"""Trainer loop + checkpoint/rotation/resume tests (SURVEY aux
'Checkpoint / resume'; reference train/train.py:1191-1218, 1434-1457)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirenderer_tpu.core import config
from unirenderer_tpu.core.checkpoint import CheckpointManager
from unirenderer_tpu.train.trainer import Trainer, synthetic_batches


def small_cfg():
    cfg = config.tiny()
    import dataclasses
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, checkpoint_every=2,
                                       checkpoints_total_limit=2))


def test_checkpoint_manager_rotation(tmp_path):
    cm = CheckpointManager(str(tmp_path), total_limit=2)
    tree = {"a": np.arange(4.0), "b": {"c": np.ones((2, 2))}}
    for s in (2, 4, 6):
        cm.save(s, tree)
    cm.wait()
    assert cm.all_steps() == [4, 6]
    restored = cm.restore(template=tree)
    np.testing.assert_allclose(restored["a"], tree["a"])


def test_restore_params_falls_back_past_unfinalized_dir(tmp_path):
    """A trainer killed mid-save leaves a checkpoint-N dir without a
    readable `state` tree; restore_params must fall back to the newest
    COMPLETE checkpoint and report the step it actually restored."""
    cm = CheckpointManager(str(tmp_path), total_limit=5)
    tree = {"a": np.arange(4.0)}
    cm.save(2, tree)
    cm.wait()
    # simulate the kill: a newer step dir exists but holds no state
    os.makedirs(tmp_path / "checkpoint-4" / "state.orbax-checkpoint-tmp-0")
    restored = cm.restore_params()
    np.testing.assert_allclose(restored["a"], tree["a"])
    assert cm.restored_step() == 2
    assert cm.latest_step() == 4          # the broken dir still exists


def test_trainer_smoke_and_resume(tmp_path):
    cfg = small_cfg()
    workdir = str(tmp_path / "run")
    tr = Trainer(cfg, workdir, n_devices=1, dtype=jnp.float32)
    it = synthetic_batches(cfg, batch=2)
    state = tr.train(it, max_steps=4)
    assert int(jax.device_get(state.step)) == 4
    tr.ckpt.wait()
    assert tr.ckpt.latest_step() == 4
    assert os.path.exists(os.path.join(workdir, "metrics.jsonl"))

    # resume: a fresh trainer picks up at step 4
    tr2 = Trainer(cfg, workdir, n_devices=1, dtype=jnp.float32)
    start = tr2.maybe_resume()
    assert start == 4
    s4 = jax.tree_util.tree_leaves(tr2.state.params)[0]
    s4_orig = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_allclose(np.asarray(s4), np.asarray(s4_orig),
                               atol=1e-6)


def test_install_ported_recomputes_text_context(tmp_path):
    """Round-1 weak #2: the SD port used to drop the ported text encoder,
    leaving the cached blank-prompt context computed from RANDOM CLIP.
    install_ported must recompute ctx from the ported weights."""
    cfg = small_cfg()
    tr = Trainer(cfg, str(tmp_path / "r"), n_devices=1, dtype=jnp.float32)
    ctx_before = np.asarray(jax.device_get(tr.ctx))

    from unirenderer_tpu.models.clip_text import init_text_encoder
    _, other_text = init_text_encoder(cfg.text, jax.random.key(123),
                                      dtype=jnp.float32)
    dual_params = jax.device_get(tr.state.params)
    tr.install_ported(dual_params, tr.vae_params, other_text)

    ctx_after = np.asarray(jax.device_get(tr.ctx))
    assert not np.allclose(ctx_before, ctx_after), (
        "ported text params did not change the cached blank context")
    # the replicated copy the train step actually consumes must match too
    np.testing.assert_allclose(
        np.asarray(jax.device_get(tr.ctx_r)), ctx_after, atol=0)
    # and training still runs with the installed weights
    state = tr.train(synthetic_batches(cfg, batch=2), max_steps=1)
    assert int(jax.device_get(state.step)) == 1


def test_metric_logger_tensorboard(tmp_path):
    """--report-to tensorboard parity (reference train/train.py:712-719):
    scalars land in a TB event file next to the JSONL."""
    import glob
    import json

    from unirenderer_tpu.core.tracing import MetricLogger

    path = str(tmp_path / "metrics.jsonl")
    lg = MetricLogger(path, report_to=("jsonl", "tensorboard"))
    lg.log(1, {"loss": 0.5, "lr": 1e-4})
    lg.log(2, {"loss": 0.25, "lr": 1e-4})
    lg.close()
    with open(path) as f:
        recs = [json.loads(l) for l in f]
    assert [r["loss"] for r in recs] == [0.5, 0.25]
    ev = glob.glob(str(tmp_path / "tensorboard" / "events.out.tfevents.*"))
    assert ev, "no tensorboard event file written"
    assert os.path.getsize(ev[0]) > 0


def test_lr_schedule_cosine():
    """Warmup+cosine LR option (TrainConfig.lr_schedule): ramps from 0,
    peaks at the configured lr after warmup, decays to end_factor*lr at
    the horizon; optimizer still produces finite updates."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unirenderer_tpu.core import config
    from unirenderer_tpu.train.train_step import (
        make_lr_schedule, make_optimizer,
    )

    cfg = config.tiny()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, lr_schedule="cosine", learning_rate=1e-3,
        lr_warmup_steps=10, lr_decay_steps=100, lr_end_factor=0.1))
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) < 1e-4
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(sched(100)), 1e-4, rtol=1e-4)
    mid = float(sched(55))
    assert 1e-4 < mid < 1e-3

    opt = make_optimizer(cfg)
    params = {"params": {"w": jnp.ones((4, 4))}}
    state = opt.init(params["params"])
    grads = {"w": jnp.full((4, 4), 0.5)}
    updates, _ = opt.update(grads, state, params["params"])
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_params_npz_roundtrip(tmp_path):
    """Portable params export (tools/export_params.py): f16 .npz
    round-trips the tree structure; values match to f16 precision; step
    metadata survives; int leaves keep their dtype."""
    from unirenderer_tpu.core.checkpoint import (
        load_params_npz, save_params_npz,
    )
    rng = np.random.default_rng(0)
    kernel = rng.standard_normal((3, 3, 4, 8)).astype(np.float32)
    params = {"params": {"conv": {"kernel": kernel,
                                  "bias": np.zeros(8, np.float32)},
                         "emb": {"table": np.arange(12, dtype=np.int32)}}}
    path = str(tmp_path / "p.npz")
    save_params_npz(path, params, step=1234, dtype="float16")
    loaded, step = load_params_npz(path)
    assert step == 1234
    assert loaded["params"]["emb"]["table"].dtype == np.int32
    k = loaded["params"]["conv"]["kernel"]
    assert k.dtype == np.float32          # upcast on load
    # the exact contract: load == f16 quantization of the saved f32
    np.testing.assert_array_equal(
        k, kernel.astype(np.float16).astype(np.float32))
    # jax tree structure identical
    assert (jax.tree_util.tree_structure(loaded)
            == jax.tree_util.tree_structure(params))


def test_trainer_install_dual_warm_start(tmp_path):
    """--init-params path: install_dual replaces params and resets the
    optimizer; training still steps."""
    cfg = small_cfg()
    tr = Trainer(cfg, str(tmp_path / "a"), n_devices=1, dtype=jnp.float32)
    warm = jax.tree.map(lambda x: np.asarray(x) + 1.0,
                        jax.device_get(tr.state.params))
    tr.install_dual(warm)
    got = jax.tree_util.tree_leaves(jax.device_get(tr.state.params))[0]
    want = jax.tree_util.tree_leaves(warm)[0]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
    state = tr.train(synthetic_batches(cfg, batch=2), max_steps=1)
    assert int(jax.device_get(state.step)) == 1


def test_adafactor_optimizer_steps_and_shrinks_state(tmp_path):
    """--optimizer adafactor (the single-chip flagship configuration:
    AdamW's f32 moments are 20.9GB for the 1.74B-param flagship, over one
    16GB v5e): the factored optimizer must step, reduce the loss signal
    pathway (finite loss, params change), and hold O(rows+cols) state —
    strictly smaller than AdamW's 2x-params moments."""
    import dataclasses

    from unirenderer_tpu.train.train_step import create_train_state

    def nbytes(tree):
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "size"))

    cfg_af = dataclasses.replace(
        small_cfg(), train=dataclasses.replace(
            small_cfg().train, optimizer="adafactor"))
    tr = Trainer(cfg_af, str(tmp_path / "af"), n_devices=1,
                 dtype=jnp.float32)
    p0 = jax.tree_util.tree_leaves(jax.device_get(tr.state.params))[0].copy()
    state = tr.train(synthetic_batches(cfg_af, batch=2), max_steps=2)
    assert int(jax.device_get(state.step)) == 2
    p1 = jax.tree_util.tree_leaves(jax.device_get(state.params))[0]
    assert np.isfinite(p1).all()
    assert not np.allclose(p0, p1)

    cfg_aw = small_cfg()
    s_aw = create_train_state(cfg_aw, jax.device_get(tr.state.params))
    s_af = create_train_state(cfg_af, jax.device_get(tr.state.params))
    # tiny config: most kernels are below adafactor's 128 min-factor dim,
    # so the win is modest here; the structural check is the next assert
    assert nbytes(s_af.opt_state) < 0.55 * nbytes(s_aw.opt_state)

    # where factoring applies (both trailing dims >= 128, i.e. every big
    # matmul in the flagship) the state is O(rows+cols), not O(rows*cols)
    big = {"params": {"dense": {"kernel": np.zeros((256, 256), np.float32)}}}
    s_big_af = create_train_state(cfg_af, big)
    s_big_aw = create_train_state(cfg_aw, big)
    assert nbytes(s_big_af.opt_state) < 0.02 * nbytes(s_big_aw.opt_state)
