"""Multi-device (8 virtual CPU) data-parallel training tests —
'multi-node without a real cluster' (SURVEY section 4 implication)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirenderer_tpu.core import config
from unirenderer_tpu.diffusion.schedule import DiffusionSchedule
from unirenderer_tpu.models.dual_stream import init_dual_stream
from unirenderer_tpu.models.vae import init_vae
from unirenderer_tpu.parallel import mesh as pmesh
from unirenderer_tpu.train.train_step import (
    BATCH_KEYS, create_train_state, make_train_step,
)


@pytest.fixture(scope="module")
def setup():
    cfg = config.tiny()
    k1, k2 = jax.random.split(jax.random.key(0))
    dual, dual_params = init_dual_stream(
        cfg.unet, k1, ctx_len=cfg.text.max_length, dtype=jnp.float32)
    vae, vae_params = init_vae(cfg.vae, k2)
    schedule = DiffusionSchedule.create(cfg.diffusion)
    return cfg, dual, dual_params, vae, vae_params, schedule


def _fresh(params):
    # buffer donation in a sharded step can consume the donated buffers;
    # each test gets its own copy of the module-scoped params
    import jax.numpy as jnp
    return jax.tree.map(jnp.copy, params)


def _batch(cfg, b):
    hw = cfg.vae.sample_size
    k = jax.random.key(3)
    ks = jax.random.split(k, len(BATCH_KEYS))
    return {key: jax.random.uniform(kk, (b, hw, hw, 3), minval=-1, maxval=1)
            for key, kk in zip(BATCH_KEYS, ks)}


def test_single_device_step_decreases_nothing_weird(setup):
    cfg, dual, dual_params, vae, vae_params, schedule = setup
    step_fn = make_train_step(cfg, dual, vae, schedule)
    state = create_train_state(cfg, dual_params)
    ctx = jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim))
    batch = _batch(cfg, 2)
    state, m = jax.jit(step_fn)(state, vae_params, ctx, batch,
                                jax.random.key(1))
    assert int(state.step) == 1
    assert np.isfinite(float(m["loss"]))
    assert float(m["grad_norm"]) > 0


def test_eight_device_dp_step(setup, eight_devices):
    cfg, dual, dual_params, vae, vae_params, schedule = setup
    m = pmesh.make_mesh(8)
    step_fn = make_train_step(cfg, dual, vae, schedule)
    state = create_train_state(cfg, _fresh(dual_params))
    sharded = pmesh.make_sharded_train_step(step_fn, m)

    state = pmesh.replicate(state, m)
    vp = pmesh.replicate(vae_params, m)
    ctx = pmesh.replicate(
        jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim)), m)
    batch = pmesh.shard_batch(_batch(cfg, 16), m)

    state, metrics = sharded(state, vp, ctx, batch, jax.random.key(2))
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))


def test_dp_matches_single_device(setup, eight_devices):
    """The DP-sharded step over 8 devices must produce the same params as
    the unsharded step on the identical global batch (determinism of the
    XLA collective path)."""
    cfg, dual, dual_params, vae, vae_params, schedule = setup
    step_fn = make_train_step(cfg, dual, vae, schedule)
    ctx = jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim))
    batch = _batch(cfg, 8)
    rng = jax.random.key(9)

    s_single = create_train_state(cfg, _fresh(dual_params))
    s_single, m_single = jax.jit(step_fn)(s_single, vae_params, ctx, batch,
                                          rng)

    m8 = pmesh.make_mesh(8)
    sharded = pmesh.make_sharded_train_step(step_fn, m8)
    s_dp = pmesh.replicate(create_train_state(cfg, _fresh(dual_params)), m8)
    s_dp, m_dp = sharded(s_dp, pmesh.replicate(vae_params, m8),
                         pmesh.replicate(ctx, m8),
                         pmesh.shard_batch(batch, m8), rng)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_dp["loss"]),
                               rtol=1e-4)
    a = jax.tree_util.tree_leaves(s_single.params)[0]
    b = jax.tree_util.tree_leaves(s_dp.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fsdp_sharding_rules(setup, eight_devices):
    cfg, dual, dual_params, vae, vae_params, schedule = setup
    m = pmesh.make_mesh(8)
    sh = pmesh.fsdp_param_sharding(dual_params, m, min_size=1024)
    leaves = jax.tree_util.tree_leaves(sh)
    assert len(leaves) > 0
    # at least one parameter should actually shard on 'data'
    has_sharded = any("data" in str(s.spec) for s in leaves)
    assert has_sharded


def test_tp_sharding_rules(setup, eight_devices):
    """Column/row rules land on the transformer dense kernels only."""
    cfg, dual, dual_params, vae, vae_params, schedule = setup
    m = pmesh.make_mesh_2d(2, 2)
    sh = pmesh.tp_param_sharding(dual_params, m)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    col = [p for p, s in flat if "model" in str(s.spec)
           and any(n in str(p) for n in ("to_q", "to_k", "to_v", "proj"))]
    row = [p for p, s in flat if "model" in str(s.spec)
           and any(n in str(p) for n in ("to_out", "out"))]
    assert col and row
    # nothing else sharded: convs/norms/embeddings replicated
    for p, s in flat:
        if "model" in str(s.spec):
            assert any(n in str(p) for n in
                       ("to_q", "to_k", "to_v", "to_out", "proj", "out")), p


def test_tp_matches_single_device(setup, eight_devices):
    """Hybrid DP(2) x TP(2): identical global batch must give the same
    loss and updated params as the unsharded step — GSPMD's Megatron
    collectives are numerically faithful."""
    cfg, dual, dual_params, vae, vae_params, schedule = setup
    step_fn = make_train_step(cfg, dual, vae, schedule)
    ctx = jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim))
    batch = _batch(cfg, 4)
    rng = jax.random.key(11)

    s_single = create_train_state(cfg, _fresh(dual_params))
    s_single, m_single = jax.jit(step_fn)(s_single, vae_params, ctx, batch,
                                          rng)

    m22 = pmesh.make_mesh_2d(2, 2)
    tp_step, state_sh = pmesh.make_tp_train_step(
        step_fn, m22, create_train_state(cfg, _fresh(dual_params)))
    s_tp = pmesh.apply_sharding(
        create_train_state(cfg, _fresh(dual_params)), state_sh)
    repl = pmesh.replicated(m22)
    bs = pmesh.batch_sharding(m22)
    s_tp, m_tp = tp_step(
        s_tp,
        jax.tree.map(lambda x: jax.device_put(x, repl), vae_params),
        jax.device_put(ctx, repl),
        jax.tree.map(lambda x: jax.device_put(x, bs), batch), rng)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_tp["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_inference_matches_single_device():
    """Multi-chip DP serving: the full forward-sampling pipeline over an
    8-device mesh must reproduce the single-device result (batch split
    over `data`, params replicated — SURVEY 2.5 applied to inference)."""
    import jax.numpy as jnp

    from unirenderer_tpu.core import config
    from unirenderer_tpu.parallel.mesh import make_mesh, shard_pipeline
    from unirenderer_tpu.pipelines import UniRendererPipeline

    cfg = config.tiny()
    pipe = UniRendererPipeline.create(cfg, jax.random.key(0),
                                      dtype=jnp.float32)
    s = cfg.vae.sample_size
    b = 8
    ks = jax.random.split(jax.random.key(1), 6)
    maps = {k: jax.random.uniform(ks[i], (b, s, s, 3), minval=-1, maxval=1)
            for i, k in enumerate(("normal", "albedo", "spec_light",
                                   "diff_light", "env", "mask"))}
    kwargs = dict(**maps, metallic=jnp.full((b,), 0.4),
                  roughness=jnp.full((b,), 0.6),
                  rng=jax.random.key(2), num_steps=2)

    single = np.asarray(pipe.mask2image_3mod_albedo(**kwargs))

    mesh = make_mesh(8)
    shard_call = shard_pipeline(pipe, mesh)
    sharded = np.asarray(
        shard_call(pipe.mask2image_3mod_albedo, **kwargs))
    np.testing.assert_allclose(sharded, single, atol=2e-4)


def test_tp_sharded_inference_matches_single_device():
    """DP(4) x TP(2) serving: TP-sharded dual params through the full
    sampling scan must reproduce the single-device result."""
    import jax.numpy as jnp

    from unirenderer_tpu.core import config
    from unirenderer_tpu.parallel.mesh import make_mesh_2d, shard_pipeline
    from unirenderer_tpu.pipelines import UniRendererPipeline

    cfg = config.tiny()
    pipe = UniRendererPipeline.create(cfg, jax.random.key(0),
                                      dtype=jnp.float32)
    s = cfg.vae.sample_size
    b = 8
    ks = jax.random.split(jax.random.key(1), 6)
    maps = {k: jax.random.uniform(ks[i], (b, s, s, 3), minval=-1, maxval=1)
            for i, k in enumerate(("normal", "albedo", "spec_light",
                                   "diff_light", "env", "mask"))}
    kwargs = dict(**maps, metallic=jnp.full((b,), 0.4),
                  roughness=jnp.full((b,), 0.6),
                  rng=jax.random.key(2), num_steps=2)

    single = np.asarray(pipe.mask2image_3mod_albedo(**kwargs))

    shard_call = shard_pipeline(pipe, make_mesh_2d(4, 2))
    sharded = np.asarray(
        shard_call(pipe.mask2image_3mod_albedo, **kwargs))
    np.testing.assert_allclose(sharded, single, atol=2e-4)


def test_tp_fsdp_matches_single_device(setup, eight_devices):
    """Hybrid DP(2) x TP(2) with FSDP-over-data on the TP-replicated
    remainder (tp_param_sharding data_axis): numerically identical to the
    unsharded step, with conv/embedding kernels actually sharded on
    'data' (ADVICE round-2 low #3 made real)."""
    cfg, dual, dual_params, vae, vae_params, schedule = setup
    step_fn = make_train_step(cfg, dual, vae, schedule)
    ctx = jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim))
    batch = _batch(cfg, 4)
    rng = jax.random.key(13)

    s_single = create_train_state(cfg, _fresh(dual_params))
    s_single, m_single = jax.jit(step_fn)(s_single, vae_params, ctx, batch,
                                          rng)

    m22 = pmesh.make_mesh_2d(2, 2)
    # low min-size so the tiny config's conv kernels participate
    sh = pmesh.tp_param_sharding(
        create_train_state(cfg, _fresh(dual_params)), m22,
        data_axis="data", fsdp_min_size=256)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    assert any("data" in str(s.spec) for _, s in flat), \
        "FSDP-over-data sharded nothing"
    assert any("model" in str(s.spec) for _, s in flat)

    tp_step, state_sh = pmesh.make_tp_train_step(
        step_fn, m22, create_train_state(cfg, _fresh(dual_params)),
        fsdp=True)
    s_tp = pmesh.apply_sharding(
        create_train_state(cfg, _fresh(dual_params)), state_sh)
    repl = pmesh.replicated(m22)
    bs = pmesh.batch_sharding(m22)
    s_tp, m_tp = tp_step(
        s_tp,
        jax.tree.map(lambda x: jax.device_put(x, repl), vae_params),
        jax.device_put(ctx, repl),
        jax.tree.map(lambda x: jax.device_put(x, bs), batch), rng)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_tp["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bf16_grad_step_tracks_f32_step(setup):
    """grad_dtype='bfloat16' (the flagship single-chip memory mode,
    TrainConfig.grad_dtype) must keep master params f32 and produce an
    update close to the f32-grad step — same program, grads merely
    computed w.r.t. the bf16 compute params the model casts to anyway."""
    import dataclasses
    cfg, dual, dual_params, vae, vae_params, schedule = setup
    ctx = jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim))
    batch = _batch(cfg, 2)
    rng = jax.random.key(7)

    s32 = create_train_state(cfg, _fresh(dual_params))
    s32, m32 = jax.jit(make_train_step(cfg, dual, vae, schedule))(
        s32, vae_params, ctx, batch, rng)

    cfg16 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_dtype="bfloat16"))
    s16 = create_train_state(cfg16, _fresh(dual_params))
    s16, m16 = jax.jit(make_train_step(cfg16, dual, vae, schedule))(
        s16, vae_params, ctx, batch, rng)

    assert np.isfinite(float(m16["loss"]))
    # near-identical forward: layers whose compute dtype promotes from the
    # param dtype (flax norm scale/bias application) run bf16 instead of
    # f32 under this mode, so the loss shifts by O(bf16 eps), not more
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]),
                               rtol=5e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s16.params),
                    jax.tree_util.tree_leaves(s32.params)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == np.float32
        # updates agree to bf16 grad precision (lr-scaled, so loose)
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_two_phase_step_matches_fused(setup):
    """make_two_phase_train_step (the flagship single-chip fragmentation
    workaround, PERF.md round 5) must produce the same params as the fused
    step — same ops, split at the grads boundary."""
    from unirenderer_tpu.train.train_step import make_two_phase_train_step
    cfg, dual, dual_params, vae, vae_params, schedule = setup
    ctx = jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim))
    batch = _batch(cfg, 2)
    rng = jax.random.key(11)

    s_f = create_train_state(cfg, _fresh(dual_params))
    s_f, m_f = jax.jit(make_train_step(cfg, dual, vae, schedule))(
        s_f, vae_params, ctx, batch, rng)

    g_raw, u_raw = make_two_phase_train_step(cfg, dual, vae, schedule)
    s_t = create_train_state(cfg, _fresh(dual_params))
    grads, m_t = jax.jit(g_raw)(s_t.params, vae_params, ctx, batch, rng,
                                s_t.step)
    s_t = jax.jit(u_raw, donate_argnums=(0, 1))(s_t, grads)

    assert int(s_t.step) == 1
    np.testing.assert_allclose(float(m_t["loss"]), float(m_f["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_t.params),
                    jax.tree_util.tree_leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
