"""VAE pre-training (train/vae_train.py) — the zero-egress stand-in for
the reference's downloaded AutoencoderKL (train/train.py:954-961)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirenderer_tpu.core import config
from unirenderer_tpu.train.trainer import synthetic_batches
from unirenderer_tpu.train.vae_train import (
    create_vae_train_state, make_vae_train_step, stack_modalities, train_vae,
)


def test_stack_modalities_shape():
    cfg = config.tiny()
    batch = next(iter(synthetic_batches(cfg, 2)))
    stacked = stack_modalities(batch)
    assert stacked.shape == (16, cfg.vae.sample_size, cfg.vae.sample_size, 3)


def test_vae_loss_decreases_on_fixed_batch():
    """Reconstruction loss must fall when overfitting one batch."""
    from unirenderer_tpu.models.vae import init_vae
    cfg = config.tiny()
    vae, params = init_vae(cfg.vae, jax.random.key(0))
    state = create_vae_train_state(params, lr=3e-3)
    step = jax.jit(make_vae_train_step(vae, lr=3e-3))
    images = jax.random.uniform(jax.random.key(1), (4, 16, 16, 3),
                                minval=-1, maxval=1)
    rng = jax.random.key(2)
    first = last = None
    for _ in range(30):
        state, metrics = step(state, images, rng)
        if first is None:
            first = float(metrics["vae_loss"])
        last = float(metrics["vae_loss"])
    assert np.isfinite(last)
    assert last < 0.6 * first, (first, last)


def test_train_vae_driver_checkpoints_and_restores(tmp_path):
    """Driver runs over the shared batch iterator, writes a checkpoint
    that restore_params() digs params out of, and resumes."""
    from unirenderer_tpu.core.checkpoint import CheckpointManager
    cfg = config.tiny()
    batches = itertools.islice(synthetic_batches(cfg, 2), 4)
    state = train_vae(cfg, batches, str(tmp_path), max_steps=3,
                      lr=1e-3, checkpoint_every=1000)
    assert int(state.step) == 3
    cm = CheckpointManager(str(tmp_path / "vae_checkpoints"))
    assert cm.latest_step() == 3
    restored = cm.restore_params()
    assert restored is not None
    leaves_a = jax.tree.leaves(restored)
    leaves_b = jax.tree.leaves(jax.device_get(state.params))
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # resume continues the counter
    batches = itertools.islice(synthetic_batches(cfg, 2), 4)
    state2 = train_vae(cfg, batches, str(tmp_path), max_steps=5, lr=1e-3,
                       checkpoint_every=1000)
    assert int(state2.step) == 5


def test_small_config_geometry():
    """small(): 64^2 images, 16^2 latents, flagship topology."""
    cfg = config.small()
    assert cfg.vae.sample_size == 64
    assert cfg.vae.downscale == 4
    assert cfg.unet.sample_size == 16
    assert len(cfg.unet.block_out_channels) == 3
    # model builds and one forward step runs
    from unirenderer_tpu.models.dual_stream import init_dual_stream
    dual, params = init_dual_stream(cfg.unet, jax.random.key(0),
                                    ctx_len=cfg.text.max_length)
    img = jnp.zeros((1, 16, 16, 4))
    attr = jnp.zeros((1, 16, 16, cfg.unet.attr_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, cfg.text.max_length, cfg.text.hidden_size))
    img_out, attr_out = dual.apply(params, img, attr, t, t, ctx,
                                   deterministic=True)
    assert img_out.shape == img.shape
    assert attr_out.shape == attr.shape


def test_train_vae_warm_start_from_npz(tmp_path):
    """--init-params warm-start (round 5): continue training an earlier
    round's exported VAE instead of restarting — params at step 0 of the
    new run must equal the npz, and a workdir checkpoint still wins."""
    from unirenderer_tpu.core.checkpoint import save_params_npz
    cfg = config.tiny()
    batches = itertools.islice(synthetic_batches(cfg, 2), 3)
    state = train_vae(cfg, batches, str(tmp_path / "a"), max_steps=2,
                      lr=1e-3, checkpoint_every=1000)
    npz = str(tmp_path / "vae.npz")
    save_params_npz(npz, jax.device_get(state.params), step=2,
                    dtype="float32")

    # warm-start: 0 further steps -> final params == the export
    state2 = train_vae(cfg, iter(()), str(tmp_path / "b"), max_steps=0,
                       lr=1e-3, init_params=npz)
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(state2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7, rtol=1e-7)

    # a geometry mismatch is a clear error, not silent garbage
    with pytest.raises(ValueError, match="does not match"):
        train_vae(config.small(), iter(()), str(tmp_path / "c"),
                  max_steps=0, lr=1e-3, init_params=npz)

    # resume precedence: the workdir-a checkpoint (step 2) wins over npz
    batches = itertools.islice(synthetic_batches(cfg, 2), 3)
    state3 = train_vae(cfg, batches, str(tmp_path / "a"), max_steps=3,
                       lr=1e-3, init_params=npz, checkpoint_every=1000)
    assert int(state3.step) == 3


def test_train_vae_scene_bank(tmp_path):
    """Fresh-scenes VAE training (round 5): scenes sampled + rendered
    inside the jitted step; loss is finite, steps advance, checkpoints
    land — no host batch iterator at all."""
    from unirenderer_tpu.core.checkpoint import CheckpointManager
    from unirenderer_tpu.data.scene_bank import synthetic_bank
    cfg = config.tiny()
    bank = synthetic_bank(cfg.data)
    state = train_vae(cfg, iter(()), str(tmp_path), max_steps=2,
                      lr=1e-3, scene_bank=bank, bank_batch=2,
                      checkpoint_every=1000)
    assert int(state.step) == 2
    cm = CheckpointManager(str(tmp_path / "vae_checkpoints"))
    assert cm.latest_step() == 2
