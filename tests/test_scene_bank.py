"""Scene-bank fresh-scenes training (data/scene_bank.py): on-device scene
sampling must produce render-ready scenes identical in structure to
stack_scene output, respect the sampling distribution, and drive the fused
bank train step (one XLA program, zero per-step host input) on a sharded
mesh.  The reference's analogue is the fresh in-loop GPU render every step
(train/train.py:184-439)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirenderer_tpu.core import config
from unirenderer_tpu.data.scene_bank import load_scene_bank, sample_scenes


def _tiny_cfg():
    cfg = config.tiny()
    return dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data,
                                      resolution=cfg.vae.sample_size,
                                      ssaa=1, texture_res=16))


@pytest.fixture(scope="module")
def bank_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("bankdata")
    from tools.make_synthetic_data import main as gen
    gen(["--out", str(out), "--n-mesh", "6", "--n-env", "3",
         "--env-res", "8", "--env-min-res", "4", "--tex-res", "16",
         "--seed", "7"])
    return str(out)


@pytest.fixture(scope="module")
def bank(bank_dir):
    cfg = _tiny_cfg()
    return load_scene_bank(os.path.join(bank_dir, "meshes"),
                           os.path.join(bank_dir, "envs"), cfg.data)


def test_bank_shapes(bank):
    m = bank["v_pos"].shape[0]
    assert m == 6
    assert bank["v_pos"].shape == bank["v_nrm"].shape
    assert bank["v_pos"].shape[1] % 128 == 0          # lane-rounded pad
    assert bank["t_idx"].shape[1] % 128 == 0
    assert bank["diffuse"].shape[0] == 3
    assert bank["kds"].shape == (6, 16, 16, 3)


def test_sample_scenes_structure_and_distribution(bank):
    cfg = _tiny_cfg()
    b = jax.tree.map(jnp.asarray, bank)
    scene = jax.jit(lambda bk, r: sample_scenes(bk, r, 64, cfg.data))(
        b, jax.random.key(0))
    assert scene["v_pos"].shape == (64,) + bank["v_pos"].shape[1:]
    assert scene["mvps"].shape == (64, 4, 4)
    assert scene["nrots"].shape == (64, 3, 3)
    # material grid values land on the 11-level grid
    g = cfg.data.material_grid
    met = np.asarray(scene["metallics"])
    assert np.allclose(met * (g - 1), np.round(met * (g - 1)), atol=1e-5)
    # normals stay unit-length after the anisotropic-scale augmentation
    n = np.linalg.norm(np.asarray(scene["v_nrm"]), axis=-1)
    mask = n > 1e-3                                   # skip padded verts
    assert np.allclose(n[mask], 1.0, atol=1e-4)
    # albedo stays a valid texture
    kd = np.asarray(scene["kds"])
    assert kd.min() >= 0.0 and kd.max() <= 1.0
    # different scenes are drawn (mesh indices vary across the batch)
    assert len(np.unique(np.asarray(scene["v_pos"]).sum((1, 2)))) > 2


def test_sample_feeds_collate(bank):
    cfg = _tiny_cfg()
    from unirenderer_tpu.data.objaverse import collate_from_scene
    b = jax.tree.map(jnp.asarray, bank)
    scene = sample_scenes(b, jax.random.key(1), 2, cfg.data)
    out = jax.jit(lambda s: collate_from_scene(
        s, cfg.data.resolution, ssaa=1))(scene)
    r = cfg.data.resolution
    for k in ("image", "normal", "albedo", "mask"):
        assert out[k].shape == (2, r, r, 3)
        x = np.asarray(out[k])
        assert np.isfinite(x).all()
        assert x.min() >= -1.0 - 1e-5 and x.max() <= 1.0 + 1e-5
    # something was actually rendered (non-background pixels exist)
    assert float((np.asarray(out["mask"]) > 0).mean()) > 0.01


def test_synthetic_bank_matches_file_bank_schema(bank):
    """synthetic_bank (used by tests + the driver dryrun) must be
    drop-in for a file-loaded bank: same keys, sampleable, renderable."""
    cfg = _tiny_cfg()
    from unirenderer_tpu.data.objaverse import collate_from_scene
    from unirenderer_tpu.data.scene_bank import synthetic_bank

    sb = synthetic_bank(cfg.data, v_pad=256, t_pad=512)
    assert set(sb) == set(bank)
    for k in sb:
        assert sb[k].ndim == bank[k].ndim, k
        assert sb[k].dtype == bank[k].dtype, k
    scene = sample_scenes(jax.tree.map(jnp.asarray, sb),
                          jax.random.key(2), 2, cfg.data)
    out = jax.jit(lambda s: collate_from_scene(
        s, cfg.data.resolution, ssaa=1))(scene)
    assert np.isfinite(np.asarray(out["image"])).all()
    assert float((np.asarray(out["mask"]) > 0).mean()) > 0.01


def test_bank_train_step_runs_sharded(bank):
    """Fused sample+render+train step over the 8-device DP mesh: params
    replicated, bank replicated, sampled scene sharded inside the step."""
    cfg = _tiny_cfg()
    from unirenderer_tpu.train.trainer import Trainer

    tr = Trainer(cfg, "/tmp/scene_bank_test_run", dtype=jnp.float32,
                 scene_bank=bank)
    state = tr.train(iter(()), max_steps=2)
    assert int(jax.device_get(state.step)) == 2
    # a second call resumes from the checkpoint instead of restarting
    tr2 = Trainer(cfg, "/tmp/scene_bank_test_run", dtype=jnp.float32,
                  scene_bank=bank)
    assert tr2.maybe_resume() == 2


def test_rotation_augmentation_is_rigid(bank):
    """SO(3) augmentation (cfg.data.rotation_augment): the per-scene
    matrices are proper rotations, vertex geometry stays rigid up to the
    anisotropic scale, and the flag can be switched off."""
    import dataclasses

    from unirenderer_tpu.data.scene_bank import _random_rotations

    R = np.asarray(_random_rotations(jax.random.key(4), 16))
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.99          # proper (no reflection)
    # matrices differ across the batch (actually random)
    assert not np.allclose(R[0], R[1])

    cfg = _tiny_cfg()
    b = jax.tree.map(jnp.asarray, bank)
    scene = sample_scenes(b, jax.random.key(3), 4, cfg.data)
    n = np.linalg.norm(np.asarray(scene["v_nrm"]), axis=-1)
    assert np.allclose(n[n > 1e-3], 1.0, atol=1e-4)

    off = dataclasses.replace(cfg.data, rotation_augment=False)
    scene_off = sample_scenes(b, jax.random.key(3), 4, off)
    assert scene_off["v_pos"].shape == scene["v_pos"].shape
    # same rng, same sampled meshes: only the rotation should differ, so
    # per-vertex radii (up to the shared anisotropic scale) must match
    r_on = np.sort(np.linalg.norm(np.asarray(scene["v_pos"]), axis=-1))
    r_off = np.sort(np.linalg.norm(np.asarray(scene_off["v_pos"]), axis=-1))
    np.testing.assert_allclose(r_on, r_off, atol=1e-4)
