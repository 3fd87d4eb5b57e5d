"""Tests: fast_init structure parity, activation introspection, material,
anomaly guard, tracing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirenderer_tpu.core import config
from unirenderer_tpu.core.debug import AnomalyGuard, checkify_finite
from unirenderer_tpu.core.tracing import MetricLogger, PhaseTimer
from unirenderer_tpu.models.dual_stream import DualStreamModel
from unirenderer_tpu.models.introspect import (
    capture_activations, diff_activations,
)
from unirenderer_tpu.render.material import Material
from unirenderer_tpu.utils.fast_init import shape_init


def test_shape_init_matches_real_init_structure():
    cfg = config.tiny().unet
    model = DualStreamModel(cfg, jnp.float32)
    s = cfg.sample_size
    args = (jnp.zeros((1, s, s, 4)), jnp.zeros((1, s, s, 28)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 16, cfg.cross_attention_dim)))
    real = model.init(jax.random.key(0), *args)
    fast = shape_init(lambda: model.init(jax.random.key(0), *args))
    rs = jax.tree.map(lambda x: (x.shape, str(x.dtype)), real)
    fs = jax.tree.map(lambda x: (x.shape, str(x.dtype)), fast)
    assert rs == fs
    # and the model runs with the fast params
    out = model.apply(fast, *args)
    assert np.isfinite(np.asarray(out[0])).all()


def test_capture_and_diff_activations():
    cfg = config.tiny().unet
    model = DualStreamModel(cfg, jnp.float32)
    s = cfg.sample_size
    args = (jnp.ones((1, s, s, 4)), jnp.ones((1, s, s, 28)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 16, cfg.cross_attention_dim)))
    p1 = model.init(jax.random.key(0), *args)
    a1 = capture_activations(model, p1, *args)
    assert len(a1) > 10
    a2 = capture_activations(model, p1, *args)
    rows = diff_activations(a1, a2)
    assert all(r[1] == 0.0 for r in rows)          # identical runs
    p2 = model.init(jax.random.key(1), *args)
    a3 = capture_activations(model, p2, *args)
    rows = diff_activations(a1, a3)
    assert rows[0][1] > 0.0                        # different weights differ


def test_material_constant_and_texture():
    m = Material(kd=jnp.asarray([0.5, 0.2, 0.1]))
    uv = jnp.zeros((4, 4, 2))
    out = np.asarray(m.sample_kd(uv))
    np.testing.assert_allclose(out[..., 0], 0.5)
    tex = jnp.ones((8, 8, 3)) * 0.3
    mt = Material(kd=tex)
    assert mt.has_texture
    np.testing.assert_allclose(np.asarray(mt.sample_kd(uv)), 0.3, rtol=1e-5)


def test_anomaly_guard():
    g = AnomalyGuard(patience=2)
    assert g.check({"loss": 1.0}, 0)
    assert not g.check({"loss": float("nan")}, 1)
    with pytest.raises(FloatingPointError):
        g.check({"loss": float("inf")}, 2)
    # recovery resets
    g2 = AnomalyGuard(patience=2)
    g2.check({"loss": float("nan")}, 0)
    assert g2.check({"loss": 0.5}, 1)


def test_checkify_finite_catches_nan():
    def bad(x):
        return jnp.log(x)                          # nan for x < 0

    f = checkify_finite(bad)
    f(jnp.asarray([1.0]))                          # fine
    with pytest.raises(Exception):
        f(jnp.asarray([-1.0]))


def test_phase_timer_and_logger(tmp_path):
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    log = MetricLogger(str(tmp_path / "m.jsonl"))
    log.log(1, {"loss": 0.5})
    log.close()
    import json
    rec = json.loads((tmp_path / "m.jsonl").read_text().strip())
    assert rec["loss"] == 0.5 and rec["step"] == 1


def test_medium_config_builds_and_sizes():
    """medium() (round-5: the step between small and flagship): geometry
    is self-consistent (VAE downscale matches latent size), the dual
    model shape-inits, and the parameter count lands between small and
    flagship so single-chip AdamW still fits (PARITY §2.5)."""
    cfg = config.medium()
    assert cfg.data.resolution == cfg.vae.sample_size == 128
    assert cfg.vae.sample_size // cfg.vae.downscale == cfg.unet.sample_size

    def count(c):
        u = c.unet
        model = DualStreamModel(u, jnp.float32)
        s = u.sample_size
        args = (jnp.zeros((1, s, s, 4)), jnp.zeros((1, s, s, 28)),
                jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 16, u.cross_attention_dim)))
        t = jax.eval_shape(lambda: model.init(jax.random.key(0), *args))
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(t))

    n_small, n_med = count(config.small()), count(cfg)
    n_flag = count(config.flagship())
    assert n_small < n_med < n_flag
    assert 2e8 < n_med < 8e8   # AdamW f32 state ~2x params stays < 16GB
