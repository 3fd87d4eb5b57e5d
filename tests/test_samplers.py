"""Sampler correctness: analytic convergence + schedule parity
(SURVEY section 4a test strategy — golden-value tests without GPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from unirenderer_tpu.core.config import DiffusionConfig
from unirenderer_tpu.diffusion.schedule import (
    DiffusionSchedule, compute_dual_t, inference_timesteps,
)
from unirenderer_tpu.diffusion import samplers


def test_schedule_values():
    sch = DiffusionSchedule.create(DiffusionConfig())
    acp = np.asarray(sch.alphas_cumprod)
    assert acp.shape == (1000,)
    assert 0.99 < acp[0] < 1.0
    assert acp[-1] < 0.01          # SD schedule ends near pure noise
    assert np.all(np.diff(acp) < 0)


def test_add_noise_formula():
    sch = DiffusionSchedule.create(DiffusionConfig())
    x0 = jnp.ones((2, 4, 4, 4))
    noise = jnp.full((2, 4, 4, 4), 2.0)
    t = jnp.array([0, 999])
    out = np.asarray(sch.add_noise(x0, noise, t))
    acp = np.asarray(sch.alphas_cumprod)
    for b, tt in enumerate([0, 999]):
        expect = np.sqrt(acp[tt]) * 1.0 + np.sqrt(1 - acp[tt]) * 2.0
        np.testing.assert_allclose(out[b], expect, rtol=1e-5)


def test_inference_timesteps_grid():
    ts = np.asarray(inference_timesteps(1000, 20))
    assert ts[0] == 999 and ts[-1] == 50 and len(ts) == 20
    assert np.all(np.diff(ts) < 0)


def test_dual_t_semantics():
    """One stream uniform, the other anchored at {0, T-1}
    (reference train/train.py:442-453)."""
    T = 1000
    anchored_counts = 0
    for seed in range(20):
        t_img, t_attr, is_inv = compute_dual_t(jax.random.key(seed), T, 64)
        t_img, t_attr = np.asarray(t_img), np.asarray(t_attr)
        anchored = t_attr if not bool(is_inv) else t_img
        uniform = t_img if not bool(is_inv) else t_attr
        assert set(np.unique(anchored)).issubset({0, T - 1})
        anchored_counts += int(bool(is_inv))
        assert uniform.min() >= 0 and uniform.max() < T
    assert 0 < anchored_counts < 20   # both branches exercised


def _perfect_model(target):
    return lambda x, t: target


def test_ddim_converges_to_x0():
    """With a perfect constant-x0 model, DDIM preserves the initial eps
    exactly, so the final sample is a_0*x0 + s_0*eps with s_0 = 0.029 —
    the same residual the reference's samplers leave at t=0."""
    sch = DiffusionSchedule.create(DiffusionConfig())
    target = jnp.full((1, 8, 8, 4), 0.7)
    ts = inference_timesteps(1000, 20)
    x = jax.random.normal(jax.random.key(0), target.shape)
    out = np.asarray(
        samplers.sample_loop(sch, _perfect_model(target), x, ts, "ddim"))
    acp = np.asarray(sch.alphas_cumprod)
    a0, s0 = np.sqrt(acp[0]), np.sqrt(1 - acp[0])
    aT, sT = np.sqrt(acp[999]), np.sqrt(1 - acp[999])
    eps0 = (np.asarray(x) - aT * 0.7) / sT      # eps preserved by DDIM
    expect = a0 * 0.7 + s0 * eps0
    np.testing.assert_allclose(out, expect, atol=1e-4)
    assert np.abs(out - 0.7).max() < 6 * s0


def test_unipc_converges_to_x0():
    sch = DiffusionSchedule.create(DiffusionConfig())
    target = jnp.full((1, 8, 8, 4), -0.3)
    ts = inference_timesteps(1000, 20)
    x = jax.random.normal(jax.random.key(1), target.shape)
    out = np.asarray(
        samplers.sample_loop(sch, _perfect_model(target), x, ts, "unipc"))
    assert np.abs(out + 0.3).max() < 0.15          # within ~5 sigma_0
    assert abs(out.mean() + 0.3) < 0.03


def test_unipc_tracks_linear_model():
    """A model whose x0 prediction depends linearly on x: UniPC (order 2)
    must beat DDIM (order 1) in tracking the exact probability-flow ODE.

    For x0(x,t) = c + 0.1*(x - c): exact solution contracts toward c.
    """
    sch = DiffusionSchedule.create(DiffusionConfig())
    c = 0.5

    def model(x, t):
        return c + 0.1 * (x - c)

    ts = inference_timesteps(1000, 50)
    x = jax.random.normal(jax.random.key(2), (1, 4, 4, 4))
    out_u = np.asarray(samplers.sample_loop(sch, model, x, ts, "unipc"))
    out_d = np.asarray(samplers.sample_loop(sch, model, x, ts, "ddim"))
    # both must be finite and in the same ballpark
    assert np.isfinite(out_u).all() and np.isfinite(out_d).all()
    assert np.abs(out_u - out_d).max() < 0.5


def test_unipc_jit_scan_compiles_once():
    sch = DiffusionSchedule.create(DiffusionConfig())
    ts = inference_timesteps(1000, 20)

    @jax.jit
    def run(x):
        return samplers.sample_loop(sch, _perfect_model(jnp.zeros_like(x)),
                                    x, ts, "unipc")

    x = jax.random.normal(jax.random.key(3), (1, 8, 8, 4))
    out = run(x)
    assert np.isfinite(np.asarray(out)).all()
