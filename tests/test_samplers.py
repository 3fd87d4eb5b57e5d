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


# ---------------------------------------------------------------------------
# Golden-vector UniPC: independent numpy implementation of the published
# UniPC bh2 predictor-corrector (arXiv 2302.04867; the algorithm of the
# diffusers UniPCMultistepScheduler instances the reference samples with,
# eval/test_real.py:485-493), written from the paper's update equations with
# generic R/b linear solves — NOT derived from our closed-form jax code.
# ---------------------------------------------------------------------------


class _NumpyUniPC:
    """solver_order=2, solver_type='bh2', predict_x0=True,
    lower_order_final=True."""

    def __init__(self, acp, timesteps):
        self.acp = np.asarray(acp, np.float64)
        self.timesteps = list(int(t) for t in timesteps)
        self.model_outputs = []       # x0 predictions, newest last
        self.timestep_list = []
        self.last_sample = None
        self.this_order = None
        self.lower_order_nums = 0
        self.step_index = 0

    def _al(self, t):
        a = np.sqrt(self.acp[max(t, 0)]) if t >= 0 else 1.0
        s = np.sqrt(1.0 - self.acp[max(t, 0)]) if t >= 0 else 0.0
        lam = np.log(a) - np.log(max(s, 1e-10))
        return a, s, lam

    def _build_Rb(self, h, rks):
        hh = -h
        h_phi_1 = np.expm1(hh)
        B_h = h_phi_1                       # bh2
        h_phi_k = h_phi_1 / hh - 1.0
        R, b = [], []
        fact = 1.0
        for i in range(1, len(rks) + 1):
            R.append([rk ** (i - 1) for rk in rks])
            b.append(h_phi_k * fact / B_h)
            fact *= (i + 1)
            h_phi_k = h_phi_k / hh - 1.0 / fact
        return np.asarray(R), np.asarray(b), h_phi_1, B_h

    def _uni_p(self, sample, t_next, order):
        m0 = self.model_outputs[-1]
        s0 = self.timestep_list[-1]
        a_t, sig_t, lam_t = self._al(t_next)
        _, sig_s0, lam_s0 = self._al(s0)
        h = lam_t - lam_s0
        rks, D1s = [], []
        for i in range(1, order):
            si = self.timestep_list[-(i + 1)]
            mi = self.model_outputs[-(i + 1)]
            _, _, lam_si = self._al(si)
            rk = (lam_si - lam_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        R, b, h_phi_1, B_h = self._build_Rb(h, rks)
        if len(D1s) > 0:
            if order == 2:
                rhos_p = np.asarray([0.5])
            else:
                rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])
            pred_res = sum(r * d for r, d in zip(rhos_p, D1s))
        else:
            pred_res = 0.0
        x_t = sig_t / sig_s0 * sample - a_t * h_phi_1 * m0
        return x_t - a_t * B_h * pred_res

    def _uni_c(self, this_model_output, this_sample, t, order):
        m0 = self.model_outputs[-1]
        s0 = self.timestep_list[-1]
        a_t, sig_t, lam_t = self._al(t)
        _, sig_s0, lam_s0 = self._al(s0)
        h = lam_t - lam_s0
        rks, D1s = [], []
        for i in range(1, order):
            si = self.timestep_list[-(i + 1)]
            mi = self.model_outputs[-(i + 1)]
            _, _, lam_si = self._al(si)
            rk = (lam_si - lam_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        R, b, h_phi_1, B_h = self._build_Rb(h, rks)
        if order == 1:
            rhos_c = np.asarray([0.5])
        else:
            rhos_c = np.linalg.solve(R, b)
        corr_res = sum(r * d for r, d in zip(rhos_c[:-1], D1s)) \
            if D1s else 0.0
        D1_t = this_model_output - m0
        x_t = sig_t / sig_s0 * self.last_sample - a_t * h_phi_1 * m0
        return x_t - a_t * B_h * (corr_res + rhos_c[-1] * D1_t)

    def step(self, model_output, t, sample):
        """diffusers UniPCMultistepScheduler.step structure."""
        model_output = np.asarray(model_output, np.float64)
        if self.step_index > 0 and self.last_sample is not None:
            sample = self._uni_c(model_output, sample, t, self.this_order)
        self.model_outputs.append(model_output)
        self.timestep_list.append(t)
        if len(self.model_outputs) > 2:
            self.model_outputs.pop(0)
            self.timestep_list.pop(0)
        n = len(self.timesteps)
        this_order = min(2, n - self.step_index)     # lower_order_final
        self.this_order = min(this_order, self.lower_order_nums + 1)
        self.last_sample = sample
        t_next = self.timesteps[self.step_index + 1] \
            if self.step_index + 1 < n else 0
        prev = self._uni_p(sample, t_next, self.this_order)
        if self.lower_order_nums < 2:
            self.lower_order_nums += 1
        self.step_index += 1
        return prev


def _run_numpy_unipc(acp, ts, model, x):
    sched = _NumpyUniPC(acp, ts)
    x = np.asarray(x, np.float64)
    for t in sched.timesteps:
        x = sched.step(model(x, t), int(t), x)
    return x


def test_unipc_matches_published_algorithm_golden():
    """Full 8-step trajectory of our scan-based unipc_step must match the
    independent numpy implementation of the published bh2 algorithm to
    float32 precision, for an x-dependent model (exercises predictor AND
    corrector history paths)."""
    sch = DiffusionSchedule.create(DiffusionConfig())
    acp = np.asarray(sch.alphas_cumprod)
    ts = inference_timesteps(1000, 8)

    def model_np(x, t):
        return 0.3 + 0.2 * np.tanh(x) * (1.0 + t / 1000.0)

    def model_jx(x, t):
        return 0.3 + 0.2 * jnp.tanh(x) * (1.0 + t / 1000.0)

    x0 = np.asarray(jax.random.normal(jax.random.key(7), (2, 4, 4, 3)))
    want = _run_numpy_unipc(acp, np.asarray(ts), model_np, x0)
    got = np.asarray(samplers.sample_loop(
        sch, model_jx, jnp.asarray(x0), ts, "unipc"))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_unipc_matches_published_algorithm_20steps():
    """Same cross-check at the production 20-step setting
    (reference eval/test_real.py:547-554)."""
    sch = DiffusionSchedule.create(DiffusionConfig())
    acp = np.asarray(sch.alphas_cumprod)
    ts = inference_timesteps(1000, 20)
    c = np.linspace(-0.5, 0.5, 4 * 4 * 3).reshape(4, 4, 3)

    def model_np(x, t):
        return c + 0.15 * x

    def model_jx(x, t):
        return jnp.asarray(c) + 0.15 * x

    x0 = np.asarray(jax.random.normal(jax.random.key(9), (1, 4, 4, 3)))
    want = _run_numpy_unipc(acp, np.asarray(ts), model_np, x0)
    got = np.asarray(samplers.sample_loop(
        sch, model_jx, jnp.asarray(x0), ts, "unipc"))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_unipc_second_order_beats_ddim_on_ode():
    """ODE-tracking accuracy: ground truth = 2000-step dense DDIM of the
    probability-flow ODE; UniPC's error must be strictly below DDIM's at
    every coarse step count (the higher-order terms help; the shared
    order-1 warmup step bounds the margin on this toy model)."""
    sch = DiffusionSchedule.create(DiffusionConfig())

    def model(x, t):
        # time-varying x0 prediction -> DDIM is NOT exact
        tt = t / 1000.0
        return 0.4 * jnp.sin(3.0 * tt) + 0.1 * x

    x = jax.random.normal(jax.random.key(11), (1, 4, 4, 3))
    dense = np.asarray(samplers.sample_loop(
        sch, model, x, inference_timesteps(1000, 2000), "ddim"))
    for n in (10, 20, 50):
        ts = inference_timesteps(1000, n)
        u = np.asarray(samplers.sample_loop(sch, model, x, ts, "unipc"))
        d = np.asarray(samplers.sample_loop(sch, model, x, ts, "ddim"))
        err_u = np.abs(u - dense).mean()
        err_d = np.abs(d - dense).mean()
        assert err_u < err_d, (n, err_u, err_d)


def test_unipc_step0_garbage_history_cannot_leak():
    """Round-5 TPU regression (PERF.md "UniPC scan step-0"): the fused
    sampling scan on the TPU applied the step-0 corrector despite the
    `where(step > 0, ...)` mask, amplifying the iterate by the
    uninitialized-history transition (~-17x) and sinking forward-render
    PSNR to ~random.  unipc_step now sanitizes the history at the scan
    boundary so BOTH select branches are identical at step 0 and no
    inf/NaN is ever computed.  This test poisons the init history with
    NaN: the step-0 output must be finite and bit-equal to the clean run
    — i.e. the history cannot influence step 0 through ANY code path."""
    sch = DiffusionSchedule.create(DiffusionConfig())
    shape = (2, 4, 4, 4)
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    x0p = 0.3 * jax.random.normal(jax.random.key(1), shape, jnp.float32)

    clean = samplers.UniPCState.init(shape, jnp.float32)
    bad = jnp.full(shape, jnp.nan, jnp.float32)
    poisoned = samplers.UniPCState(
        m0=bad, m1=bad, t0=jnp.int32(0), t1=jnp.int32(0),
        last_sample=bad, step=jnp.int32(0))

    st_c, x_c = samplers.unipc_step(sch, clean, x, x0p, 999, 949, False)
    st_p, x_p = samplers.unipc_step(sch, poisoned, x, x0p, 999, 949, False)
    assert bool(jnp.isfinite(x_c).all())
    np.testing.assert_array_equal(np.asarray(x_c), np.asarray(x_p))
    # the carried history itself must also be clean after step 0
    for leaf_c, leaf_p in zip(jax.tree.leaves(st_c), jax.tree.leaves(st_p)):
        np.testing.assert_array_equal(np.asarray(leaf_c), np.asarray(leaf_p))


def test_unipc_corrector_identity_at_step0_under_forced_apply():
    """The step-0 corrector must be the exact identity even when applied
    unconditionally (the TPU select bug applied it): sanitized history
    makes x_corr == x with h == 0 and every division guarded."""
    sch = DiffusionSchedule.create(DiffusionConfig())
    shape = (1, 4, 4, 4)
    x = jax.random.normal(jax.random.key(2), shape, jnp.float32)
    x0p = 0.5 * jax.random.normal(jax.random.key(3), shape, jnp.float32)
    # corrector with history == (x, x0p, t): transition t -> t, d1_t == 0
    out = samplers._uni_bh2_update(
        sch, x, x0p, jnp.int32(999), jnp.int32(999), x0p, jnp.int32(999),
        jnp.asarray(False), corrector_mt=x0p)
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=0, atol=0)
