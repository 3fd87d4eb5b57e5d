"""Samplers as pure step functions, built to live inside one `lax.scan`.

The reference attaches eight Python `UniPCMultistepScheduler` objects to the
pipeline, one per modality (eval/test_real.py:485-493), and steps them in a
Python loop (pipeline.py:2629-2730).  Here scheduler state is a pytree of
arrays, so a whole 20-step sampling run compiles to ONE XLA program and the
six attribute modality groups are stepped with `jax.vmap` over a stacked
state instead of six Python objects.

UniPC follows the predictor-corrector algorithm of the UniPC paper
(arXiv 2302.04867) in its x0-("data"-)prediction form with the B2(h) variant
(diffusers solver_type "bh2", solver_order 2, lower_order_final) so that a
weight-ported model reproduces reference samples.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from unirenderer_tpu.diffusion.schedule import DiffusionSchedule


# ---------------------------------------------------------------------------
# DDIM (eta=0), x0-prediction
# ---------------------------------------------------------------------------


def ddim_step(schedule: DiffusionSchedule, x: jax.Array, x0_pred: jax.Array,
              t: jax.Array, t_next: jax.Array) -> jax.Array:
    """Deterministic DDIM update from timestep t to t_next (t_next < t).

    With x0 prediction: eps = (x - a_t x0)/s_t;  x' = a_n x0 + s_n eps.
    """
    a_t, s_t = schedule.alpha_sigma(t)
    a_n, s_n = schedule.alpha_sigma(t_next)
    a_n = jnp.where(t_next >= 0, a_n, 1.0)
    s_n = jnp.where(t_next >= 0, s_n, 0.0)
    eps = (x - a_t * x0_pred) / s_t
    return a_n * x0_pred + s_n * eps


# ---------------------------------------------------------------------------
# UniPC (order<=2, bh2, data prediction)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class UniPCState:
    """Multistep history for one latent group.

    m0/m1: the two most recent model (x0) outputs; t0/t1 their timesteps;
    last_sample: the pre-predictor sample of the previous step (corrector
    input); step: scan index.
    """
    m0: jax.Array
    m1: jax.Array
    t0: jax.Array          # scalar int32
    t1: jax.Array
    last_sample: jax.Array
    step: jax.Array        # scalar int32

    @classmethod
    def init(cls, shape, dtype=jnp.float32) -> "UniPCState":
        z = jnp.zeros(shape, dtype)
        return cls(m0=z, m1=z, t0=jnp.int32(0), t1=jnp.int32(0),
                   last_sample=z, step=jnp.int32(0))


def _alpha_sigma_lambda(schedule: DiffusionSchedule, t: jax.Array):
    # t may be -0 (final target); clamp to valid range. Final target t=0.
    a, s = schedule.alpha_sigma(jnp.maximum(t, 0))
    lam = jnp.log(a) - jnp.log(jnp.maximum(s, 1e-10))
    return a, s, lam


def _uni_bh2_update(schedule: DiffusionSchedule, x: jax.Array,
                    m0: jax.Array, s0: jax.Array, t: jax.Array,
                    m1: jax.Array, s1: jax.Array,
                    use_second: jax.Array,
                    corrector_mt: jax.Array | None = None) -> jax.Array:
    """Shared core of the UniP (predictor) and UniC (corrector) bh2 update.

    Transition from timestep s0 to t given newest model output m0 at s0,
    optional second history point (m1 at s1, enabled by `use_second`), and,
    for the corrector, the model output `corrector_mt` evaluated at t.

    Data-prediction form:
        x_t = sigma_t/sigma_s0 * x - alpha_t * phi1 * m0 - alpha_t*B_h * res
    where hh = -h, phi1 = expm1(hh), B_h = expm1(hh) (bh2), and res combines
    the order-2 difference terms with coefficient rho.
    """
    _, sig_s0, lam_s0 = _alpha_sigma_lambda(schedule, s0)
    alp_t, sig_t, lam_t = _alpha_sigma_lambda(schedule, t)
    _, _, lam_s1 = _alpha_sigma_lambda(schedule, s1)

    h = lam_t - lam_s0
    hh = -h
    phi1 = jnp.expm1(hh)
    b_h = phi1                                   # bh2: B(h) = expm1(hh)
    # h == 0 happens by CONSTRUCTION at step 0, where unipc_step feeds the
    # corrector a sanitized s0 == t so that the update is exactly the
    # identity (see unipc_step).  Every division below is guarded so that
    # no inf/NaN is ever produced on that path — 0 * inf would poison the
    # final -alp_t * b_h * res term even though b_h == 0.
    safe_hh = jnp.where(hh == 0, 1.0, hh)
    safe_bh = jnp.where(b_h == 0, 1.0, b_h)

    # second-order difference D1 = (m1 - m0)/r1,  r1 = (lam_s1-lam_s0)/h
    r1 = (lam_s1 - lam_s0) / jnp.where(h == 0, 1.0, h)
    safe_r1 = jnp.where(jnp.abs(r1) < 1e-8, 1.0, r1)
    d1 = (m1 - m0) / safe_r1
    d1 = jnp.where(use_second, d1, jnp.zeros_like(d1))

    x_t_ = sig_t / sig_s0 * x - alp_t * phi1 * m0

    if corrector_mt is None:
        # Predictor: order-2 rho_p = 0.5 (UniPC paper, k=2 closed form)
        res = 0.5 * d1
        return x_t_ - alp_t * b_h * res
    # Corrector: solve the 2x2 system for rhos_c = R^{-1} b with
    #   R = [[1, 1], [r1, 1]],  b = [phi1/hh - 1, (phi1/hh - 1)/hh - 0.5]
    # (matches diffusers' R/b construction for bh2, order 2).
    h_phi_k1 = phi1 / safe_hh - 1.0              # b[0]
    h_phi_k2 = h_phi_k1 / safe_hh - 0.5          # b[1]
    b1 = h_phi_k1 / safe_bh
    b2 = h_phi_k2 * 2.0 / safe_bh
    # order-2 solve of [[1,1],[r1,1]] . [rho_hist, rho_new] = [b1, b2]
    det = jnp.where(jnp.abs(1.0 - safe_r1) < 1e-8, 1.0, 1.0 - safe_r1)
    rho_hist2 = (b1 - b2) / det            # multiplies D1 (history diff)
    rho_new2 = (b2 - safe_r1 * b1) / det   # multiplies D1_t (new diff)
    # order-1 corrector: rho = [0.5] on D1_t only
    rho_hist = jnp.where(use_second, rho_hist2, 0.0)
    rho_new = jnp.where(use_second, rho_new2, 0.5)
    d1_t = corrector_mt - m0
    res = rho_hist * d1 + rho_new * d1_t
    return x_t_ - alp_t * b_h * res


def unipc_step(schedule: DiffusionSchedule, state: UniPCState, x: jax.Array,
               x0_pred: jax.Array, t: jax.Array, t_next: jax.Array,
               is_final: jax.Array | bool = False,
               ) -> Tuple[UniPCState, jax.Array]:
    """One UniPC step: corrector on the previous transition, then predictor
    for t -> t_next.  `x0_pred` is the model output at (x, t).

    Order bookkeeping mirrors diffusers: effective predictor order at step i
    is min(2, i+1) with order 1 on the final step (lower_order_final);
    corrector order equals the previous step's predictor order.
    """
    step = state.step

    # ---- sanitize the history so step-0/1 garbage can never leak ----
    # Round-5 finding (PERF.md "UniPC scan step-0"): on the TPU the fused
    # sampling scan applied the step-0 corrector DESPITE the
    # `where(step > 0, ...)` mask — the uninitialized-history corrector
    # (transition lambda(0) -> lambda(999), expm1 ~ 5e2) multiplied the
    # iterate by ~-17x and sank forward-render PSNR from ~24 to ~8, while
    # the identical program on CPU and the eager per-step path were
    # correct.  Rather than depend on which side of a select the compiler
    # materializes, make BOTH sides equal at the boundary: at step 0 the
    # corrector's history is (x, x0_pred, t) so h == 0 and the update is
    # exactly the identity; at step <= 1 m1/t1 fall back to m0/t0 so the
    # order-2 difference D1 is exactly zero wherever it is masked anyway.
    first = step == 0
    last_sample = jnp.where(first, x, state.last_sample)
    m0 = jnp.where(first, x0_pred, state.m0)
    t0 = jnp.where(first, t, state.t0)
    m1 = jnp.where(step <= 1, m0, state.m1)
    t1 = jnp.where(step <= 1, t0, state.t1)

    # ---- corrector (identity at step 0 by construction) ----
    corr_second = step >= 2          # previous predictor used order 2
    x_corr = _uni_bh2_update(
        schedule, last_sample, m0, t0, t,
        m1, t1, corr_second, corrector_mt=x0_pred)
    x = jnp.where(step > 0, x_corr, x)

    # ---- predictor t -> t_next ----
    pred_second = (step >= 1) & jnp.logical_not(is_final)
    x_next = _uni_bh2_update(
        schedule, x, x0_pred, t, t_next, m0, t0,
        pred_second, corrector_mt=None)

    new_state = UniPCState(
        m0=x0_pred, m1=m0, t0=t, t1=t0,
        last_sample=x, step=step + 1)
    return new_state, x_next


# ---------------------------------------------------------------------------
# Generic driver: scan a model over a timestep grid with one latent group
# ---------------------------------------------------------------------------


def sample_loop(schedule: DiffusionSchedule,
                model_fn: Callable[[jax.Array, jax.Array], jax.Array],
                x_init: jax.Array, timesteps: jax.Array,
                method: str = "unipc") -> jax.Array:
    """Denoise x_init over `timesteps` (descending). model_fn(x, t) -> x0."""
    n = timesteps.shape[0]
    ts_next = jnp.concatenate([timesteps[1:], jnp.zeros((1,), jnp.int32)])

    if method == "ddim":
        def body(x, tt):
            t, tn = tt
            x0 = model_fn(x, t)
            return ddim_step(schedule, x, x0, t, tn), None
        x, _ = jax.lax.scan(body, x_init, (timesteps, ts_next))
        return x

    state = UniPCState.init(x_init.shape, x_init.dtype)
    is_final = jnp.arange(n) == n - 1

    def body(carry, tt):
        x, st = carry
        t, tn, fin = tt
        x0 = model_fn(x, t)
        st, x = unipc_step(schedule, st, x, x0, t, tn, fin)
        return (x, st), None

    (x, _), _ = jax.lax.scan(body, (x_init, state),
                             (timesteps, ts_next, is_final))
    return x
