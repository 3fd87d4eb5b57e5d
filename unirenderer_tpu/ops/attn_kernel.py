"""Specialized non-causal flash-attention forward kernel for the SD UNet
self-attention shapes (S=4096/D=40 dominates: 83% of sampling FLOPs).

Why another kernel (PERF.md round-3 roofline): with D=40 the MXU tile
floor is fixed at ~5.6 ms for the B16/H8/S4096 bucket — no head packing
changes it — and the measured winners (xla_dpa 8.39-8.56 ms, library
flash 9.86 ms) sit ~3 ms above that floor on online-softmax VPU work
(≈2.1G exps/call) that does not overlap the matmuls.  This kernel
attacks exactly that gap:

  * software pipelining: grid step j computes the QK^T matmul for KV
    block j while applying the softmax/PV update for block j-1 (score
    buffers rotate in VMEM scratch) — the only cross-iteration
    dependency chain is the VPU update, so Mosaic can overlap block j's
    MXU phase with block j-1's VPU phase;
  * exp2 softmax with the scale folded into Q on the host side
    (q * sm_scale * log2(e), exp2(s - m)) — saves one multiply per
    score element inside the hot loop;
  * optional `running_max=False` mode for bounded-logit inference:
    drops the per-block running-max pass and the accumulator rescale
    (~1/3 of the VPU work).  f32 exp2 is finite up to 2^127, so it is
    exact as long as scaled logits stay below ~38 (|q.k|/sqrt(d) <= 26);
    opt-in for the serving path only, never for training.

Forward-only (the serving/sampling path); training keeps the library
flash kernel's custom VJP via ops/flash_attention.py routing.

Reference parity note: replaces xformers memory-efficient attention
(reference train/train.py:1057-1070) on the inference path; see
PERF.md for the measured A/B against xla_dpa / library flash.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = math.log2(math.e)
_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, s_buf, m_ref, l_ref, acc_ref, *,
            pipelined: bool, running_max: bool):
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    # grid position of the LAST kv block's softmax/PV update
    last = nj - 1

    @pl.when(j == 0)
    def _init():
        if running_max:
            m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if pipelined:
        # step j: matmul for kv block j, softmax/PV update for block j-1
        @pl.when(j < nj - 1)
        def _qk():
            s_buf[j % 2] = lax.dot_general(
                q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        upd_pred, upd_slot = j > 0, (j - 1) % 2
    else:
        def _qk():
            s_buf[0] = lax.dot_general(
                q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        _qk()
        upd_pred, upd_slot = j >= 0, 0

    @pl.when(upd_pred)
    def _update():
        s = s_buf[upd_slot]
        if running_max:
            m_prev = m_ref[:, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            corr = jnp.exp2(m_prev - m_new)
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            l_new = l_ref[:, 0:1] * corr + jnp.sum(p, -1, keepdims=True)
            acc_ref[:] = acc_ref[:] * corr + lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            p = jnp.exp2(s)
            l_new = l_ref[:, 0:1] + jnp.sum(p, -1, keepdims=True)
            acc_ref[:] += lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == last)
    def _fin():
        o_ref[0] = (acc_ref[:] / l_ref[:, 0:1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "pipelined", "running_max",
                     "vmem_limit_mb", "interpret"))
def unet_flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                         block_q: int = 512, block_k: int = 1024,
                         pipelined: bool = True, running_max: bool = True,
                         vmem_limit_mb: int = 0,
                         interpret: bool = False) -> jax.Array:
    """Non-causal attention over (B, S, H, D) tensors (the model layout).

    Requires S % block_q == 0 and S_k % block_k == 0 (the SD levels are
    powers of two; use ops.flash_attention routing for general shapes).
    """
    b, s, h, d = q.shape
    sk = k.shape[1]
    bq, bk = min(block_q, s), min(block_k, sk)
    if s % bq or sk % bk:
        raise ValueError(f"S={s}/{sk} not divisible by blocks {bq}/{bk}")
    nq, nk = s // bq, sk // bk
    nj = nk + 1 if pipelined else nk

    # fold softmax scale + log2(e) into q: the kernel computes exp2(s - m)
    qs = (q * jnp.asarray(1.0 / math.sqrt(d) * _LOG2E, q.dtype))
    qs = qs.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)

    if pipelined:
        k_idx = lambda bh, i, j: (bh, jnp.minimum(j, nk - 1), 0)
        v_idx = lambda bh, i, j: (bh, jnp.maximum(j - 1, 0), 0)
    else:
        k_idx = lambda bh, i, j: (bh, j, 0)
        v_idx = k_idx

    kern = functools.partial(_kernel, pipelined=pipelined,
                             running_max=running_max)
    params = {}
    if vmem_limit_mb:
        params["vmem_limit_bytes"] = vmem_limit_mb * 1024 * 1024
    out = pl.pallas_call(
        kern,
        grid=(b * h, nq, nj),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, bk, d), k_idx),
            pl.BlockSpec((1, bk, d), v_idx),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 if pipelined else 1, bq, bk), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),   # running max (log2)
            pltpu.VMEM((bq, 128), jnp.float32),   # running denominator
            pltpu.VMEM((bq, d), jnp.float32),     # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            **params),
        interpret=interpret,
    )(qs, kt, vt)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
