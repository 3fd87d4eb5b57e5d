"""Pallas TPU flash attention (forward) for the UNet self-attention.

Replaces the reference's xformers memory-efficient attention
(train/train.py:1057-1070) / attention slicing (controlnet.py:1588-1651)
with the TPU-native tiling: online-softmax over K/V blocks, the (S,S)
score matrix never touches HBM.  Sequences here are the 2D latent maps —
4096 tokens at the 64x64 level (SURVEY aux 'long-context': no ring/seq
parallelism needed).

Forward runs as a Pallas kernel; backward (training) recomputes standard
attention under jax.vjp — correct, and cheap relative to the conv trunk at
these sequence lengths.  Head dims (40/80/160 in SD) are zero-padded to the
128-lane boundary outside the kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 128      # query block
BK = 128      # key block


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                      seq_k: int):
    q = q_ref[0].astype(jnp.float32) * scale          # (BQ, D)
    bq, d = q.shape
    m = jnp.full((bq, 1), -1e30, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * BK, BK), :].astype(jnp.float32)   # (BK,D)
        v = v_ref[0, pl.ds(i * BK, BK), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (BQ,BK)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32)
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, seq_k // BK, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def _flash_fwd(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """q,k,v (BH, S, D) -> (BH, S, D)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    d_pad = max(128, ((d + 127) // 128) * 128)
    sq_pad = ((sq + BQ - 1) // BQ) * BQ
    sk_pad = ((sk + BK - 1) // BK) * BK
    q = _pad_to(_pad_to(q, d_pad, 2), sq_pad, 1)
    k = _pad_to(_pad_to(k, d_pad, 2), sk_pad, 1)
    v = _pad_to(_pad_to(v, d_pad, 2), sk_pad, 1)
    # NOTE: padded K rows contribute exp(0 - m)=... they produce scores of
    # 0 (q.k = 0) which are wrong; mask by padding K with -inf scores via a
    # large negative bias on padded rows: implemented by zero V and
    # correcting l with extra mass. Simpler: require sk % BK == 0 (caller
    # gates); assert here.
    assert sk == sk_pad, "flash kernel requires seq_k % 128 == 0"

    grid = (bh, sq_pad // BQ)
    out = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, scale=scale, seq_k=sk_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, d_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, d_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d_pad), q.dtype),
    )(q, k, v)
    return out[:, :sq, :d]


def _reference_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / math.sqrt(d)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


@jax.custom_vjp
def _flash(q, k, v):
    return _flash_fwd(q, k, v)


def _flash_vjp_fwd(q, k, v):
    return _flash_fwd(q, k, v), (q, k, v)


def _flash_vjp_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_reference_attention, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """(B, S, H, D) attention via the Pallas kernel.  Caller guarantees
    S % 128 == 0 (ops/flash_attention.py gates)."""
    b, s, h, d = q.shape
    sk = k.shape[1]
    to_bh = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, -1, d)
    out = _flash(to_bh(q), to_bh(k), to_bh(v))
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
