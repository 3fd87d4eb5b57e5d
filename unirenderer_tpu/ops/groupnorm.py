"""Fused GroupNorm(+SiLU) Pallas kernel — PERF.md round-2 agenda item 2.

XLA lowers GroupNorm as a reduce pass plus an apply pass (two HBM round
trips of the activation); on SD UNet shapes every per-batch slice fits
VMEM ((4096, 320) f32 = 5.2MB at the largest level), so one kernel
invocation per batch element computes the group statistics AND applies
normalize+affine+SiLU in a single read/write.

Used by models/layers.py ResnetBlock (GN->SiLU->conv, reference
unet_2d_blocks.py ResnetBlock2D) and the transformer pre-norms.  Forward
only: the custom VJP recomputes through the jnp reference for the
backward (the model remats blocks anyway); serving gets the fused path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def groupnorm_silu_reference(x: jax.Array, scale: jax.Array,
                             bias: jax.Array, groups: int,
                             eps: float, silu: bool) -> jax.Array:
    """Pure-jnp reference (flax nn.GroupNorm semantics, NHWC)."""
    b = x.shape[0]
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape) * scale + bias
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _kernel(x_ref, s_ref, b_ref, o_ref, *, groups: int, eps: float,
            silu: bool, n: int):
    x = x_ref[0].astype(jnp.float32)            # (HW, C)
    c = x.shape[-1]
    cg = c // groups
    s1 = jnp.sum(x, axis=0, keepdims=True)      # (1, C)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    # channel->group aggregation as a one-hot matmul: Mosaic has no
    # (1,C)->(G,C/G) vector shape-cast for narrow C (e.g. the small/tiny
    # VAE configs), and the MXU eats these trivially at any width.
    ch_g = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (ch_g == gr).astype(jnp.float32)        # (C, G) one-hot
    hi = jax.lax.Precision.HIGHEST              # stats must stay f32:
    g1 = jnp.dot(s1, m, precision=hi)           # (1, G); default MXU
    g2 = jnp.dot(s2, m, precision=hi)           # precision is bf16-ish
    mean = g1 / n
    var = g2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)              # (1, G)
    mean_c = jnp.dot(mean, m.T, precision=hi)   # (1, C) per-channel stats
    inv_c = jnp.dot(inv, m.T, precision=hi)
    y = (x - mean_c) * inv_c * s_ref[:] + b_ref[:]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _fused_fwd(x, scale, bias, groups, eps, silu, interpret=False):
    b = x.shape[0]
    c = x.shape[-1]
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    x3 = x.reshape(b, hw, c)
    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, eps=eps, silu=silu,
                          n=hw * (c // groups)),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        # the f32 working set (x, x^2, y) legitimately exceeds the 16MB
        # default scoped-vmem budget at the biggest SD shapes.  Size the
        # request from the actual block working set (input + ~4 f32
        # temporaries + output, 2x compiler slack) instead of a fixed
        # number, so small shapes keep the default budget and older
        # TPU generations with less VMEM aren't asked for more than the
        # block needs (ADVICE round-2 low #4)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(
                16 * 1024 * 1024,
                min(112 * 1024 * 1024,
                    2 * hw * c * (x.dtype.itemsize + 5 * 4)))),
        interpret=interpret,
    )(x3, scale.reshape(1, c).astype(jnp.float32),
      bias.reshape(1, c).astype(jnp.float32))
    return out.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_groupnorm_silu(x, scale, bias, groups: int, eps: float,
                         silu: bool):
    """Fused GN(+SiLU) on TPU; falls back to the jnp reference off-TPU.

    x (B, ..., C) with C % groups == 0; scale/bias (C,)."""
    return _dispatch(x, scale, bias, groups, eps, silu)


def _dispatch(x, scale, bias, groups, eps, silu):
    c = x.shape[-1]
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    fits = hw * c * 4 <= 8 * 1024 * 1024        # VMEM block budget
    if jax.default_backend() == "tpu" and c % groups == 0 and fits:
        return _fused_fwd(x, scale, bias, groups, eps, silu)
    return groupnorm_silu_reference(x, scale, bias, groups, eps, silu)


def _vjp_fwd(x, scale, bias, groups, eps, silu):
    return _dispatch(x, scale, bias, groups, eps, silu), (x, scale, bias)


def _vjp_bwd(groups, eps, silu, res, g):
    x, scale, bias = res
    _, pullback = jax.vjp(
        lambda xx, ss, bb: groupnorm_silu_reference(
            xx, ss, bb, groups, eps, silu), x, scale, bias)
    return pullback(g)


fused_groupnorm_silu.defvjp(_vjp_fwd, _vjp_bwd)
