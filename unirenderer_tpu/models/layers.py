"""Primitive layers for the dual-stream denoiser and VAE.

NHWC layout throughout (TPU-native conv layout; the reference is NCHW torch).
Parameters live in float32; compute dtype is configurable (bf16 on TPU).

Geometry mirrors the Stable-Diffusion-v1.x blocks used by the reference
(models/unet_2d_blocks.py, vendored diffusers), re-implemented from scratch.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0) -> jax.Array:
    """Sinusoidal timestep embedding, SD convention (cos first).

    Matches diffusers `Timesteps(num_channels=dim, flip_sin_to_cos=True,
    downscale_freq_shift=0)` used by the reference UNet/encoder/decoder
    (models/controlnet.py time_proj).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedMLP(nn.Module):
    """linear -> silu -> linear, 320 -> 1280 in SD geometry."""
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jax.Array) -> jax.Array:
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        h = nn.silu(h)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(h)



class FusedGroupNorm(nn.Module):
    """GroupNorm with optional fused SiLU — single-HBM-pass Pallas kernel
    on TPU (ops/groupnorm.py), jnp reference elsewhere.  Param names match
    nn.GroupNorm (scale/bias) so weight-port path maps are unchanged."""
    num_groups: int
    eps: float = 1e-5
    silu: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from unirenderer_tpu.ops.groupnorm import fused_groupnorm_silu
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return fused_groupnorm_silu(x, scale, bias, self.num_groups,
                                    self.eps, self.silu)

class ResnetBlock(nn.Module):
    """SD ResnetBlock2D: GN->silu->conv3x3 [+temb] ->GN->silu->conv3x3 + skip."""
    out_channels: int
    num_groups: int = 32
    eps: float = 1e-5
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        h = FusedGroupNorm(self.num_groups, self.eps, silu=True,
                           name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :].astype(h.dtype)
        h = FusedGroupNorm(self.num_groups, self.eps, silu=True,
                           name="norm2")(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class Downsample(nn.Module):
    """conv3x3 stride 2, SAME-style pad=1 (SD UNet downsample)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """nearest x2 + conv3x3 (SD UNet upsample)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


# above this many score elements per head-batch, slice the query axis so
# the materialised (S_q_chunk, S_k) f32 score block stays ~1GB — the TPU
# analogue of the reference's attention slicing (controlnet.py:1588-1651)
_SLICE_SCORE_ELEMS = 2 ** 28


def dmajor_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Attention with the head_dim in the SUBLANE position of the matmuls.

    SD head dims (40/80/160) are far from the 128-lane MXU tile; the
    standard (B,S,H,D) layout pads the score matmul's contraction 40->128
    (3.2x wasted MXU work).  Transposing to (B,H,D,S) puts D in sublanes
    (8/16-granular: 40->48, 20% pad) and S in lanes (4096 tiles exactly).
    Measured on v5e (B4,H8,S4096,D40, chained-in-scan): 6.0ms vs 41.9ms
    for jax.nn.dot_product_attention and 14ms for a padded flash kernel.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    qt = q.transpose(0, 2, 3, 1)          # (B,H,D,S)
    kt = k.transpose(0, 2, 3, 1)
    vt = v.transpose(0, 2, 3, 1)

    def attend(q_chunk):                  # (B,H,D,Sc) -> (B,H,D,Sc)
        s = jnp.einsum("bhds,bhdt->bhst", q_chunk, kt,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(q_chunk.dtype)
        return jnp.einsum("bhdt,bhst->bhds", vt, p)

    n_slices = 1
    while (b * h * (sq // n_slices) * sk > _SLICE_SCORE_ELEMS
           and sq % (n_slices * 2) == 0):
        n_slices *= 2
    if n_slices > 1:
        qs = qt.reshape(b, h, d, n_slices, sq // n_slices)
        qs = jnp.moveaxis(qs, 3, 0)       # (n,B,H,D,Sc)
        out = jax.lax.map(attend, qs)
        out = jnp.moveaxis(out, 0, 3).reshape(b, h, d, sq)
    else:
        out = attend(qt)
    return out.transpose(0, 3, 1, 2)


def _attention(q: jax.Array, k: jax.Array, v: jax.Array,
               use_flash: bool) -> jax.Array:
    """Scaled dot-product attention over (B, S, H, D) tensors.

    use_flash=True routes self-attention through the Pallas flash kernel
    (ops/flash_attention.py) where it tiles — measured on v5e at B16/H8
    bf16 (tools/bench_attention.py, PERF.md round 2): 11.3ms vs 27.6ms
    d-major at S4096/D40 and 2.2ms vs 3.2ms at S1024/D80.  Shapes the
    kernel can't tile (cross-attention kv=77, the S=256/D=160 level) fall
    back to d-major XLA attention, which wins there.
    """
    if use_flash:
        from unirenderer_tpu.ops.flash_attention import maybe_flash_attention
        out = maybe_flash_attention(q, k, v)
        if out is not None:
            return out
    return dmajor_attention(q, k, v)


class Attention(nn.Module):
    """Multi-head attention; self- or cross- depending on ctx argument.

    SD1.x convention: num_heads fixed (8), inner dim = query dim,
    no bias on q/k/v, bias on output projection.
    """
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, ctx: Optional[jax.Array] = None) -> jax.Array:
        inner = x.shape[-1]
        head_dim = inner // self.num_heads
        src = x if ctx is None else ctx
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(src)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(src)
        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.num_heads, head_dim)
        k = k.reshape(b, sk, self.num_heads, head_dim)
        v = v.reshape(b, sk, self.num_heads, head_dim)
        out = _attention(q, k, v, self.use_flash and ctx is None)
        out = out.reshape(b, sq, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(out)


class FeedForwardGEGLU(nn.Module):
    """GEGLU feed-forward (SD transformer blocks), expansion 4x."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        hg = nn.Dense(dim * 8, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(hg, 2, axis=-1)
        return nn.Dense(dim, dtype=self.dtype, name="out")(h * nn.gelu(gate))


class BasicTransformerBlock(nn.Module):
    """LN->self-attn  LN->cross-attn  LN->GEGLU-FF, each residual.

    LayerNorm eps is 1e-5 (torch default, as in diffusers' SD blocks) so a
    ported SD checkpoint reproduces torch activations exactly
    (tests/test_torch_parity.py)."""
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, ctx: jax.Array) -> jax.Array:
        x = x + Attention(self.num_heads, self.dtype, self.use_flash,
                          name="attn1")(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                                     name="norm1")(x))
        x = x + Attention(self.num_heads, self.dtype, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), ctx)
        x = x + FeedForwardGEGLU(self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x))
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> 1x1 conv in -> N blocks -> 1x1 conv out + res."""
    num_heads: int
    num_layers: int = 1
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, ctx: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        res = x
        x = FusedGroupNorm(self.num_groups, 1e-6, name="norm")(x)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        for i in range(self.num_layers):
            x = BasicTransformerBlock(self.num_heads, self.dtype,
                                      self.use_flash,
                                      name=f"block_{i}")(x, ctx)
        x = x.reshape(b, h, w, c)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + res


class SelfAttention2D(nn.Module):
    """Single-head spatial self-attention used in the VAE mid block."""
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(self.num_groups, epsilon=1e-6, name="norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        out = jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return res + out.reshape(b, h, w, c)


class ZeroConv(nn.Module):
    """1x1 conv initialised to zero — the ControlNet residual gate
    (reference models/controlnet.py:1360-1415 `zero_module`)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, name="conv")(x)
