"""UNet down/mid/up blocks with feature taps.

The reference modifies diffusers blocks so that *up* blocks also return their
intermediate hidden states (models/unet_2d_blocks.py:2584-2590, 2697-2703) —
the taps that feed the dual-stream cross-conditioning.  Here every block
returns its taps natively; XLA dead-code-eliminates unused ones.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from unirenderer_tpu.models.layers import (
    Downsample, ResnetBlock, Transformer2D, Upsample,
)


class DownBlock(nn.Module):
    """n resnets (+ optional per-resnet transformer) + optional downsample.

    Returns (hidden, taps) where taps has one entry per resnet plus one for
    the downsample — matching the reference's down_block_res_samples layout
    (models/controlnet.py:1051-1073: 1 + 3 + 3 + 3 + 2 samples for SD1.x).
    """
    out_channels: int
    num_layers: int = 2
    has_attention: bool = False
    num_heads: int = 8
    transformer_layers: int = 1
    num_groups: int = 32
    add_downsample: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array, ctx: jax.Array,
                 deterministic: bool = True
                 ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        taps = ()
        for i in range(self.num_layers):
            x = ResnetBlock(self.out_channels, self.num_groups,
                            dropout=self.dropout, dtype=self.dtype,
                            name=f"resnet_{i}")(x, temb, deterministic)
            if self.has_attention:
                x = Transformer2D(self.num_heads, self.transformer_layers,
                                  self.num_groups, self.dtype, self.use_flash,
                                  name=f"attn_{i}")(x, ctx)
            taps += (x,)
        if self.add_downsample:
            x = Downsample(self.out_channels, self.dtype,
                           name="downsample")(x)
            taps += (x,)
        return x, taps


class MidBlock(nn.Module):
    """resnet -> transformer -> resnet (UNetMidBlock2DCrossAttn)."""
    out_channels: int
    num_heads: int = 8
    transformer_layers: int = 1
    num_groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array, ctx: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        x = ResnetBlock(self.out_channels, self.num_groups,
                        dropout=self.dropout, dtype=self.dtype,
                        name="resnet_0")(x, temb, deterministic)
        x = Transformer2D(self.num_heads, self.transformer_layers,
                          self.num_groups, self.dtype, self.use_flash,
                          name="attn")(x, ctx)
        x = ResnetBlock(self.out_channels, self.num_groups,
                        dropout=self.dropout, dtype=self.dtype,
                        name="resnet_1")(x, temb, deterministic)
        return x


class UpBlock(nn.Module):
    """n+1 resnets, each consuming one skip connection, + optional upsample.

    `skips` are consumed from the END (reference models/controlnet.py:
    `res_samples = down_block_res_samples[-len(resnets):]`).
    Returns (hidden, taps) — the up-block residual tap of the reference
    (models/controlnet.py:1119-1151 up_block_res_samples).
    """
    out_channels: int
    num_layers: int = 3                 # layers_per_block + 1
    has_attention: bool = False
    num_heads: int = 8
    transformer_layers: int = 1
    num_groups: int = 32
    add_upsample: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, skips: Tuple[jax.Array, ...],
                 temb: jax.Array, ctx: jax.Array,
                 deterministic: bool = True
                 ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        assert len(skips) == self.num_layers
        taps = ()
        for i in range(self.num_layers):
            skip = skips[-(i + 1)]      # pop from the end
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock(self.out_channels, self.num_groups,
                            dropout=self.dropout, dtype=self.dtype,
                            name=f"resnet_{i}")(x, temb, deterministic)
            if self.has_attention:
                x = Transformer2D(self.num_heads, self.transformer_layers,
                                  self.num_groups, self.dtype, self.use_flash,
                                  name=f"attn_{i}")(x, ctx)
            taps += (x,)
        if self.add_upsample:
            x = Upsample(self.out_channels, self.dtype, name="upsample")(x)
        return x, taps
