"""SD AutoencoderKL (VAE) in flax, NHWC.

Replaces the reference's diffusers `AutoencoderKL` (L0 foundation; used for
all 8 modality encodes per train step, train/train.py:1266-1304).  Geometry
matches SD-v1.x so ported torch weights drop in (see models/surgery.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from unirenderer_tpu.core.config import VAEConfig
from unirenderer_tpu.models.layers import ResnetBlock, SelfAttention2D


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                name=f"down_{i}_res_{j}")(x, None)
            if i != len(cfg.block_out_channels) - 1:
                # SD VAE downsample: asymmetric (0,1) pad + stride-2 conv
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_downsample")(x)
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_res_0")(x, None)
        x = SelfAttention2D(cfg.norm_num_groups, self.dtype,
                            name="mid_attn")(x)
        x = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_res_1")(x, None)
        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        # moments: mean + logvar
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                    dtype=self.dtype, name="conv_out")(x)
        # diffusers applies an extra 1x1 "quant_conv"
        x = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype,
                    name="quant_conv")(x)
        return x


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.cfg
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype,
                    name="post_quant_conv")(z)
        ch = cfg.block_out_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        x = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_res_0")(x, None)
        x = SelfAttention2D(cfg.norm_num_groups, self.dtype,
                            name="mid_attn")(x)
        x = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_res_1")(x, None)
        rev = tuple(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                name=f"up_{i}_res_{j}")(x, None)
            if i != len(rev) - 1:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode -> image.  Latents are scaled by
    cfg.scaling_factor at the call sites, matching the reference
    (`latents * vae.config.scaling_factor`, train/train.py:1267-1268)."""
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype, name="encoder")
        self.decoder = Decoder(self.cfg, self.dtype, name="decoder")

    def encode(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)

    def __call__(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype)
        return self.decode(z)


def sample_latent(mean: jax.Array, logvar: jax.Array, rng: jax.Array,
                  scaling: float) -> jax.Array:
    """DiagonalGaussian sample * scaling_factor."""
    z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape,
                                                         mean.dtype)
    return z * scaling


def init_vae(cfg: VAEConfig, rng: jax.Array, dtype=jnp.float32):
    model = AutoencoderKL(cfg, dtype)
    x = jnp.zeros((1, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    params = model.init(rng, x, jax.random.key(0))
    return model, params
