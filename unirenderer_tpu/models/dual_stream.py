"""The dual-stream denoiser: image UNet + attribute encoder + attribute decoder.

This is the TPU-first re-design of the reference's three-model choreography
(models/controlnet.py: UNet2DConditionModel :49-1166, AttributeEncoderModel
:1170-1778, AttributeDecoderModel :1781-2527, driven by train/train.py:
1324-1354).  Instead of three Python calls shuttling feature lists, one flax
module computes both stream predictions in a single traced forward so XLA can
fuse and schedule the whole graph:

    attr encoder (t_attr):  28-ch attribute latent -> down+mid features
                            -> zero-conv residuals into the UNet        (A->I)
    image UNet   (t_img):   4-ch image latent + residuals -> img_pred,
                            and raw (pre-residual) down/mid taps
    attr decoder (t_attr):  encoder features as skips + zero-conv'd UNet
                            taps as residuals -> 28-ch attr_pred        (I->A)

Key wiring facts preserved from the reference:
  * The encoder IGNORES the noisy image latent entirely — its input is only
    conv_in(attribute latent) (controlnet.py:1716-1720 `sample =
    controlnet_cond`).
  * Encoder emits BOTH zero-conv'd residuals (into the UNet) and raw
    features (into the decoder) (controlnet.py:1750-1778).
  * Decoder skips = encoder raw taps + zero-conv(UNet raw taps); decoder
    mid input = encoder raw mid + zero-conv(UNet raw mid)
    (controlnet.py:2446-2477).
  * Encoder/decoder run on t_attr, the UNet on t_img — two independent
    diffusion time schedules (train/train.py:1258-1264).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from unirenderer_tpu.core.config import UNetConfig
from unirenderer_tpu.models.blocks import DownBlock, MidBlock, UpBlock
from unirenderer_tpu.models.layers import (
    TimestepEmbedMLP, ZeroConv, timestep_embedding,
)

Taps = Tuple[jax.Array, ...]


def _maybe_remat(mod_cls, enabled: bool, det_argnum: int):
    """Wrap a block class in nn.remat (jax.checkpoint) when enabled —
    the TPU analogue of the reference's enable_gradient_checkpointing()
    (train/train.py:1072-1074).  `det_argnum` is the positional index of the
    static `deterministic` flag in __call__ (self counts as 0)."""
    if not enabled:
        return mod_cls
    return nn.remat(mod_cls, static_argnums=(det_argnum,))


class _Trunk(nn.Module):
    """Shared structural helpers bound to one UNetConfig."""
    cfg: UNetConfig
    dtype: jnp.dtype = jnp.bfloat16

    def time_embed(self, t: jax.Array, name: str) -> jax.Array:
        temb = timestep_embedding(t, self.cfg.block_out_channels[0])
        return TimestepEmbedMLP(self.cfg.time_embed_dim, self.dtype,
                                name=name)(temb)


class ImageUNet(_Trunk):
    """SD-geometry UNet over the image latent, with raw feature taps.

    forward -> (img_pred, raw_down_taps, raw_mid, up_taps); residuals from
    the attribute encoder are added ControlNet-style AFTER the raw taps are
    recorded (reference models/controlnet.py:1051-1112).
    """

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,                        # (B,H,W,4)
        t_img: jax.Array,                         # (B,)
        ctx: jax.Array,                           # (B,77,D)
        down_residuals: Optional[Taps] = None,    # 12 zero-conv'd residuals
        mid_residual: Optional[jax.Array] = None,
        deterministic: bool = True,
        cached_raw: Optional[Tuple[Taps, jax.Array]] = None,
    ) -> Tuple[jax.Array, Taps, jax.Array, Taps]:
        """`cached_raw=(raw_down_taps, raw_mid)` skips the whole encoder
        half (conv_in/down/mid) and reuses the given raw features —
        encoder propagation across adjacent denoise steps (Faster
        Diffusion, arXiv 2312.09608): adjacent-step encoder features are
        nearly identical, so decoder-only steps trade a small
        approximation for ~the encoder's FLOPs.  Opt-in via
        SamplerConfig.encoder_reuse."""
        cfg = self.cfg
        temb = self.time_embed(t_img, "time_embedding")
        Down = _maybe_remat(DownBlock, cfg.remat, 4)
        Up = _maybe_remat(UpBlock, cfg.remat, 5)

        if cached_raw is None:
            x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                        dtype=self.dtype,
                        name="conv_in")(sample.astype(self.dtype))
            down_taps: Taps = (x,)
            for i, ch in enumerate(cfg.block_out_channels):
                is_last = i == len(cfg.block_out_channels) - 1
                x, taps = Down(
                    out_channels=ch, num_layers=cfg.layers_per_block,
                    has_attention=cfg.down_block_attn[i],
                    num_heads=cfg.num_heads,
                    transformer_layers=cfg.transformer_layers,
                    num_groups=cfg.norm_num_groups,
                    add_downsample=not is_last,
                    dropout=cfg.dropout, dtype=self.dtype,
                    use_flash=cfg.use_flash_attention,
                    name=f"down_{i}")(x, temb, ctx, deterministic)
                down_taps += taps
            raw_down_taps = down_taps

            x = MidBlock(cfg.block_out_channels[-1], cfg.num_heads,
                         cfg.transformer_layers, cfg.norm_num_groups,
                         cfg.dropout, self.dtype, cfg.use_flash_attention,
                         name="mid")(x, temb, ctx, deterministic)
            raw_mid = x
        else:
            raw_down_taps, raw_mid = cached_raw
            down_taps = raw_down_taps
            x = raw_mid

        if down_residuals is not None:
            down_taps = tuple(
                d + r.astype(d.dtype)
                for d, r in zip(down_taps, down_residuals))
        if mid_residual is not None:
            x = x + mid_residual.astype(x.dtype)

        skips = list(down_taps)
        up_taps: Taps = (x,)
        rev = tuple(reversed(cfg.block_out_channels))
        n_skip = cfg.layers_per_block + 1
        for i, ch in enumerate(rev):
            is_last = i == len(rev) - 1
            blk_skips = tuple(skips[-n_skip:])
            del skips[-n_skip:]
            x, taps = Up(
                out_channels=ch, num_layers=n_skip,
                has_attention=cfg.up_block_attn[i], num_heads=cfg.num_heads,
                transformer_layers=cfg.transformer_layers,
                num_groups=cfg.norm_num_groups, add_upsample=not is_last,
                dropout=cfg.dropout, dtype=self.dtype,
                use_flash=cfg.use_flash_attention,
                name=f"up_{i}")(x, blk_skips, temb, ctx, deterministic)
            up_taps += taps

        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-5,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        return x.astype(jnp.float32), raw_down_taps, raw_mid, up_taps


class AttrEncoder(_Trunk):
    """ControlNet-style copy of the UNet encoder running on the 28-channel
    attribute latent with its own timestep (reference AttributeEncoderModel,
    models/controlnet.py:1170-1778).

    forward -> (ctrl_down (12, zero-conv'd), ctrl_mid, raw_down (12), raw_mid)
    """

    @nn.compact
    def __call__(
        self,
        attr_latent: jax.Array,                   # (B,H,W,28)
        t_attr: jax.Array,                        # (B,)
        ctx: jax.Array,
        conditioning_scale: float = 1.0,
        deterministic: bool = True,
    ) -> Tuple[Taps, jax.Array, Taps, jax.Array]:
        cfg = self.cfg
        temb = self.time_embed(t_attr, "time_embedding")
        Down = _maybe_remat(DownBlock, cfg.remat, 4)

        # conv_in runs on the 28-ch attribute latent; the image latent never
        # enters the encoder (controlnet.py:1716-1720).
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype,
                    name="conv_in")(attr_latent.astype(self.dtype))
        down_taps: Taps = (x,)
        for i, ch in enumerate(cfg.block_out_channels):
            is_last = i == len(cfg.block_out_channels) - 1
            x, taps = Down(
                out_channels=ch, num_layers=cfg.layers_per_block,
                has_attention=cfg.down_block_attn[i], num_heads=cfg.num_heads,
                transformer_layers=cfg.transformer_layers,
                num_groups=cfg.norm_num_groups, add_downsample=not is_last,
                dropout=cfg.dropout, dtype=self.dtype,
                use_flash=cfg.use_flash_attention,
                name=f"down_{i}")(x, temb, ctx, deterministic)
            down_taps += taps

        x = MidBlock(cfg.block_out_channels[-1], cfg.num_heads,
                     cfg.transformer_layers, cfg.norm_num_groups,
                     cfg.dropout, self.dtype, cfg.use_flash_attention,
                     name="mid")(x, temb, ctx, deterministic)
        raw_mid = x

        ctrl_down: Taps = tuple(
            ZeroConv(t.shape[-1], self.dtype,
                     name=f"zero_down_{i}")(t) * conditioning_scale
            for i, t in enumerate(down_taps))
        ctrl_mid = ZeroConv(x.shape[-1], self.dtype,
                            name="zero_mid")(x) * conditioning_scale
        return ctrl_down, ctrl_mid, down_taps, raw_mid


class AttrDecoder(_Trunk):
    """UNet-decoder copy producing the 28-channel attribute prediction
    (reference AttributeDecoderModel, models/controlnet.py:1781-2527).

    Skips come from the attribute encoder's raw taps; the image UNet's raw
    taps enter through zero convs (`control_down_blocks`/`control_mid_block`,
    controlnet.py:2446-2477) — the inverse cross-conditioning direction.
    """

    @nn.compact
    def __call__(
        self,
        enc_mid: jax.Array,                       # encoder raw mid
        enc_down_taps: Taps,                      # encoder raw down taps (12)
        t_attr: jax.Array,
        ctx: jax.Array,
        unet_down_taps: Taps,                     # UNet raw down taps (12)
        unet_mid: jax.Array,                      # UNet raw mid
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        temb = self.time_embed(t_attr, "time_embedding")
        Up = _maybe_remat(UpBlock, cfg.remat, 5)

        skips = [
            e + ZeroConv(u.shape[-1], self.dtype,
                         name=f"control_down_{i}")(u).astype(e.dtype)
            for i, (e, u) in enumerate(zip(enc_down_taps, unet_down_taps))
        ]
        x = enc_mid + ZeroConv(unet_mid.shape[-1], self.dtype,
                               name="control_mid")(unet_mid).astype(enc_mid.dtype)

        rev = tuple(reversed(cfg.block_out_channels))
        n_skip = cfg.layers_per_block + 1
        for i, ch in enumerate(rev):
            is_last = i == len(rev) - 1
            blk_skips = tuple(skips[-n_skip:])
            del skips[-n_skip:]
            x, _ = Up(
                out_channels=ch, num_layers=n_skip,
                has_attention=cfg.up_block_attn[i], num_heads=cfg.num_heads,
                transformer_layers=cfg.transformer_layers,
                num_groups=cfg.norm_num_groups, add_upsample=not is_last,
                dropout=cfg.dropout, dtype=self.dtype,
                use_flash=cfg.use_flash_attention,
                name=f"up_{i}")(x, blk_skips, temb, ctx, deterministic)

        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-5,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.attr_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        return x.astype(jnp.float32)


class DualStreamModel(nn.Module):
    """One module = the full dual-stream system.

    `run_decoder` is a static flag: forward-rendering mode skips the
    attribute decoder entirely (reference pipeline.py:1586-1653 never calls
    controldec), and XLA prunes the encoder's raw-tap outputs it feeds.
    """
    cfg: UNetConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.unet = ImageUNet(self.cfg, self.dtype, name="unet")
        self.encoder = AttrEncoder(self.cfg, self.dtype, name="controlnet")
        self.decoder = AttrDecoder(self.cfg, self.dtype, name="controldec")

    def __call__(
        self,
        img_latent: jax.Array,                    # (B,H,W,4) noisy image lat
        attr_latent: jax.Array,                   # (B,H,W,28) attr latent
        t_img: jax.Array,                         # (B,)
        t_attr: jax.Array,                        # (B,)
        ctx: jax.Array,                           # (B,77,D) text context
        run_decoder: bool = True,
        conditioning_scale: float = 1.0,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        ctx = ctx.astype(self.dtype)
        ctrl_down, ctrl_mid, raw_enc_down, raw_enc_mid = self.encoder(
            attr_latent, t_attr, ctx, conditioning_scale, deterministic)
        img_pred, raw_u_down, raw_u_mid, _ = self.unet(
            img_latent, t_img, ctx, ctrl_down, ctrl_mid, deterministic)
        if not run_decoder:
            return img_pred, None
        attr_pred = self.decoder(
            raw_enc_mid, raw_enc_down, t_attr, ctx, raw_u_down, raw_u_mid,
            deterministic)
        return img_pred, attr_pred

    # Convenience for the cycle-consistency pass (UNet path only but WITH
    # encoder conditioning — reference train/train.py:1395-1414).
    def image_stream(self, img_latent, attr_latent, t_img, t_attr, ctx,
                     deterministic: bool = True) -> jax.Array:
        img_pred, _ = self(img_latent, attr_latent, t_img, t_attr, ctx,
                           run_decoder=False, deterministic=deterministic)
        return img_pred

    # --- split entry points for loop-invariant hoisting --------------
    # In forward-rendering sampling the encoder's inputs (clean attribute
    # latents, t_attr = 0) never change across denoise steps; the reference
    # re-runs it all 20 steps (pipeline.py:1611-1618).  These methods let
    # the sampler compute the encoder residuals ONCE outside the lax.scan.

    def encode_attr(self, attr_latent, t_attr, ctx,
                    conditioning_scale: float = 1.0,
                    deterministic: bool = True):
        ctrl_down, ctrl_mid, _, _ = self.encoder(
            attr_latent, t_attr, ctx.astype(self.dtype),
            conditioning_scale, deterministic)
        return ctrl_down, ctrl_mid

    def image_stream_with_residuals(self, img_latent, t_img, ctx,
                                    ctrl_down, ctrl_mid,
                                    deterministic: bool = True):
        img_pred, _, _, _ = self.unet(
            img_latent, t_img, ctx.astype(self.dtype), ctrl_down, ctrl_mid,
            deterministic)
        return img_pred

    def image_stream_full_taps(self, img_latent, t_img, ctx,
                               ctrl_down, ctrl_mid,
                               deterministic: bool = True):
        """Like image_stream_with_residuals but also returns the raw
        down/mid taps for encoder-propagation caching."""
        img_pred, raw_down, raw_mid, _ = self.unet(
            img_latent, t_img, ctx.astype(self.dtype), ctrl_down, ctrl_mid,
            deterministic)
        return img_pred, raw_down, raw_mid

    def image_stream_cached(self, t_img, ctx, ctrl_down, ctrl_mid,
                            cached_raw, deterministic: bool = True):
        """Decoder-only step from cached raw taps (encoder propagation)."""
        img_pred, _, _, _ = self.unet(
            None, t_img, ctx.astype(self.dtype), ctrl_down, ctrl_mid,
            deterministic, cached_raw=cached_raw)
        return img_pred

    # In INVERSE sampling the image latent is clean and t_img = 0, and the
    # attribute decoder consumes the UNet's RAW taps — which are recorded
    # BEFORE the encoder residuals are added (reference controlnet.py:
    # 1051-1112) and therefore do not depend on the per-step encoder state
    # at all.  The UNet pass is EXACTLY loop-invariant; the reference
    # re-runs all of it every step (pipeline.py:2670-2680).  These two
    # methods let the sampler hoist it: XLA prunes the unused up blocks
    # from `unet_raw_taps` (output dead-code elimination).

    def unet_raw_taps(self, img_latent, t_img, ctx,
                      deterministic: bool = True):
        _, raw_down, raw_mid, _ = self.unet(
            img_latent, t_img, ctx.astype(self.dtype), None, None,
            deterministic)
        return raw_down, raw_mid

    def attr_streams_with_unet_taps(self, attr_latent, t_attr, ctx,
                                    unet_raw_down, unet_raw_mid,
                                    conditioning_scale: float = 1.0,
                                    deterministic: bool = True):
        ctx = ctx.astype(self.dtype)
        _, _, raw_enc_down, raw_enc_mid = self.encoder(
            attr_latent, t_attr, ctx, conditioning_scale, deterministic)
        return self.decoder(
            raw_enc_mid, raw_enc_down, t_attr, ctx, unet_raw_down,
            unet_raw_mid, deterministic)


def init_dual_stream(cfg: UNetConfig, rng: jax.Array, batch: int = 1,
                     ctx_len: int = 77, dtype=jnp.bfloat16):
    """Initialise parameters with dummy inputs (all submodules visited)."""
    model = DualStreamModel(cfg, dtype)
    s = cfg.sample_size
    img = jnp.zeros((batch, s, s, cfg.in_channels), jnp.float32)
    attr = jnp.zeros((batch, s, s, cfg.attr_channels), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jnp.zeros((batch, ctx_len, cfg.cross_attention_dim), jnp.float32)
    params = model.init(rng, img, attr, t, t, ctx, run_decoder=True)
    return model, params
