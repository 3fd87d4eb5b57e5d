"""Typed configuration for the whole framework.

The reference scatters configuration across ~45 argparse flags
(reference train/train.py:502-874), accelerate YAMLs, shell env vars and
hard-coded path overrides (train/train.py:936-941).  Here everything is a
frozen dataclass so configs are hashable (usable as jit static args) and
self-documenting.  The reference's config-override bug (train/train.py:995
writes controlnet's dict where controldec's was intended) is not replicated.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

# The seven 4-channel latent modality groups of the attribute stream, in the
# exact concat order used by the reference (train/train.py:1307-1310:
# mask | material | normal | albedo | spec_light | diff_light | env).
ATTR_MODALITIES: Tuple[str, ...] = (
    "mask", "material", "normal", "albedo", "spec_light", "diff_light", "env",
)
LATENT_CHANNELS = 4
NUM_ATTR_GROUPS = len(ATTR_MODALITIES)          # 7
ATTR_CHANNELS = NUM_ATTR_GROUPS * LATENT_CHANNELS  # 28


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Dual-stream denoiser trunk config (SD-v1.4 UNet geometry by default).

    Mirrors the geometry implied by reference models/controlnet.py:49-1166
    (UNet2DConditionModel) without inheriting its diffusers plumbing.
    """
    in_channels: int = LATENT_CHANNELS              # image-latent channels
    out_channels: int = LATENT_CHANNELS
    attr_channels: int = ATTR_CHANNELS              # attribute-latent channels
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # True -> block has cross/self attention (SD1.x: first 3 down, last 3 up)
    down_block_attn: Tuple[bool, ...] = (True, True, True, False)
    num_heads: int = 8
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    transformer_layers: int = 1
    sample_size: int = 64                           # latent H=W
    dropout: float = 0.0
    # flash attention via Pallas (falls back to XLA attention off-TPU)
    use_flash_attention: bool = True
    # rematerialise block activations (jax.checkpoint) to trade FLOPs for HBM
    remat: bool = True

    @property
    def up_block_attn(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.down_block_attn))

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """SD AutoencoderKL geometry (reference L0: diffusers AutoencoderKL)."""
    in_channels: int = 3
    latent_channels: int = LATENT_CHANNELS
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    sample_size: int = 512

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    """CLIP ViT-L/14 text model geometry (reference L0: CLIPTextModel).

    The reference always conditions on the constant prompt ' '
    (train/train.py:1254), so at train/inference time the 77x768 context can
    be precomputed once and cached; the full module exists for parity.
    """
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    intermediate_size: int = 3072


# ---------------------------------------------------------------------------
# Diffusion
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """x0-prediction DDPM schedule (the base model is the x0 SD variant,
    reference train/train.sh:6 `stable-diffusion-v1-4_x0`; targets are
    latents, not noise: train/train.py:1358-1359)."""
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "sample"                 # x0 prediction
    # env latent perturbation during training (train/train.py:1286-1288)
    env_noise_aug: float = 0.02


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Inference-time sampler (reference recipe: 20 UniPC steps, cfg 0,
    ensemble of 5 - eval/test_real.py:547-554)."""
    num_steps: int = 20
    method: str = "unipc"                           # "unipc" | "ddim"
    order: int = 2                                  # UniPC solver order
    guidance_scale: float = 0.0
    ensemble: int = 5
    thresholding: bool = False
    # encoder propagation (Faster Diffusion, arXiv 2312.09608): run the
    # full UNet only every k-th forward-sampling step, decoder-only with
    # cached raw taps in between.  1 = off (exact reference semantics).
    encoder_reuse: int = 1


# ---------------------------------------------------------------------------
# Renderer
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Split-sum PBR renderer (reference src/utils/render.py)."""
    resolution: int = 512
    env_res: int = 512                              # base cubemap face size
    env_min_res: int = 16                           # coarsest specular mip
    min_roughness: float = 0.04
    max_mip_level: int = 4                          # len(mips)-2, see get_mip
    spp: int = 1                                    # supersamples per pixel
    near: float = 0.1
    far: float = 1000.0
    fovy_deg: float = 30.0
    # triangles processed per rasterizer chunk (static shape for scan)
    raster_chunk: int = 1024
    layers: int = 1                                 # depth peel layers (ref: 1)


# ---------------------------------------------------------------------------
# Data / Train
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DataConfig:
    root_dir: str = ""
    env_dir: str = ""
    meta_json: str = ""
    resolution: int = 512
    # reference train split pins the camera (dataset/objaverse.py:207-208);
    # made a choice here per SURVEY section "reference bugs".
    random_camera: bool = False
    camera_distance: float = 4.0
    material_grid: int = 11                         # 11x11 metallic/roughness
    num_workers: int = 8
    # supersampling factor for the render collate — our substitute for the
    # reference's dr.antialias on every buffer (src/utils/render.py:287-294)
    ssaa: int = 2
    # static mesh padding for batched rendering.  t_pad <= 32768 keeps the
    # Pallas tile rasterizer on its fast path at the SSAA resolution
    # (ops/rasterize._pallas_ok); raise for larger preprocessed meshes.
    v_pad: int = 32768
    t_pad: int = 32768
    # static albedo-texture resolution for batched rendering (OBJ map_Kd
    # images are resized to this; constant-kd meshes get a tiled texture)
    texture_res: int = 256
    # scene-bank augmentation: random SO(3) object rotation per sampled
    # scene (data/scene_bank.sample_scenes).  Camera az/el sampling varies
    # the VIEW direction but the environment light stays world-fixed;
    # rotating the object decorrelates surface orientation from the light
    # — diversity the reference's fixed per-epoch scenes never had.
    rotation_augment: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Loss weights & loop hyperparameters exactly as reference
    train/train.py:1375-1378,1416 and train/train.sh:21-42."""
    batch_size_per_device: int = 2
    learning_rate: float = 5e-6
    # "adamw" (reference parity, train/train.py:1044-1053) or "adafactor":
    # factored second moments cut optimizer state from 2x to ~0x param
    # size — the difference between flagship 512^2 training fitting on one
    # 16GB v5e (AdamW state alone is 20.9GB for the 1.74B-param dual
    # stream) and not; the standard big-model TPU optimizer (T5/PaLM).
    optimizer: str = "adamw"
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    # LR schedule (beyond-reference: the ref fine-tunes SD at a constant
    # 5e-6, train.sh:21-42; from-scratch runs want warmup + decay)
    lr_schedule: str = "constant"        # "constant" | "cosine"
    lr_warmup_steps: int = 0
    lr_decay_steps: int = 0              # cosine horizon (required if cosine)
    lr_end_factor: float = 0.1           # final lr = learning_rate * this
    gradient_accumulation_steps: int = 1
    max_steps: int = 5_000_000
    checkpoint_every: int = 5000
    validation_every: int = 5000
    checkpoints_total_limit: int = 5
    seed: int = 42
    # loss weights
    w_img: float = 1.0
    w_attr: float = 10.0
    w_contrastive: float = 0.01
    w_cycle: float = 0.8
    contrastive_temperature: float = 0.1
    # precision: params f32, compute bf16 (TPU native; fp16+scaler not needed)
    compute_dtype: str = "bfloat16"
    # "float32" (default) or "bfloat16": dtype of the backward pass / grad
    # tree.  bfloat16 differentiates w.r.t. the bf16-cast compute params
    # (the cast the model applies internally anyway), halving the 7.0GB
    # f32 weight-grad liveness that blocks flagship 512^2 single-chip
    # training (TRAIN512_r05: 17.25G > 15.75G HBM at batch 2 with f32
    # grads).  Master params and optimizer statistics stay f32 — each
    # grad leaf is upcast transiently inside the fused update.
    grad_dtype: str = "float32"
    mesh_axes: Tuple[str, ...] = ("data",)


# ---------------------------------------------------------------------------
# Bundles
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SystemConfig:
    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    text: TextEncoderConfig = dataclasses.field(default_factory=TextEncoderConfig)
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    sampler: SamplerConfig = dataclasses.field(default_factory=SamplerConfig)
    render: RenderConfig = dataclasses.field(default_factory=RenderConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


def flagship() -> SystemConfig:
    """The production SD-v1.4-geometry system (512^2 images, 64^2 latents)."""
    return SystemConfig()


def legacy16() -> SystemConfig:
    """Legacy 4-attribute 16-ch layout (reference `rendering`/
    `inverse_rendering`/`mask2image`/`image2mask`, pipeline.py:3684,976:
    metallic | roughness | normal | light) — SURVEY C5/C7 model family."""
    return SystemConfig(unet=UNetConfig(attr_channels=16))


def legacy12() -> SystemConfig:
    """Legacy 3-attribute 12-ch layout (reference `*_3mod` methods,
    pipeline.py:1246: material | normal | light)."""
    return SystemConfig(unet=UNetConfig(attr_channels=12))


def small() -> SystemConfig:
    """Quality-benchmark scale: 64^2 images, 16^2 latents.  Same topology
    as flagship (3-level UNet w/ cross-attention, 3-block VAE) at widths a
    single v5e chip trains from scratch in minutes — the config behind
    QUALITY_r*.json (BASELINE.md harness) when no SD port is available."""
    return SystemConfig(
        unet=UNetConfig(
            block_out_channels=(128, 256, 512),
            layers_per_block=1,
            down_block_attn=(True, True, False),
            num_heads=4,
            cross_attention_dim=256,
            norm_num_groups=16,
            sample_size=16,
            remat=False,
        ),
        vae=VAEConfig(
            block_out_channels=(32, 64, 128),
            layers_per_block=1,
            norm_num_groups=8,
            sample_size=64,
        ),
        text=TextEncoderConfig(
            vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
            max_length=16, intermediate_size=512,
        ),
        sampler=SamplerConfig(ensemble=1),
        render=RenderConfig(resolution=64, env_res=32, env_min_res=8,
                            max_mip_level=2, raster_chunk=256),
        data=DataConfig(resolution=64, texture_res=64,
                        v_pad=4096, t_pad=8192, random_camera=True),
        train=TrainConfig(batch_size_per_device=8, learning_rate=1e-4,
                          checkpoint_every=1000, validation_every=1000),
    )


def medium() -> SystemConfig:
    """Intermediate scale for when `small` saturates: 128^2 images, 32^2
    latents, flagship topology at ~3.2x small's parameter count (328M
    dual-stream params — AdamW f32 state still fits one 16GB v5e).  Attention
    buckets: S=1024/D=24 (level 0), S=256/D=48, S=64/D=96.  Warm starts
    do NOT transfer across configs (different widths); a medium run
    trains from scratch or distills."""
    return SystemConfig(
        unet=UNetConfig(
            block_out_channels=(192, 384, 768),
            layers_per_block=2,
            down_block_attn=(True, True, False),
            num_heads=8,
            cross_attention_dim=512,
            norm_num_groups=32,
            sample_size=32,
            remat=True,
        ),
        vae=VAEConfig(
            block_out_channels=(64, 128, 256),
            layers_per_block=2,
            norm_num_groups=16,
            sample_size=128,
        ),
        text=TextEncoderConfig(
            vocab_size=512, hidden_size=512, num_layers=4, num_heads=8,
            max_length=16, intermediate_size=1024,
        ),
        sampler=SamplerConfig(ensemble=1),
        render=RenderConfig(resolution=128, env_res=64, env_min_res=8,
                            max_mip_level=3, raster_chunk=512),
        data=DataConfig(resolution=128, texture_res=128,
                        v_pad=8192, t_pad=16384, random_camera=True),
        train=TrainConfig(batch_size_per_device=8, learning_rate=1e-4,
                          checkpoint_every=1000, validation_every=1000),
    )


def tiny(latent_size: int = 8) -> SystemConfig:
    """A minute system for tests: same topology, toy widths."""
    return SystemConfig(
        unet=UNetConfig(
            block_out_channels=(32, 64),
            layers_per_block=1,
            down_block_attn=(True, False),
            num_heads=2,
            cross_attention_dim=32,
            norm_num_groups=8,
            sample_size=latent_size,
            use_flash_attention=False,
            remat=False,
        ),
        vae=VAEConfig(
            block_out_channels=(16, 32),
            layers_per_block=1,
            norm_num_groups=8,
            sample_size=latent_size * 2,
        ),
        text=TextEncoderConfig(
            vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
            max_length=16, intermediate_size=64,
        ),
        sampler=SamplerConfig(num_steps=3, ensemble=1),
        render=RenderConfig(resolution=32, env_res=16, env_min_res=4,
                            max_mip_level=1, raster_chunk=64),
        # data.resolution matches the tiny VAE input (sample_size=16) so
        # fused render-in-step/scene-bank smoke runs render at toy scale
        # instead of inheriting the flagship 512^2 default
        data=DataConfig(resolution=16, texture_res=32,
                        v_pad=4096, t_pad=8192, random_camera=True),
        # validation_every=2 so smoke runs exercise the validation hook
        train=TrainConfig(batch_size_per_device=2, validation_every=2),
    )
