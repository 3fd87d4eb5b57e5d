"""uni-renderer-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of EnVision-Research/Uni-Renderer (CVPR 2025).

Unified forward rendering (intrinsics -> RGB) and inverse rendering
(RGB -> intrinsics) in one dual-stream latent diffusion model, plus a
split-sum PBR mesh renderer for on-the-fly training data generation.

Layer map (mirrors reference SURVEY.md section 1, re-designed TPU-first):

    core/       typed configs, sharding helpers, checkpointing, tracing
    ops/        TPU compute primitives: BSDF math, cubemap filtering,
                rasterization, texture sampling, image losses, Pallas kernels
    render/     split-sum PBR mesh renderer (reference: src/utils/render.py)
    models/     flax modules: dual-stream denoiser, VAE, CLIP text encoder
                (reference: models/controlnet.py, models/unet_2d_blocks.py)
    diffusion/  DDPM x0 schedule, dual-timestep sampling, DDIM/UniPC samplers
                (reference: train/train.py:442-453, models/pipeline.py)
    data/       Objaverse dataset + offline preprocessing tools
    parallel/   device mesh / pjit sharding utilities
    train/      dual-schedule training loop (reference: train/train.py)
    eval/       metrics (FID/PSNR/mIoU/normal-angle) + eval drivers
"""

__version__ = "0.1.0"
