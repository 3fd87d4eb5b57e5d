"""Benchmark harness — prints ONE JSON line.

Measures 512^2 dual-stream forward-rendering sampling on the local TPU
chip: attribute-encoder + UNet per step (reference pipeline.py:1586-1653)
as one jitted 20-step lax.scan, plus the 6-map VAE encode and final VAE
decode — end-to-end images/sec/chip for `mask2image_3mod_albedo`.

vs_baseline: ratio against the A800 reference estimate.  The reference
publishes no numbers (BASELINE.md); the estimate below assumes the
reference recipe (20 UniPC steps of controlnet+unet at 512^2 fp16 +
7 VAE encodes + 1 decode) sustains ~1.0 images/sec on one A800 — derived
from typical SD-UNet A800 step rates (~15 it/s at 512^2, x1.45 for the
encoder pass).  The driver north star is >= 2x that (BASELINE.json).

Implementation notes:
  * Params are materialised structure-only (utils/fast_init.py) — a real
    init through the TPU tunnel costs ~8 min and benchmarks nothing.
  * Weight VALUES don't change dense-compute timing; zeros are used.
  * A persistent XLA compilation cache keeps re-runs warm.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

A800_IMAGES_PER_SEC_ESTIMATE = 1.0
NUM_STEPS = 20
BATCH = int(os.environ.get("BENCH_BATCH", "16"))


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax.numpy as jnp

    from unirenderer_tpu.core import config
    from unirenderer_tpu.models.dual_stream import DualStreamModel
    from unirenderer_tpu.models.vae import AutoencoderKL
    from unirenderer_tpu.pipelines import UniRendererPipeline
    from unirenderer_tpu.models.clip_text import CLIPTextEncoder, blank_ids
    from unirenderer_tpu.utils.fast_init import shape_init

    base = config.flagship()
    cfg = dataclasses.replace(
        base,
        unet=dataclasses.replace(
            base.unet,
            use_flash_attention=os.environ.get("BENCH_FLASH", "1") == "1",
            remat=False),
        sampler=dataclasses.replace(
            base.sampler,
            encoder_reuse=int(os.environ.get("BENCH_ENC_REUSE", "1"))))

    dual = DualStreamModel(cfg.unet, jnp.bfloat16)
    vae = AutoencoderKL(cfg.vae, jnp.bfloat16)
    text = CLIPTextEncoder(cfg.text, jnp.bfloat16)

    s = cfg.unet.sample_size
    img = jnp.zeros((1, s, s, 4))
    attr = jnp.zeros((1, s, s, cfg.unet.attr_channels))
    tt = jnp.zeros((1,), jnp.int32)
    ctx0 = jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim))

    t0 = time.time()

    # serving keeps weights in bf16: halves HBM footprint AND the
    # per-step weight-read bandwidth (weights are re-read every denoise
    # step).  The cast happens HOST-side inside shape_init — a device-side
    # cast of the full parameter set through the relay was the bulk of
    # round 2's init_s=90.7 (VERDICT weak #3).
    dual_params = shape_init(
        lambda: dual.init(jax.random.key(0), img, attr, tt, tt, ctx0),
        fill="scaled_normal", cast=jnp.bfloat16)
    vae_params = shape_init(
        lambda: vae.init(jax.random.key(0),
                         jnp.zeros((1, cfg.vae.sample_size,
                                    cfg.vae.sample_size, 3)),
                         jax.random.key(1)),
        fill="scaled_normal", cast=jnp.bfloat16)
    text_params = shape_init(
        lambda: text.init(jax.random.key(0), blank_ids(cfg.text)),
        fill="scaled_normal", cast=jnp.bfloat16)
    jax.block_until_ready(dual_params)
    init_s = time.time() - t0

    pipe = UniRendererPipeline(cfg, dual, dual_params, vae, vae_params,
                               text, text_params)

    hw = cfg.vae.sample_size
    b = BATCH
    # time-salted inputs: the execution relay caches identical
    # (program, input) pairs, which would fake the timing
    salt = int(time.time() * 1000) % (2 ** 31)
    rng = jax.random.key(salt)
    mk = jax.random.split(jax.random.key(salt + 1), 6)
    maps = {k: 0.1 * jax.random.normal(mk[i], (b, hw, hw, 3))
            for i, k in enumerate(("normal", "albedo", "spec_light",
                                   "diff_light", "env", "mask"))}
    metallic = jnp.full((b,), 0.5)
    roughness = jnp.full((b,), 0.5)

    def run(r):
        return pipe.mask2image_3mod_albedo(
            **maps, metallic=metallic, roughness=roughness, rng=r,
            num_steps=NUM_STEPS)

    import numpy as np

    t0 = time.time()
    out = run(rng)
    np.asarray(out[0, 0, 0])            # host-transfer fence (PERF.md:
    compile_s = time.time() - t0        # block_until_ready can lie)

    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(jax.random.fold_in(rng, i))
    np.asarray(out[0, 0, 0])
    dt = (time.perf_counter() - t0) / iters

    images_per_sec = b / dt

    # inverse path (production real_image2mask, hoisted-UNet scan)
    inv_img = 0.1 * jax.random.normal(jax.random.key(salt + 2),
                                      (b, hw, hw, 3))
    inv_mask = jnp.ones((b, hw, hw, 3))

    def run_inv(r):
        return pipe.real_image2mask_3mod_albedo(
            image=inv_img, mask=inv_mask, rng=r, num_steps=NUM_STEPS,
            ensemble=1)["normal"]

    out = run_inv(rng)
    np.asarray(out[0, 0, 0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = run_inv(jax.random.fold_in(rng, 7 + i))
    np.asarray(out[0, 0, 0])
    dt_inv = (time.perf_counter() - t0) / iters
    inverse_images_per_sec = b / dt_inv

    # production inverse recipe: ensemble of 5 (test_real.py:547-554),
    # folded into the batch dimension (ONE scan at 5*batch) — effective
    # images/sec counts each input image once
    inverse_e5 = None
    try:
        def run_inv5(r):
            return pipe.real_image2mask_3mod_albedo(
                image=inv_img, mask=inv_mask, rng=r, num_steps=NUM_STEPS,
                ensemble=5)["normal"]

        out = run_inv5(rng)
        np.asarray(out[0, 0, 0])
        t0 = time.perf_counter()
        for i in range(2):
            out = run_inv5(jax.random.fold_in(rng, 17 + i))
        np.asarray(out[0, 0, 0])
        inverse_e5 = b / ((time.perf_counter() - t0) / 2)
    except Exception as e:                  # OOM etc: report, don't die
        print(f"# ensemble-5 inverse failed: {type(e).__name__}",
              flush=True)

    print(json.dumps({
        "metric": "dual_stream_sample_images_per_sec_per_chip_512",
        "value": round(images_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / A800_IMAGES_PER_SEC_ESTIMATE,
                             4),
        "detail": {
            "batch": b, "steps": NUM_STEPS,
            "sec_per_batch": round(dt, 4),
            "sec_per_denoise_step": round(dt / NUM_STEPS, 5),
            "inverse_images_per_sec": round(inverse_images_per_sec, 4),
            "inverse_ensemble5_images_per_sec":
                round(inverse_e5, 4) if inverse_e5 else None,
            "encoder_reuse": cfg.sampler.encoder_reuse,
            "init_s": round(init_s, 1),
            "compile_s": round(compile_s, 1),
            # cold/warm split (VERDICT round-2 'do this' #8): warm means
            # the persistent compile cache carried the big scan programs
            "warm_start": compile_s < 60,
        },
    }))


if __name__ == "__main__":
    main()
