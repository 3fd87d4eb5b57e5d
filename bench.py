"""Benchmark harness — prints ONE JSON line.

Measures 512^2 dual-stream sampling throughput on the local TPU chip:
the production forward-rendering path (attribute encoder + UNet per step,
reference pipeline.py:1586-1653) as one jitted 20-step lax.scan, plus the
VAE decode — i.e. images/sec/chip end-to-end for `mask2image_3mod_albedo`.

vs_baseline: ratio against the A800 reference estimate.  The reference
publishes no numbers (BASELINE.md); the A800 estimate below is derived from
the reference recipe (20 UniPC steps of controlnet+unet at 512^2, fp16
~1.37x UNet cost/step + VAE decode) on A800 ~= 1.0 images/sec.  The driver
target is >= 2x that (BASELINE.json north star).
"""

from __future__ import annotations

import json
import time

A800_IMAGES_PER_SEC_ESTIMATE = 1.0
NUM_STEPS = 20
BATCH = 4


def main():
    import jax
    import jax.numpy as jnp

    from unirenderer_tpu.core import config
    from unirenderer_tpu.pipelines import UniRendererPipeline

    cfg = config.flagship()
    pipe = UniRendererPipeline.create(cfg, jax.random.key(0))

    s = cfg.vae.sample_size
    b = BATCH
    rng = jax.random.key(1)
    maps = {k: jnp.zeros((b, s, s, 3), jnp.float32)
            for k in ("normal", "albedo", "spec_light", "diff_light", "env",
                      "mask")}
    metallic = jnp.full((b,), 0.5)
    roughness = jnp.full((b,), 0.5)

    def run(r):
        out = pipe.mask2image_3mod_albedo(
            **maps, metallic=metallic, roughness=roughness, rng=r,
            num_steps=NUM_STEPS)
        return out

    # compile
    out = run(rng)
    jax.block_until_ready(out)

    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(jax.random.fold_in(rng, i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    images_per_sec = b / dt
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
        },
    }))


if __name__ == "__main__":
    main()
