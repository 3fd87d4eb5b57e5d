#!/usr/bin/env python
"""Single-image inverse rendering CLI — reference eval/test_real.py
(SURVEY C12): image (+ mask) -> ensemble-of-5 inverse rendering at 20 UniPC
steps -> 6 map folders.

Mask source (eval/segmentation.py, the MASK FILE CONTRACT): --mask FILE
accepts any external segmenter's output (the documented SAM2 command in
segmentation.py produces a compatible file, mirroring the reference's
in-process SAM2 at test_real.py:520-533); --box x0,y0,x1,y1 runs the
built-in box-prompt heuristic; default is the white-background heuristic.

Usage:
  python -m unirenderer_tpu.eval.run_inverse --image in.png --out outdir \
      [--mask mask.png|mask.npy] [--box x0,y0,x1,y1] [--ckpt dir] \
      [--steps 20] [--ensemble 5]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


from unirenderer_tpu.eval.segmentation import (   # noqa: F401 (re-export)
    auto_mask, box_prompt_mask, load_mask,
)


def load_image(path: str, size: int) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB").resize((size, size),
                                                 Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def save_image(path: str, arr01: np.ndarray) -> None:
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(
        (np.clip(arr01, 0, 1) * 255).astype(np.uint8)).save(path)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--mask", help="external mask file (png/npy), see "
                    "eval/segmentation.py MASK FILE CONTRACT")
    ap.add_argument("--box", help="x0,y0,x1,y1 box-prompt heuristic mask")
    ap.add_argument("--point", help="x,y[,x,y...] click-prompt heuristic "
                    "mask (negative pair = background click), the "
                    "reference's SAM2 point flow (test_real.py:520-533)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", help="checkpoint dir (trained params)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--ensemble", type=int, default=5)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random model (smoke only)")
    ap.add_argument("--relight-env",
                    help="HDR latlong (.hdr RGBE or .npy linear float) — "
                    "additionally re-light the object under this "
                    "environment (pipelines.relight; the reference app's "
                    "segment -> decompose -> re-light flow) and save "
                    "relit/0.png")
    args = ap.parse_args(argv)

    import jax
    if os.environ.get("UNIRENDER_PLATFORM"):
        # the axon sitecustomize force-registers the TPU platform; honor an
        # explicit override (used by CPU-only test runs)
        jax.config.update("jax_platforms", os.environ["UNIRENDER_PLATFORM"])
    import jax.numpy as jnp

    from unirenderer_tpu.core import config
    from unirenderer_tpu.pipelines import UniRendererPipeline

    cfg = config.tiny() if args.tiny else config.flagship()
    size = cfg.vae.sample_size if args.tiny else args.size

    pipe = UniRendererPipeline.create(cfg, jax.random.key(0))
    if args.ckpt:
        from unirenderer_tpu.core.checkpoint import CheckpointManager
        cm = CheckpointManager(args.ckpt)
        restored = cm.restore_params()
        if restored is not None:
            pipe.dual_params = jax.tree.map(jnp.asarray, restored)

    img01 = load_image(args.image, size)
    if args.mask:
        mask01 = load_mask(args.mask, size)
    elif args.box:
        mask01 = box_prompt_mask(img01,
                                 [int(v) for v in args.box.split(",")])
    elif args.point:
        from unirenderer_tpu.eval.segmentation import point_prompt_mask
        mask01 = point_prompt_mask(img01,
                                   [int(v) for v in args.point.split(",")])
    else:
        mask01 = auto_mask(img01)

    image = jnp.asarray(img01 * 2 - 1)[None]
    mask = jnp.asarray(mask01 * 2 - 1)[None]

    out = pipe.real_image2mask_3mod_albedo(
        image=image, mask=mask, rng=jax.random.key(1),
        num_steps=args.steps, ensemble=args.ensemble)

    # 6 output folders like the reference (test_real.py:566-593)
    for name in ("normal", "albedo", "spec_light", "diff_light", "env"):
        save_image(os.path.join(args.out, name, "0.png"),
                   (np.asarray(out[name])[0] + 1) / 2)
    save_image(os.path.join(args.out, "metallic", "0.png"),
               np.repeat(np.asarray(out["metallic"])[0][..., None], 3, -1))
    save_image(os.path.join(args.out, "roughness", "0.png"),
               np.repeat(np.asarray(out["roughness"])[0][..., None], 3, -1))
    m = float(np.asarray(out["metallic"]).mean())
    r = float(np.asarray(out["roughness"]).mean())
    print(f"saved maps to {args.out}  metallic~{m:.3f} roughness~{r:.3f}")

    if args.relight_env:
        if args.relight_env.endswith(".npy"):
            env_img = np.load(args.relight_env).astype(np.float32)
        else:
            from unirenderer_tpu.data.hdr import read_hdr
            env_img = read_hdr(args.relight_env)
        relit = pipe.relight(
            image=image, mask=mask, new_env=jnp.asarray(env_img),
            rng=jax.random.key(2), num_steps=args.steps,
            decomposed=out)
        save_image(os.path.join(args.out, "relit", "0.png"),
                   (np.asarray(relit)[0] + 1) / 2)
        print(f"saved relit image under {args.relight_env}")


if __name__ == "__main__":
    main()
