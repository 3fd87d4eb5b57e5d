#!/usr/bin/env python
"""Held-out VAE reconstruction eval: encode->decode PSNR per modality.

The VAE recon ceiling bounds every decoded map PSNR in the quality
harness (BASELINE.md target: >= 34dB).  Measures on the held-out render
set, per modality (image/normal/albedo/spec/diff) plus the flat material
image, and the overall mean — the artifact behind any "VAE ceiling"
claim (round-4 VERDICT #3).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh-dir", default="/tmp/q5/test/meshes")
    ap.add_argument("--env-dir", default="/tmp/q5/test/envs")
    ap.add_argument("--vae-ckpt", required=True,
                    help="npz export or orbax checkpoint dir")
    ap.add_argument("--config", default="small")
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--out", default="VAE_RECON.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from unirenderer_tpu.utils.runtime import setup_runtime
    setup_runtime()

    from unirenderer_tpu.core import config
    from unirenderer_tpu.core.checkpoint import load_params_npz
    from unirenderer_tpu.data.objaverse import ObjaverseDataTest, collate_render
    from unirenderer_tpu.eval import metrics as M
    from unirenderer_tpu.pipelines import UniRendererPipeline

    cfg = getattr(config, args.config)()
    res = cfg.vae.sample_size
    pipe = UniRendererPipeline.create(cfg, jax.random.key(0),
                                      dtype=jnp.float32)
    if args.vae_ckpt.endswith(".npz"):
        vp, step = load_params_npz(args.vae_ckpt)
    else:
        from unirenderer_tpu.core.checkpoint import restore_params
        vp, step = restore_params(args.vae_ckpt)
    pipe.vae_params = jax.tree.map(jnp.asarray, vp)

    meshes = sorted(glob.glob(os.path.join(args.mesh_dir, "*.npz")))
    envs = sorted(d for d in glob.glob(os.path.join(args.env_dir, "*"))
                  if os.path.isdir(d))
    ds = ObjaverseDataTest(cfg.data, meshes, envs, seed=1234)

    mods = ("image", "normal", "albedo", "spec_light", "diff_light",
            "material")
    psnrs = {m: [] for m in mods}
    bsz = 8
    for start in range(0, args.n, bsz):
        items = [ds[i % len(ds)] for i in range(start, min(start + bsz,
                                                           args.n))]
        batch = collate_render(items, resolution=res)
        mask01 = jnp.clip(batch["mask"] * 0.5 + 0.5, 0, 1)[..., :1]
        m = jnp.reshape(batch["metallic"], (-1, 1, 1, 1)) * mask01
        r = jnp.reshape(batch["roughness"], (-1, 1, 1, 1)) * mask01
        mat = jnp.concatenate([m, m, r], -1) * 2.0 - 1.0
        for name in mods:
            img = mat if name == "material" else batch[name]
            z = pipe.encode_images(img, jax.random.key(start))
            dec = np.clip(np.asarray(pipe.decode_latents(z)), -1, 1)
            gt = (np.asarray(img) + 1) / 2
            psnrs[name].append(float(M.psnr((dec + 1) / 2, gt)))

    rep = {"n": args.n, "ckpt": args.vae_ckpt, "ckpt_step": int(step or 0),
           "psnr": {k: float(np.mean(v)) for k, v in psnrs.items()}}
    rep["psnr_mean"] = float(np.mean(list(rep["psnr"].values())))
    print(json.dumps(rep, indent=1))
    with open(args.out, "w") as f:
        json.dump(rep, f, indent=1)


if __name__ == "__main__":
    main()
