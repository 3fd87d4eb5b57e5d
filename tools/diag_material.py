#!/usr/bin/env python
"""Material-readout ceiling diagnostic (round-4 VERDICT #6).

metal_rough_mae on the r05 checkpoint is 0.232 (ens5) vs 0.479 random.
The readout chain is: model predicts the VAE latent of the masked
[m,m,r] image -> VAE decode -> masked mean.  This measures each stage's
intrinsic error with GROUND-TRUTH inputs:

  vae_mae    encode(GT material image) -> decode -> masked-mean readout
             (the VAE's contribution alone — the readout CEILING)
  quant_mae  readout of the GT IMAGE itself (masking/mean quantization)

If vae_mae is a large fraction of 0.232, the fix is VAE/readout-side
(e.g. read out in latent space against encoded anchors) rather than more
dual-model training.
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
    ap.add_argument("--vae-ckpt", default="artifacts/r04/vae_small.npz")
    ap.add_argument("--config", default="small")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--out", default="/tmp/diag_material.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from unirenderer_tpu.utils.runtime import setup_runtime
    setup_runtime()

    from unirenderer_tpu.core import config
    from unirenderer_tpu.core.checkpoint import load_params_npz
    from unirenderer_tpu.data.objaverse import ObjaverseDataTest, collate_render
    from unirenderer_tpu.pipelines import UniRendererPipeline

    cfg = getattr(config, args.config)()
    res = cfg.vae.sample_size
    pipe = UniRendererPipeline.create(cfg, jax.random.key(0),
                                      dtype=jnp.float32)
    vp, _ = load_params_npz(args.vae_ckpt)
    pipe.vae_params = jax.tree.map(jnp.asarray, vp)

    meshes = sorted(glob.glob(os.path.join(args.mesh_dir, "*.npz")))
    envs = sorted(d for d in glob.glob(os.path.join(args.env_dir, "*"))
                  if os.path.isdir(d))
    ds = ObjaverseDataTest(cfg.data, meshes, envs, seed=1234)
    items = [ds[i % len(ds)] for i in range(args.n)]
    batch = collate_render(items, resolution=res)

    mask01 = np.clip(np.asarray(batch["mask"]) * 0.5 + 0.5, 0, 1)[..., 0]
    m_gt = np.asarray(batch["metallic"])            # (B,) scalars
    r_gt = np.asarray(batch["roughness"])
    m_img = m_gt[:, None, None, None] * mask01[..., None]
    r_img = r_gt[:, None, None, None] * mask01[..., None]
    mat = np.concatenate([m_img, m_img, r_img], -1) * 2.0 - 1.0  # [-1,1]

    def masked_mean(x):
        s = mask01.sum(axis=(1, 2)) + 1e-6
        return (x * mask01).sum(axis=(1, 2)) / s

    def readout(img01):
        met = img01[..., :2].mean(axis=-1)
        rou = img01[..., 2]
        return masked_mean(met), masked_mean(rou)

    # quantization floor: read the GT image back out
    m0, r0 = readout(np.clip((mat + 1) / 2, 0, 1))
    quant = float(np.mean(np.abs(m0 - m_gt)) + np.mean(np.abs(r0 - r_gt))) / 2

    # VAE round trip
    z = pipe.encode_images(jnp.asarray(mat), jax.random.key(7))
    dec = np.asarray(pipe.decode_latents(z))
    m1, r1 = readout(np.clip((dec + 1) / 2, 0, 1))
    vae = float(np.mean(np.abs(m1 - m_gt)) + np.mean(np.abs(r1 - r_gt))) / 2

    rep = dict(n=args.n, quant_mae=quant, vae_mae=vae,
               vae_ckpt=args.vae_ckpt,
               per_obj_vae_m=np.abs(m1 - m_gt).tolist(),
               per_obj_vae_r=np.abs(r1 - r_gt).tolist())
    print(json.dumps({k: v for k, v in rep.items()
                      if not k.startswith("per_")}, indent=1))
    with open(args.out, "w") as f:
        json.dump(rep, f, indent=1)


if __name__ == "__main__":
    main()
