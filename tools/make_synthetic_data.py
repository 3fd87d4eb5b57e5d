#!/usr/bin/env python
"""Generate a synthetic preprocessed dataset (meshes + prefiltered envs)
in the exact on-disk layout the training/eval data path consumes
(tools/obj2mesh.py .npz meshes; tools/light2map.py env dirs) — no external
data needed.  Scenes: anisotropically scaled spheres under smooth random
HDR environments, the distribution used for the self-measured quality
benchmark (BASELINE.md / QUALITY_r*.json).

Usage:
  python tools/make_synthetic_data.py --out DIR [--n-mesh 8] [--n-env 4] \
      [--env-res 64] [--sphere-res 24]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-mesh", type=int, default=8)
    ap.add_argument("--n-env", type=int, default=4)
    ap.add_argument("--env-res", type=int, default=64)
    ap.add_argument("--env-min-res", type=int, default=8)
    ap.add_argument("--env-samples", type=int, default=64)
    ap.add_argument("--sphere-res", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    from unirenderer_tpu.utils.runtime import setup_runtime
    setup_runtime()
    import jax.numpy as jnp

    from unirenderer_tpu.ops.cubemap import build_env_mips, latlong_to_cubemap
    from unirenderer_tpu.render.mesh import make_sphere

    rng = np.random.default_rng(args.seed)
    mesh_dir = os.path.join(args.out, "meshes")
    env_root = os.path.join(args.out, "envs")
    os.makedirs(mesh_dir, exist_ok=True)
    os.makedirs(env_root, exist_ok=True)

    base = make_sphere(args.sphere_res)
    for i in range(args.n_mesh):
        scale = rng.uniform(0.55, 1.0, size=3).astype(np.float32)
        v = np.asarray(base.v_pos) * scale
        # normals of an ellipsoid: n ∝ p / scale^2
        n = np.asarray(base.v_pos) / (scale ** 2)
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
        kd = rng.uniform(0.2, 0.9, size=3).astype(np.float32)
        np.savez(os.path.join(mesh_dir, f"m{i:03d}.npz"),
                 v_pos=v.astype(np.float32),
                 t_idx=np.asarray(base.t_pos_idx, np.int32),
                 v_nrm=n.astype(np.float32),
                 v_tex=np.asarray(base.v_tex, np.float32),
                 v_tng=np.asarray(base.v_tng, np.float32),
                 kd=kd)
    print(f"wrote {args.n_mesh} meshes to {mesh_dir}")

    for e in range(args.n_env):
        # smooth random latlong: few random spherical lobes + ambient
        h, w = 32, 64
        th = np.linspace(0, np.pi, h)
        ph = np.linspace(-np.pi, np.pi, w)
        tt, pp = np.meshgrid(th, ph, indexing="ij")
        d = np.stack([np.sin(tt) * np.sin(pp), np.cos(tt),
                      -np.sin(tt) * np.cos(pp)], -1)
        img = np.full((h, w, 3), rng.uniform(0.1, 0.3), np.float32)
        for _ in range(3):
            axis = rng.standard_normal(3)
            axis /= np.linalg.norm(axis)
            color = rng.uniform(0.3, 2.5, size=3)
            sharp = rng.uniform(2.0, 12.0)
            lobe = np.maximum(d @ axis, 0.0) ** sharp
            img += (lobe[..., None] * color).astype(np.float32)
        cube = latlong_to_cubemap(jnp.asarray(img), args.env_res)
        spec, diff = build_env_mips(cube, min_res=args.env_min_res,
                                    num_samples=args.env_samples)
        d_out = os.path.join(env_root, f"e{e:02d}")
        os.makedirs(d_out, exist_ok=True)
        for l, m in enumerate(spec):
            np.save(os.path.join(d_out, f"specular_{l}.npy"),
                    np.asarray(m, np.float32))
        np.save(os.path.join(d_out, "diffuse.npy"),
                np.asarray(diff, np.float32))
        print(f"wrote env {d_out} ({len(spec)} specular mips)")


if __name__ == "__main__":
    main()
