#!/usr/bin/env python
"""Environment-map preprocessing CLI — reference light2map.py (SURVEY C15).

HDR latlong -> 512^2 cubemap -> avg-pool mip chain to 16^2 -> GGX
prefiltered specular per level + Lambertian diffuse from the coarsest ->
specular_{0..N}.npy + diffuse.npy per env dir (the 7-file layout the
dataset expects, dataset/objaverse.py:114-116).

Usage: python tools/light2map.py --src DIR --dst DIR [--res 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--min-res", type=int, default=16)
    ap.add_argument("--samples", type=int, default=256)
    args = ap.parse_args()

    import jax
    if os.environ.get("UNIRENDER_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["UNIRENDER_PLATFORM"])
    import jax.numpy as jnp

    from unirenderer_tpu.data.hdr import read_hdr
    from unirenderer_tpu.render.light import env_from_latlong

    os.makedirs(args.dst, exist_ok=True)
    files = [f for f in sorted(os.listdir(args.src))
             if f.lower().endswith((".hdr", ".npy"))]
    print(f"[light2map] {len(files)} envs")
    for f in files:
        try:
            src = os.path.join(args.src, f)
            if f.lower().endswith(".hdr"):
                ll = read_hdr(src)
            else:
                ll = np.load(src)
            env = env_from_latlong(jnp.asarray(ll), res=args.res,
                                   min_res=args.min_res,
                                   num_samples=args.samples)
            out_dir = os.path.join(args.dst, os.path.splitext(f)[0])
            os.makedirs(out_dir, exist_ok=True)
            for i, s in enumerate(env.specular):
                np.save(os.path.join(out_dir, f"specular_{i}.npy"),
                        np.asarray(s))
            np.save(os.path.join(out_dir, "diffuse.npy"),
                    np.asarray(env.diffuse))
            print(f"[light2map] ok {f}")
        except Exception:
            print(f"[light2map] failed: {f}", file=sys.stderr)
            traceback.print_exc()


if __name__ == "__main__":
    main()
