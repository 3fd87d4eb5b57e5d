#!/usr/bin/env python
"""On-the-fly render-collate throughput on TPU (VERDICT round-2 item 2).

The reference renders training batches in-loop at full GPU speed
(train/train.py:184-439); our equivalent is `collate_render`, which since
round 3 runs render + the ENTIRE post-process as ONE jitted dispatch.
This bench records seconds/batch for that path so the "< 1s/batch on TPU"
criterion has a measured number (round 2: ~6s/batch eager through the
relay).

Relay-honest timing: fresh random camera per item per iteration (salted
by wall clock -> different inputs, no relay result-cache), np.asarray
host-transfer fence, first iteration reported separately as compile.

Usage: python tools/bench_collate.py --mesh-dir /tmp/q3/data/meshes \
           --env-dir /tmp/q3/data/envs --batch 16 --resolution 64
       python tools/bench_collate.py --synthetic --batch 4 --resolution 512
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh-dir")
    ap.add_argument("--env-dir")
    ap.add_argument("--synthetic", action="store_true",
                    help="sphere meshes + flat envs (no data needed)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--ssaa", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args(argv)

    from unirenderer_tpu.utils.runtime import setup_runtime
    setup_runtime()
    import jax

    from unirenderer_tpu.core import config
    from unirenderer_tpu.data.objaverse import (
        ObjaverseDataTest, collate_render,
    )

    cfg = config.small()
    rng = random.Random(time.time_ns())  # salt: fresh cameras every run

    if args.synthetic:
        items_src = _synthetic_items(cfg, args.batch * 4, rng)
        def draw(n):
            picked = [dict(items_src[rng.randrange(len(items_src))])
                      for _ in range(n)]
            for it in picked:
                it["azimuth"] = rng.uniform(0, 360)
                it["elevation"] = rng.uniform(60, 120)
            return picked
    else:
        meshes = sorted(glob.glob(os.path.join(args.mesh_dir, "*.npz")))
        envs = sorted(d for d in glob.glob(os.path.join(args.env_dir, "*"))
                      if os.path.isdir(d))
        assert meshes and envs, "need --mesh-dir/--env-dir or --synthetic"
        ds = ObjaverseDataTest(cfg.data, meshes, envs,
                               seed=rng.randrange(1 << 30))
        def draw(n):
            return [ds[rng.randrange(len(ds))] for _ in range(n)]

    times = []
    for i in range(args.iters + 1):
        t0 = time.time()
        batch = collate_render(draw(args.batch),
                               resolution=args.resolution, ssaa=args.ssaa)
        np.asarray(batch["image"])          # host-transfer fence
        times.append(time.time() - t0)
    compile_s, steady = times[0], times[1:]
    sec = float(np.median(steady))
    print(json.dumps({
        "metric": "collate_s_per_batch", "value": round(sec, 3),
        "unit": "s/batch", "batch": args.batch,
        "resolution": args.resolution, "ssaa": args.ssaa,
        "compile_s": round(compile_s, 1),
        "detail": [round(t, 3) for t in steady],
        "platform": jax.devices()[0].platform,
    }))


def _synthetic_items(cfg, n, rng):
    from unirenderer_tpu.data.objaverse import material_grid
    from unirenderer_tpu.render.mesh import make_sphere

    sphere = make_sphere(24)
    kd = np.asarray([0.6, 0.5, 0.4], np.float32)
    mesh = {
        "v_pos": np.asarray(sphere.v_pos),
        "t_idx": np.asarray(sphere.t_pos_idx),
        "v_nrm": np.asarray(sphere.v_nrm),
        "v_tex": np.asarray(sphere.v_tex),
        "v_tng": np.asarray(sphere.v_tng),
        "kd": kd,
        "kd_tex": np.broadcast_to(kd, (cfg.data.texture_res,
                                       cfg.data.texture_res, 3)).copy(),
    }
    env = {"specular_0": np.ones((6, 8, 8, 3), np.float32),
           "specular_1": np.ones((6, 4, 4, 3), np.float32),
           "diffuse": np.ones((6, 4, 4, 3), np.float32)}
    grid = material_grid(cfg.data.material_grid)
    out = []
    for _ in range(n):
        m, r = rng.choice(grid)
        out.append(dict(mesh=mesh, env=env, metallic=m, roughness=r,
                        azimuth=rng.uniform(0, 360),
                        elevation=rng.uniform(60, 120),
                        distance=cfg.data.camera_distance))
    return out


if __name__ == "__main__":
    main()
