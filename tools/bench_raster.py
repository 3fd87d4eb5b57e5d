#!/usr/bin/env python
"""Rasterizer A/B on the real TPU: JAX tiled-matmul (ops/rasterize.py) vs
Pallas tile kernel (ops/rasterize_pallas.py), honest relay-proof timing
(fresh salted inputs, np.asarray host-transfer fence, phantom filtering —
see PERF.md).

Scenes: analytic sphere at increasing tessellation, 512^2 and 1024^2
(the collate SSAA resolution), plus the data path's fully padded
T=131072 case.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args(argv)

    import jax
    if os.environ.get("UNIRENDER_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["UNIRENDER_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from unirenderer_tpu.ops.rasterize import rasterize
    from unirenderer_tpu.ops.rasterize_pallas import rasterize_pallas
    from unirenderer_tpu.ops.transform import xfm_points
    from unirenderer_tpu.render import camera
    from unirenderer_tpu.render.mesh import make_sphere

    cases = [  # (sphere_res, pad_T, hw, chunk)
        (24, 4096, 512, 256),
        (48, 16384, 512, 256),
        (24, 131072, 512, 512),      # data-path static padding
        (48, 16384, 1024, 256),      # SSAA resolution
    ]
    iters = args.iters
    results = {}
    for (res, pad_t, hw, chunk) in cases:
        m = make_sphere(res)
        v = np.asarray(m.v_pos)
        t = np.asarray(m.t_pos_idx, np.int32)
        t = np.concatenate([t, np.zeros((pad_t - len(t), 3), np.int32)])

        def make_inputs():
            salt = (time.perf_counter_ns() % 1000) * 1e-6
            az = 30.0 + salt                    # fresh camera per dispatch
            mvp, campos = camera.spherical_camera(az, 70.0, 3.5)
            return xfm_points(jnp.asarray(v)[None], mvp[None])[0]

        tri = jnp.asarray(t)

        def bench(fn):
            @jax.jit
            def run(pos):
                def body(c, i):
                    r = fn(pos + c, tri)
                    return r.z[:1, :1] * 1e-9, None
                c, _ = jax.lax.scan(body, jnp.zeros((1, 1)),
                                    jnp.arange(iters))
                return c
            np.asarray(run(make_inputs()))
            times = []
            for _ in range(10):
                fresh = make_inputs()
                np.asarray(fresh)
                t0 = time.perf_counter()
                np.asarray(run(fresh))
                ms = (time.perf_counter() - t0) * 1000.0
                if ms > 10.0:
                    times.append(ms / iters)
                if len(times) >= 3:
                    break
            return round(sorted(times)[len(times) // 2], 3) if times \
                else float("nan")

        key = f"T{pad_t}_hw{hw}"
        results[key] = {
            "jax": bench(lambda p, t_: rasterize(p, t_, hw, hw, chunk,
                                                 impl="jax")),
            "pallas": bench(
                lambda p, t_: rasterize(p, t_, hw, hw, chunk,
                                        impl="pallas")),
        }
        print(key, results[key], flush=True)

    print(json.dumps({"raster_ab_ms": results}))


if __name__ == "__main__":
    main()
