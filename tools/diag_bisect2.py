#!/usr/bin/env python
"""Per-step scan-vs-eager divergence tracer for the UniPC sampler.

diag_bisect_sample.py established: pipe._sample == jitted-scan clone
bit-exactly (8.3dB), but the EAGER python loop over the SAME unipc_step
gets 24.4dB.  This script runs both on identical inputs and records, per
step: max|x0_scan - x0_eager| and max|x_scan - x_eager| — the first step
where they split localizes the bug (model-eval-under-scan vs sampler
state math).
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
    ap.add_argument("--ckpt", default="artifacts/r05/dual_small.npz")
    ap.add_argument("--vae-ckpt", default="artifacts/r04/vae_small.npz")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="/tmp/diag_bisect2.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from unirenderer_tpu.utils.runtime import setup_runtime
    setup_runtime()

    from unirenderer_tpu.core import config
    from unirenderer_tpu.core.checkpoint import load_params_npz
    from unirenderer_tpu.data.objaverse import ObjaverseDataTest, collate_render
    from unirenderer_tpu.diffusion.samplers import UniPCState, unipc_step
    from unirenderer_tpu.diffusion.schedule import inference_timesteps
    from unirenderer_tpu.pipelines import UniRendererPipeline

    cfg = config.small()
    res = cfg.vae.sample_size
    pipe = UniRendererPipeline.create(cfg, jax.random.key(0),
                                      dtype=jnp.float32)
    dp, _ = load_params_npz(args.ckpt)
    pipe.dual_params = jax.tree.map(jnp.asarray, dp)
    vp, _ = load_params_npz(args.vae_ckpt)
    pipe.vae_params = jax.tree.map(jnp.asarray, vp)

    meshes = sorted(glob.glob(os.path.join(args.mesh_dir, "*.npz")))
    envs = sorted(d for d in glob.glob(os.path.join(args.env_dir, "*"))
                  if os.path.isdir(d))
    ds = ObjaverseDataTest(cfg.data, meshes, envs, seed=1234)
    items = [ds[i] for i in range(2)]
    batch = collate_render(items, resolution=res)

    rng = jax.random.key(1000)
    k_enc, k_noise = jax.random.split(rng)
    mask01 = jnp.clip(batch["mask"] * 0.5 + 0.5, 0, 1)[..., :1]
    m = jnp.reshape(batch["metallic"], (-1, 1, 1, 1)) * mask01
    r = jnp.reshape(batch["roughness"], (-1, 1, 1, 1)) * mask01
    maps = dict(normal=batch["normal"], albedo=batch["albedo"],
                spec_light=batch["spec_light"],
                diff_light=batch["diff_light"], env=batch["env"],
                mask=batch["mask"],
                material=jnp.concatenate([m, m, r], -1) * 2.0 - 1.0)
    lat = pipe._encode_maps(maps, k_enc)
    groups = [lat["material"], lat["normal"], lat["albedo"],
              lat["spec_light"], lat["diff_light"], lat["env"]]
    shape = lat["normal"].shape
    b = shape[0]
    ctx = pipe.blank_context(b)
    head = jnp.concatenate([lat["mask"]] + groups, axis=-1)
    t0 = jnp.zeros((b,), jnp.int32)
    noise = jax.random.normal(k_noise, shape, jnp.float32)
    n = args.steps

    ts = inference_timesteps(cfg.diffusion.num_train_timesteps, n)
    ts_next = jnp.concatenate([ts[1:], jnp.zeros((1,), jnp.int32)])
    is_final = jnp.arange(n) == n - 1

    # --- scan path, collecting per-step (x0, x_next) ---
    @jax.jit
    def scan_trace(params, x0noise):
        cd, cm = pipe.dual.apply(params, head, t0, ctx,
                                 method="encode_attr")
        st = UniPCState.init(x0noise.shape, x0noise.dtype)

        def body(carry, tt):
            x, s = carry
            t, tn, fin = tt
            tb = jnp.full((b,), t, jnp.int32)
            x0 = pipe.dual.apply(params, x, tb, ctx, cd, cm,
                                 method="image_stream_with_residuals"
                                 ).astype(jnp.float32)
            s, xn = unipc_step(pipe.schedule, s, x, x0, t, tn, fin)
            return (xn, s), (x0, xn)

        (_, _), (x0s, xs) = jax.lax.scan(body, (x0noise, st),
                                         (ts, ts_next, is_final))
        return x0s, xs, (cd, cm)

    x0s_scan, xs_scan, (cd_s, cm_s) = scan_trace(pipe.dual_params, noise)
    x0s_scan = np.asarray(x0s_scan)
    xs_scan = np.asarray(xs_scan)
    print("scan done", flush=True)

    # --- eager path on the SAME cd/cm (computed in the scan program) ---
    @jax.jit
    def x0_fn(params, x, t, cd, cm):
        tb = jnp.full((b,), t, jnp.int32)
        return pipe.dual.apply(params, x, tb, ctx, cd, cm,
                               method="image_stream_with_residuals"
                               ).astype(jnp.float32)

    ts_np = np.asarray(ts)
    tsn_np = np.asarray(ts_next)
    x = noise
    st = UniPCState.init(x.shape, x.dtype)
    rows = []
    for i in range(n):
        x0p = x0_fn(pipe.dual_params, x, int(ts_np[i]), cd_s, cm_s)
        # compare the model outputs given the SCAN's input iterate too:
        x0_on_scan_input = x0_fn(pipe.dual_params,
                                 jnp.asarray(xs_scan[i - 1]) if i > 0
                                 else noise,
                                 int(ts_np[i]), cd_s, cm_s)
        st, x = unipc_step(pipe.schedule, st, x, x0p, int(ts_np[i]),
                           int(tsn_np[i]), i == n - 1)
        row = dict(
            i=i, t=int(ts_np[i]),
            d_x0=float(np.abs(x0s_scan[i] - np.asarray(x0p)).max()),
            d_x0_scaninput=float(
                np.abs(x0s_scan[i] - np.asarray(x0_on_scan_input)).max()),
            d_x=float(np.abs(xs_scan[i] - np.asarray(x)).max()),
            x_norm_eager=float(np.sqrt(np.mean(np.asarray(x) ** 2))),
            x_norm_scan=float(np.sqrt(np.mean(xs_scan[i] ** 2))),
        )
        rows.append(row)
        print(row, flush=True)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
