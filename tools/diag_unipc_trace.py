#!/usr/bin/env python
"""Per-step UniPC trace on the real forward-rendering task (round 5).

diag_forward.py showed onestep x0 25.5dB / ddim20 25.0dB / unipc20 9.2dB.
Constant-x0 and linear-Gaussian toys integrate exactly, so the failure
needs the real model's response along the UniPC trajectory.  This traces,
per step: ||x||, ||x0_pred||, PSNR of decode(x0_pred) — for full UniPC and
for a corrector-disabled (predictor-only) variant — to separate
iterate-drift (model mispredicts on off-manifold x) from a corrector bug.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh-dir", required=True)
    ap.add_argument("--env-dir", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--vae-ckpt", required=True)
    ap.add_argument("--config", default="small")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="/tmp/diag_unipc_trace.json")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from unirenderer_tpu.utils.runtime import setup_runtime
    setup_runtime()

    from unirenderer_tpu.core import config
    from unirenderer_tpu.core.checkpoint import load_params_npz
    from unirenderer_tpu.data.objaverse import ObjaverseDataTest, collate_render
    from unirenderer_tpu.diffusion.samplers import UniPCState, unipc_step
    from unirenderer_tpu.diffusion.schedule import inference_timesteps
    from unirenderer_tpu.eval import metrics as M
    from unirenderer_tpu.pipelines import UniRendererPipeline

    cfg = getattr(config, args.config)()
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
    items = [ds[i % len(ds)] for i in range(args.n)]
    batch = collate_render(items, resolution=res)
    gt01 = (np.asarray(batch["image"]) + 1) / 2

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
    attr_groups = [lat["material"], lat["normal"], lat["albedo"],
                   lat["spec_light"], lat["diff_light"], lat["env"]]
    shape = lat["normal"].shape
    b = shape[0]
    ctx = pipe.blank_context(b)
    head = jnp.concatenate([lat["mask"]] + attr_groups, axis=-1)
    t0 = jnp.zeros((b,), jnp.int32)

    @jax.jit
    def enc(params):
        return pipe.dual.apply(params, head, t0, ctx, method="encode_attr")

    cd, cm = enc(pipe.dual_params)

    @jax.jit
    def x0_fn(params, x, t):
        tb = jnp.full((b,), t, jnp.int32)
        return pipe.dual.apply(params, x, tb, ctx, cd, cm,
                               method="image_stream_with_residuals"
                               ).astype(jnp.float32)

    ts = np.asarray(inference_timesteps(cfg.diffusion.num_train_timesteps,
                                        args.steps))
    ts_next = np.concatenate([ts[1:], [0]]).astype(np.int32)
    noise = jax.random.normal(k_noise, shape, jnp.float32)

    trace = {"ckpt": args.ckpt, "steps": int(args.steps), "rows": []}

    def psnr_dec(z):
        a = (np.clip(np.asarray(pipe.decode_latents(z)), -1, 1) + 1) / 2
        return float(M.psnr(a, gt01))

    for variant in ("full", "no_corrector"):
        x = noise
        st = UniPCState.init(x.shape, x.dtype)
        print(f"--- {variant} ---", flush=True)
        for i, (t, tn) in enumerate(zip(ts, ts_next)):
            x0p = x0_fn(pipe.dual_params, x, int(t))
            if variant == "no_corrector":
                # predictor-only (UniP): the order-2 bh2 predictor with
                # real history, NO corrector pass
                from unirenderer_tpu.diffusion.samplers import \
                    _uni_bh2_update
                use2 = jnp.asarray((i >= 1) and (i != len(ts) - 1))
                x = _uni_bh2_update(pipe.schedule, x, x0p,
                                    jnp.int32(int(t)), jnp.int32(int(tn)),
                                    st.m0, st.t0, use2, corrector_mt=None)
                st = UniPCState(m0=x0p, m1=st.m0, t0=jnp.int32(int(t)),
                                t1=st.t0, last_sample=x, step=st.step + 1)
            else:
                st, x = unipc_step(pipe.schedule, st, x, x0p, int(t),
                                   int(tn), i == len(ts) - 1)
            row = dict(i=i, t=int(t),
                       x_norm=float(jnp.sqrt(jnp.mean(x * x))),
                       x0_norm=float(jnp.sqrt(jnp.mean(x0p * x0p))),
                       x0_psnr=psnr_dec(x0p))
            trace["rows"].append({**row, "variant": variant})
            print(row, flush=True)
        final_psnr = psnr_dec(x)
        trace[f"final_psnr_{variant}"] = final_psnr
        print(variant, "final", final_psnr, flush=True)

    with open(args.out, "w") as f:
        json.dump(trace, f, indent=2)
    print(json.dumps({k: v for k, v in trace.items() if k != "rows"}))


if __name__ == "__main__":
    main()
