#!/usr/bin/env python
"""Bisect pipe._sample (9.2dB) vs hand loop (24.4dB) on identical inputs."""
from __future__ import annotations

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
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
    from unirenderer_tpu.pipelines import FORWARD_RENDER, UniRendererPipeline

    cfg = config.small()
    res = cfg.vae.sample_size
    pipe = UniRendererPipeline.create(cfg, jax.random.key(0),
                                      dtype=jnp.float32)
    dp, _ = load_params_npz("artifacts/r05/dual_small.npz")
    pipe.dual_params = jax.tree.map(jnp.asarray, dp)
    vp, _ = load_params_npz("artifacts/r04/vae_small.npz")
    pipe.vae_params = jax.tree.map(jnp.asarray, vp)

    meshes = sorted(glob.glob("/tmp/q6/test/meshes/*.npz"))
    envs = sorted(d for d in glob.glob("/tmp/q6/test/envs/*")
                  if os.path.isdir(d))
    ds = ObjaverseDataTest(cfg.data, meshes, envs, seed=1234)
    items = [ds[i] for i in range(2)]
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
    groups = [lat["material"], lat["normal"], lat["albedo"],
              lat["spec_light"], lat["diff_light"], lat["env"]]
    attr_groups = jnp.stack(groups)
    shape = lat["normal"].shape
    b = shape[0]
    ctx = pipe.blank_context(b)
    head = jnp.concatenate([lat["mask"]] + groups, axis=-1)
    t0 = jnp.zeros((b,), jnp.int32)
    noise = jax.random.normal(k_noise, shape, jnp.float32)

    def psnr_dec(z):
        a = (np.clip(np.asarray(pipe.decode_latents(z)), -1, 1) + 1) / 2
        return float(M.psnr(a, gt01))

    # (a) pipeline path
    xa, _ = pipe._sample(FORWARD_RENDER, noise, attr_groups, lat["mask"],
                         ctx, 20)
    print("A pipe._sample     psnr", psnr_dec(xa), flush=True)

    # (b) jitted scan clone of the hand loop
    @jax.jit
    def scan_clone(params, x0noise):
        cd, cm = pipe.dual.apply(params, head, t0, ctx,
                                 method="encode_attr")
        ts = inference_timesteps(cfg.diffusion.num_train_timesteps, 20)
        ts_next = jnp.concatenate([ts[1:], jnp.zeros((1,), jnp.int32)])
        is_final = jnp.arange(20) == 19
        st = UniPCState.init(x0noise.shape, x0noise.dtype)

        def body(carry, tt):
            x, s = carry
            t, tn, fin = tt
            tb = jnp.full((b,), t, jnp.int32)
            x0 = pipe.dual.apply(params, x, tb, ctx, cd, cm,
                                 method="image_stream_with_residuals"
                                 ).astype(jnp.float32)
            s, x = unipc_step(pipe.schedule, s, x, x0, t, tn, fin)
            return (x, s), None

        (x, _), _ = jax.lax.scan(body, (x0noise, st),
                                 (ts, ts_next, is_final))
        return x

    xb = scan_clone(pipe.dual_params, noise)
    print("B scan clone       psnr", psnr_dec(xb), flush=True)
    print("A-B max abs diff", float(jnp.abs(xa - xb).max()), flush=True)

    # (c) python loop (known good, 24.4dB)
    cd, cm = jax.jit(lambda p: pipe.dual.apply(
        p, head, t0, ctx, method="encode_attr"))(pipe.dual_params)

    @jax.jit
    def x0_fn(params, x, t):
        tb = jnp.full((b,), t, jnp.int32)
        return pipe.dual.apply(params, x, tb, ctx, cd, cm,
                               method="image_stream_with_residuals"
                               ).astype(jnp.float32)

    ts = np.asarray(inference_timesteps(cfg.diffusion.num_train_timesteps,
                                        20))
    ts_next = np.concatenate([ts[1:], [0]]).astype(np.int32)
    x = noise
    st = UniPCState.init(x.shape, x.dtype)
    for i, (t, tn) in enumerate(zip(ts, ts_next)):
        x0p = x0_fn(pipe.dual_params, x, int(t))
        st, x = unipc_step(pipe.schedule, st, x, x0p, int(t), int(tn),
                           i == 19)
    print("C python loop      psnr", psnr_dec(x), flush=True)
    print("B-C max abs diff", float(jnp.abs(xb - x).max()), flush=True)


if __name__ == "__main__":
    main()
