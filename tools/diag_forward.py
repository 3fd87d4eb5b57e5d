#!/usr/bin/env python
"""Forward-rendering failure diagnostic (round 5).

QUALITY_r05 landed forward PSNR 7.04 ~= the 6.25 random baseline while the
inverse maps are far above random and the TRAINING image loss is tiny
(0.003-0.004 x0-MSE at 90k steps).  That combination points at a
train/inference mismatch rather than a model-capacity problem.  This script
separates the candidate failure points on a held-out batch:

  vae_recon        decode(encode(GT image))           -> VAE ceiling
  onestep_t999     decode(x0_pred(pure noise, t=999)) -> conditioning power:
                   the model is x0-prediction, so its FIRST estimate from
                   pure noise is already a full image prediction
  onestep_t500/200 decode(x0_pred(noisy GT, t))       -> mid-SNR denoising
  unipc20/100      the shipped sampler                 -> integration quality
  ddim20/100       the simplest exact x0 sampler       -> sampler cross-check

If onestep_t999 >> unipc20 the sampler integration is the bug; if
onestep_t999 is also ~7dB the forward conditioning path is the bug
(training objective / layout / VAE treatment), and more training of the
same recipe will not fix it.
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
    ap.add_argument("--ckpt", required=True, help="dual params npz")
    ap.add_argument("--vae-ckpt", required=True, help="vae params npz")
    ap.add_argument("--config", default="small")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--out", default="/tmp/diag_forward.json")
    ap.add_argument("--dump", default="", help="dir for PNG dumps")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from unirenderer_tpu.utils.runtime import setup_runtime
    setup_runtime()

    from unirenderer_tpu.core import config
    from unirenderer_tpu.core.checkpoint import load_params_npz
    from unirenderer_tpu.data.objaverse import ObjaverseDataTest, collate_render
    from unirenderer_tpu.eval import metrics as M
    from unirenderer_tpu.pipelines import UniRendererPipeline, FORWARD_RENDER

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

    # ---- assemble the exact forward-mode latents eval_quality feeds ----
    mask01 = jnp.clip(batch["mask"] * 0.5 + 0.5, 0, 1)[..., :1]
    m = jnp.reshape(batch["metallic"], (-1, 1, 1, 1)) * mask01
    r = jnp.reshape(batch["roughness"], (-1, 1, 1, 1)) * mask01
    maps = dict(normal=batch["normal"], albedo=batch["albedo"],
                spec_light=batch["spec_light"], diff_light=batch["diff_light"],
                env=batch["env"], mask=batch["mask"],
                material=jnp.concatenate([m, m, r], -1) * 2.0 - 1.0,
                image=batch["image"])
    lat = pipe._encode_maps(maps, k_enc)
    attr_groups = jnp.stack([lat["material"], lat["normal"], lat["albedo"],
                             lat["spec_light"], lat["diff_light"], lat["env"]])
    shape = lat["normal"].shape
    b = shape[0]
    ctx = pipe.blank_context(b)

    # The TRAINING ctx constant: trainer.py seeds its text encoder from
    # key(cfg.train.seed) with a 4-WAY split (k3 = third of four), while
    # UniRendererPipeline.create uses key(0) with a 3-way split — a
    # different random text encoder, hence a DIFFERENT blank-prompt ctx
    # than the one the model saw for all 90k training steps.
    from unirenderer_tpu.models.clip_text import blank_ids, init_text_encoder
    _, _, k3t, _ = jax.random.split(jax.random.key(cfg.train.seed), 4)
    text_t, text_t_params = init_text_encoder(cfg.text, k3t,
                                              dtype=jnp.float32)
    ctx_train1 = jax.jit(lambda p: text_t.apply(p, blank_ids(cfg.text)))(
        text_t_params)
    ctx_train = jnp.broadcast_to(ctx_train1, (b,) + ctx_train1.shape[1:])

    report = {"ckpt": args.ckpt, "n": args.n}

    def psnr_of(img_m11):
        a = (np.clip(np.asarray(img_m11), -1, 1) + 1) / 2
        return float(M.psnr(a, gt01))

    # 0) VAE ceiling
    recon = pipe.decode_latents(lat["image"])
    report["vae_recon"] = psnr_of(recon)
    print("vae_recon", report["vae_recon"], flush=True)

    # shared attr encoding at t_attr = 0 (the forward conditioning)
    head = jnp.concatenate([lat["mask"]] + [attr_groups[i] for i in range(6)],
                           axis=-1)
    t0 = jnp.zeros((b,), jnp.int32)

    @jax.jit
    def x0_pred(params, img_lat, t, c):
        cd, cm = pipe.dual.apply(params, head, t0, c, method="encode_attr")
        tb = jnp.full((b,), t, jnp.int32)
        return pipe.dual.apply(params, img_lat, tb, c, cd, cm,
                               method="image_stream_with_residuals")

    noise = jax.random.normal(k_noise, shape, jnp.float32)
    dumps = {}

    # 1) one-step x0 from pure noise at t=999, under BOTH ctx constants
    for cname, c in (("evalctx", ctx), ("trainctx", ctx_train)):
        p = x0_pred(pipe.dual_params, noise, 999, c)
        key = f"onestep_t999_pure_noise_{cname}"
        report[key] = psnr_of(pipe.decode_latents(p))
        print(key, report[key], flush=True)
        dumps[f"onestep_{cname}"] = np.asarray(pipe.decode_latents(p))

    # 2) one-step x0 from NOISED GT latent at several t
    for t in (999, 700, 500, 200):
        noisy = pipe.schedule.add_noise(lat["image"], noise,
                                        jnp.full((b,), t, jnp.int32))
        for cname, c in (("evalctx", ctx), ("trainctx", ctx_train)):
            p = x0_pred(pipe.dual_params, noisy, t, c)
            key = f"onestep_t{t}_noised_gt_{cname}"
            report[key] = psnr_of(pipe.decode_latents(p))
            print(key, report[key], flush=True)

    # 3) full samplers: the shipped UniPC scan, and a DDIM loop over the
    # SAME hoisted x0 predictor (ddim_step is exact for x0 prediction, so
    # it cleanly separates "sampler integration bug" from "model bug")
    from unirenderer_tpu.diffusion.samplers import ddim_step
    from unirenderer_tpu.diffusion.schedule import inference_timesteps

    for cname, c in (("evalctx", ctx), ("trainctx", ctx_train)):
        for steps in (20, 100):
            img_lat, _ = pipe._sample(FORWARD_RENDER, noise, attr_groups,
                                      lat["mask"], c, steps)
            out = pipe.decode_latents(img_lat)
            key = f"unipc{steps}_{cname}"
            report[key] = psnr_of(out)
            print(key, report[key], flush=True)
            dumps[key] = np.asarray(out)

    @jax.jit
    def ddim_run(params, x, c, n_steps: int = 20):
        ts = inference_timesteps(cfg.diffusion.num_train_timesteps, n_steps)
        ts_next = jnp.concatenate([ts[1:], -jnp.ones((1,), jnp.int32)])
        cd, cm = pipe.dual.apply(params, head, t0, c, method="encode_attr")

        def body(xc, tt):
            t, tn = tt
            tb = jnp.full((b,), t, jnp.int32)
            x0 = pipe.dual.apply(params, xc, tb, c, cd, cm,
                                 method="image_stream_with_residuals")
            return ddim_step(pipe.schedule, xc, x0.astype(jnp.float32),
                             t, tn), None

        xf, _ = jax.lax.scan(body, x, (ts, ts_next))
        return xf

    for cname, c in (("evalctx", ctx), ("trainctx", ctx_train)):
        out = pipe.decode_latents(ddim_run(pipe.dual_params, noise, c))
        key = f"ddim20_{cname}"
        report[key] = psnr_of(out)
        print(key, report[key], flush=True)
        dumps[key] = np.asarray(out)

    if args.dump:
        os.makedirs(args.dump, exist_ok=True)
        try:
            from PIL import Image
            rows = [np.concatenate(list(gt01 * 2 - 1), axis=1)]
            names = ["gt"] + list(dumps)
            rows += [np.concatenate(list(v), axis=1) for v in dumps.values()]
            grid = np.concatenate(rows, axis=0)
            g8 = (np.clip((grid + 1) / 2, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(g8).save(os.path.join(args.dump, "diag.png"))
            print("rows:", names)
        except Exception as e:  # pillow optional
            print("dump failed:", e)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
