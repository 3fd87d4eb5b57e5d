#!/usr/bin/env python
"""Training-step throughput on the real TPU chip (flagship 512^2 config,
bf16 compute / f32 params, full dual-schedule step incl. VAE encodes,
cycle pass and optimizer).  Validates the flash-attention BACKWARD path
in context and records samples/sec/chip for training.

Relay-honest timing: state threads through the chained steps (serialized
by construction), fresh salted batches, np.asarray fence, phantom filter.

Usage: python tools/bench_train.py [--batch 4] [--iters 4]
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--no-flash", action="store_true")
    ap.add_argument("--render-in-step", action="store_true",
                    help="bench the FUSED regime: rasterize+shade 512^2 "
                         "(SSAA) inside the train step (the reference's "
                         "in-loop render, train/train.py:184-439) — scene "
                         "tensors in, one XLA program per step")
    ap.add_argument("--optimizer", choices=("adamw", "adafactor"),
                    default="adamw",
                    help="adamw = reference parity but its f32 state is "
                         "20.9GB for the 1.74B-param flagship (> one "
                         "16GB v5e); adafactor = factored second moments, "
                         "the single-chip-trainable configuration")
    ap.add_argument("--grad-dtype", choices=("float32", "bfloat16"),
                    default="float32",
                    help="bfloat16 halves the weight-grad tree liveness "
                         "(7.0GB -> 3.5GB for the flagship) — required to "
                         "fit the 512^2 train step on one 16GB v5e "
                         "(f32 grads measured 17.25G at batch 2)")
    ap.add_argument("--two-phase", action="store_true",
                    help="run the step as two jitted programs (grads | "
                         "optimizer update) — same numerics, one extra "
                         "dispatch; sidesteps the fused program's 35%% "
                         "allocator fragmentation (3.26G at flagship "
                         "512^2 b1) that OOMs the single chip")
    ap.add_argument("--max-grad-norm", type=float, default=1.0,
                    help="<=0 disables global-norm clipping — removes the "
                         "all-leaves-live barrier at the clip's global "
                         "reduce (adafactor keeps its own per-update "
                         "clipping_threshold, the T5/PaLM recipe)")
    args = ap.parse_args(argv)

    # Training defaults to the Pallas flash kernel where it tiles: the
    # serving-tuned `auto` routing picks xla_dpa at S4096/D40, which
    # materializes f32 (B,H,4096,4096) score matrices — 2.1GB each in the
    # flagship 512^2 BACKWARD pass, a guaranteed HBM OOM at batch 4
    # (measured round 5: 21.2G requested vs 15.75G).  Flash's custom VJP
    # never materializes scores.  Override via UNIRENDER_ATTN as usual.
    os.environ.setdefault("UNIRENDER_ATTN", "flash")

    import jax
    if os.environ.get("UNIRENDER_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["UNIRENDER_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from unirenderer_tpu.core import config
    from unirenderer_tpu.diffusion.schedule import DiffusionSchedule
    from unirenderer_tpu.models.dual_stream import DualStreamModel
    from unirenderer_tpu.models.vae import AutoencoderKL
    from unirenderer_tpu.train.train_step import (
        BATCH_KEYS, create_train_state, make_train_step,
    )
    from unirenderer_tpu.utils.fast_init import shape_init

    base = config.flagship()
    cfg = dataclasses.replace(
        base,
        unet=dataclasses.replace(base.unet,
                                 use_flash_attention=not args.no_flash),
        train=dataclasses.replace(base.train, optimizer=args.optimizer,
                                  grad_dtype=args.grad_dtype,
                                  max_grad_norm=args.max_grad_norm))

    dual = DualStreamModel(cfg.unet, jnp.bfloat16)
    vae = AutoencoderKL(cfg.vae, jnp.bfloat16)
    s = cfg.unet.sample_size
    img = jnp.zeros((1, s, s, 4))
    attr = jnp.zeros((1, s, s, cfg.unet.attr_channels))
    tt = jnp.zeros((1,), jnp.int32)
    ctx0 = jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim))
    dual_params = shape_init(
        lambda: dual.init(jax.random.key(0), img, attr, tt, tt, ctx0),
        fill="scaled_normal")
    vae_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        shape_init(lambda: vae.init(
            jax.random.key(0),
            jnp.zeros((1, cfg.vae.sample_size, cfg.vae.sample_size, 3)),
            jax.random.key(1)), fill="scaled_normal"))

    schedule = DiffusionSchedule.create(cfg.diffusion)
    b, hw = args.batch, cfg.vae.sample_size
    ctx = jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim))

    if args.render_in_step:
        # the reference's actual regime: render the supervision maps INSIDE
        # the hot loop (train/train.py:184-439) — here fused into the same
        # XLA program as the model step (train_step.make_render_train_step)
        import random as _random

        from unirenderer_tpu.data.objaverse import (
            material_grid, pad_mesh, stack_scene,
        )
        from unirenderer_tpu.render.mesh import make_sphere
        from unirenderer_tpu.train.train_step import make_render_train_step

        sphere = make_sphere(90)     # 32.4k tris ~ the 32768 t_pad budget
        mesh_np = pad_mesh(
            {"v_pos": np.asarray(sphere.v_pos),
             "t_idx": np.asarray(sphere.t_pos_idx),
             "v_nrm": np.asarray(sphere.v_nrm),
             "v_tex": np.asarray(sphere.v_tex),
             "v_tng": np.asarray(sphere.v_tng)},
            cfg.data.v_pad, cfg.data.t_pad)
        tr = cfg.data.texture_res
        prng = _random.Random(0)
        grid = material_grid(cfg.data.material_grid)
        env = {"diffuse": np.full((6, 16, 16, 3), 0.4, np.float32)}
        res_l, lvl = 64, 0
        while res_l >= 8:
            env[f"specular_{lvl}"] = np.full((6, res_l, res_l, 3),
                                             0.6, np.float32)
            res_l //= 2
            lvl += 1

        def make_batch():
            salt = int(time.perf_counter_ns()) % (2 ** 31)
            items = []
            for i in range(b):
                mm, rr = prng.choice(grid)
                kd = np.asarray(
                    np.random.default_rng(salt + i).uniform(
                        0.2, 0.9, (tr, tr, 3)), np.float32)
                items.append(dict(
                    mesh={**mesh_np, "kd_tex": kd}, env=env,
                    metallic=mm, roughness=rr,
                    azimuth=prng.uniform(0, 360),
                    elevation=prng.uniform(60, 120),
                    distance=cfg.data.camera_distance))
            return stack_scene(items)

        raw_step = make_render_train_step(cfg, dual, vae, schedule)
        metric_name = "render_train_step_ms_512_flagship"
    else:
        def make_batch():
            salt = int(time.perf_counter_ns()) % (2 ** 31)
            ks = jax.random.split(jax.random.key(salt), len(BATCH_KEYS))
            return {k: 0.5 * jax.random.normal(ks[i], (b, hw, hw, 3))
                    for i, k in enumerate(BATCH_KEYS)}

        raw_step = make_train_step(cfg, dual, vae, schedule)
        metric_name = "train_step_ms_512_flagship"

    if args.two_phase:
        from unirenderer_tpu.train.train_step import make_two_phase_train_step
        bt = None
        if args.render_in_step:
            from unirenderer_tpu.data.objaverse import collate_from_scene

            def bt(scene):
                full = collate_from_scene(scene, cfg.data.resolution,
                                          ssaa=cfg.data.ssaa, bg=1.0)
                return {k: full[k] for k in BATCH_KEYS}
        g_raw, u_raw = make_two_phase_train_step(cfg, dual, vae, schedule,
                                                 batch_transform=bt)
        g_fn = jax.jit(g_raw)
        u_fn = jax.jit(u_raw, donate_argnums=(0, 1))

        def step_fn(state, vp, c, batch, rng):
            grads, metrics = g_fn(state.params, vp, c, batch, rng,
                                  state.step)
            return u_fn(state, grads), metrics
    else:
        step_fn = jax.jit(raw_step, donate_argnums=(0,))
    state = create_train_state(cfg, dual_params)

    rng = jax.random.key(0)
    t0 = time.time()
    state, metrics = step_fn(state, vae_params, ctx, make_batch(), rng)
    np.asarray(metrics["loss"])
    compile_s = time.time() - t0

    times = []
    for _ in range(10):
        batch = make_batch()
        # fence: batch materialised on host before the clock starts
        np.asarray(jax.tree_util.tree_leaves(batch)[0]).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = step_fn(state, vae_params, ctx, batch, rng)
        loss = float(np.asarray(metrics["loss"]))
        ms = (time.perf_counter() - t0) * 1000.0 / args.iters
        if ms > 10.0:
            times.append(ms)
        if len(times) >= 3:
            break
    ms = sorted(times)[len(times) // 2] if times else float("nan")
    try:   # peak HBM if the backend exposes it (the axon relay may not)
        stats = jax.local_devices()[0].memory_stats() or {}
        peak_hbm_gb = round(stats.get("peak_bytes_in_use", 0) / 1e9, 2)
    except Exception:
        peak_hbm_gb = None
    print(json.dumps({
        "metric": metric_name,
        "value": round(ms, 1),
        "samples_per_sec_per_chip": round(b / (ms / 1000.0), 3),
        "batch": b, "flash": not args.no_flash,
        "optimizer": args.optimizer, "grad_dtype": args.grad_dtype,
        "max_grad_norm": args.max_grad_norm, "two_phase": args.two_phase,
        "compile_s": round(compile_s, 1), "last_loss": round(loss, 4),
        "peak_hbm_gb": peak_hbm_gb,
    }))


if __name__ == "__main__":
    main()
