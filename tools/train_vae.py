#!/usr/bin/env python
"""VAE pre-training CLI.  The reference never trains its VAE — it downloads
SD-v1.4's AutoencoderKL (train/train.py:954-961); zero-egress deployments
train one here instead, then pass --vae-ckpt to tools/train.py /
tools/eval_quality.py so the diffusion stack runs on a real autoencoder.

Usage:
  python tools/train_vae.py --workdir runs/vae --synthetic --tiny --steps 50
  python tools/train_vae.py --workdir runs/vae --mesh-dir D/meshes \
      --env-dir D/envs --steps 20000 [--config small] [--batch 8]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--mesh-dir")
    ap.add_argument("--env-dir")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=4,
                    help="scenes per batch (x8 modality maps = VAE batch)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr-schedule", choices=("constant", "cosine"),
                    default="constant")
    ap.add_argument("--lr-warmup", type=int, default=500)
    ap.add_argument("--kl-weight", type=float, default=1e-6)
    ap.add_argument("--config", choices=("tiny", "small", "medium", "flagship"),
                    default="flagship")
    ap.add_argument("--tiny", action="store_true",
                    help="alias for --config tiny")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--resolution", type=int)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cache-batches", type=int,
                    help="pre-render N batches once and train from the "
                         "host-RAM pool (fast path for finite synthetic "
                         "distributions)")
    ap.add_argument("--cache-dir",
                    help="persist/reuse the pre-rendered pool here")
    ap.add_argument("--init-params",
                    help="warm-start from a .npz params export "
                         "(tools/export_params.py) instead of random init; "
                         "an existing workdir checkpoint still wins")
    ap.add_argument("--scene-bank", action="store_true",
                    help="device-resident scene bank: render fresh random "
                         "scenes INSIDE the jitted step (zero per-step host "
                         "IO, infinite effective dataset) instead of the "
                         "host collate/cache pool")
    ap.add_argument("--no-augment", action="store_true",
                    help="disable the scene-bank augmentations")
    args = ap.parse_args(argv)
    if args.scene_bank and (args.synthetic or args.cache_batches):
        ap.error("--scene-bank excludes --synthetic/--cache-batches "
                 "(it samples fresh scenes from the device bank)")

    import jax

    from unirenderer_tpu.utils.runtime import setup_runtime
    setup_runtime()
    import jax.numpy as jnp

    from unirenderer_tpu.core import config
    from unirenderer_tpu.train.trainer import synthetic_batches
    from unirenderer_tpu.train.vae_train import train_vae

    name = "tiny" if args.tiny else args.config
    cfg = getattr(config, name)()
    res = args.resolution or cfg.vae.sample_size

    bank = None
    if args.scene_bank:
        from unirenderer_tpu.data.scene_bank import load_scene_bank
        if args.resolution:
            import dataclasses
            cfg = dataclasses.replace(
                cfg, data=dataclasses.replace(cfg.data,
                                              resolution=args.resolution))
        bank = load_scene_bank(args.mesh_dir, args.env_dir, cfg.data)
        n_m, n_e = bank["v_pos"].shape[0], bank["diffuse"].shape[0]
        mb = sum(a.nbytes for a in bank.values()) / 1e6
        print(f"[vae] scene bank: {n_m} meshes, {n_e} envs, {mb:.0f} MB "
              f"device-resident", flush=True)
        batches = iter(())
    elif args.synthetic:
        batches = synthetic_batches(cfg, args.batch, seed=args.seed)
    else:
        from unirenderer_tpu.data.input_pipeline import input_pipeline
        from unirenderer_tpu.data.objaverse import (
            ObjaverseData, collate_render,
        )
        meshes = sorted(glob.glob(os.path.join(args.mesh_dir, "*.npz")))
        envs = sorted(d for d in glob.glob(os.path.join(args.env_dir, "*"))
                      if os.path.isdir(d))
        assert meshes and envs, "no preprocessed meshes/envs found"
        ds = ObjaverseData(cfg.data, meshes, envs)
        batches = input_pipeline(
            ds, args.batch,
            collate=lambda items: collate_render(
                items, resolution=res, ssaa=cfg.data.ssaa),
            process_index=jax.process_index(),
            process_count=jax.process_count())

    if args.cache_batches:
        from unirenderer_tpu.data.input_pipeline import cached_batch_source
        batches = cached_batch_source(batches, args.cache_batches,
                                      cache_dir=args.cache_dir,
                                      seed=args.seed,
                                      expect_batch=args.batch,
                                      expect_resolution=res)

    state = train_vae(cfg, batches, args.workdir, args.steps, lr=args.lr,
                      kl_weight=args.kl_weight, seed=args.seed,
                      dtype=jnp.float32, lr_schedule=args.lr_schedule,
                      lr_warmup=args.lr_warmup,
                      init_params=args.init_params or "",
                      scene_bank=bank, bank_batch=args.batch,
                      augment=not args.no_augment)
    print(f"finished at step {int(jax.device_get(state.step))} "
          f"(target {args.steps}); "
          f"checkpoints in {args.workdir}/vae_checkpoints")


if __name__ == "__main__":
    main()
