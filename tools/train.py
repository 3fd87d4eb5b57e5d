#!/usr/bin/env python
"""Training CLI — the reference's `bash train/train.sh` ->
`accelerate launch train/train.py` entry (SURVEY C8), as one flag-light
command over the typed config (no accelerate YAML topology matrix: the
mesh is discovered from jax.devices()).

Usage:
  # real data (preprocessed by tools/obj2mesh.py + tools/light2map.py):
  python tools/train.py --workdir runs/exp1 --mesh-dir data/meshes \
      --env-dir data/envs [--steps N] [--batch-per-device 2] [--fsdp]

  # synthetic smoke (no data needed):
  python tools/train.py --workdir runs/smoke --synthetic --tiny --steps 10
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--mesh-dir")
    ap.add_argument("--env-dir")
    ap.add_argument("--steps", type=int)
    ap.add_argument("--batch-per-device", type=int)
    ap.add_argument("--lr", type=float)
    ap.add_argument("--lr-schedule", choices=("constant", "cosine"))
    ap.add_argument("--lr-warmup", type=int,
                    help="warmup steps (0 = none)")
    ap.add_argument("--lr-decay-steps", type=int,
                    help="cosine horizon; defaults to --steps")
    ap.add_argument("--optimizer", choices=("adamw", "adafactor"),
                    help="adamw (default, reference parity) or adafactor "
                         "(factored second moments — fits the flagship on "
                         "a single 16GB chip; see core/config.TrainConfig)")
    ap.add_argument("--checkpoint-every", type=int,
                    help="steps between checkpoint saves (each save is a "
                    "full-state host transfer — the riskiest RPC through "
                    "the relay; see PERF.md wedge notes)")
    ap.add_argument("--fsdp", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--config", choices=("tiny", "small", "medium", "flagship"),
                    default="flagship")
    ap.add_argument("--tiny", action="store_true",
                    help="alias for --config tiny")
    ap.add_argument("--vae-ckpt",
                    help="frozen VAE from tools/train_vae.py "
                         "(<workdir>/vae_checkpoints, or a .npz export)")
    ap.add_argument("--init-params",
                    help="warm-start dual-stream params from a .npz export "
                         "(tools/export_params.py); optimizer starts fresh; "
                         "an orbax resume in --workdir still wins")
    ap.add_argument("--random-camera", action="store_true")
    ap.add_argument("--validation", action="store_true",
                    help="run the inverse pipeline on one held-out scene "
                         "every cfg.train.validation_every steps, write "
                         "maps + PSNRs under <workdir>/validation (the "
                         "reference's log_validation, train/train.py:1459)")
    ap.add_argument("--render-in-step", action="store_true",
                    help="fuse the render collate INTO the jitted train "
                         "step (the reference's in-loop 512^2 regime, "
                         "train/train.py:184-439, as one XLA program); "
                         "the input pipeline feeds raw scene tensors — "
                         "no per-batch host round trip of rendered maps")
    ap.add_argument("--scene-bank", action="store_true",
                    help="fresh-scenes training: load the WHOLE mesh/env "
                         "set into HBM once and sample+render a new random "
                         "batch inside the jitted step (zero per-step host "
                         "transfer; the fix for finite-pool overfitting — "
                         "see data/scene_bank.py)")
    ap.add_argument("--no-augment", action="store_true",
                    help="disable the scene-bank augmentations")
    ap.add_argument("--resolution", type=int,
                    help="render resolution (default: config's)")
    ap.add_argument("--cache-batches", type=int,
                    help="pre-render N batches once and train from the "
                         "host-RAM pool (fast path for finite synthetic "
                         "distributions)")
    ap.add_argument("--cache-dir",
                    help="persist/reuse the pre-rendered pool here")
    ap.add_argument("--report-to", default="jsonl",
                    help="comma list: jsonl,tensorboard (reference "
                         "--report_to, train/train.py:712-719)")
    ap.add_argument("--sd-unet", help="diffusers UNet state_dict (.bin)")
    ap.add_argument("--sd-vae", help="diffusers VAE state_dict (.bin)")
    ap.add_argument("--sd-text", help="CLIP text state_dict (.bin)")
    args = ap.parse_args(argv)

    if args.config == "flagship":
        # The serving-tuned `auto` attention routing materializes f32
        # (B,H,4096,4096) scores at the 64^2 level via xla_dpa — 2.1GB
        # each in the flagship backward, an HBM OOM at batch 4 (PERF.md
        # round 5).  Flash's custom VJP never materializes scores.
        os.environ.setdefault("UNIRENDER_ATTN", "flash")

    import jax

    from unirenderer_tpu.utils.runtime import setup_runtime
    setup_runtime()
    import jax.numpy as jnp

    from unirenderer_tpu.core import config
    from unirenderer_tpu.train.trainer import Trainer, synthetic_batches

    name = "tiny" if args.tiny else args.config
    cfg = getattr(config, name)()
    tr_over = {}
    if args.batch_per_device:
        tr_over["batch_size_per_device"] = args.batch_per_device
    if args.lr:
        tr_over["learning_rate"] = args.lr
    if args.lr_schedule:
        tr_over["lr_schedule"] = args.lr_schedule
        if args.lr_schedule == "cosine":
            tr_over["lr_decay_steps"] = (args.lr_decay_steps or args.steps
                                         or cfg.train.max_steps)
    if args.lr_warmup is not None:
        tr_over["lr_warmup_steps"] = args.lr_warmup
    if args.optimizer:
        tr_over["optimizer"] = args.optimizer
    if args.checkpoint_every:
        tr_over["checkpoint_every"] = args.checkpoint_every
    if tr_over:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **tr_over))
    if args.random_camera:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, random_camera=True))
    if args.resolution:   # the in-step render reads cfg.data.resolution
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          resolution=args.resolution))

    if args.render_in_step and (args.synthetic or args.cache_batches):
        ap.error("--render-in-step renders inside the train step; it "
                 "needs --mesh-dir/--env-dir and excludes --synthetic "
                 "and --cache-batches (the pre-rendered pool already "
                 "sidesteps per-step rendering)")
    if args.scene_bank and (args.synthetic or args.cache_batches
                            or args.render_in_step):
        ap.error("--scene-bank subsumes --render-in-step and excludes "
                 "--synthetic/--cache-batches (it samples fresh scenes "
                 "from the device-resident bank every step)")

    bank = None
    if args.scene_bank:
        from unirenderer_tpu.data.scene_bank import load_scene_bank
        bank = load_scene_bank(args.mesh_dir, args.env_dir, cfg.data)
        n_m = bank["v_pos"].shape[0]
        n_e = bank["diffuse"].shape[0]
        mb = sum(a.nbytes for a in bank.values()) / 1e6
        print(f"[train] scene bank: {n_m} meshes, {n_e} envs, {mb:.0f} MB "
              f"device-resident")

    trainer = Trainer(cfg, args.workdir, fsdp=args.fsdp,
                      dtype=jnp.bfloat16 if name == "flagship"
                      else jnp.float32,
                      report_to=tuple(args.report_to.split(",")),
                      render_in_step=args.render_in_step,
                      scene_bank=bank,
                      bank_augment=not args.no_augment)

    if args.vae_ckpt and args.vae_ckpt.endswith(".npz"):
        from unirenderer_tpu.core.checkpoint import load_params_npz
        vae_p, vstep = load_params_npz(args.vae_ckpt)
        trainer.install_vae(jax.tree.map(jnp.asarray, vae_p))
        print(f"[train] frozen VAE from {args.vae_ckpt} step {vstep}")
    elif args.vae_ckpt:
        from unirenderer_tpu.core.checkpoint import CheckpointManager
        vcm = CheckpointManager(args.vae_ckpt)
        vae_p = vcm.restore_params()
        assert vae_p is not None, f"no checkpoint under {args.vae_ckpt}"
        trainer.install_vae(jax.tree.map(jnp.asarray, vae_p))
        print(f"[train] frozen VAE from {args.vae_ckpt} "
              f"step {vcm.restored_step()}")

    if args.init_params:
        from unirenderer_tpu.core.checkpoint import load_params_npz
        dual_p, pstep = load_params_npz(args.init_params)
        trainer.install_dual(jax.tree.map(jnp.asarray, dual_p))
        print(f"[train] warm-start dual params from {args.init_params} "
              f"(exported at step {pstep})")

    # optional SD weight port (reference from_pretrained + surgery path)
    if args.sd_unet:
        if not (args.sd_vae and args.sd_text):
            ap.error("--sd-unet requires --sd-vae and --sd-text "
                     "(the port installs all three stacks together)")
        from unirenderer_tpu.models import surgery
        unet_sd = surgery.load_torch_state_dict(args.sd_unet)
        vae_sd = surgery.load_torch_state_dict(args.sd_vae)
        text_sd = surgery.load_torch_state_dict(args.sd_text)
        dual_p, vae_p, text_p = surgery.port_sd_checkpoint(
            unet_sd, vae_sd, text_sd, cfg)
        trainer.install_ported(dual_p, vae_p, text_p)

    n_dev = len(jax.devices())
    global_batch = cfg.train.batch_size_per_device * n_dev

    if args.scene_bank:
        batches = iter(())      # unused: the trainer feeds itself the bank
    elif args.synthetic:
        batches = synthetic_batches(cfg, global_batch)
    else:
        # async prefetched pipeline: render-collate runs in a background
        # thread and OVERLAPS the device train step — unlike the
        # reference's synchronous in-loop collate (train/train.py:1239,
        # the HOT-loop mistake SURVEY §3.1 flags)
        from unirenderer_tpu.data.input_pipeline import input_pipeline
        from unirenderer_tpu.data.objaverse import (
            ObjaverseData, collate_render, stack_scene,
        )
        meshes = sorted(glob.glob(os.path.join(args.mesh_dir, "*.npz")))
        envs = sorted(d for d in glob.glob(os.path.join(args.env_dir, "*"))
                      if os.path.isdir(d))
        assert meshes and envs, "no preprocessed meshes/envs found"
        ds = ObjaverseData(cfg.data, meshes, envs)
        if args.render_in_step:
            collate = stack_scene              # raw tensors; render in-step
        else:
            collate = lambda items: collate_render(
                items, resolution=args.resolution or cfg.data.resolution,
                ssaa=cfg.data.ssaa)
        batches = input_pipeline(
            ds, global_batch, collate=collate,
            process_index=jax.process_index(),
            process_count=jax.process_count())

    if args.cache_batches:
        from unirenderer_tpu.data.input_pipeline import cached_batch_source
        batches = cached_batch_source(
            batches, args.cache_batches, cache_dir=args.cache_dir,
            expect_batch=global_batch,
            expect_resolution=args.resolution or cfg.data.resolution)

    validation_fn = None
    if args.validation:
        # the reference's --validation_steps -> log_validation flow
        # (train/train.py:1459-1475; broken there — a NameError).  The
        # pipeline SHARES the trainer's modules/params: no re-init (the
        # flagship init-on-TPU trap), no extra HBM copies of VAE/text.
        from unirenderer_tpu.data.objaverse import collate_render
        from unirenderer_tpu.eval.validation import make_validation_fn
        from unirenderer_tpu.pipelines import UniRendererPipeline

        pipe = UniRendererPipeline(
            cfg, trainer.dual, trainer.state.params, trainer.vae,
            trainer.vae_params, trainer.text, trainer.text_params)
        if args.synthetic:
            val_batch = next(synthetic_batches(cfg, 1, seed=999))
        else:
            from unirenderer_tpu.data.objaverse import ObjaverseDataTest
            if args.scene_bank:     # pipeline branch didn't run
                meshes = sorted(glob.glob(
                    os.path.join(args.mesh_dir, "*.npz")))
                envs = sorted(
                    d for d in glob.glob(os.path.join(args.env_dir, "*"))
                    if os.path.isdir(d))
            vds = ObjaverseDataTest(cfg.data, meshes, envs, seed=4321)
            val_batch = collate_render(
                [vds[0]], resolution=args.resolution
                or cfg.data.resolution, ssaa=cfg.data.ssaa)
        validation_fn = make_validation_fn(
            pipe, val_batch, os.path.join(args.workdir, "validation"),
            num_steps=10, ensemble=1, logger=trainer.logger)

    state = trainer.train(batches, max_steps=args.steps,
                          validation_fn=validation_fn)
    print(f"finished at step {int(jax.device_get(state.step))}; "
          f"checkpoints in {args.workdir}/checkpoints")


if __name__ == "__main__":
    main()
