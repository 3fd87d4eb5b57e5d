"""The training driver — reference train/train.py main() (SURVEY C8),
re-built around one pjit'd step.

Loop shape (reference :1234-1482): per step render-collate a batch (L3),
run the dual-schedule train step, log scalars, checkpoint with rotation,
periodically run a validation inverse-rendering pass (the reference calls a
`log_validation` that is never imported — a NameError bug; here it exists).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unirenderer_tpu.core.checkpoint import AsyncSaver, CheckpointManager
from unirenderer_tpu.core.config import SystemConfig
from unirenderer_tpu.core.debug import AnomalyGuard
from unirenderer_tpu.core.tracing import MetricLogger, PhaseTimer
from unirenderer_tpu.diffusion.schedule import DiffusionSchedule
from unirenderer_tpu.models.clip_text import blank_ids, init_text_encoder
from unirenderer_tpu.models.dual_stream import init_dual_stream
from unirenderer_tpu.models.vae import init_vae
from unirenderer_tpu.parallel import mesh as pmesh
from unirenderer_tpu.train.train_step import (
    BATCH_KEYS, TrainState, create_train_state, make_train_step,
)


class Trainer:
    """Owns models, state, sharding and the step loop."""

    def __init__(self, cfg: SystemConfig, workdir: str,
                 n_devices: Optional[int] = None, fsdp: bool = False,
                 dtype=jnp.bfloat16, report_to: tuple = ("jsonl",),
                 render_in_step: bool = False, scene_bank=None,
                 bank_augment: bool = True):
        self.cfg = cfg
        self.workdir = workdir
        self.render_in_step = render_in_step
        self.scene_bank = scene_bank
        os.makedirs(workdir, exist_ok=True)
        rng = jax.random.key(cfg.train.seed)
        k1, k2, k3, self._rng = jax.random.split(rng, 4)

        self.dual, dual_params = init_dual_stream(
            cfg.unet, k1, ctx_len=cfg.text.max_length, dtype=dtype)
        self.vae, self.vae_params = init_vae(cfg.vae, k2, dtype=dtype)
        self.text, self.text_params = init_text_encoder(
            cfg.text, k3, dtype=dtype)
        # constant ' ' prompt context, cached once (train/train.py:1254)
        self.ctx = self._blank_ctx(self.text_params)

        self.schedule = DiffusionSchedule.create(cfg.diffusion)
        self.mesh = pmesh.make_mesh(n_devices)
        if scene_bank is not None:
            # fresh-scenes training from a device-resident bank: sample +
            # render + train as ONE program; only (state, rng) vary per
            # step — zero host transfer (train_step.make_bank_train_step)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from unirenderer_tpu.train.train_step import (
                make_bank_train_step,
            )
            gbatch = cfg.train.batch_size_per_device * self.mesh.size
            dsh = NamedSharding(self.mesh, P("data"))
            constraint = (
                (lambda scene: jax.lax.with_sharding_constraint(
                    scene, jax.tree.map(lambda _: dsh, scene)))
                if self.mesh.size > 1 else None)
            step_fn = make_bank_train_step(
                cfg, self.dual, self.vae, self.schedule, gbatch,
                augment=bank_augment, scene_constraint=constraint)
        elif render_in_step:
            # the reference's in-loop render regime as ONE fused program
            # (train_step.make_render_train_step); batches are raw SCENE
            # pytrees (data/objaverse.stack_scene)
            from unirenderer_tpu.train.train_step import (
                make_render_train_step,
            )
            step_fn = make_render_train_step(cfg, self.dual, self.vae,
                                             self.schedule)
        else:
            step_fn = make_train_step(cfg, self.dual, self.vae,
                                      self.schedule)
        self.state = create_train_state(cfg, dual_params)
        self._step = pmesh.make_sharded_train_step(
            step_fn, self.mesh, fsdp=fsdp,
            state=self.state if fsdp else None,
            replicate_batch=scene_bank is not None)

        self.state = pmesh.replicate(self.state, self.mesh)
        self.vae_params_r = pmesh.replicate(self.vae_params, self.mesh)
        self.ctx_r = pmesh.replicate(self.ctx, self.mesh)

        self.ckpt = CheckpointManager(
            os.path.join(workdir, "checkpoints"),
            cfg.train.checkpoints_total_limit)
        self.logger = MetricLogger(os.path.join(workdir, "metrics.jsonl"),
                                   report_to=report_to)
        self.timer = PhaseTimer()
        self.guard = AnomalyGuard()
        # non-stalling saves: on-device snapshot + background D2H fetch
        # (PERF.md round 4: the sync fetch cost ~2x step time on the relay)
        self._saver = AsyncSaver(self.ckpt)

    # ------------------------------------------------------------------
    def _save(self, step: int, blocking: bool = False) -> None:
        self._saver.save(step, self.state, blocking=blocking)

    def _join_save(self) -> None:
        self._saver.join()

    # ------------------------------------------------------------------
    def _blank_ctx(self, text_params):
        return jax.jit(lambda p: self.text.apply(
            p, blank_ids(self.cfg.text)))(text_params)

    def install_ported(self, dual_params, vae_params, text_params=None
                       ) -> None:
        """Install ported SD weights for all three stacks (reference
        train/train.py:954-996).  Recomputes the cached blank-prompt
        context from the PORTED text encoder — conditioning on the
        random-init CLIP context would be garbage."""
        self.state = pmesh.replicate(
            create_train_state(self.cfg, dual_params), self.mesh)
        self.vae_params = vae_params
        self.vae_params_r = pmesh.replicate(vae_params, self.mesh)
        if text_params is not None:
            self.text_params = text_params
            self.ctx = self._blank_ctx(text_params)
            self.ctx_r = pmesh.replicate(self.ctx, self.mesh)

    def install_dual(self, dual_params) -> None:
        """Warm-start the dual-stream params (tools/export_params.py .npz
        from a previous round); optimizer state starts fresh.  A later
        orbax resume (maybe_resume) still wins over this init."""
        self.state = pmesh.replicate(
            create_train_state(self.cfg, dual_params), self.mesh)

    def install_vae(self, vae_params) -> None:
        """Install pre-trained VAE params (tools/train_vae.py output) —
        the zero-egress replacement for the reference's downloaded
        AutoencoderKL (train/train.py:954-961); stays frozen."""
        self.vae_params = vae_params
        self.vae_params_r = pmesh.replicate(vae_params, self.mesh)

    # ------------------------------------------------------------------
    def maybe_resume(self) -> int:
        """--resume_from_checkpoint latest semantics
        (reference train/train.py:1191-1218)."""
        step = self.ckpt.latest_step()
        if step is None:
            return 0
        host_state = jax.tree.map(np.asarray, self.state)
        restored = self.ckpt.restore(step, template=host_state)
        self.state = pmesh.replicate(restored, self.mesh)
        return int(step)

    # ------------------------------------------------------------------
    def train(self, batch_iterator: Iterator[dict],
              max_steps: Optional[int] = None,
              validation_fn: Optional[Callable[[TrainState, int], None]]
              = None) -> TrainState:
        cfg = self.cfg.train
        max_steps = max_steps or cfg.max_steps
        start = self.maybe_resume()
        step = start
        if self.scene_bank is not None:
            # the "batch" is the bank itself, uploaded once and reused —
            # the per-step inputs are only (state, rng)
            import itertools
            bank_r = pmesh.replicate(
                jax.tree.map(jnp.asarray, self.scene_bank), self.mesh)
            batch_iterator = itertools.repeat(bank_r)
        for batch in batch_iterator:
            if step >= max_steps:
                break
            if self.scene_bank is not None:
                pass                        # already on device, replicated
            elif not self.render_in_step:
                batch = {k: batch[k] for k in BATCH_KEYS}
            if self.scene_bank is None:
                with self.timer.phase("h2d"):
                    batch = pmesh.shard_batch(batch, self.mesh)
            with self.timer.phase("step", sync=False):
                self.state, metrics = self._step(
                    self.state, self.vae_params_r, self.ctx_r, batch,
                    self._rng)
            step += 1
            if step % 10 == 0 or step == start + 1:
                self.logger.log(step, metrics)
                self.guard.check(metrics, step)
            if step % cfg.checkpoint_every == 0:
                with self.timer.phase("checkpoint"):
                    self._save(step)
            if validation_fn and step % cfg.validation_every == 0:
                validation_fn(self.state, step)
        # final save (reference save_pretrained at train end,
        # train/train.py:1484-1494) so short runs are restorable
        if step > start and step % cfg.checkpoint_every != 0:
            self._save(step, blocking=True)
        self._join_save()
        self.ckpt.wait()
        self.timer.dump(os.path.join(self.workdir, "phases.jsonl"))
        return self.state


def synthetic_batches(cfg: SystemConfig, batch: int,
                      seed: int = 0) -> Iterator[dict]:
    """Random-map batch source for smoke runs / benchmarks (no dataset)."""
    rng = np.random.default_rng(seed)
    hw = cfg.vae.sample_size
    while True:
        yield {k: jnp.asarray(rng.uniform(-1, 1, (batch, hw, hw, 3)),
                              jnp.float32) for k in BATCH_KEYS}
