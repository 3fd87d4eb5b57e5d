"""The jitted dual-schedule train step (reference train/train.py:1234-1427).

TPU-first design decisions vs the reference:
  * All 8 VAE encodes (train/train.py:1266-1304) run as ONE batched conv
    call over a (8B,H,W,3) stack — bigger MXU batches, one kernel launch.
  * The cycle-consistency second pass (train/train.py:1388-1416) sits under
    `lax.cond`, so only the taken branch executes at runtime while the whole
    step remains one compiled program (SURVEY "hard parts" #4).
  * bf16 compute / f32 params; no fp16 loss-scaler (not needed on TPU).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from unirenderer_tpu.core.config import LATENT_CHANNELS, SystemConfig
from unirenderer_tpu.diffusion.schedule import DiffusionSchedule, compute_dual_t
from unirenderer_tpu.train.losses import dual_stream_loss

# Batch keys: (B,H,W,3) maps in [-1,1], exactly the 8 modalities VAE-encoded
# by the reference step (train/train.py:1240-1304).
BATCH_KEYS = ("image", "material", "mask", "env", "normal", "albedo",
              "spec_light", "diff_light")


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def make_lr_schedule(cfg: SystemConfig):
    """Scalar lr or an optax schedule per TrainConfig.lr_schedule."""
    t = cfg.train
    if t.lr_schedule == "cosine":
        assert t.lr_decay_steps > 0, "cosine schedule needs lr_decay_steps"
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=t.learning_rate,
            warmup_steps=max(t.lr_warmup_steps, 1),
            decay_steps=t.lr_decay_steps,
            end_value=t.learning_rate * t.lr_end_factor)
    if t.lr_warmup_steps > 0:
        return optax.linear_schedule(0.0, t.learning_rate,
                                     t.lr_warmup_steps)
    return t.learning_rate


def make_optimizer(cfg: SystemConfig) -> optax.GradientTransformation:
    t = cfg.train
    if t.optimizer == "adafactor":
        # factored second moments, no first moment: optimizer state is
        # O(rows+cols) instead of 2x params — what lets the 1.74B-param
        # flagship train on a single 16GB chip (config.TrainConfig notes)
        inner = optax.adafactor(make_lr_schedule(cfg),
                                clipping_threshold=1.0,
                                weight_decay_rate=t.adam_weight_decay)
    else:
        inner = optax.adamw(make_lr_schedule(cfg), b1=t.adam_beta1,
                            b2=t.adam_beta2,
                            eps=t.adam_eps, weight_decay=t.adam_weight_decay)
    # max_grad_norm <= 0 disables global-norm clipping.  Beyond reference
    # parity (the ref always clips at 1.0) this is a MEMORY lever: the
    # global norm is a barrier that forces the entire grad tree live at
    # once (measured: the flagship 512^2 OOM dump's largest allocations
    # are grad leaves pinned by optax clip_by_global_norm's reduce);
    # without it each leaf dies into its per-leaf optimizer update.
    # Adafactor retains its own per-update clipping_threshold=1.0
    # (T5/PaLM recipe), so training stays bounded.
    if t.max_grad_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(t.max_grad_norm), inner)
    else:
        opt = inner
    if t.gradient_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, t.gradient_accumulation_steps)
    return opt


def create_train_state(cfg: SystemConfig, params) -> TrainState:
    opt = make_optimizer(cfg)
    return TrainState(step=jnp.int32(0), params=params,
                      opt_state=opt.init(params["params"]))


def make_loss_fn(cfg: SystemConfig, dual, vae, schedule: DiffusionSchedule):
    """The dual-schedule loss (reference train/train.py:1234-1427) as a
    standalone loss_fn(params, vae_params, ctx, batch, rng) -> (loss, aux),
    shared by the fused train step and the two-phase variant."""
    scaling = cfg.vae.scaling_factor
    n_train_t = cfg.diffusion.num_train_timesteps

    def encode_batch(vae_params, batch, rng):
        stacked = jnp.concatenate([batch[k] for k in BATCH_KEYS], axis=0)
        mean, logvar = vae.apply(vae_params, stacked, method="encode")
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype)
        z = z.astype(jnp.float32) * scaling
        parts = jnp.split(z, len(BATCH_KEYS), axis=0)
        return dict(zip(BATCH_KEYS, parts))

    def loss_fn(params, vae_params, ctx, batch, rng):
        b = batch["image"].shape[0]
        keys = jax.random.split(rng, 7)
        lat = encode_batch(vae_params, batch, keys[0])

        # env perturbation (train/train.py:1286-1288)
        lat["env"] = lat["env"] + cfg.diffusion.env_noise_aug * \
            jax.random.normal(keys[1], lat["env"].shape)

        t_img, t_attr, is_inv = compute_dual_t(keys[2], n_train_t, b)

        latents_img = lat["image"]
        noise_img = jax.random.normal(keys[3], latents_img.shape)
        noisy_img = schedule.add_noise(latents_img, noise_img, t_img)

        # 24-ch attr concat order: material|normal|albedo|spec|diff|env
        # (train/train.py:1307)
        attr24 = jnp.concatenate(
            [lat["material"], lat["normal"], lat["albedo"],
             lat["spec_light"], lat["diff_light"], lat["env"]], axis=-1)
        noise_attr = jax.random.normal(keys[4], attr24.shape)
        noisy_attr24 = schedule.add_noise(attr24, noise_attr, t_attr)
        attr28 = jnp.concatenate([lat["mask"], noisy_attr24], axis=-1)

        ctxb = jnp.broadcast_to(ctx, (b,) + ctx.shape[1:])
        img_pred, attr_pred28 = dual.apply(
            params, noisy_img, attr28, t_img, t_attr, ctxb,
            deterministic=True)
        attr_pred = attr_pred28[..., LATENT_CHANNELS:]   # drop mask group

        # ---- cycle pass (inverse-rendering steps only) ----
        def cycle(_):
            t_img_c = jax.random.randint(keys[5], (b,), 0, n_train_t)
            t_attr_c = jnp.zeros((b,), jnp.int32)
            noise_c = jax.random.normal(keys[6], latents_img.shape)
            noisy_img_c = schedule.add_noise(latents_img, noise_c, t_img_c)
            attr28_c = jnp.concatenate([lat["mask"], attr_pred], axis=-1)
            pred_c, _ = dual.apply(
                params, noisy_img_c, attr28_c, t_img_c, t_attr_c, ctxb,
                run_decoder=False, deterministic=True)
            return pred_c

        cycle_pred = jax.lax.cond(
            is_inv, cycle, lambda _: jnp.zeros_like(img_pred), None)

        return dual_stream_loss(img_pred, attr_pred, latents_img, attr24,
                                cycle_pred, is_inv, cfg.train)

    return loss_fn


def _cast_like_compute(params):
    """f32 leaves -> bf16 (the cast flax applies at every use site)."""
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)


def make_train_step(cfg: SystemConfig, dual, vae, schedule: DiffusionSchedule):
    """Returns train_step(state, vae_params, ctx, batch, rng) -> (state, metrics).

    `ctx` is the cached blank-prompt text context (1, 77, D) — the reference
    re-runs CLIP on ' ' every step (train/train.py:1313-1321); we don't.
    """
    opt = make_optimizer(cfg)
    loss_fn = make_loss_fn(cfg, dual, vae, schedule)
    grad_bf16 = cfg.train.grad_dtype == "bfloat16"

    def train_step(state: TrainState, vae_params, ctx, batch, rng
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        diff_params = state.params
        if grad_bf16:
            # Differentiate w.r.t. the bf16 compute params (the cast flax
            # applies at every use site anyway, so the forward is
            # unchanged); the grad tree comes out bf16 — 3.5GB instead of
            # 7.0GB live for the flagship (TrainConfig.grad_dtype notes).
            diff_params = _cast_like_compute(state.params)
        (_, metrics), grads = grad_fn(diff_params, vae_params, ctx, batch,
                                      rng)
        if grad_bf16:
            # Leaf-wise upcast: fuses into the per-leaf optimizer update,
            # so the f32 copy of each grad is transient, never the tree.
            grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, opt_state = opt.update(grads["params"], state.opt_state,
                                        state.params["params"])
        params = {"params": optax.apply_updates(state.params["params"],
                                                updates)}
        metrics["grad_norm"] = optax.global_norm(grads["params"])
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step


def make_two_phase_train_step(cfg: SystemConfig, dual, vae,
                              schedule: DiffusionSchedule,
                              batch_transform=None):
    """The train step as TWO jitted programs — (grad_step, update_step) —
    with numerics identical to the fused step (same ops, same order).

    Why: the fused flagship 512^2 program OOMs a 16GB v5e not on real
    liveness but on allocator FRAGMENTATION — the compiler dump shows
    5.94G of actual temps inflated to 9.20G by 35% fragmentation, because
    forward activations, the full weight-grad tree and optimizer temps all
    pack into one arena (PERF.md round-5 memory-wall log).  Splitting at
    the grads boundary gives each program a small, uniform working set:

      grad_step   peak ~= params(args) + activations + grad outputs
      update_step peak ~= params(args) + grads(args, donated) + aliased out

    Cost: one extra dispatch per step and the grad tree round-trips HBM
    between programs (it stays on device; nothing crosses the host).

    `batch_transform` (optional, traced inside grad_step) maps the raw
    input to the 8-modality batch — pass a render collate to get the
    two-phase equivalent of make_render_train_step.
    """
    opt = make_optimizer(cfg)
    loss_fn = make_loss_fn(cfg, dual, vae, schedule)
    grad_bf16 = cfg.train.grad_dtype == "bfloat16"

    def grad_step(params, vae_params, ctx, batch, rng, step):
        rng = jax.random.fold_in(rng, step)
        if batch_transform is not None:
            batch = batch_transform(batch)
        diff_params = _cast_like_compute(params) if grad_bf16 else params
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(diff_params, vae_params, ctx, batch,
                                      rng)
        return grads, metrics

    def update_step(state: TrainState, grads) -> TrainState:
        if grad_bf16:
            grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, opt_state = opt.update(grads["params"], state.opt_state,
                                        state.params["params"])
        params = {"params": optax.apply_updates(state.params["params"],
                                                updates)}
        return TrainState(state.step + 1, params, opt_state)

    return grad_step, update_step


def make_render_train_step(cfg: SystemConfig, dual, vae,
                           schedule: DiffusionSchedule,
                           resolution: int = 0, ssaa: int = 0,
                           bg: float = 1.0):
    """Render-in-step: the reference's in-loop GPU render regime
    (train/train.py:184-439 collate inside the hot loop, :1239) fused the
    TPU way — rasterize + shade + SSAA + VAE encodes + dual-schedule loss +
    optimizer as ONE XLA program per step.

    vs the host-collate path this removes the device->host->device round
    trip of the 8 rendered maps (8 x (B,512,512,3) f32 ~ 100MB/batch —
    seconds of relay latency each way on the axon tunnel) and lets XLA
    overlap render and model work.  The step takes a stacked SCENE pytree
    (data/objaverse.stack_scene) instead of rendered maps; every leaf has
    leading batch dim, so DP sharding is unchanged
    (parallel/mesh.make_sharded_train_step works as-is).
    """
    base = make_train_step(cfg, dual, vae, schedule)
    res = resolution or cfg.data.resolution
    ss = ssaa or cfg.data.ssaa

    def render_train_step(state: TrainState, vae_params, ctx, scene, rng
                          ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        from unirenderer_tpu.data.objaverse import collate_from_scene
        batch = collate_from_scene(scene, res, ssaa=ss, bg=bg)
        batch = {k: batch[k] for k in BATCH_KEYS}
        return base(state, vae_params, ctx, batch, rng)

    return render_train_step


def make_bank_train_step(cfg: SystemConfig, dual, vae,
                         schedule: DiffusionSchedule, batch_size: int,
                         resolution: int = 0, ssaa: int = 0,
                         bg: float = 1.0, augment: bool = True,
                         scene_constraint=None):
    """Fresh-scenes training: sample a NEW random batch of scenes from a
    device-resident bank (data/scene_bank) + rasterize + shade + VAE encode
    + dual-schedule loss + optimizer — ONE XLA program per step whose only
    inputs are (state, vae_params, ctx, bank, rng).  Zero per-step host
    transfer; infinite effective dataset (the fix for the round-4 image-
    stream overfitting, QUALITY_r04_trajectory.json).

    The reference's analogue renders fresh scenes on the GPU inside
    collate_fn every step (train/train.py:184-439).

    `scene_constraint` (optional) shards the sampled scene over the data
    axis for multi-chip runs (lax.with_sharding_constraint over P('data')):
    sampling is trivially cheap so each device computes it redundantly and
    keeps its slice — no host-side batch distribution at all.
    """
    base = make_train_step(cfg, dual, vae, schedule)
    res = resolution or cfg.data.resolution
    ss = ssaa or cfg.data.ssaa

    def bank_train_step(state: TrainState, vae_params, ctx, bank, rng
                        ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        from unirenderer_tpu.data.objaverse import collate_from_scene
        from unirenderer_tpu.data.scene_bank import sample_scenes
        scene_rng = jax.random.fold_in(jax.random.fold_in(rng, state.step),
                                       0x5CE7E)
        scene = sample_scenes(bank, scene_rng, batch_size, cfg.data,
                              augment=augment)
        if scene_constraint is not None:
            scene = scene_constraint(scene)
        batch = collate_from_scene(scene, res, ssaa=ss, bg=bg)
        batch = {k: batch[k] for k in BATCH_KEYS}
        return base(state, vae_params, ctx, batch, rng)

    return bank_train_step
