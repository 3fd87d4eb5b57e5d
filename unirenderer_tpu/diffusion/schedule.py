"""DDPM noise schedule, x0-prediction variant.

The reference trains against latents, not noise (train/train.py:1358-1359,
base model `stable-diffusion-v1-4_x0`, train/train.sh:6) with the standard
SD scaled-linear beta schedule (L0: diffusers DDPMScheduler).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from unirenderer_tpu.core.config import DiffusionConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed schedule arrays (length num_train_timesteps)."""
    betas: jax.Array
    alphas_cumprod: jax.Array

    @classmethod
    def create(cls, cfg: DiffusionConfig) -> "DiffusionSchedule":
        n = cfg.num_train_timesteps
        if cfg.beta_schedule == "scaled_linear":
            betas = jnp.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                                 n, dtype=jnp.float32) ** 2
        elif cfg.beta_schedule == "linear":
            betas = jnp.linspace(cfg.beta_start, cfg.beta_end, n,
                                 dtype=jnp.float32)
        else:
            raise ValueError(cfg.beta_schedule)
        acp = jnp.cumprod(1.0 - betas)
        return cls(betas=betas.astype(jnp.float32),
                   alphas_cumprod=acp.astype(jnp.float32))

    @property
    def num_train_timesteps(self) -> int:
        return self.betas.shape[0]

    def alpha_sigma(self, t: jax.Array):
        """(sqrt(acp_t), sqrt(1-acp_t)) for integer timesteps t."""
        acp = self.alphas_cumprod[t]
        return jnp.sqrt(acp), jnp.sqrt(1.0 - acp)

    def log_snr_half(self, t: jax.Array) -> jax.Array:
        """lambda_t = log(alpha_t / sigma_t) (UniPC / DPM-solver lambda)."""
        a, s = self.alpha_sigma(t)
        return jnp.log(a) - jnp.log(s)

    def add_noise(self, x0: jax.Array, noise: jax.Array,
                  t: jax.Array) -> jax.Array:
        """q(x_t | x_0); t broadcast over batch (reference
        DDPMScheduler.add_noise semantics)."""
        a, s = self.alpha_sigma(t)
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return a.reshape(shape) * x0 + s.reshape(shape) * noise


def compute_dual_t(rng: jax.Array, num_timesteps: int, batch: int):
    """The dual-schedule timestep sampler (reference train/train.py:442-453).

    One stream gets uniform t in [0, T); the other is anchored per-sample at
    t in {0, T-1}.  Which stream is which flips per step:
      idx == 0 (forward rendering): image stream uniform (being denoised),
               attributes anchored (the conditioning input)
      idx == 1 (inverse rendering): attribute stream uniform, image anchored
    Returns (t_img, t_attr, is_inverse_rendering) with is_inverse a scalar
    bool array (used under lax.cond for the cycle pass).
    """
    k_idx, k_uniform, k_anchor = jax.random.split(rng, 3)
    idx = jax.random.bernoulli(k_idx)                       # True -> inverse
    t_uniform = jax.random.randint(k_uniform, (batch,), 0, num_timesteps)
    t_anchor = jax.random.bernoulli(k_anchor, shape=(batch,)).astype(
        jnp.int32) * (num_timesteps - 1)
    # idx==1 (inverse rendering): attribute stream uniform, image anchored;
    # idx==0 (forward rendering): image stream uniform, attributes anchored.
    t_img = jnp.where(idx, t_anchor, t_uniform)
    t_attr = jnp.where(idx, t_uniform, t_anchor)
    return t_img, t_attr, idx


def inference_timesteps(num_train_timesteps: int, num_steps: int) -> jnp.ndarray:
    """Descending inference timestep grid, diffusers 'linspace' spacing
    (UniPCMultistepScheduler.set_timesteps): linspace(0, T-1, N+1).round()
    reversed, dropping the trailing 0."""
    import numpy as np
    ts = np.linspace(0, num_train_timesteps - 1, num_steps + 1).round()
    ts = ts[::-1][:-1].astype(np.int32)
    return jnp.asarray(ts.copy())
