"""Training losses — exact semantics of reference train/train.py:1356-1416.

Weights: loss = mse_img + 10*mse_attr + 0.01*contrastive  (forward task)
         loss = mse_img + mse_attr + 0.8*cycle            (inverse task)
(the reference switches BOTH the attr weight and drops the contrastive term
in the inverse branch — train/train.py:1378 vs :1416; preserved here.)

The contrastive term (train/train.py:1364-1373) pushes the albedo prediction
of samples 0 and 1 together while separating material/specular:
  pos = exp(cos(albedo_0, albedo_1)/tau)
  neg = pos + exp(cos(mat_0, mat_1)/tau) + exp(cos(spec_0, spec_1)/tau)
  L = -log(pos/neg)        (tau = 0.1; requires batch >= 2 — the reference
                            crashes for batch < 2, we gate it instead.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unirenderer_tpu.core.config import LATENT_CHANNELS, TrainConfig


def _cos(a: jax.Array, b: jax.Array) -> jax.Array:
    a = a.reshape(-1).astype(jnp.float32)
    b = b.reshape(-1).astype(jnp.float32)
    na = jnp.maximum(jnp.linalg.norm(a), 1e-8)
    nb = jnp.maximum(jnp.linalg.norm(b), 1e-8)
    return jnp.dot(a, b) / (na * nb)


def contrastive_loss(attr_pred: jax.Array, temperature: float) -> jax.Array:
    """attr_pred: (B,h,w,24) prediction AFTER dropping the mask group.

    Group slices (train/train.py:1361-1363): material=[:4], albedo=[8:12],
    spec=[12:16].
    """
    c = LATENT_CHANNELS
    material = attr_pred[..., 0 * c:1 * c]
    albedo = attr_pred[..., 2 * c:3 * c]
    spec = attr_pred[..., 3 * c:4 * c]
    m = _cos(material[0], material[1]) / temperature
    a = _cos(albedo[0], albedo[1]) / temperature
    s = _cos(spec[0], spec[1]) / temperature
    pos = jnp.exp(a)
    neg = pos + jnp.exp(m) + jnp.exp(s)
    return -jnp.log(pos / neg)


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def dual_stream_loss(img_pred, attr_pred, img_target, attr_target,
                     cycle_img_pred, is_inverse, cfg: TrainConfig):
    """Combine per reference; `cycle_img_pred` is the cycle-pass prediction
    (only meaningful when is_inverse) and attr targets are the clean 24-ch
    latents (targets are latents, not noise — train/train.py:1358-1359).
    """
    loss_img = mse(img_pred, img_target)
    loss_attr = mse(attr_pred, attr_target)
    batch = img_pred.shape[0]
    contr = (contrastive_loss(attr_pred, cfg.contrastive_temperature)
             if batch >= 2 else jnp.float32(0.0))
    loss_fwd = (cfg.w_img * loss_img + cfg.w_attr * loss_attr
                + cfg.w_contrastive * contr)
    loss_cycle = mse(cycle_img_pred, img_target)
    loss_inv = loss_img + loss_attr + cfg.w_cycle * loss_cycle
    loss = jnp.where(is_inverse, loss_inv, loss_fwd)
    metrics = {
        "loss": loss, "loss_img": loss_img, "loss_attr": loss_attr,
        "loss_contrastive": contr, "loss_cycle": loss_cycle,
        "is_inverse": is_inverse.astype(jnp.float32),
    }
    return loss, metrics
