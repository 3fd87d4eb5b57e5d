"""Fused tonemap + image losses — TPU equivalent of the renderutils loss
kernel (reference c_src/loss.cu, SURVEY N3).  XLA fuses the whole chain;
no hand-written backward needed.

Semantics follow renderutils/loss.py: tonemap in {none, log_srgb},
loss in {l1, mse, smape, relmse}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _srgb(f: jax.Array) -> jax.Array:
    return jnp.where(f > 0.0031308,
                     1.055 * jnp.power(jnp.clip(f, 0.0031308, None),
                                       1.0 / 2.4) - 0.055,
                     12.92 * f)


def _tonemap(img: jax.Array, mode: str) -> jax.Array:
    if mode == "none":
        return img
    if mode == "log_srgb":
        return _srgb(jnp.log(jnp.clip(img, 0.0, 65535.0) + 1.0))
    raise ValueError(mode)


def image_loss(img: jax.Array, target: jax.Array, loss: str = "l1",
               tonemap: str = "none") -> jax.Array:
    """Mean loss between tonemapped images (reference ru.image_loss)."""
    img_t = _tonemap(img, tonemap)
    ref_t = _tonemap(target, tonemap)
    err = img_t - ref_t
    if loss == "l1":
        return jnp.mean(jnp.abs(err))
    if loss == "mse":
        return jnp.mean(err * err)
    if loss == "smape":
        denom = jnp.abs(img_t) + jnp.abs(ref_t) + 0.01
        return jnp.mean(2.0 * jnp.abs(err) / denom)
    if loss == "relmse":
        denom = img_t * img_t + ref_t * ref_t + 0.01
        return jnp.mean(err * err / denom)
    raise ValueError(loss)
