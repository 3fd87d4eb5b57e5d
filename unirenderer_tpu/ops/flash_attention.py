"""Flash attention for UNet self-attention (Pallas TPU kernel).

The reference relies on xformers memory-efficient attention
(train/train.py:1057-1070) and attention slicing (controlnet.py:1588-1651).
On TPU the fused path is a Pallas flash kernel; sequence lengths here are
short (<= 4096 for the 64x64 latent self-attention, 77 for text cross
attention), so XLA's fused attention is already near-optimal — the Pallas
kernel is used when shapes tile cleanly and falls back otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def maybe_flash_attention(q: jax.Array, k: jax.Array, v: jax.Array
                          ) -> Optional[jax.Array]:
    """Run the Pallas flash kernel if shapes/backend allow, else None.

    q, k, v: (B, S, H, D).  Returns (B, S, H, D) or None for fallback.
    """
    if jax.default_backend() != "tpu":
        return None
    b, s, h, d = q.shape
    sk = k.shape[1]
    # kernel pads head_dim internally; seq lengths must tile by 128
    # (the 64^2-latent self-attention: 4096/1024/256 qualify, 64 falls back)
    if s % 128 != 0 or sk % 128 != 0:
        return None
    try:
        from unirenderer_tpu.ops._flash_kernel import flash_attention
        return flash_attention(q, k, v)
    except Exception:
        return None
