"""Pallas TPU tile rasterizer — the kernel-level version of the tiled
matmul rasterizer in ops/rasterize.py (replaces nvdiffrast `dr.rasterize`,
reference src/utils/render.py:310-313; SURVEY N7 'the hard one').

Same RastOutput contract as ops/rasterize.rasterize.  Design:

  * grid = (tiles, chunk-slots): each core walks its tile's pixel block
    (P pixels, pixels in SUBLANES, triangles of the current chunk in
    LANES) over a COMPACTED list of triangle chunks.
  * Binned culling via scalar prefetch: chunk x tile bbox overlap is
    computed vectorised OUTSIDE the kernel; the kernel's chunk BlockSpec
    index_map reads the per-tile survivor list, and slots past the
    survivor count repeat the previous block index — Pallas skips the
    re-fetch, so culled chunks cost neither DMA nor compute (the
    TPU-native version of binned rasterization).
  * Per-pixel depth resolve with exact one-hot winner selection (no
    gathers): chunk-min z, then min-index one-hot for (u, v, id).
  * Running best (z, u, v, id) lives in VMEM scratch across chunk slots;
    outputs are flushed once per tile on the last slot.

Numerics match ops/rasterize.rasterize bit-for-bit policy-wise: same edge
functions, same perspective-correct barycentrics, same BIG/eps constants.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unirenderer_tpu.ops.rasterize import RastOutput, _pad_tris

_BIG = 1e30
_IBIG = 2 ** 30


def _tile_hw(height: int, width: int, max_px: int = 512):
    """Pick (th, tw) dividing (height, width) with th*tw <= max_px,
    preferring wide tiles (pixels-in-lanes friendliness of the flush)."""
    def divisors(n):
        return [d for d in range(1, n + 1) if n % d == 0]
    best = (1, 1)
    for tw in divisors(width):
        for th in divisors(height):
            if th * tw <= max_px and th * tw > best[0] * best[1]:
                best = (th, tw)
            # prefer wider among equal areas
            if (th * tw == best[0] * best[1] and tw > best[1]
                    and th * tw <= max_px):
                best = (th, tw)
    return best


def _precompute(pos_clip, tri, height, width, chunk):
    """Shared host/JAX-side geometry setup (same math as
    ops/rasterize.rasterize:79-126)."""
    tri = _pad_tris(tri, chunk)
    n_chunks = tri.shape[0] // chunk

    w_clip = pos_clip[:, 3:4]
    w_safe = jnp.where(jnp.abs(w_clip) < 1e-9,
                       jnp.where(w_clip < 0, -1e-9, 1e-9), w_clip)
    inv_w = 1.0 / w_safe
    ndc = pos_clip[:, :3] * inv_w
    sx = (ndc[:, 0] * 0.5 + 0.5) * width
    sy = (ndc[:, 1] * 0.5 + 0.5) * height
    sz = ndc[:, 2]
    behind = (pos_clip[:, 3] <= 1e-9)

    i0, i1, i2 = tri[:, 0], tri[:, 1], tri[:, 2]
    tx = jnp.stack([sx[i0], sx[i1], sx[i2]], 1)
    ty = jnp.stack([sy[i0], sy[i1], sy[i2]], 1)
    tz = jnp.stack([sz[i0], sz[i1], sz[i2]], 1)
    tw = jnp.stack([inv_w[i0, 0], inv_w[i1, 0], inv_w[i2, 0]], 1)
    bad = (behind[i0] | behind[i1] | behind[i2]
           | (i0 == i1) | (i1 == i2) | (i0 == i2))

    x0, x1, x2 = tx[:, 0], tx[:, 1], tx[:, 2]
    y0, y1, y2 = ty[:, 0], ty[:, 1], ty[:, 2]

    def edge(ax, ay, bx, by):
        return ay - by, bx - ax, ax * by - ay * bx

    a0, b0, c0 = edge(x1, y1, x2, y2)
    a1, b1, c1 = edge(x2, y2, x0, y0)
    a2, b2, c2 = edge(x0, y0, x1, y1)
    area = a2 * x2 + b2 * y2 + c2
    area = jnp.where(bad | (jnp.abs(area) <= 1e-12), 0.0, area)

    # (n_chunks, 16, chunk): 9 edge coefs, area, 3 z, 3 w
    coef = jnp.stack(
        [a0, b0, c0, a1, b1, c1, a2, b2, c2, area,
         tz[:, 0], tz[:, 1], tz[:, 2], tw[:, 0], tw[:, 1], tw[:, 2]],
        axis=0).reshape(16, n_chunks, chunk).transpose(1, 0, 2)

    bxmin = jnp.where(area == 0, jnp.inf, tx.min(1))
    bxmax = jnp.where(area == 0, -jnp.inf, tx.max(1))
    bymin = jnp.where(area == 0, jnp.inf, ty.min(1))
    bymax = jnp.where(area == 0, -jnp.inf, ty.max(1))
    cb = jnp.stack([bxmin.reshape(n_chunks, chunk).min(1),
                    bxmax.reshape(n_chunks, chunk).max(1),
                    bymin.reshape(n_chunks, chunk).min(1),
                    bymax.reshape(n_chunks, chunk).max(1)], axis=1)
    return coef, cb, n_chunks


def _survivor_lists(cb, n_ty, n_tx, th, tw):
    """(counts (n_tiles,), order (n_tiles, n_chunks)): per tile, the chunk
    indices whose screen bbox overlaps the tile, compacted to the front;
    padding slots repeat the last survivor (index-map no-op re-fetch)."""
    n_chunks = cb.shape[0]
    tiles_y = jnp.arange(n_ty) * th
    tiles_x = jnp.arange(n_tx) * tw
    ty0 = jnp.repeat(tiles_y, n_tx).astype(jnp.float32)   # (n_tiles,)
    tx0 = jnp.tile(tiles_x, n_ty).astype(jnp.float32)
    hit = ((cb[None, :, 0] < tx0[:, None] + tw)
           & (cb[None, :, 1] > tx0[:, None])
           & (cb[None, :, 2] < ty0[:, None] + th)
           & (cb[None, :, 3] > ty0[:, None]))             # (n_tiles, n_chunks)
    counts = hit.sum(axis=1).astype(jnp.int32)
    # stable compaction: argsort of (!hit) keeps survivor order
    order = jnp.argsort(~hit, axis=1, stable=True).astype(jnp.int32)
    # repeat last survivor into the padding slots
    idx = jnp.minimum(jnp.arange(n_chunks)[None, :],
                      jnp.maximum(counts[:, None] - 1, 0))
    order = jnp.take_along_axis(order, idx, axis=1)
    return counts, order


def _make_kernel(n_tx, th, tw, chunk, n_chunks, has_prev):
    P = th * tw

    def kernel(counts_ref, order_ref, coef_ref, *rest):
        if has_prev:
            (pz_ref, outf_ref, outi_ref,
             bu, bv, bz, bid, pz_s) = rest
        else:
            (outf_ref, outi_ref, bu, bv, bz, bid) = rest
        t = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            bu[:] = jnp.zeros((P, 1), jnp.float32)
            bv[:] = jnp.zeros((P, 1), jnp.float32)
            bz[:] = jnp.full((P, 1), _BIG, jnp.float32)
            bid[:] = jnp.zeros((P, 1), jnp.int32)
            if has_prev:
                pz_s[:] = pz_ref[0].reshape(P, 1)

        @pl.when(j < counts_ref[t])
        def _():
            ci = order_ref[t, j]
            tyi = t // n_tx
            txi = t % n_tx
            lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
            px = ((txi * tw + lin % tw).astype(jnp.float32) + 0.5)
            py = ((tyi * th + lin // tw).astype(jnp.float32) + 0.5)

            co = coef_ref[0]                       # (16, chunk)
            a0, b0, c0 = co[0:1], co[1:2], co[2:3]   # (1, chunk)
            a1, b1, c1 = co[3:4], co[4:5], co[5:6]
            a2, b2, c2 = co[6:7], co[7:8], co[8:9]
            ar = co[9:10]
            z0, z1, z2 = co[10:11], co[11:12], co[12:13]
            w0, w1, w2 = co[13:14], co[14:15], co[15:16]

            e0 = px * a0 + py * b0 + c0            # (P, chunk)
            e1 = px * a1 + py * b1 + c1
            e2 = px * a2 + py * b2 + c2
            inside = (((e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (ar > 0))
                      | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0) & (ar < 0)))
            valid = inside & (ar != 0)

            ar_safe = jnp.where(ar == 0, 1.0, ar)
            su = e0 / ar_safe
            sv = e1 / ar_safe
            sw = 1.0 - su - sv
            denom = su * w0 + sv * w1 + sw * w2
            denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            pu = su * w0 / denom
            pv = sv * w1 / denom
            pw = 1.0 - pu - pv
            zhit = pu * z0 + pv * z1 + pw * z2

            zcand = jnp.where(valid, zhit, _BIG)
            if has_prev:
                zcand = jnp.where(zcand > pz_s[:] + 1e-6, zcand, _BIG)

            zmin = jnp.min(zcand, axis=1, keepdims=True)       # (P, 1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (P, chunk), 1)
            kmin = jnp.min(jnp.where(zcand == zmin, rows, _IBIG),
                           axis=1, keepdims=True)              # (P, 1)
            oh = (rows == kmin)                                # exact 1-hot
            u_sel = jnp.sum(jnp.where(oh, pu, 0.0), axis=1, keepdims=True)
            v_sel = jnp.sum(jnp.where(oh, pv, 0.0), axis=1, keepdims=True)

            better = zmin < bz[:]
            bz[:] = jnp.where(better, zmin, bz[:])
            bu[:] = jnp.where(better, u_sel, bu[:])
            bv[:] = jnp.where(better, v_sel, bv[:])
            bid[:] = jnp.where(better, ci * chunk + kmin + 1, bid[:])

        @pl.when(j == n_chunks - 1)
        def _():
            miss = bid[:] == 0
            zout = jnp.where(miss, 0.0, bz[:])
            outf_ref[0] = jnp.concatenate(
                [bu[:], bv[:], zout], axis=1).T      # (3, P)
            outi_ref[0] = bid[:].reshape(1, P)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "chunk", "interpret"))
def rasterize_pallas(pos_clip: jax.Array, tri: jax.Array, height: int,
                     width: int, chunk: int = 256,
                     prev_z: Optional[jax.Array] = None,
                     interpret: bool = False) -> RastOutput:
    """Drop-in Pallas equivalent of ops/rasterize.rasterize (TPU path)."""
    coef, cb, n_chunks = _precompute(pos_clip, tri, height, width, chunk)
    # larger tiles at high resolution keep the scalar-prefetch survivor
    # lists (n_tiles x n_chunks i32, SMEM-resident) inside the SMEM budget
    th, tw = _tile_hw(height, width,
                      max_px=512 if height * width <= 512 * 512 else 1024)
    n_ty, n_tx = height // th, width // tw
    n_tiles = n_ty * n_tx
    P = th * tw
    counts, order = _survivor_lists(cb, n_ty, n_tx, th, tw)

    has_prev = prev_z is not None
    kernel = _make_kernel(n_tx, th, tw, chunk, n_chunks, has_prev)

    in_specs = [
        pl.BlockSpec((1, 16, chunk),
                     lambda t, j, counts, order:
                     (order[t, jnp.minimum(j, counts[t] - 1)], 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [coef]
    if has_prev:
        pz_t = (prev_z.reshape(n_ty, th, n_tx, tw)
                .transpose(0, 2, 1, 3).reshape(n_tiles, P))
        in_specs.append(pl.BlockSpec(
            (1, P), lambda t, j, counts, order: (t, 0),
            memory_space=pltpu.VMEM))
        operands.append(pz_t)

    scratch = [
        pltpu.VMEM((P, 1), jnp.float32),     # bu
        pltpu.VMEM((P, 1), jnp.float32),     # bv
        pltpu.VMEM((P, 1), jnp.float32),     # bz
        pltpu.VMEM((P, 1), jnp.int32),       # bid
    ]
    if has_prev:
        scratch.append(pltpu.VMEM((P, 1), jnp.float32))   # pz_s

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_chunks),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 3, P), lambda t, j, counts, order: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, j, counts, order: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )

    outf, outi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 3, P), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, P), jnp.int32),
        ],
        interpret=interpret,
    )(counts, order, *operands)

    def untile(x):
        return (x.reshape(n_ty, n_tx, th, tw)
                .transpose(0, 2, 1, 3).reshape(height, width))

    return RastOutput(bary_u=untile(outf[:, 0]), bary_v=untile(outf[:, 1]),
                      z=untile(outf[:, 2]), tri_id=untile(outi[:, 0]))
