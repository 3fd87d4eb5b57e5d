"""Triangle rasterization — the TPU-native replacement for nvdiffrast
(reference SURVEY N7: `dr.rasterize` via DepthPeeler at
src/utils/render.py:310-313, `dr.interpolate` at :217-234).

Design: brute-force tiled rasterization formulated as matmuls.

  Edge-function evaluation for a tile of P pixels against a chunk of C
  triangles is ONE (P,3) x (3,3C) matmul -> MXU work, not scalar loops.
  The pipeline is: outer `lax.scan` over static pixel tiles, inner
  `lax.scan` over triangle chunks, carrying the per-pixel nearest hit
  (z-buffer).  All shapes static; meshes are padded to a chunk multiple
  with degenerate triangles.

Output follows nvdiffrast's rast buffer convention: (u, v, z_ndc, id+1)
with perspective-correct barycentrics and id 0 = background, so the
downstream interpolation/shading code matches the reference semantics.
The reference uses a single depth layer (num_layers=1, train/train.py:193),
i.e. plain z-buffering — depth peeling beyond layer 1 is implemented by
re-rasterizing with a z > prev_z constraint.

Anti-aliasing: nvdiffrast's analytic `dr.antialias` has no TPU analogue;
we provide optional 2x supersampling (render at 2R, average-pool) — a
documented deviation (SURVEY 'hard parts' (1)).

A Pallas kernel version of the inner loop (keeping the tile in VMEM across
all triangle chunks) lives in ops/_raster_kernel.py and is used on TPU for
large meshes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class RastOutput(NamedTuple):
    """Per-pixel hit info, each (H, W, ...)."""
    bary_u: jax.Array        # perspective-correct barycentric for vertex 0
    bary_v: jax.Array        # for vertex 1
    z: jax.Array             # NDC depth (z/w) of hit
    tri_id: jax.Array        # int32, 0 = miss, else triangle index + 1


def _pad_tris(tri: jax.Array, chunk: int) -> jax.Array:
    t = tri.shape[0]
    pad = (-t) % chunk
    if pad:
        tri = jnp.concatenate(
            [tri, jnp.zeros((pad, 3), tri.dtype)], axis=0)
    return tri


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def rasterize(pos_clip: jax.Array, tri: jax.Array, height: int, width: int,
              chunk: int = 256,
              prev_z: Optional[jax.Array] = None) -> RastOutput:
    """Rasterize triangles into an (height, width) grid.

    pos_clip: (V, 4) clip-space positions (x,y,z,w) — output of
              `xfm_points(v_pos, mvp)` (reference render.py:306).
    tri:      (T, 3) int32 vertex indices.
    prev_z:   optional (H, W) previous-layer depth for peeling; only hits
              with z > prev_z + eps are kept (reference DepthPeeler
              rasterize_next_layer).

    Clip convention: OpenGL-style, viewport maps x/w,y/w in [-1,1] to
    pixels; pixel centers at (i+0.5).  y is flipped so row 0 = top
    (nvdiffrast image layout).
    """
    tri = _pad_tris(tri, chunk)
    n_chunks = tri.shape[0] // chunk

    w_clip = pos_clip[:, 3:4]
    w_safe = jnp.where(jnp.abs(w_clip) < 1e-9,
                       jnp.where(w_clip < 0, -1e-9, 1e-9), w_clip)
    inv_w = 1.0 / w_safe                                # (V,1)
    ndc = pos_clip[:, :3] * inv_w                       # (V,3)
    sx = (ndc[:, 0] * 0.5 + 0.5) * width                # pixel coords
    # y-DOWN screen convention: clip +y maps to increasing row index.  The
    # reference's projection matrix already negates y (render_utils.py:188),
    # so world +y lands at row 0 (image top) — same as its nvdiffrast usage.
    sy = (ndc[:, 1] * 0.5 + 0.5) * height
    sz = ndc[:, 2]
    behind = (pos_clip[:, 3] <= 1e-9)

    # gather per-triangle data: (Tc, 3) each
    def tri_data(t):
        i0, i1, i2 = t[:, 0], t[:, 1], t[:, 2]
        return (jnp.stack([sx[i0], sx[i1], sx[i2]], 1),
                jnp.stack([sy[i0], sy[i1], sy[i2]], 1),
                jnp.stack([sz[i0], sz[i1], sz[i2]], 1),
                jnp.stack([inv_w[i0, 0], inv_w[i1, 0], inv_w[i2, 0]], 1),
                behind[i0] | behind[i1] | behind[i2],
                (i0 == i1) | (i1 == i2) | (i0 == i2))

    # pixel-center coordinates
    py, px = jnp.meshgrid(jnp.arange(height) + 0.5,
                          jnp.arange(width) + 0.5, indexing="ij")
    pix = jnp.stack([px.reshape(-1), py.reshape(-1),
                     jnp.ones(height * width)], axis=1)      # (P,3)

    BIG = jnp.float32(1e30)
    p = height * width
    init = (jnp.full((p,), BIG), jnp.zeros((p,), jnp.int32),
            jnp.zeros((p,)), jnp.zeros((p,)))
    prev_z_flat = (None if prev_z is None
                   else prev_z.reshape(-1))

    def chunk_body(carry, chunk_idx):
        best_z, best_id, best_u, best_v = carry
        t = jax.lax.dynamic_slice_in_dim(tri, chunk_idx * chunk, chunk, 0)
        tx, ty, tz, tw, bad_w, degen = tri_data(t)

        # Edge matrix: for each triangle, 3 edge functions + area.
        # E_k(p) = a*px + b*py + c ; edges (v1,v2),(v2,v0),(v0,v1)
        x0, x1, x2 = tx[:, 0], tx[:, 1], tx[:, 2]
        y0, y1, y2 = ty[:, 0], ty[:, 1], ty[:, 2]

        def edge(ax, ay, bx, by):
            # signed area form: a = ay-by, b = bx-ax, c = ax*by-ay*bx
            return ay - by, bx - ax, ax * by - ay * bx

        a0, b0, c0 = edge(x1, y1, x2, y2)   # opposite v0
        a1, b1, c1 = edge(x2, y2, x0, y0)   # opposite v1
        a2, b2, c2 = edge(x0, y0, x1, y1)   # opposite v2
        area = a2 * x2 + b2 * y2 + c2       # 2*signed area

        # (P,3) @ (3, 3C) -> (P, 3C): all edge functions at all pixels
        em = jnp.stack([jnp.concatenate([a0, a1, a2]),
                        jnp.concatenate([b0, b1, b2]),
                        jnp.concatenate([c0, c1, c2])], axis=0)
        ev = pix @ em                                      # (P, 3C)
        e0, e1, e2 = ev[:, :chunk], ev[:, chunk:2 * chunk], ev[:, 2 * chunk:]

        area_safe = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
        inside = (((e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (area > 0))
                  | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0) & (area < 0)))
        valid = inside & ~(bad_w | degen)[None, :] \
            & (jnp.abs(area) > 1e-12)[None, :]

        # screen barycentrics
        su = e0 / area_safe[None, :]
        sv = e1 / area_safe[None, :]
        sw = 1.0 - su - sv
        # perspective correction
        iw0, iw1, iw2 = tw[:, 0], tw[:, 1], tw[:, 2]
        denom = su * iw0[None] + sv * iw1[None] + sw * iw2[None]
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        pu = su * iw0[None] / denom
        pv = sv * iw1[None] / denom
        pw = 1.0 - pu - pv
        zhit = (pu * tz[:, 0][None] + pv * tz[:, 1][None]
                + pw * tz[:, 2][None])

        zcand = jnp.where(valid, zhit, BIG)
        if prev_z_flat is not None:
            zcand = jnp.where(zcand > prev_z_flat[:, None] + 1e-6,
                              zcand, BIG)
        k = jnp.argmin(zcand, axis=1)                      # (P,)
        rows = jnp.arange(p)
        zk = zcand[rows, k]
        better = zk < best_z
        tri_index = chunk_idx * chunk + k
        best_id = jnp.where(better, tri_index.astype(jnp.int32) + 1, best_id)
        best_u = jnp.where(better, pu[rows, k], best_u)
        best_v = jnp.where(better, pv[rows, k], best_v)
        best_z = jnp.where(better, zk, best_z)
        return (best_z, best_id, best_u, best_v), None

    (bz, bid, bu, bv), _ = jax.lax.scan(chunk_body, init,
                                        jnp.arange(n_chunks))
    miss = bid == 0
    bz = jnp.where(miss, 0.0, bz)
    return RastOutput(
        bary_u=bu.reshape(height, width),
        bary_v=bv.reshape(height, width),
        z=bz.reshape(height, width),
        tri_id=bid.reshape(height, width))


def interpolate(attr: jax.Array, rast: RastOutput,
                tri: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Interpolate per-vertex attributes at rasterized pixels —
    `dr.interpolate` (reference render.py:22-23, :217-234).

    attr (V, A); tri (T, 3).  Returns (image (H, W, A), mask (H, W, 1)).
    """
    tid = jnp.maximum(rast.tri_id - 1, 0)
    v = tri[tid]                                          # (H,W,3)
    a0 = attr[v[..., 0]]
    a1 = attr[v[..., 1]]
    a2 = attr[v[..., 2]]
    u = rast.bary_u[..., None]
    vv = rast.bary_v[..., None]
    w = 1.0 - u - vv
    out = a0 * u + a1 * vv + a2 * w
    mask = (rast.tri_id > 0)[..., None]
    return jnp.where(mask, out, 0.0), mask.astype(attr.dtype)


def ssaa_downsample(img: jax.Array, factor: int = 2) -> jax.Array:
    """Average-pool supersampled render — our AA substitute for
    `dr.antialias` (documented deviation)."""
    h, w, c = img.shape[-3:]
    lead = img.shape[:-3]
    x = img.reshape(lead + (h // factor, factor, w // factor, factor, c))
    return x.mean(axis=(-4, -2))
