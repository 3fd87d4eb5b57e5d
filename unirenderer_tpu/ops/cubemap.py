"""Cubemap construction, sampling, and prefiltering — TPU-native equivalent
of the renderutils cubemap CUDA kernels (reference c_src/cubemap.cu, SURVEY
N2) and of nvdiffrast's `dr.texture(..., boundary_mode='cube')` lookups
(SURVEY N7; used at src/utils/render.py:58,69 and light2map.py).

Conventions match the reference exactly (src/models/geometry/render/util.py:
94-134): face order [+x,-x,+y,-y,+z,-z], `cube_to_dir` mapping, pixel
centers at (-1+1/R .. 1-1/R).

Deviations (documented):
  * Seamless cross-face bilinear filtering is implemented by remapping
    off-face taps through their 3D direction onto the adjacent face
    (nearest texel there) — matching nvdiffrast's `boundary_mode='cube'`
    edge behavior.  At the 8 cube corners (taps outside TWO face edges)
    the remap picks one of the 3 corner texels instead of nvdiffrast's
    3-texel average; the residual error is confined to corner texels.
  * The GGX specular prefilter uses filtered importance sampling (Karis
    split-sum) instead of the CUDA NDF-bound search — same integral, a
    TPU-friendly gather/scan formulation.  One-time offline cost per env.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Face <-> direction mapping
# ---------------------------------------------------------------------------

def cube_to_dir(face: int, x: jax.Array, y: jax.Array) -> jax.Array:
    """(x, y) in [-1, 1] on `face` -> unnormalized direction (..., 3).
    Matches reference util.py:94-101."""
    one = jnp.ones_like(x)
    if face == 0:
        d = (one, -y, -x)
    elif face == 1:
        d = (-one, -y, x)
    elif face == 2:
        d = (x, one, y)
    elif face == 3:
        d = (x, -one, -y)
    elif face == 4:
        d = (x, -y, one)
    elif face == 5:
        d = (-x, -y, -one)
    else:
        raise ValueError(face)
    return jnp.stack(d, axis=-1)


def face_grid(res: int) -> jax.Array:
    """Pixel-center grid (gy, gx) each (res, res), range [-1+1/R, 1-1/R]."""
    g = jnp.linspace(-1.0 + 1.0 / res, 1.0 - 1.0 / res, res)
    gy, gx = jnp.meshgrid(g, g, indexing="ij")
    return gy, gx


def all_face_dirs(res: int) -> jax.Array:
    """(6, res, res, 3) unit direction per texel."""
    gy, gx = face_grid(res)
    dirs = jnp.stack([cube_to_dir(s, gx, gy) for s in range(6)])
    return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def texel_solid_angles(res: int) -> jax.Array:
    """(res, res) solid angle of each texel (same for every face)."""
    def proj(x, y):
        return jnp.arctan2(x * y, jnp.sqrt(x * x + y * y + 1.0))
    step = 2.0 / res
    edge = jnp.linspace(-1.0, 1.0, res + 1)
    ex, ey = jnp.meshgrid(edge, edge, indexing="xy")
    a = proj(ex[1:, 1:], ey[1:, 1:]) - proj(ex[1:, :-1], ey[1:, :-1]) \
        - proj(ex[:-1, 1:], ey[:-1, 1:]) + proj(ex[:-1, :-1], ey[:-1, :-1])
    del step
    return jnp.abs(a)


def dir_to_cube_uv(v: jax.Array):
    """directions (..., 3) -> (face_idx (...,), u, v in [-1,1]).

    Inverse of cube_to_dir (consistent per-face)."""
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    ax, ay, az = jnp.abs(vx), jnp.abs(vy), jnp.abs(vz)
    # face selection: dominant axis
    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)
    face = jnp.where(
        is_x, jnp.where(vx > 0, 0, 1),
        jnp.where(is_y, jnp.where(vy > 0, 2, 3),
                  jnp.where(vz > 0, 4, 5)))
    ma = jnp.maximum(jnp.where(is_x, ax, jnp.where(is_y, ay, az)), 1e-20)
    # per-face (x, y) from the cube_to_dir equations
    x = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-vz / ma, vz / ma, vx / ma, vx / ma, vx / ma, -vx / ma])
    y = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-vy / ma, -vy / ma, vz / ma, -vz / ma, -vy / ma, -vy / ma])
    return face, x, y


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def cube_to_dir_vec(face: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Vectorized cube_to_dir where `face` is an int array (same mapping as
    cube_to_dir above)."""
    one = jnp.ones_like(x)
    preds = [face == i for i in range(6)]
    dx = jnp.select(preds, [one, -one, x, x, x, -x])
    dy = jnp.select(preds, [-y, -y, one, -one, -y, -y])
    dz = jnp.select(preds, [-x, x, y, -y, one, -one])
    return jnp.stack([dx, dy, dz], axis=-1)


def _seamless_tap_index(face: jax.Array, xi: jax.Array, yi: jax.Array,
                        res: int):
    """Resolve one bilinear tap (integer texel (xi, yi), possibly one texel
    outside [0, res)) to a concrete (face, row, col) texel — crossing onto
    the adjacent face when off-edge, like nvdiffrast boundary_mode='cube'
    (reference use: src/utils/render.py:58,69; SURVEY N7)."""
    inside = (xi >= 0) & (xi < res) & (yi >= 0) & (yi < res)
    # off-face: rebuild the tap's plane point (outside [-1,1]) -> direction
    # -> owning face + nearest texel there.
    px = (xi.astype(jnp.float32) + 0.5) * (2.0 / res) - 1.0
    py = (yi.astype(jnp.float32) + 0.5) * (2.0 / res) - 1.0
    d = cube_to_dir_vec(face, px, py)
    f2, u2, v2 = dir_to_cube_uv(d)
    ix2 = jnp.clip(jnp.round((u2 + 1.0) * 0.5 * res - 0.5),
                   0, res - 1).astype(jnp.int32)
    iy2 = jnp.clip(jnp.round((v2 + 1.0) * 0.5 * res - 0.5),
                   0, res - 1).astype(jnp.int32)
    fo = jnp.where(inside, face, f2)
    xo = jnp.where(inside, jnp.clip(xi, 0, res - 1), ix2)
    yo = jnp.where(inside, jnp.clip(yi, 0, res - 1), iy2)
    return fo, yo, xo


def sample_cubemap(cube: jax.Array, dirs: jax.Array,
                   seamless: bool = True) -> jax.Array:
    """Bilinear cubemap sample.  cube (6,R,R,C); dirs (...,3) -> (...,C).

    Taps that fall off the face edge wrap onto the adjacent face
    (seamless=True, the nvdiffrast 'cube' boundary mode); seamless=False
    clamps at face edges (cheaper; for interior-dominated workloads).
    """
    res = cube.shape[1]
    face, x, y = dir_to_cube_uv(dirs)
    # continuous pixel coords: pixel centers at (i+0.5)*2/R - 1
    fx = (x + 1.0) * 0.5 * res - 0.5
    fy = (y + 1.0) * 0.5 * res - 0.5
    x0u = jnp.floor(fx).astype(jnp.int32)        # may be -1 .. res-1
    y0u = jnp.floor(fy).astype(jnp.int32)
    wx = jnp.clip(fx - x0u, 0.0, 1.0)
    wy = jnp.clip(fy - y0u, 0.0, 1.0)

    if seamless:
        def lin_tap(yy, xx):
            f, r, c = _seamless_tap_index(face, xx, yy, res)
            return (f * res + r) * res + c
    else:
        def lin_tap(yy, xx):
            return ((face * res + jnp.clip(yy, 0, res - 1)) * res
                    + jnp.clip(xx, 0, res - 1))

    # per-channel 1-D gathers — a (..., C) gather output would be
    # lane-padded C->128 on TPU (the 512^2 collate OOM, ops/gather.py)
    from unirenderer_tpu.ops.gather import gather_rows_weighted
    lins = (lin_tap(y0u, x0u), lin_tap(y0u, x0u + 1),
            lin_tap(y0u + 1, x0u), lin_tap(y0u + 1, x0u + 1))
    wts = ((1 - wx) * (1 - wy), wx * (1 - wy),
           (1 - wx) * wy, wx * wy)
    return gather_rows_weighted(
        cube.reshape(6 * res * res, cube.shape[-1]), lins, wts)


def sample_cubemap_mip(mips, dirs: jax.Array,
                       mip_level: jax.Array) -> jax.Array:
    """Trilinear (linear-mipmap-linear) cubemap lookup with a per-pixel
    fractional mip level — the `dr.texture(..., mip_level_bias=...)` used
    for roughness-indexed specular light (src/utils/render.py:69).

    mips: list of (6,R_l,R_l,C); mip_level (...,) in [0, len(mips)-1].
    """
    n = len(mips)
    lvl = jnp.clip(mip_level, 0.0, n - 1.0)
    if n == 1:
        return sample_cubemap(mips[0], dirs)

    # Flat mip ATLAS + only the TWO bracketing levels (8 seamless taps),
    # not dense taps at every level with mostly-zero weights (4n).  The
    # per-level resolution becomes a per-pixel value via a tiny table
    # lookup — all the seamless edge math is elementwise in `res`, so it
    # vectorizes unchanged.  Taps are per-channel 1-D gathers
    # (ops/gather.py — the 512^2 collate layout rule).
    import numpy as _np
    c = mips[0].shape[-1]
    atlas = jnp.concatenate([m.reshape(-1, c) for m in mips], axis=0)
    res_t = jnp.asarray([m.shape[1] for m in mips], jnp.int32)
    offs = jnp.asarray(_np.concatenate(
        [[0], _np.cumsum([6 * m.shape[1] * m.shape[1] for m in mips])[:-1]]),
        jnp.int32)
    l0 = jnp.floor(lvl).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n - 1)
    f = lvl - l0.astype(lvl.dtype)

    face, x, y = dir_to_cube_uv(dirs)          # level-independent

    def level_taps(li):
        res = jnp.take(res_t, li)              # per-pixel level size
        off = jnp.take(offs, li)
        fres = res.astype(x.dtype)
        fx = (x + 1.0) * 0.5 * fres - 0.5
        fy = (y + 1.0) * 0.5 * fres - 0.5
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        wx = jnp.clip(fx - x0, 0.0, 1.0)
        wy = jnp.clip(fy - y0, 0.0, 1.0)

        def lin_tap(yy, xx):
            fo, yo, xo = _seamless_tap_index(face, xx, yy, res)
            return off + (fo * res + yo) * res + xo

        lins = (lin_tap(y0, x0), lin_tap(y0, x0 + 1),
                lin_tap(y0 + 1, x0), lin_tap(y0 + 1, x0 + 1))
        wts = ((1 - wx) * (1 - wy), wx * (1 - wy),
               (1 - wx) * wy, wx * wy)
        return lins, wts

    lins0, wts0 = level_taps(l0)
    lins1, wts1 = level_taps(l1)
    from unirenderer_tpu.ops.gather import gather_rows_weighted
    return gather_rows_weighted(
        atlas, lins0 + lins1,
        tuple(w * (1 - f) for w in wts0) + tuple(w * f for w in wts1))


# ---------------------------------------------------------------------------
# Latlong conversion (reference util.py:103-134)
# ---------------------------------------------------------------------------

def latlong_to_cubemap(latlong: jax.Array, res: int) -> jax.Array:
    """(H,W,C) equirectangular -> (6,res,res,C), bilinear."""
    dirs = all_face_dirs(res)                       # (6,R,R,3)
    tu = jnp.arctan2(dirs[..., 0], -dirs[..., 2]) / (2 * math.pi) + 0.5
    tv = jnp.arccos(jnp.clip(dirs[..., 1], -1.0, 1.0)) / math.pi
    h, w = latlong.shape[:2]
    fx = tu * w - 0.5
    fy = tv * h - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(fy), 0, h - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    x0w = jnp.mod(x0, w)                            # wrap in azimuth
    x1w = jnp.mod(x0 + 1, w)
    c00 = latlong[y0, x0w]
    c01 = latlong[y0, x1w]
    c10 = latlong[y1, x0w]
    c11 = latlong[y1, x1w]
    top = c00 * (1 - wx) + c01 * wx
    bot = c10 * (1 - wx) + c11 * wx
    return top * (1 - wy) + bot * wy


def cubemap_to_latlong(cube: jax.Array, res) -> jax.Array:
    """(6,R,R,C) -> (res_h, res_w, C) equirectangular (reference
    util.py:118-134)."""
    rh, rw = (res, res * 2) if isinstance(res, int) else res
    gy = jnp.linspace(0.0 + 1.0 / rh, 1.0 - 1.0 / rh, rh)
    gx = jnp.linspace(-1.0 + 1.0 / rw, 1.0 - 1.0 / rw, rw)
    gy, gx = jnp.meshgrid(gy, gx, indexing="ij")
    sin_t, cos_t = jnp.sin(gy * math.pi), jnp.cos(gy * math.pi)
    sin_p, cos_p = jnp.sin(gx * math.pi), jnp.cos(gx * math.pi)
    dirs = jnp.stack([sin_t * sin_p, cos_t, -sin_t * cos_p], axis=-1)
    return sample_cubemap(cube, dirs)


# ---------------------------------------------------------------------------
# Downsampling (avg-pool mip build, reference light2map.py:35-40 /
# util.avg_pool_nhwc)
# ---------------------------------------------------------------------------

def downsample_cubemap(cube: jax.Array) -> jax.Array:
    """2x average-pool each face."""
    six, r, _, c = cube.shape
    x = cube.reshape(six, r // 2, 2, r // 2, 2, c)
    return x.mean(axis=(2, 4))


# ---------------------------------------------------------------------------
# Diffuse irradiance prefilter (reference c_src/cubemap.cu diffuse_cubemap;
# applied at the 16^2 coarsest mip, light2map.py:41)
# ---------------------------------------------------------------------------

def diffuse_cubemap(cube: jax.Array) -> jax.Array:
    """Lambertian irradiance convolution over the full sphere.

    Runs as ONE (6R^2 x 6R^2) x (6R^2 x C) matmul — the MXU formulation of
    the CUDA gather loop.  Intended for small R (16).
    """
    six, r, _, c = cube.shape
    dirs = all_face_dirs(r).reshape(-1, 3)            # (M,3)
    sa = texel_solid_angles(r)
    sa = jnp.broadcast_to(sa[None], (6, r, r)).reshape(-1)
    cosw = jnp.maximum(dirs @ dirs.T, 0.0) * sa[None, :]   # (M,M)
    colors = cube.reshape(-1, c)
    out = (cosw @ colors) / jnp.maximum(
        jnp.sum(cosw, axis=1, keepdims=True), 1e-8)
    return out.reshape(6, r, r, c)


# ---------------------------------------------------------------------------
# GGX specular prefilter (reference c_src/cubemap.cu specular_cubemap +
# specular_bounds; here: filtered importance sampling)
# ---------------------------------------------------------------------------

def _hammersley(n: int) -> jax.Array:
    """(n, 2) low-discrepancy sequence (van der Corput radical inverse)."""
    i = jnp.arange(n, dtype=jnp.uint32)
    u = jnp.uint32
    bits = (i << u(16)) | (i >> u(16))
    bits = ((bits & u(0x55555555)) << u(1)) | ((bits & u(0xAAAAAAAA)) >> u(1))
    bits = ((bits & u(0x33333333)) << u(2)) | ((bits & u(0xCCCCCCCC)) >> u(2))
    bits = ((bits & u(0x0F0F0F0F)) << u(4)) | ((bits & u(0xF0F0F0F0)) >> u(4))
    bits = ((bits & u(0x00FF00FF)) << u(8)) | ((bits & u(0xFF00FF00)) >> u(8))
    rad = bits.astype(jnp.float32) * (1.0 / 4294967296.0)
    return jnp.stack([i.astype(jnp.float32) / n, rad], axis=-1)


def _ggx_sample_h(xi: jax.Array, roughness: float) -> jax.Array:
    """Importance-sample the GGX NDF around +z.  xi (..., 2) -> (..., 3)."""
    a = roughness * roughness
    phi = 2.0 * math.pi * xi[..., 0]
    cos_t = jnp.sqrt((1.0 - xi[..., 1])
                     / (1.0 + (a * a - 1.0) * xi[..., 1] + 1e-12))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t],
                     axis=-1)


def specular_cubemap(cube: jax.Array, roughness: float,
                     num_samples: int = 256,
                     chunk: int = 32) -> jax.Array:
    """GGX-prefiltered cubemap at the given roughness (N=V=R assumption of
    the split-sum approximation).  Output resolution = input resolution.
    """
    six, r, _, c = cube.shape
    chunk = min(chunk, num_samples)
    num_samples = (num_samples // chunk) * chunk
    n_dirs = all_face_dirs(r)                         # (6,R,R,3) = N = V = R
    # tangent frame per texel
    up = jnp.where(jnp.abs(n_dirs[..., 2:3]) < 0.999,
                   jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
    t = jnp.cross(up, n_dirs)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-8)
    b = jnp.cross(n_dirs, t)

    xis = _hammersley(num_samples)
    hs = _ggx_sample_h(xis, roughness)                # (S,3) in local frame

    def body(carry, h_chunk):
        acc, wsum = carry
        # local -> world: h = hx*t + hy*b + hz*n  for each texel
        h = (t[..., None, :] * h_chunk[:, 0, None]
             + b[..., None, :] * h_chunk[:, 1, None]
             + n_dirs[..., None, :] * h_chunk[:, 2, None])  # (6,R,R,S',3)
        v = n_dirs[..., None, :]
        l = 2.0 * jnp.sum(v * h, -1, keepdims=True) * h - v
        ndotl = jnp.maximum(jnp.sum(n_dirs[..., None, :] * l, -1), 0.0)
        col = sample_cubemap(cube, l)                 # (6,R,R,S',C)
        acc = acc + jnp.sum(col * ndotl[..., None], axis=-2)
        wsum = wsum + jnp.sum(ndotl, axis=-1)
        return (acc, wsum), None

    acc0 = jnp.zeros((6, r, r, c))
    w0 = jnp.zeros((6, r, r))
    (acc, wsum), _ = jax.lax.scan(
        body, (acc0, w0), hs.reshape(-1, chunk, 3))
    return acc / jnp.maximum(wsum[..., None], 1e-6)


def build_env_mips(base_cube: jax.Array, min_res: int = 16,
                   min_roughness: float = 0.08, max_roughness: float = 0.5,
                   num_samples: int = 256):
    """Build the specular mip chain + diffuse map exactly like the offline
    tool (reference light2map.py:35-48 build_mips; roughness ramp matching
    nvdiffrec light.py): returns (specular_mips list, diffuse (6,m,m,C)).

    Level l of L: roughness = min_r + (max_r-min_r) * l/(L-1); diffuse from
    the coarsest mip.
    """
    mips = [base_cube]
    while mips[-1].shape[1] > min_res:
        mips.append(downsample_cubemap(mips[-1]))
    n = len(mips)
    spec = []
    for l, m in enumerate(mips):
        rough = min_roughness + (max_roughness - min_roughness) * (
            l / max(n - 1, 1))
        spec.append(specular_cubemap(m, float(rough),
                                     num_samples=num_samples))
    diffuse = diffuse_cubemap(mips[-1])
    return spec, diffuse
