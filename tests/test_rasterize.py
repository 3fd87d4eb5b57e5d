"""Rasterizer correctness tests (TPU equivalent of nvdiffrast usage in
reference src/utils/render.py:181-258)."""

import jax.numpy as jnp
import numpy as np

from unirenderer_tpu.ops.rasterize import (
    RastOutput, interpolate, rasterize, ssaa_downsample,
)


def _quad(z=0.5, w=1.0, half=0.5):
    """Two triangles covering [-half, half]^2 at depth z (clip space)."""
    pos = jnp.asarray([
        [-half, -half, z, w],
        [half, -half, z, w],
        [half, half, z, w],
        [-half, half, z, w],
    ], jnp.float32)
    tri = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    return pos, tri


def test_center_quad_coverage():
    pos, tri = _quad(half=0.5)
    rast = rasterize(pos, tri, 32, 32, chunk=8)
    ids = np.asarray(rast.tri_id)
    # central pixel covered, corners not
    assert ids[16, 16] > 0
    assert ids[0, 0] == 0 and ids[31, 31] == 0
    # coverage fraction ~ (0.5)^2 = 25% of pixels
    frac = (ids > 0).mean()
    assert 0.2 < frac < 0.3


def test_fullscreen_quad_full_coverage():
    pos, tri = _quad(half=1.0)
    rast = rasterize(pos, tri, 16, 16, chunk=8)
    assert (np.asarray(rast.tri_id) > 0).all()


def test_depth_test_nearer_wins():
    posA, triA = _quad(z=0.8, half=1.0)       # far quad
    posB, _ = _quad(z=0.2, half=0.4)          # near quad, smaller
    pos = jnp.concatenate([posA, posB])
    tri = jnp.concatenate([triA, triA + 4])
    rast = rasterize(pos, tri, 32, 32, chunk=8)
    ids = np.asarray(rast.tri_id)
    assert ids[16, 16] >= 3                   # near quad triangle (id 3 or 4)
    assert 0 < ids[2, 16] <= 2                # border: far quad


def test_barycentric_interpolation_linear():
    """Interpolating vertex x-coordinates must reproduce pixel x (NDC)."""
    pos, tri = _quad(half=1.0)
    h = w = 64
    rast = rasterize(pos, tri, h, w, chunk=8)
    attr = pos[:, 0:1]                        # x coordinate as attribute
    img, mask = interpolate(attr, rast, tri)
    img = np.asarray(img)[..., 0]
    xs = (np.arange(w) + 0.5) / w * 2 - 1     # pixel-center NDC x
    expect = np.tile(xs, (h, 1))
    np.testing.assert_allclose(img, expect, atol=1e-4)


def test_perspective_correct_barycentrics():
    """A triangle with differing w must interpolate 1/w linearly in screen
    space: attribute = w interpolated perspective-correct equals analytic."""
    pos = jnp.asarray([
        [-1.0, -1.0, 0.0, 1.0],
        [3.0, -1.0, 0.0, 2.0],      # ndc x = 1.5
        [-1.0, 3.0, 0.0, 2.0],
    ], jnp.float32)
    tri = jnp.asarray([[0, 1, 2]], jnp.int32)
    rast = rasterize(pos, tri, 32, 32, chunk=8)
    # attribute equal to w: perspective-correct interpolation of w gives
    # 1 / (linear interp of 1/w) — check one interior pixel consistency
    img, mask = interpolate(pos[:, 3:4], rast, tri)
    m = np.asarray(mask)[..., 0] > 0
    vals = np.asarray(img)[..., 0][m]
    assert vals.min() >= 1.0 - 1e-3 and vals.max() <= 2.0 + 1e-3


def test_depth_peel_second_layer():
    posA, triA = _quad(z=0.2, half=1.0)       # near fullscreen
    posB, _ = _quad(z=0.8, half=1.0)          # far fullscreen
    pos = jnp.concatenate([posA, posB])
    tri = jnp.concatenate([triA, triA + 4])
    r1 = rasterize(pos, tri, 16, 16, chunk=8)
    assert (np.asarray(r1.tri_id) <= 2).all() and (np.asarray(r1.tri_id) > 0).all()
    r2 = rasterize(pos, tri, 16, 16, chunk=8, prev_z=r1.z)
    assert (np.asarray(r2.tri_id) >= 3).all()


def test_degenerate_and_padding_triangles_ignored():
    pos, tri = _quad(half=0.5)
    tri_deg = jnp.concatenate(
        [tri, jnp.asarray([[0, 0, 1]], jnp.int32)])   # degenerate
    r = rasterize(pos, tri_deg, 16, 16, chunk=8)      # padded to 8
    assert np.asarray(r.tri_id).max() <= 2


def test_ssaa_downsample():
    img = jnp.ones((8, 8, 3))
    out = ssaa_downsample(img, 2)
    assert out.shape == (4, 4, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0)
