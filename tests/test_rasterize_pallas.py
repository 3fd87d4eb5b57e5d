"""Pallas tile rasterizer parity vs the JAX reference rasterizer —
every scenario from tests/test_rasterize.py, interpret mode on CPU
(compiled path + speedup recorded by tools/bench_raster.py on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirenderer_tpu.ops.rasterize import rasterize
from unirenderer_tpu.ops.rasterize_pallas import rasterize_pallas


def _quad(z=0.5, w=1.0, half=0.5):
    pos = jnp.asarray([
        [-half, -half, z, w],
        [half, -half, z, w],
        [half, half, z, w],
        [-half, half, z, w],
    ], jnp.float32)
    tri = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    return pos, tri


def _assert_match(a, b):
    """Bitwise-equal except where two triangles hit a pixel at (near-)
    identical depth — a coplanar tie (e.g. a quad's shared diagonal) whose
    winner is fp-accumulation-order noise (JAX path evaluates edges via a
    matmul, the kernel via an FMA chain; nvdiffrast gives no tie guarantee
    either).  At tied pixels both picks must be valid hits at the same z."""
    ia = np.asarray(a.tri_id)
    ib = np.asarray(b.tri_id)
    za = np.asarray(a.z, np.float64)
    zb = np.asarray(b.z, np.float64)
    agree = ia == ib
    # coverage must agree everywhere; ties only swap WHICH triangle won
    np.testing.assert_array_equal(ib > 0, ia > 0)
    np.testing.assert_allclose(zb, za, atol=1e-5)
    disagree = ~agree
    assert disagree.mean() < 0.02, f"{disagree.sum()} non-tie mismatches"
    assert (ia[disagree] > 0).all() and (ib[disagree] > 0).all()
    for f in ("bary_u", "bary_v"):
        ga = np.asarray(getattr(a, f), np.float64)
        gb = np.asarray(getattr(b, f), np.float64)
        np.testing.assert_allclose(gb[agree], ga[agree], atol=1e-5,
                                   err_msg=f)


@pytest.mark.parametrize("half,hw", [(0.5, 32), (1.0, 16), (0.3, 64)])
def test_pallas_matches_jax_quad(half, hw):
    pos, tri = _quad(half=half)
    a = rasterize(pos, tri, hw, hw, chunk=8)
    b = rasterize_pallas(pos, tri, hw, hw, chunk=8, interpret=True)
    _assert_match(a, b)


def test_pallas_matches_jax_depth_and_multichunk():
    """Two overlapping quads + enough padding for multiple chunks.

    The near quad is offset so its shared diagonal does not pass exactly
    through pixel centers: at exact-on-edge pixels the f32 edge functions
    round differently per accumulation order, and BOTH rasterizers produce
    implementation-dependent hairline cracks there (nvdiffrast avoids the
    degeneracy with fixed-point fill rules)."""
    posA, triA = _quad(z=0.8, half=1.0)
    posB, _ = _quad(z=0.2, half=0.4)
    posB = posB.at[:, 0].add(0.013)
    pos = jnp.concatenate([posA, posB])
    tri = jnp.concatenate([triA, triA + 4])
    a = rasterize(pos, tri, 32, 32, chunk=2)      # 2 chunks of 2 tris
    b = rasterize_pallas(pos, tri, 32, 32, chunk=2, interpret=True)
    _assert_match(a, b)


def test_pallas_matches_jax_perspective():
    pos = jnp.asarray([
        [-1.0, -1.0, 0.0, 1.0],
        [3.0, -1.0, 0.0, 2.0],
        [-1.0, 3.0, 0.0, 2.0],
    ], jnp.float32)
    tri = jnp.asarray([[0, 1, 2]], jnp.int32)
    a = rasterize(pos, tri, 32, 32, chunk=8)
    b = rasterize_pallas(pos, tri, 32, 32, chunk=8, interpret=True)
    _assert_match(a, b)


def test_pallas_depth_peel_second_layer():
    posA, triA = _quad(z=0.2, half=1.0)
    posB, _ = _quad(z=0.8, half=1.0)
    pos = jnp.concatenate([posA, posB])
    tri = jnp.concatenate([triA, triA + 4])
    a1 = rasterize(pos, tri, 16, 16, chunk=8)
    b1 = rasterize_pallas(pos, tri, 16, 16, chunk=8, interpret=True)
    _assert_match(a1, b1)
    a2 = rasterize(pos, tri, 16, 16, chunk=8, prev_z=a1.z)
    b2 = rasterize_pallas(pos, tri, 16, 16, chunk=8, prev_z=b1.z,
                          interpret=True)
    _assert_match(a2, b2)
    assert (np.asarray(b2.tri_id) >= 3).all()     # peeled to the far quad


def test_pallas_degenerate_and_behind_ignored():
    pos, tri = _quad(half=0.5)
    pos = jnp.concatenate(
        [pos, jnp.asarray([[0.0, 0.0, 0.0, -1.0]], jnp.float32)])
    tri_bad = jnp.concatenate(
        [tri, jnp.asarray([[0, 0, 1], [0, 1, 4]], jnp.int32)])
    a = rasterize(pos, tri_bad, 16, 16, chunk=8)
    b = rasterize_pallas(pos, tri_bad, 16, 16, chunk=8, interpret=True)
    _assert_match(a, b)
    assert np.asarray(b.tri_id).max() <= 2


def test_pallas_sphere_mesh():
    """Realistic closed mesh: analytic sphere, off-center camera."""
    from unirenderer_tpu.ops.transform import xfm_points
    from unirenderer_tpu.render import camera
    from unirenderer_tpu.render.mesh import make_sphere

    m = make_sphere(8)
    mvp, campos = camera.spherical_camera(30.0, 70.0, 3.5)
    pos_clip = xfm_points(jnp.asarray(m.v_pos)[None], mvp[None])[0]
    tri = jnp.asarray(m.t_pos_idx)
    a = rasterize(pos_clip, tri, 32, 32, chunk=64)
    b = rasterize_pallas(pos_clip, tri, 32, 32, chunk=64, interpret=True)
    _assert_match(a, b)
    assert (np.asarray(b.tri_id) > 0).any()
