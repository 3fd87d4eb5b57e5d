"""End-to-end renderer tests: sphere under uniform/directional light must
obey analytic shading properties (TPU equivalent of the reference's visual
validation; SURVEY R1)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirenderer_tpu.ops import texture as tex
from unirenderer_tpu.render import camera, render
from unirenderer_tpu.render.light import EnvLight, env_from_latlong
from unirenderer_tpu.render.mesh import make_sphere


@pytest.fixture(scope="module")
def sphere():
    return make_sphere(12)


@pytest.fixture(scope="module")
def white_env():
    spec = tuple(jnp.ones((6, r, r, 3)) for r in (16, 8, 4))
    return EnvLight(specular=spec, diffuse=jnp.ones((6, 4, 4, 3)))


@pytest.fixture(scope="module")
def cam():
    return camera.spherical_camera(0.0, 90.0, 4.0, fovy_deg=30.0)


def test_render_sphere_buffers(sphere, white_env, cam):
    mvp, campos = cam
    out = render.render_mesh(sphere, mvp, campos, white_env,
                             metallic=0.0, roughness=0.5, resolution=64,
                             chunk=64)
    for k in ("shaded", "spec_light", "diff_light", "gb_normal", "normal",
              "albedo"):
        assert out[k].shape == (64, 64, 4), k
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert out["depth"].shape == (64, 64, 1)
    mask = np.asarray(out["mask"])[..., 0]
    # sphere of radius 1 at distance 4 with 30 deg fov: covered fraction
    frac = mask.mean()
    assert 0.4 < frac < 0.9
    # center covered, corners empty
    assert mask[32, 32] == 1.0 and mask[0, 0] == 0.0


def test_normals_point_at_camera_center(sphere, white_env, cam):
    mvp, campos = cam
    out = render.render_mesh(sphere, mvp, campos, white_env,
                             metallic=0.0, roughness=0.5, resolution=64,
                             chunk=64)
    n_center = np.asarray(out["gb_normal"])[32, 32, :3]
    view_dir = np.asarray(campos) / np.linalg.norm(np.asarray(campos))
    assert float(n_center @ view_dir) > 0.95


def test_white_env_diffuse_light_is_white(sphere, white_env, cam):
    """Under a uniform unit environment, diffuse light == 1 everywhere on
    the surface (energy conservation of the irradiance prefilter)."""
    mvp, campos = cam
    out = render.render_mesh(sphere, mvp, campos, white_env,
                             metallic=0.0, roughness=0.5, resolution=64,
                             chunk=64)
    mask = np.asarray(out["mask"])[..., 0] > 0
    diff = np.asarray(out["diff_light"])[..., 0][mask]
    assert diff.min() > 0.95          # srgb(1.0) == 1.0


def test_metallic_kills_diffuse(sphere, white_env, cam):
    mvp, campos = cam
    out0 = render.render_mesh(sphere, mvp, campos, white_env,
                              metallic=0.0, roughness=0.4, resolution=32,
                              chunk=64, kd_const=jnp.asarray([0.5, 0.5, 0.5]))
    out1 = render.render_mesh(sphere, mvp, campos, white_env,
                              metallic=1.0, roughness=0.4, resolution=32,
                              chunk=64, kd_const=jnp.asarray([0.5, 0.5, 0.5]))
    m = np.asarray(out0["mask"])[..., 0] > 0
    # shading still present but the diffuse *component* contribution drops:
    # compare shaded - spec-only correlation via diff_col = kd*(1-metallic)
    s0 = np.asarray(out0["shaded"])[..., 0][m].mean()
    s1 = np.asarray(out1["shaded"])[..., 0][m].mean()
    assert s0 != pytest.approx(s1, rel=1e-3)


def test_directional_env_shading_gradient(sphere, cam):
    """+y-bright environment must light the top of the sphere more than
    the bottom."""
    mvp, campos = camera.spherical_camera(0.0, 90.0, 4.0)
    cube = np.zeros((6, 16, 16, 3), np.float32)
    cube[2] = 4.0                                     # +y face bright
    from unirenderer_tpu.ops import cubemap as cm
    spec = [jnp.asarray(cube)]
    c = jnp.asarray(cube)
    while c.shape[1] > 4:
        c = cm.downsample_cubemap(c)
        spec.append(c)
    env = EnvLight(specular=tuple(spec), diffuse=cm.diffuse_cubemap(c))
    out = render.render_mesh(sphere, mvp, campos, env, metallic=0.0,
                             roughness=0.9, resolution=64, chunk=64)
    img = np.asarray(out["diff_light"])[..., 0]
    mask = np.asarray(out["mask"])[..., 0] > 0
    top = img[:28][mask[:28]].mean()                  # upper sphere rows
    bottom = img[36:][mask[36:]].mean()
    assert top > bottom * 1.5


def test_env_from_latlong_pipeline():
    ll = jnp.ones((16, 32, 3)) * 0.5
    env = env_from_latlong(ll, res=16, min_res=4, num_samples=16)
    assert env.specular[0].shape == (6, 16, 16, 3)
    assert env.diffuse.shape == (6, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(env.diffuse), 0.5, rtol=1e-2)


def test_fg_lut_properties():
    lut = tex.fg_lut(res=64, num_samples=64)
    assert lut.shape == (1, 64, 64, 2)
    assert np.isfinite(lut).all()
    # scale+bias bounded by 1 (energy conservation)
    assert lut[..., 0].max() <= 1.2 and lut[..., 1].max() <= 1.2
    assert lut.min() >= 0.0


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    back = np.asarray(render.srgb_to_rgb(render.rgb_to_srgb(x)))
    np.testing.assert_allclose(back, np.asarray(x), atol=1e-5)


# ---------------------------------------------------------------------------
# Mip-mapped 2D texture sampling (reference src/utils/texture.py:21-60)
# ---------------------------------------------------------------------------

def test_build_texture_mips_chain():
    t = jnp.asarray(np.random.default_rng(0).uniform(
        size=(16, 16, 3)).astype(np.float32))
    mips = tex.build_texture_mips(t)
    assert [m.shape[0] for m in mips] == [16, 8, 4, 2, 1]
    # each level is the 2x average of the previous
    np.testing.assert_allclose(
        np.asarray(mips[1]),
        np.asarray(t).reshape(8, 2, 8, 2, 3).mean((1, 3)), rtol=1e-6)
    # 1x1 level is the global mean
    np.testing.assert_allclose(np.asarray(mips[-1])[0, 0],
                               np.asarray(t).mean((0, 1)), rtol=1e-5)


def test_sample_texture2d_mip_level_selection():
    """Explicit integer mip level must equal direct bilinear on that mip;
    zero derivatives select the base level."""
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    mips = tex.build_texture_mips(t)
    uv = jnp.asarray(rng.uniform(0.1, 0.9, size=(50, 2)).astype(np.float32))
    for lvl in (0, 2):
        got = tex.sample_texture2d_mip(
            mips, uv, mip_level=jnp.full((50,), float(lvl)))
        want = tex.sample_texture2d(mips[lvl], uv, wrap="wrap")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
    base = tex.sample_texture2d_mip(mips, uv,
                                    uv_deriv=jnp.zeros((50, 4)))
    want = tex.sample_texture2d(mips[0], uv, wrap="wrap")
    np.testing.assert_allclose(np.asarray(base), np.asarray(want), atol=1e-6)


def test_uv_mip_level_footprint_rule():
    """One-texel-per-pixel footprint -> level 0; 4-texel -> level 2."""
    d = jnp.asarray([[1 / 32, 0.0, 0.0, 1 / 32],      # 1 texel on a 32-map
                     [4 / 32, 0.0, 0.0, 4 / 32]])     # 4 texels
    lvl = np.asarray(tex.uv_mip_level(d, 32, 32))
    np.testing.assert_allclose(lvl, [0.0, 2.0], atol=1e-5)


def test_sample_texture2d_mip_filters_checkerboard():
    """A high-frequency checkerboard sampled with a large footprint must
    return (near) the mean gray instead of aliasing."""
    g = np.indices((64, 64)).sum(0) % 2
    t = jnp.asarray(np.repeat(g[..., None], 3, -1).astype(np.float32))
    mips = tex.build_texture_mips(t)
    uv = jnp.asarray(np.random.default_rng(2).uniform(
        0.2, 0.8, size=(64, 2)).astype(np.float32))
    big = jnp.broadcast_to(jnp.asarray([0.25, 0.0, 0.0, 0.25]), (64, 4))
    out = np.asarray(tex.sample_texture2d_mip(mips, uv, uv_deriv=big))
    np.testing.assert_allclose(out, 0.5, atol=0.05)
    centers = jnp.asarray(
        np.stack([(np.arange(16) + 0.5) / 64,
                  np.full(16, 0.5 / 64)], -1).astype(np.float32))
    sharp = np.asarray(tex.sample_texture2d_mip(
        mips, centers, uv_deriv=jnp.zeros((16, 4))))
    assert sharp.std() > 0.2       # base level keeps the pattern


def test_screen_uv_derivs_wrap_seam():
    uvs = jnp.asarray(np.stack(
        [np.linspace(0, 1.5, 8) % 1.0, np.full(8, 0.5)], -1))[None]
    uvs = jnp.broadcast_to(uvs, (4, 8, 2))
    d = np.asarray(tex.screen_uv_derivs(uvs, wrap=True))
    assert np.abs(d).max() < 0.45      # the 0.96->0.17 wrap reads small


def test_conditioning_light_maps_match_renderer(sphere):
    """The relight-path reconstruction of spec/diff conditioning maps from
    a normal map (render/light.conditioning_light_maps) must match the
    renderer's own split-sum buffers for a distant camera (where the
    constant-view-dir approximation holds)."""
    from unirenderer_tpu.render.light import conditioning_light_maps

    from unirenderer_tpu.ops import cubemap as cm

    def smooth_cube(r):                    # value = smooth fn of direction
        d = np.asarray(cm.all_face_dirs(r))
        return jnp.asarray((0.55 + 0.35 * d).astype(np.float32))

    spec = tuple(smooth_cube(r) for r in (16, 8, 4))
    env = EnvLight(specular=spec, diffuse=smooth_cube(4))
    # camera far away on +x: per-pixel view dirs ~ constant (1,0,0)
    mvp, campos = camera.spherical_camera(0.0, 90.0, 40.0, fovy_deg=3.0)
    rough = 0.4
    bufs = render.render_mesh(sphere, mvp, campos, env, 0.3, rough, 64)
    mask = np.asarray(bufs["mask"])[..., 0] > 0.5
    nrm = bufs["gb_normal"][..., :3]
    spec_l, diff_l = conditioning_light_maps(
        env, nrm, jnp.asarray(rough), view_dir=(1.0, 0.0, 0.0))
    for got, key in ((diff_l, "diff_light"), (spec_l, "spec_light")):
        want = np.asarray(bufs[key])[..., :3]
        err = np.abs(np.asarray(got) - want)[mask]
        assert err.max() < 0.05, (key, err.max())
