"""Data layer tests: OBJ IO (native vs python), HDR roundtrip, dataset
resampling robustness, render-collate end-to-end (SURVEY C9/C14/C15/C16)."""

import os
import tempfile

import numpy as np
import pytest

from unirenderer_tpu.data import hdr, obj_io
from unirenderer_tpu.data.objaverse import (
    ObjaverseData, collate_render, material_grid, pad_mesh,
)
from unirenderer_tpu.core.config import DataConfig


OBJ_TEXT = """
v -1 -1 0
v 1 -1 0
v 1 1 0
v -1 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1
f 1/1/1 3/3/1 4/4/1
"""


@pytest.fixture()
def obj_file(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(OBJ_TEXT)
    return str(p)


def test_native_and_python_parser_agree(obj_file):
    a = obj_io.load_obj(obj_file, use_native=True)
    b = obj_io.load_obj(obj_file, use_native=False)
    for k in ("v_pos", "t_idx", "v_nrm", "v_tex", "v_tng"):
        np.testing.assert_allclose(a[k], b[k], atol=1e-6)


def test_load_obj_unified_topology(obj_file):
    m = obj_io.load_obj(obj_file)
    assert m["v_pos"].shape == (4, 3)
    assert m["t_idx"].shape == (2, 3)
    assert m["v_nrm"].shape == (4, 3)
    np.testing.assert_allclose(m["v_nrm"], [[0, 0, 1]] * 4)
    # normalized to unit cube
    assert abs(np.abs(m["v_pos"]).max() - 1.0) < 1e-5


def test_hdr_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(
        0.01, 10.0, (16, 32, 3)).astype(np.float32)
    p = str(tmp_path / "t.hdr")
    hdr.write_hdr(p, img)
    back = hdr.read_hdr(p)
    assert back.shape == img.shape
    # RGBE precision is ~1/256 RELATIVE TO THE MAX channel (shared exponent)
    tol = img.max(axis=-1, keepdims=True) / 256.0 + 1e-3
    assert (np.abs(back - img) <= tol).all()


def test_material_grid():
    g = material_grid(11)
    assert len(g) == 121
    assert (0.0, 0.0) in g and (1.0, 1.0) in g


def _make_dataset(tmp_path, n_mesh=2, bad=0):
    mesh_dir = tmp_path / "meshes"
    env_dir = tmp_path / "envs" / "e0"
    mesh_dir.mkdir()
    env_dir.mkdir(parents=True)
    # quad in the yz-plane facing +x: visible from the reference's pinned
    # camera (az=0, elev=90 -> eye on the +x axis)
    v = np.asarray([[0, -1, -1], [0, 1, -1], [0, 1, 1], [0, -1, 1]],
                   np.float32)
    t = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    n = np.tile(np.asarray([[1, 0, 0]], np.float32), (4, 1))
    paths = []
    for i in range(n_mesh):
        p = str(mesh_dir / f"m{i}.npz")
        np.savez(p, v_pos=v, t_idx=t, v_nrm=n, v_tex=np.zeros((4, 2),
                 np.float32), v_tng=np.tile(
                     np.asarray([[1, 0, 0]], np.float32), (4, 1)),
                 kd=np.asarray([0.5, 0.5, 0.5], np.float32))
        paths.append(p)
    for i in range(bad):
        paths.append(str(mesh_dir / f"missing{i}.npz"))
    for l, r in enumerate((8, 4)):
        np.save(str(env_dir / f"specular_{l}.npy"),
                np.ones((6, r, r, 3), np.float32))
    np.save(str(env_dir / "diffuse.npy"), np.ones((6, 4, 4, 3), np.float32))
    cfg = DataConfig(resolution=32)
    return ObjaverseData(cfg, paths, [str(env_dir)], v_pad=8, t_pad=4)


def test_dataset_getitem(tmp_path):
    ds = _make_dataset(tmp_path)
    item = ds[0]
    assert item["mesh"]["v_pos"].shape == (8, 3)
    assert item["mesh"]["t_idx"].shape == (4, 3)
    assert 0 <= item["metallic"] <= 1
    assert item["azimuth"] == 0.0 and item["elevation"] == 90.0


def test_dataset_resamples_missing(tmp_path):
    """Missing meshes resample instead of crashing
    (reference dataset/objaverse.py:284-286)."""
    ds = _make_dataset(tmp_path, n_mesh=1, bad=3)
    for i in range(len(ds)):
        item = ds[i]
        assert item is not None


def test_collate_render_batch(tmp_path):
    ds = _make_dataset(tmp_path)
    batch = collate_render([ds[0], ds[1]], resolution=32)
    for k in ("image", "mask", "material", "normal", "albedo",
              "spec_light", "diff_light", "env"):
        assert batch[k].shape == (2, 32, 32, 3), k
        arr = np.asarray(batch[k])
        assert np.isfinite(arr).all()
        assert arr.min() >= -1.001 and arr.max() <= 1.001
    # the quad faces +z; camera at elevation 90 looks from +x side...
    # at least some of the mask must be on
    assert np.asarray(batch["mask"]).max() == 1.0


def test_pad_mesh_overflow_raises():
    m = {"v_pos": np.zeros((10, 3), np.float32),
         "t_idx": np.zeros((4, 3), np.int32)}
    with pytest.raises(ValueError):
        pad_mesh(m, 8, 8)


def test_collate_render_ssaa_antialiases_edges(tmp_path):
    """ssaa=2 must produce fractional edge coverage in the mask (the
    dr.antialias substitute); ssaa=1 yields only hard +-1 values."""
    ds = _make_dataset(tmp_path)
    item = ds[0]
    # rotate the quad so its edges are slanted in screen space (an
    # axis-aligned quad has no partially covered pixels to antialias)
    c, s = np.cos(0.3), np.sin(0.3)
    rot = np.asarray([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    item["mesh"]["v_pos"] = item["mesh"]["v_pos"] @ rot.T
    hard = collate_render([item], resolution=32, ssaa=1)
    soft = collate_render([item], resolution=32, ssaa=2)
    for k in ("image", "mask", "normal", "albedo"):
        assert soft[k].shape == (1, 32, 32, 3), k
    mh = np.asarray(hard["mask"])
    ms = np.asarray(soft["mask"])
    assert np.isin(mh, [-1.0, 1.0]).all()
    frac = (~np.isclose(np.abs(ms), 1.0)).sum()
    assert frac > 0                 # fractional coverage exists at edges
    # coverage is preserved overall
    assert abs((ms > 0).mean() - (mh > 0).mean()) < 0.1


def test_collate_render_uses_kd_texture(tmp_path):
    """A mesh with a map_Kd image renders the TEXTURE's colors into the
    albedo buffer (reference Material kd Texture2D path,
    src/utils/material.py:49-110), not the constant kd."""
    from PIL import Image
    ds = _make_dataset(tmp_path)
    # write a solid red texture next to the mesh and point kd_map at it
    tex_path = tmp_path / "meshes" / "red.png"
    Image.fromarray(
        np.full((8, 8, 3), [255, 0, 0], np.uint8)).save(str(tex_path))
    m0 = dict(np.load(str(tmp_path / "meshes" / "m0.npz")))
    np.savez(str(tmp_path / "meshes" / "m0.npz"), **m0,
             kd_map=np.asarray(str(tex_path)))
    item = ds[0]
    batch = collate_render([item], resolution=32, ssaa=1)
    alb = (np.asarray(batch["albedo"]) + 1) / 2
    mask = (np.asarray(batch["mask"]) + 1) / 2 > 0.5
    red = alb[..., 0][mask[..., 0]]
    green = alb[..., 1][mask[..., 0]]
    assert red.mean() > 0.5          # red channel dominates
    assert green.mean() < 0.1


# ---------------------------------------------------------------------------
# Normal-map frame convention (round-3 fix: canonical-camera-relative)
# ---------------------------------------------------------------------------


def _sphere_item(az, el):
    from unirenderer_tpu.render.mesh import make_sphere

    s = make_sphere(16)
    kd = np.asarray([0.6, 0.5, 0.4], np.float32)
    mesh = {
        "v_pos": np.asarray(s.v_pos), "t_idx": np.asarray(s.t_pos_idx),
        "v_nrm": np.asarray(s.v_nrm), "v_tex": np.asarray(s.v_tex),
        "v_tng": np.asarray(s.v_tng), "kd": kd,
        "kd_tex": np.broadcast_to(kd, (16, 16, 3)).copy(),
    }
    env = {"specular_0": np.ones((6, 8, 8, 3), np.float32),
           "specular_1": np.ones((6, 4, 4, 3), np.float32),
           "diffuse": np.ones((6, 4, 4, 3), np.float32)}
    return dict(mesh=mesh, env=env, metallic=0.3, roughness=0.5,
                azimuth=az, elevation=el, distance=2.5)


def test_canonical_normal_rotation_identity_at_pin():
    """At the reference's pinned train camera (az=0, el=90,
    dataset/objaverse.py:207-208) the normal frame is bit-for-bit the old
    world-space convention."""
    from unirenderer_tpu.render.camera import canonical_normal_rotation

    q = np.asarray(canonical_normal_rotation(0.0, 90.0))
    np.testing.assert_allclose(q, np.eye(3), atol=1e-6)


def test_canonical_normal_rotation_is_rotation():
    from unirenderer_tpu.render.camera import canonical_normal_rotation

    for az, el in ((137.0, 64.0), (291.5, 118.0), (45.0, 90.0)):
        q = np.asarray(canonical_normal_rotation(az, el))
        np.testing.assert_allclose(q @ q.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(q) > 0.99


def test_collate_normals_view_invariant_for_sphere():
    """A sphere looks the same from every azimuth, so its canonical-frame
    normal map must be the same too — the invariance that makes
    image->normal learnable under random cameras (world-space targets
    rotate with the unobservable camera and sit at chance: rounds 1-2)."""
    # 90 deg is a multiple of the 16-segment sphere's facet angle, so the
    # rotated mesh maps onto itself exactly and only the frame differs
    b0 = collate_render([_sphere_item(0.0, 90.0)], resolution=32)
    b1 = collate_render([_sphere_item(90.0, 90.0)], resolution=32)
    n0 = np.asarray(b0["normal"])[0]
    n1 = np.asarray(b1["normal"])[0]
    m = (np.asarray(b0["mask"])[0, ..., 0] > 0.99) & \
        (np.asarray(b1["mask"])[0, ..., 0] > 0.99)
    # interior pixels (rasterization differs at silhouette edges)
    assert m.sum() > 50
    np.testing.assert_allclose(n0[m], n1[m], atol=0.08)
    # and the map faces the canonical camera (+x side): mean normal x > 0
    assert n0[m][:, 0].mean() > 0.3
