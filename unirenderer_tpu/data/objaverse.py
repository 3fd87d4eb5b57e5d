"""Objaverse-style dataset + on-device render collate.

Reference: dataset/objaverse.py (ObjaverseData :92, ObjaverseData_test :304)
yields mesh path + camera + env mipmaps + (metallic, roughness); the GPU
render happens inside collate_fn (train/train.py:184-439).  Here the host
side stays numpy (mesh select/pad, pose/material sampling, env selection)
and ONE jitted vmapped render produces the 9 buffers for the whole batch.

Robustness matches the reference: a missing/corrupt mesh resamples another
index (dataset/objaverse.py:284-286).
"""

from __future__ import annotations

import functools
import json
import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unirenderer_tpu.core.config import DataConfig
from unirenderer_tpu.ops import texture as tex
from unirenderer_tpu.render import camera as cam
from unirenderer_tpu.render.light import EnvLight
from unirenderer_tpu.render.mesh import Mesh
from unirenderer_tpu.render.render import composite_background, render_mesh


def material_grid(n: int = 11) -> List[Tuple[float, float]]:
    """The reference's 11x11 (metallic, roughness) grid
    (dataset/objaverse.py:133-134)."""
    vals = np.linspace(0.0, 1.0, n)
    return [(float(m), float(r)) for m in vals for r in vals]


def _resize_bilinear(img: np.ndarray, r: int) -> np.ndarray:
    """Host-side bilinear resize of an (H,W,3) float image to (r,r,3)."""
    h, w = img.shape[:2]
    yi = np.linspace(0, h - 1, r)
    xi = np.linspace(0, w - 1, r)
    y0 = np.clip(yi.astype(int), 0, h - 2)
    x0 = np.clip(xi.astype(int), 0, w - 2)
    fy = (yi - y0)[:, None, None]
    fx = (xi - x0)[None, :, None]
    a = img[y0][:, x0]
    b = img[y0][:, x0 + 1]
    c = img[y0 + 1][:, x0]
    d = img[y0 + 1][:, x0 + 1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx).astype(np.float32)


def load_mesh_npz(path: str) -> Dict[str, np.ndarray]:
    """Load a preprocessed mesh (.npz from tools/obj2mesh; the reference's
    .pth equivalent, obj2mesh.py:54-66)."""
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def pad_mesh(m: Dict[str, np.ndarray], v_pad: int, t_pad: int
             ) -> Dict[str, np.ndarray]:
    """Pad to static (v_pad, t_pad) sizes; padding triangles are degenerate
    (all-zero index) so the rasterizer ignores them."""
    out = dict(m)
    v = m["v_pos"].shape[0]
    t = m["t_idx"].shape[0]
    if v > v_pad or t > t_pad:
        raise ValueError(f"mesh exceeds pad sizes: V={v}>{v_pad} or "
                         f"T={t}>{t_pad}")
    for k in ("v_pos", "v_nrm", "v_tex", "v_tng"):
        if k in out:
            pad = np.zeros((v_pad - v,) + out[k].shape[1:], out[k].dtype)
            out[k] = np.concatenate([out[k], pad])
    out["t_idx"] = np.concatenate(
        [m["t_idx"], np.zeros((t_pad - t, 3), np.int32)])
    return out


class ObjaverseData:
    """Train dataset (reference dataset/objaverse.py:92-301).

    Items: preprocessed mesh (.npz) + random env (prefiltered npz dir) +
    (metallic, roughness) from the 11x11 grid + camera pose.  The reference
    train split PINS the camera at az=0/elev=90 (objaverse.py:207-208);
    `random_camera` makes that a choice (SURVEY 'reference bugs').
    """

    def __init__(self, cfg: DataConfig, mesh_paths: Sequence[str],
                 env_dirs: Sequence[str], seed: int = 0,
                 v_pad: Optional[int] = None, t_pad: Optional[int] = None,
                 test_mode: bool = False):
        self.cfg = cfg
        self.mesh_paths = list(mesh_paths)
        self.env_dirs = list(env_dirs)
        self.rng = random.Random(seed)
        self.grid = material_grid(cfg.material_grid)
        self.v_pad = v_pad if v_pad is not None else cfg.v_pad
        self.t_pad = t_pad if t_pad is not None else cfg.t_pad
        self.test_mode = test_mode
        self._env_cache: Dict[str, Dict[str, np.ndarray]] = {}

    def __len__(self):
        return len(self.mesh_paths)

    def _load_env(self, d: str) -> Dict[str, np.ndarray]:
        if d not in self._env_cache:
            files = {}
            i = 0
            while os.path.exists(os.path.join(d, f"specular_{i}.npy")):
                files[f"specular_{i}"] = np.load(
                    os.path.join(d, f"specular_{i}.npy"))
                i += 1
            files["diffuse"] = np.load(os.path.join(d, "diffuse.npy"))
            if i == 0:
                raise FileNotFoundError(f"no specular mips in {d}")
            self._env_cache[d] = files
        return self._env_cache[d]

    def __getitem__(self, idx: int) -> Dict:
        for _attempt in range(64):
            try:
                return self._get(idx)
            except (FileNotFoundError, ValueError, OSError):
                # resample like the reference (objaverse.py:284-286)
                idx = self.rng.randrange(len(self.mesh_paths))
        raise RuntimeError("too many unreadable samples")

    def _load_kd_texture(self, mesh: Dict, mesh_path: str) -> np.ndarray:
        """(R, R, 3) linear-space albedo texture: an embedded `kd_tex`
        array (tools/make_synthetic_data.py), the mesh's map_Kd image
        (reference Material/Texture2D kd, src/utils/material.py:49-110;
        stored in sRGB, converted to linear like nvdiffrec) or the
        constant kd color tiled."""
        r = self.cfg.texture_res
        if "kd_tex" in mesh:
            t = np.asarray(mesh["kd_tex"], np.float32)
            if t.shape[0] != r or t.shape[1] != r:
                t = _resize_bilinear(t, r)
            return t
        path = str(mesh.get("kd_map", ""))
        if path and not os.path.isabs(path):
            path = os.path.join(os.path.dirname(mesh_path), path)
        if path and os.path.exists(path):
            from PIL import Image
            img = np.asarray(Image.open(path).convert("RGB").resize(
                (r, r), Image.BILINEAR), np.float32) / 255.0
            lin = np.where(img > 0.04045,
                           ((img + 0.055) / 1.055) ** 2.4, img / 12.92)
            return lin.astype(np.float32)
        kd = np.asarray(mesh.get("kd",
                                 np.array([0.8, 0.8, 0.8], np.float32)))
        return np.broadcast_to(kd.astype(np.float32), (r, r, 3)).copy()

    def _get(self, idx: int) -> Dict:
        raw = load_mesh_npz(self.mesh_paths[idx])
        kd_tex = self._load_kd_texture(raw, self.mesh_paths[idx])
        mesh = pad_mesh(raw, self.v_pad, self.t_pad)
        mesh["kd_tex"] = kd_tex
        env_dir = self.rng.choice(self.env_dirs)
        env = self._load_env(env_dir)
        metallic, roughness = self.rng.choice(self.grid)
        if self.cfg.random_camera or self.test_mode:
            az = self.rng.uniform(0, 360)
            el = self.rng.uniform(30, 150)
        else:
            az, el = 0.0, 90.0                      # reference train pin
        return dict(mesh=mesh, env=env, metallic=metallic,
                    roughness=roughness, azimuth=az, elevation=el,
                    distance=self.cfg.camera_distance)


class ObjaverseDataTest(ObjaverseData):
    """Test split: random cameras (reference ObjaverseData_test :304,
    random pose :419-420)."""

    def __init__(self, *a, **kw):
        kw["test_mode"] = True
        super().__init__(*a, **kw)


# ---------------------------------------------------------------------------
# Collate: batch -> 9 rendered buffers on device
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _collate_batch(resolution: int, ssaa: int, bg: float,
                   v_pos, t_idx, v_nrm, v_tng, v_tex, mvps, camposes, nrots,
                   spec_mips, diffuse, metallics, roughnesses, kds, fg_lut):
    """ONE jitted program: vmapped render + the full post-process (composite,
    SSAA downsample, [-1,1] mapping, material/env images).

    Round 2 ran the post ops eagerly — ~6s/batch of per-op dispatch latency
    through the relay (VERDICT round-2 'do this' #2); fusing them here makes
    the on-the-fly collate device-bound like the reference's in-loop GPU
    render (train/train.py:184-439)."""
    from unirenderer_tpu.ops.cubemap import cubemap_to_latlong
    from unirenderer_tpu.ops.rasterize import ssaa_downsample

    def one(v, t, n, tg, tc, mvp, cp, spec, diff, met, rgh, kd_tex):
        env = EnvLight(specular=tuple(spec), diffuse=diff)
        mesh = Mesh(v_pos=v, t_pos_idx=t, v_nrm=n, t_nrm_idx=t,
                    v_tng=tg, t_tng_idx=t, v_tex=tc, t_tex_idx=t)
        return render_mesh(mesh, mvp, cp, env, met, rgh, resolution * ssaa,
                           kd_texture=kd_tex, fg_lut=fg_lut)

    bufs = jax.vmap(one)(v_pos, t_idx, v_nrm, v_tng, v_tex, mvps, camposes,
                         spec_mips, diffuse, metallics, roughnesses, kds)

    def down(x):
        return ssaa_downsample(x, ssaa) if ssaa > 1 else x

    def to_train(x4):                      # composite + downsample + [-1,1]
        rgb = down(composite_background(x4, bg))
        return rgb * 2.0 - 1.0

    mask = down(bufs["mask"])              # fractional coverage at edges
    mask3 = jnp.repeat(mask, 3, axis=-1)
    # material image: [metallic, metallic, roughness] masked, in [-1,1]
    # (reference process_material_and_mask, train/train.py:102-131)
    met_img = metallics[:, None, None, None] * mask
    rgh_img = roughnesses[:, None, None, None] * mask
    material = jnp.concatenate([met_img, met_img, rgh_img], -1) * 2 - 1

    env_img = jax.vmap(lambda c: cubemap_to_latlong(c, (resolution,
                                                        resolution)))(
        diffuse)
    env_img = jnp.clip(env_img, 0.0, 1.0) * 2 - 1

    return {
        "image": to_train(bufs["shaded"]),
        "mask": mask3 * 2 - 1,
        "material": material,
        # canonical-camera frame (camera.canonical_normal_rotation: the
        # identity at the reference's pinned train pose; under random
        # cameras this is what makes image->normal well-posed)
        "normal": down(jnp.einsum("bij,bhwj->bhwi", nrots,
                                  bufs["gb_normal"][..., :3])
                       * bufs["mask"]),                # already [-1,1]
        "albedo": to_train(bufs["albedo"]),
        "spec_light": to_train(bufs["spec_light"]),
        "diff_light": to_train(bufs["diff_light"]),
        "env": env_img,
        "metallic": metallics,
        "roughness": roughnesses,
    }


def stack_scene(items: List[Dict]) -> Dict[str, np.ndarray]:
    """Host side of the collate: stack raw scene tensors for a batch — NO
    rendering.  Every value is a numpy array with leading batch dim, so the
    scene dict is a shardable pytree (DP splits it over `data` like any
    batch; parallel/mesh.shard_batch).

    Keys: v_pos/t_idx/v_nrm/v_tng/v_tex (padded mesh), mvps/camposes/nrots
    (camera), spec_0..spec_{n-1}/diffuse (env mips), metallics/roughnesses,
    kds (albedo textures)."""
    stack = lambda key: np.stack([np.asarray(i["mesh"][key])
                                  for i in items])
    scene = {"v_pos": stack("v_pos"), "t_idx": stack("t_idx"),
             "v_nrm": stack("v_nrm"), "v_tng": stack("v_tng"),
             "v_tex": stack("v_tex"), "kds": stack("kd_tex")}

    mvps, camposes, nrots = [], [], []
    for i in items:
        mvp, cp = cam.spherical_camera(i["azimuth"], i["elevation"],
                                       i["distance"])
        mvps.append(np.asarray(mvp))
        camposes.append(np.asarray(cp))
        nrots.append(np.asarray(cam.canonical_normal_rotation(
            i["azimuth"], i["elevation"])))
    scene["mvps"] = np.stack(mvps)
    scene["camposes"] = np.stack(camposes)
    scene["nrots"] = np.stack(nrots)

    n_mips = len([k for k in items[0]["env"] if k.startswith("specular")])
    for l in range(n_mips):
        scene[f"spec_{l}"] = np.stack(
            [np.asarray(i["env"][f"specular_{l}"]) for i in items])
    scene["diffuse"] = np.stack(
        [np.asarray(i["env"]["diffuse"]) for i in items])
    scene["metallics"] = np.asarray([i["metallic"] for i in items],
                                    np.float32)
    scene["roughnesses"] = np.asarray([i["roughness"] for i in items],
                                      np.float32)
    return scene


def collate_from_scene(scene: Dict, resolution: int, ssaa: int = 2,
                       bg: float = 1.0) -> Dict[str, jnp.ndarray]:
    """Jit-traceable render collate over a stacked scene dict — the body
    shared by `collate_render` (host pipeline) and the fused
    render-in-step train path (train/train_step.make_render_train_step,
    the reference's in-loop 512^2 regime, train/train.py:184-439)."""
    n_mips = len([k for k in scene if k.startswith("spec_")])
    spec_mips = [scene[f"spec_{l}"] for l in range(n_mips)]
    fg = jnp.asarray(tex.fg_lut()[0])
    return _collate_batch(resolution, ssaa, bg, scene["v_pos"],
                          scene["t_idx"], scene["v_nrm"], scene["v_tng"],
                          scene["v_tex"], scene["mvps"], scene["camposes"],
                          scene["nrots"], spec_mips, scene["diffuse"],
                          scene["metallics"], scene["roughnesses"],
                          scene["kds"], fg)


def collate_render(items: List[Dict], resolution: int = 512,
                   bg: float = 1.0, ssaa: int = 2) -> Dict[str, jnp.ndarray]:
    """The train/train.py:184-439 collate_fn equivalent: renders the batch
    and assembles the 8 training maps (in [-1,1]) + material scalars.

    Returns the BATCH_KEYS dict for train_step plus 'metallic'/'roughness'.
    Env maps for the 'env' conditioning image use the coarsest specular mip
    expanded to a latlong image (the reference feeds the env image itself).

    Antialiasing: geometry buffers are rendered at `ssaa`x resolution and
    average-pooled down — our substitute for the reference's per-buffer
    `dr.antialias` (src/utils/render.py:287-294, 324-331).  Edge pixels get
    fractional coverage in mask/alpha exactly as antialiased composites do.
    ssaa=1 disables.

    Host side only stacks numpy arrays (`stack_scene`); everything else is
    ONE jitted dispatch (`_collate_batch`).
    """
    scene = jax.tree.map(jnp.asarray, stack_scene(items))
    return collate_from_scene(scene, resolution, ssaa=ssaa, bg=bg)
