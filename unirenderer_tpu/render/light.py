"""Environment light containers (reference src/models/geometry/rep_3d/
light.py:43-157 EnvironmentLight, SURVEY R3; static prefiltered form used by
dataset/objaverse.py load_mipmap :63-72)."""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp

from unirenderer_tpu.ops import cubemap as cm


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EnvLight:
    """Prefiltered split-sum environment: GGX specular mip chain + diffuse
    irradiance — the 7-file layout of the offline tool (specular_0..5 +
    diffuse, reference light2map.py:71-75)."""
    specular: Tuple[jax.Array, ...]      # [(6,R,R,3)] descending R
    diffuse: jax.Array                   # (6,r,r,3)

    @property
    def num_mips(self) -> int:
        return len(self.specular)


def env_from_latlong(latlong: jax.Array, res: int = 512, min_res: int = 16,
                     num_samples: int = 256) -> EnvLight:
    """HDR latlong -> prefiltered EnvLight (the light2map.py pipeline)."""
    base = cm.latlong_to_cubemap(latlong, res)
    spec, diff = cm.build_env_mips(base, min_res=min_res,
                                   num_samples=num_samples)
    return EnvLight(specular=tuple(spec), diffuse=diff)


def conditioning_light_maps(env: EnvLight, normal_img: jax.Array,
                            roughness: jax.Array,
                            view_dir=(0.0, 0.0, 1.0)):
    """Split-sum spec/diff conditioning maps for a decomposed scene — the
    per-pixel lookups the renderer bakes into the training maps
    (render/render.py shade_with_env; reference src/utils/render.py:58,69),
    reconstructed from a normal map when no geometry is available (the
    app's relight flow).

    normal_img (..., H, W, 3) in [-1, 1]; roughness scalar or (B,);
    view_dir: constant view direction toward the camera (the decomposition
    gives no per-pixel positions, so a distant-camera approximation).
    Returns (spec_light, diff_light) sRGB images in [0, 1].
    """
    from unirenderer_tpu.ops import bsdf
    from unirenderer_tpu.render.render import get_mip, rgb_to_srgb

    nrm = bsdf.safe_normalize(normal_img)
    wo = jnp.asarray(view_dir, normal_img.dtype)
    refl = bsdf.safe_normalize(bsdf.reflect(
        jnp.broadcast_to(wo, nrm.shape), nrm))
    diff = cm.sample_cubemap(env.diffuse, nrm)
    rough = jnp.asarray(roughness)
    rough = rough.reshape(rough.shape + (1,) * (nrm.ndim - 1 - rough.ndim))
    mip = get_mip(jnp.broadcast_to(rough, nrm.shape[:-1]), env.num_mips)
    spec = cm.sample_cubemap_mip(list(env.specular), refl, mip)
    return (jnp.clip(rgb_to_srgb(spec), 0.0, 1.0),
            jnp.clip(rgb_to_srgb(diff), 0.0, 1.0))


def trainable_env(rng: jax.Array, base_res: int = 512,
                  scale: float = 0.5, bias: float = 0.25) -> jax.Array:
    """Random trainable cubemap base (reference light.py `create_trainable_env_rnd`).
    Returns the base (6,R,R,3); prefilter with build_env_mips per step."""
    return jax.random.uniform(rng, (6, base_res, base_res, 3)) * scale + bias
