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


def trainable_env(rng: jax.Array, base_res: int = 512,
                  scale: float = 0.5, bias: float = 0.25) -> jax.Array:
    """Random trainable cubemap base (reference light.py `create_trainable_env_rnd`).
    Returns the base (6,R,R,3); prefilter with build_env_mips per step."""
    return jax.random.uniform(rng, (6, base_res, base_res, 3)) * scale + bias
