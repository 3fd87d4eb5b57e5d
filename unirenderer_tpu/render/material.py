"""Material container (reference src/utils/material.py:21-44 `Material`
torch module-dict + .mtl parser :49-110, SURVEY R2).

Functional pytree instead of a torch Module: kd is either a constant color
or a (H,W,3|4) texture; metallic/roughness are the per-object constants the
reference fills at shade time (render.py:120,135-146).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Material:
    kd: jax.Array                       # (3,) constant or (H,W,3|4) texture
    metallic: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.float32(0.0))
    roughness: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.float32(0.5))

    @property
    def has_texture(self) -> bool:
        return self.kd.ndim == 3

    @classmethod
    def from_mtl(cls, path: str, name: Optional[str] = None) -> "Material":
        """Load the (first or named) material of an .mtl file."""
        from unirenderer_tpu.data.obj_io import parse_mtl

        mats = parse_mtl(path)
        if not mats:
            return cls(kd=jnp.asarray([0.8, 0.8, 0.8]))
        m = mats[name] if name else next(iter(mats.values()))
        if "map_kd" in m:
            try:
                from PIL import Image
                tex = np.asarray(Image.open(m["map_kd"]).convert("RGB"),
                                 np.float32) / 255.0
                return cls(kd=jnp.asarray(tex))
            except Exception:
                pass
        return cls(kd=jnp.asarray(m["kd"]))

    def sample_kd(self, uv: jax.Array) -> jax.Array:
        """kd at texcoords (..., 2) — texture2d or broadcast constant
        (reference material['kd'].sample, texture.py:21-60)."""
        if self.has_texture:
            from unirenderer_tpu.ops.texture import sample_texture2d
            return sample_texture2d(self.kd, uv, wrap="wrap")
        return jnp.broadcast_to(self.kd, uv.shape[:-1] + (3,))
