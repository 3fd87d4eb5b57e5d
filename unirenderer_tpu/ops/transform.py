"""Point/vector transforms — TPU equivalent of renderutils xfm kernels
(reference c_src/mesh.cu, SURVEY N4): one einsum instead of a CUDA kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xfm_points(points: jax.Array, matrix: jax.Array) -> jax.Array:
    """Transform points by homogeneous 4x4 matrices.

    points: (B, N, 3); matrix: (B, 4, 4) row-vector convention
    (p' = p @ M^T like the reference ru.xfm_points).  Returns (B, N, 4).
    """
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    p = jnp.concatenate([points, ones], axis=-1)
    return jnp.einsum("bni,bji->bnj", p, matrix)


def xfm_vectors(vectors: jax.Array, matrix: jax.Array) -> jax.Array:
    """Transform direction vectors (w=0).  vectors (B,N,3), matrix (B,4,4);
    returns (B,N,3)."""
    return jnp.einsum("bni,bji->bnj", vectors, matrix[:, :3, :3])
