"""Camera math (reference src/utils/render_utils.py:188-253 `perspective`/
`lookAt` and src/utils/camera_util.py spherical sampling, SURVEY R4/R5)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def perspective(fovy_rad: float, aspect: float = 1.0, near: float = 0.1,
                far: float = 1000.0) -> jnp.ndarray:
    """OpenGL-style perspective projection (reference render_utils.py:188)."""
    y = math.tan(fovy_rad / 2)
    return jnp.asarray([
        [1.0 / (y * aspect), 0, 0, 0],
        [0, 1.0 / -y, 0, 0],
        [0, 0, -(far + near) / (far - near), -(2 * far * near) / (far - near)],
        [0, 0, -1, 0],
    ], jnp.float32)


def lookat(eye: jnp.ndarray, at: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """World->camera view matrix (reference render_utils.py:253)."""
    eye = jnp.asarray(eye, jnp.float32)
    at = jnp.asarray(at, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = at - eye
    f = f / jnp.linalg.norm(f)
    r = jnp.cross(f, up / jnp.linalg.norm(up))
    r = r / jnp.linalg.norm(r)
    u = jnp.cross(r, f)
    m = jnp.stack([
        jnp.concatenate([r, jnp.array([-jnp.dot(r, eye)])]),
        jnp.concatenate([u, jnp.array([-jnp.dot(u, eye)])]),
        jnp.concatenate([-f, jnp.array([jnp.dot(f, eye)])]),
        jnp.asarray([0.0, 0.0, 0.0, 1.0]),
    ])
    return m


def spherical_camera(azimuth_deg, elevation_deg, distance,
                     fovy_deg: float = 30.0, near: float = 0.1,
                     far: float = 1000.0):
    """Camera on a sphere looking at the origin — the pose sampler of the
    reference dataset (dataset/objaverse.py:207-208 pins az=0/elev=90 for
    train; test randomizes :419-420).

    Returns (mvp (4,4), campos (3,)).
    """
    az = jnp.deg2rad(jnp.asarray(azimuth_deg, jnp.float32))
    el = jnp.deg2rad(jnp.asarray(elevation_deg, jnp.float32))
    # elevation measured from +y pole (90 deg = equator), matching
    # camera_util.spherical_camera_pose conventions
    eye = distance * jnp.stack([
        jnp.sin(el) * jnp.cos(az),
        jnp.cos(el),
        jnp.sin(el) * jnp.sin(az)])
    view = lookat(eye, jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))
    proj = perspective(math.radians(fovy_deg), 1.0, near, far)
    return proj @ view, eye


def fov_to_intrinsics(fov_deg: float) -> jnp.ndarray:
    """Normalized pinhole intrinsics (reference camera_util.py
    FOV_to_intrinsics)."""
    focal = 1.0 / math.tan(math.radians(fov_deg) / 2) / 2.0
    return jnp.asarray([[focal, 0, 0.5], [0, focal, 0.5], [0, 0, 1]],
                       jnp.float32)
