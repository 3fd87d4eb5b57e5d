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


def view_rotation(azimuth_deg, elevation_deg) -> jnp.ndarray:
    """3x3 world->camera rotation of `spherical_camera`'s pose (lookat the
    origin, +y up; distance drops out of the rotation)."""
    az = jnp.deg2rad(jnp.asarray(azimuth_deg, jnp.float32))
    el = jnp.deg2rad(jnp.asarray(elevation_deg, jnp.float32))
    eye = jnp.stack([jnp.sin(el) * jnp.cos(az), jnp.cos(el),
                     jnp.sin(el) * jnp.sin(az)])
    return lookat(eye, jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))[:3, :3]


def canonical_normal_rotation(azimuth_deg, elevation_deg) -> jnp.ndarray:
    """Q = R0^T R_c: rotate world vectors as if the scene were turned so
    camera (az, el) sits at the reference's pinned training pose (az=0,
    el=90 — dataset/objaverse.py:207-208).

    The reference trains with ONE fixed camera, so its "world-space"
    normal maps are really normals in that camera's (fixed) frame — the
    only reason image->normal is a well-posed task there.  Under random
    cameras, raw world normals depend on an unobservable camera azimuth
    and are unlearnable on held-out objects (rounds 1-2: normal-angle
    error stuck at chance).  Expressing targets as Q @ n_world makes them
    a pure function of the image (view-space orientation in fixed axes)
    and reduces to the identity — bit-exact reference parity — when the
    camera IS the pinned one.
    """
    r0 = view_rotation(0.0, 90.0)
    return r0.T @ view_rotation(azimuth_deg, elevation_deg)


def fov_to_intrinsics(fov_deg: float) -> jnp.ndarray:
    """Normalized pinhole intrinsics (reference camera_util.py
    FOV_to_intrinsics)."""
    focal = 1.0 / math.tan(math.radians(fov_deg) / 2) / 2.0
    return jnp.asarray([[focal, 0, 0.5], [0, focal, 0.5], [0, 0, 1]],
                       jnp.float32)
