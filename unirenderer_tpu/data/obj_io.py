"""OBJ/MTL loading (reference src/utils/obj.py:59-209 `load_obj` and
src/utils/material.py:49-110 `.mtl` parser, SURVEY R2).

Parsing is done by the native C++ scanner (native/objio.cpp, via ctypes)
with a pure-numpy fallback.  After parsing, corners are RE-INDEXED into a
single unified vertex set so position/normal/uv/tangent share one index
buffer — the layout the TPU renderer interpolates with (and what the
reference's obj2mesh preprocessing effectively produces).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _native_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native OBJ parser."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(_NATIVE_DIR, "libobjio.so")
    try:
        if not os.path.exists(so):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(so)
        lib.objio_parse.restype = ctypes.c_int
        lib.objio_free.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _parse_obj_native(path: str):
    lib = _native_lib()
    if lib is None:
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    v_pos, v_tex, v_nrm = fp(), fp(), fp()
    f_pos, f_tex, f_nrm = ip(), ip(), ip()
    n_pos, n_tex, n_nrm, n_tri = (ctypes.c_long(), ctypes.c_long(),
                                  ctypes.c_long(), ctypes.c_long())
    rc = lib.objio_parse(
        path.encode(), ctypes.byref(v_pos), ctypes.byref(n_pos),
        ctypes.byref(v_tex), ctypes.byref(n_tex),
        ctypes.byref(v_nrm), ctypes.byref(n_nrm),
        ctypes.byref(f_pos), ctypes.byref(f_tex), ctypes.byref(f_nrm),
        ctypes.byref(n_tri))
    if rc != 0:
        return None

    def take_f(ptr, n, s):
        a = np.ctypeslib.as_array(ptr, shape=(max(n, 1) * s,))[:n * s]
        out = a.reshape(n, s).copy() if n else np.zeros((0, s), np.float32)
        lib.objio_free(ptr)
        return out

    def take_i(ptr, n):
        a = np.ctypeslib.as_array(ptr, shape=(max(n, 1) * 3,))[:n * 3]
        out = a.reshape(n, 3).copy() if n else np.zeros((0, 3), np.int32)
        lib.objio_free(ptr)
        return out

    t = n_tri.value
    return (take_f(v_pos, n_pos.value, 3), take_f(v_tex, n_tex.value, 2),
            take_f(v_nrm, n_nrm.value, 3), take_i(f_pos, t),
            take_i(f_tex, t), take_i(f_nrm, t))


def _parse_obj_python(path: str):
    v, vt, vn = [], [], []
    fp_, ft_, fn_ = [], [], []
    with open(path, "r", errors="ignore") as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                v.append([float(x) for x in parts[1:4]])
            elif tag == "vt":
                vt.append([float(x) for x in parts[1:3]])
            elif tag == "vn":
                vn.append([float(x) for x in parts[1:4]])
            elif tag == "f":
                corners = []
                for c in parts[1:]:
                    sub = c.split("/")
                    vi = int(sub[0])
                    ti = int(sub[1]) if len(sub) > 1 and sub[1] else 0
                    ni = int(sub[2]) if len(sub) > 2 and sub[2] else 0
                    fix = lambda i, n: (i - 1 if i > 0
                                        else (n + i if i < 0 else -1))
                    corners.append((fix(vi, len(v)), fix(ti, len(vt)),
                                    fix(ni, len(vn))))
                for k in range(2, len(corners)):
                    tri = [corners[0], corners[k - 1], corners[k]]
                    fp_.append([c[0] for c in tri])
                    ft_.append([c[1] for c in tri])
                    fn_.append([c[2] for c in tri])
    to = lambda a, s, dt: (np.asarray(a, dt) if a
                           else np.zeros((0, s), dt))
    return (to(v, 3, np.float32), to(vt, 2, np.float32),
            to(vn, 3, np.float32), to(fp_, 3, np.int32),
            to(ft_, 3, np.int32), to(fn_, 3, np.int32))


def parse_mtl(path: str) -> Dict[str, Dict]:
    """Minimal .mtl parser: Kd color + map_Kd path per material
    (reference material.py:49-110)."""
    mats: Dict[str, Dict] = {}
    cur = None
    if not os.path.exists(path):
        return mats
    with open(path, "r", errors="ignore") as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "newmtl":
                cur = parts[1]
                mats[cur] = {"kd": np.array([0.8, 0.8, 0.8], np.float32)}
            elif cur and parts[0].lower() == "kd":
                mats[cur]["kd"] = np.asarray(
                    [float(x) for x in parts[1:4]], np.float32)
            elif cur and parts[0].lower() == "map_kd":
                mats[cur]["map_kd"] = os.path.join(
                    os.path.dirname(path), parts[-1])
    return mats


def load_obj(path: str, normalize: bool = True, use_native: bool = True):
    """Load + unify an OBJ into single-index-buffer arrays.

    Returns dict: v_pos (V,3), t_idx (T,3), v_nrm, v_tex, v_tng, kd (3,)
    or kd texture path.  Mirrors the output contract of the reference's
    preprocessed .pth meshes (obj2mesh.py:54-66).
    """
    from unirenderer_tpu.render.mesh import (
        auto_normals, compute_tangents, unit_normalize_mesh,
    )

    parsed = _parse_obj_native(path) if use_native else None
    if parsed is None:
        parsed = _parse_obj_python(path)
    v_pos, v_tex, v_nrm, f_pos, f_tex, f_nrm = parsed
    if len(f_pos) == 0 or len(v_pos) == 0:
        raise ValueError(f"empty mesh: {path}")

    if normalize:
        v_pos = unit_normalize_mesh(v_pos)

    # unify (pos, tex, nrm) corner tuples -> single vertex buffer
    corners = np.stack([f_pos.reshape(-1),
                        f_tex.reshape(-1),
                        f_nrm.reshape(-1)], axis=1)
    uniq, inverse = np.unique(corners, axis=0, return_inverse=True)
    t_idx = inverse.reshape(-1, 3).astype(np.int32)
    new_pos = v_pos[uniq[:, 0]]
    new_tex = (v_tex[uniq[:, 1]] if len(v_tex) else
               np.zeros((len(uniq), 2), np.float32))
    new_tex[uniq[:, 1] < 0] = 0.0 if len(v_tex) else 0.0
    if len(v_nrm):
        has = uniq[:, 2] >= 0
        new_nrm = np.zeros((len(uniq), 3), np.float32)
        new_nrm[has] = v_nrm[np.maximum(uniq[:, 2], 0)][has]
        if not has.all():
            fallback = auto_normals(new_pos, t_idx)
            new_nrm[~has] = fallback[~has]
    else:
        new_nrm = auto_normals(new_pos, t_idx)

    v_tng = compute_tangents(new_pos, t_idx, new_tex, t_idx, new_nrm, t_idx)

    # material
    kd = np.array([0.8, 0.8, 0.8], np.float32)
    kd_map = None
    mtl_path = os.path.splitext(path)[0] + ".mtl"
    mats = parse_mtl(mtl_path)
    if mats:
        m = next(iter(mats.values()))
        kd = m.get("kd", kd)
        kd_map = m.get("map_kd")

    return {"v_pos": new_pos, "t_idx": t_idx, "v_nrm": new_nrm,
            "v_tex": new_tex, "v_tng": v_tng, "kd": kd, "kd_map": kd_map}
