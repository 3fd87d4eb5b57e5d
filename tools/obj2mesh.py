#!/usr/bin/env python
"""Mesh preprocessing CLI — reference obj2mesh.py (SURVEY C14).

OBJ+MTL -> load (native C++ parser) -> normalize -> normals/tangents ->
.npz tensor dict, batched over a thread pool (reference uses ThreadPool x8,
obj2mesh.py:91-110; per-object failures are logged and skipped :73-79).

Usage: python tools/obj2mesh.py --src DIR --dst DIR [--workers 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from unirenderer_tpu.data.obj_io import load_obj  # noqa: E402


def process_obj(src: str, dst: str) -> bool:
    try:
        m = load_obj(src, normalize=True)
        out = {k: v for k, v in m.items()
               if isinstance(v, np.ndarray)}
        if m.get("kd_map"):
            out["kd_map"] = np.asarray(m["kd_map"], dtype="U")
        np.savez_compressed(dst, **out)
        return True
    except Exception:
        print(f"[obj2mesh] failed: {src}", file=sys.stderr)
        traceback.print_exc()
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    jobs = []
    for root, _, files in os.walk(args.src):
        for f in files:
            if f.lower().endswith(".obj"):
                src = os.path.join(root, f)
                rel = os.path.relpath(src, args.src)
                dst = os.path.join(args.dst,
                                   rel.replace(os.sep, "_")[:-4] + ".npz")
                jobs.append((src, dst))
    print(f"[obj2mesh] {len(jobs)} meshes")
    with ThreadPoolExecutor(args.workers) as ex:
        results = list(ex.map(lambda j: process_obj(*j), jobs))
    print(f"[obj2mesh] ok={sum(results)} failed={len(results)-sum(results)}")


if __name__ == "__main__":
    main()
