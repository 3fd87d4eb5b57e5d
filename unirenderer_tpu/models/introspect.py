"""Per-block activation capture & diffing — the tooling SURVEY 'hard parts'
(2) calls for: weight-port fidelity debugging (GroupNorm-eps / head-layout
mismatches show up as activation drift long before they show in samples).

Usage:
    acts = capture_activations(model, params, *inputs)
    report = diff_activations(acts_a, acts_b)        # max |delta| per block
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def capture_activations(model, params, *args, **kwargs) -> Dict[str, Any]:
    """Run model.apply with flax intermediate capture; returns a flat
    {scope-path: array} dict of every submodule output."""
    out, state = model.apply(params, *args, capture_intermediates=True,
                             mutable=["intermediates"], **kwargs)
    flat = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        elif isinstance(tree, tuple):
            # flax stores __call__ outputs as a tuple of calls
            for i, v in enumerate(tree):
                walk(v, path + (str(i),) if len(tree) > 1 else path)
        else:
            flat["/".join(path)] = tree

    walk(state["intermediates"], ())
    return flat


def _leaf_arrays(x):
    return [a for a in jax.tree_util.tree_leaves(x)
            if hasattr(a, "shape")]


def diff_activations(a: Dict[str, Any], b: Dict[str, Any],
                     top_k: int = 20):
    """Max-abs and relative difference per captured scope, sorted worst
    first — pinpoints the first diverging block."""
    rows = []
    for key in sorted(set(a) & set(b)):
        la, lb = _leaf_arrays(a[key]), _leaf_arrays(b[key])
        for i, (xa, xb) in enumerate(zip(la, lb)):
            if xa.shape != xb.shape:
                rows.append((key + f"#{i}", float("inf"), float("inf")))
                continue
            xa = np.asarray(xa, np.float32)
            xb = np.asarray(xb, np.float32)
            d = np.abs(xa - xb)
            rel = d.max() / max(np.abs(xa).max(), 1e-8)
            rows.append((key + f"#{i}", float(d.max()), float(rel)))
    rows.sort(key=lambda r: -r[1])
    return rows[:top_k]


def assert_activations_close(a, b, atol: float = 1e-4):
    rows = diff_activations(a, b, top_k=5)
    bad = [r for r in rows if r[1] > atol]
    if bad:
        msg = "\n".join(f"  {k}: max|d|={d:.3e} rel={r:.3e}"
                        for k, d, r in bad)
        raise AssertionError(f"activation drift above {atol}:\n{msg}")
