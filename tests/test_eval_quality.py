"""Quality-parity harness smoke (tools/eval_quality.py — the self-measured
benchmark BASELINE.md requires)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_eval_quality_synthetic(tmp_path):
    out = tmp_path / "report.json"
    grids = tmp_path / "grids"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "eval_quality.py"),
         "--synthetic", "--tiny", "--n", "2", "--steps", "2",
         "--dump-images", str(grids), "--out", str(out)],
        capture_output=True, text=True, timeout=900, cwd=REPO,
        env={**os.environ, "UNIRENDER_PLATFORM": "cpu"})
    assert r.returncode == 0, r.stderr
    rep = json.loads(out.read_text())
    assert rep["n_objects"] == 2
    for k in ("psnr_forward_render", "psnr_maps", "normal_angle",
              "metal_rough_mae"):
        assert k in rep
    assert rep["normal_angle"]["mean"] > 0
    # harness checks are labelled as such, never as trained evals
    assert rep["checkpoint_loaded"] is False
    assert "random-weights" in rep["checkpoint"]
    # visual grid: GT row over prediction row, 5 columns, 2 objects
    assert (grids / "eval_grid_b0.png").exists()


def test_dump_grid_geometry(tmp_path):
    """The PNG grid stacks a GT row above a prediction row per object,
    with 5 columns (image/fwd, normal, albedo, spec, diff)."""
    import importlib.util

    import numpy as np
    from PIL import Image

    spec = importlib.util.spec_from_file_location(
        "eq", os.path.join(REPO, "tools", "eval_quality.py"))
    eq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(eq)
    b, h, w = 3, 16, 16
    rng = np.random.default_rng(0)
    batch = {k: rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
             for k in ("image", "normal", "albedo", "spec_light",
                       "diff_light")}
    fwd = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    inv = {k: batch[k] * 0.5
           for k in ("normal", "albedo", "spec_light", "diff_light")}
    eq._dump_grid(str(tmp_path), 7, batch, fwd, inv)
    im = Image.open(tmp_path / "eval_grid_b7.png")
    pad = 2
    assert (im.height, im.width) == (b * 2 * (h + pad) + pad,
                                     5 * (w + pad) + pad)


def test_eval_quality_aborts_on_missing_checkpoint(tmp_path):
    """FAIL-HONEST contract (round-3 VERDICT weak #1/#3): --ckpt pointing
    at a dir with no restorable checkpoint must ABORT, never silently
    evaluate random weights under a trained label."""
    empty = tmp_path / "no_ckpt_here"
    empty.mkdir()
    out = tmp_path / "report.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "eval_quality.py"),
         "--synthetic", "--tiny", "--n", "2", "--steps", "2",
         "--ckpt", str(empty), "--out", str(out)],
        capture_output=True, text=True, timeout=900, cwd=REPO,
        env={**os.environ, "UNIRENDER_PLATFORM": "cpu"})
    assert r.returncode != 0
    assert "refusing to eval random weights" in (r.stderr + r.stdout)
    assert not out.exists()
