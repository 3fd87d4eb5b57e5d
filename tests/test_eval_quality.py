"""Quality-parity harness smoke (tools/eval_quality.py — the self-measured
benchmark BASELINE.md requires)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_eval_quality_synthetic(tmp_path):
    out = tmp_path / "report.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "eval_quality.py"),
         "--synthetic", "--tiny", "--n", "2", "--steps", "2",
         "--out", str(out)],
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
