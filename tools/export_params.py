#!/usr/bin/env python
"""Export params-only portable weights from an orbax checkpoint dir.

Round-3 VERDICT weak #8: all trained state lived in /tmp and died with the
VM.  This tool turns `<workdir>/checkpoints` (full TrainState, ~1.2GB f32)
into one git-committable f16 .npz (~200MB for config.small) that
tools/eval_quality.py `--ckpt file.npz` and tools/train.py
`--init-params file.npz` both consume.

Usage:
  python tools/export_params.py --ckpt /tmp/q4/run/checkpoints \
      --out artifacts/r04/dual_small.npz
  python tools/export_params.py --ckpt /tmp/q4/run/vae_checkpoints \
      --out artifacts/r04/vae_small.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir (CheckpointManager layout)")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--dtype", default="float16",
                    choices=("float16", "float32"))
    args = ap.parse_args(argv)

    # params-only host-side work; never touch the TPU
    os.environ.setdefault("UNIRENDER_PLATFORM", "cpu")
    from unirenderer_tpu.utils.runtime import setup_runtime
    setup_runtime()

    from unirenderer_tpu.core.checkpoint import (
        CheckpointManager, save_params_npz,
    )
    cm = CheckpointManager(args.ckpt)
    params = cm.restore_params()
    if params is None:
        raise SystemExit(f"FATAL: no restorable checkpoint under {args.ckpt}")
    step = cm.restored_step()
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_params_npz(args.out, params, step=step, dtype=args.dtype)
    sz = os.path.getsize(args.out) / 1e6
    print(f"exported step {step} -> {args.out} ({sz:.0f} MB, {args.dtype})")


if __name__ == "__main__":
    main()
