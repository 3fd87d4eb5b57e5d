#!/usr/bin/env python
"""Background-removal tools — reference dataset/remove_bg.py (batch
mask-multiply to white background, :17-57) and dataset/rembg.py (single
image) (SURVEY C16).

Usage:
  batch : python tools/remove_bg.py --images DIR --masks DIR --out DIR
  single: python tools/remove_bg.py --image f.png --mask m.png --out o.png
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def apply_mask_white_bg(img01: np.ndarray, mask01: np.ndarray) -> np.ndarray:
    """rgb*mask + white*(1-mask)."""
    if mask01.ndim == 2:
        mask01 = mask01[..., None]
    mask01 = mask01[..., :1]
    return img01[..., :3] * mask01 + (1.0 - mask01)


def _load(path):
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def _load_mask(path):
    from PIL import Image
    return np.asarray(Image.open(path).convert("L"), np.float32) / 255.0


def _save(path, arr01):
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((np.clip(arr01, 0, 1) * 255).astype(np.uint8)).save(path)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--image"), ap.add_argument("--mask")
    ap.add_argument("--images"), ap.add_argument("--masks")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    if args.image:
        _save(args.out, apply_mask_white_bg(_load(args.image),
                                            _load_mask(args.mask)))
        print(f"wrote {args.out}")
        return

    os.makedirs(args.out, exist_ok=True)
    n = 0
    for f in sorted(os.listdir(args.images)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        mask_path = os.path.join(args.masks, f)
        if not os.path.exists(mask_path):
            print(f"skip (no mask): {f}", file=sys.stderr)
            continue
        out = apply_mask_white_bg(_load(os.path.join(args.images, f)),
                                  _load_mask(mask_path))
        _save(os.path.join(args.out, f), out)
        n += 1
    print(f"processed {n} images")


if __name__ == "__main__":
    main()
