"""Object-mask plumbing for the real-image inverse path (SURVEY C12/C13).

The reference drives SAM2 in-process from point/box prompts
(eval/test_real.py:520-533, eval/test_app.py:169-192).  SAM2 is a large
external torch stack; here segmentation is pluggable behind ONE contract,
so any segmenter (SAM2 included) slots in without code changes.

MASK FILE CONTRACT
------------------
A mask is a single-object foreground map aligned with the input image:
  * `.png` (any mode): pixel > 127 in the first channel = object, or
  * `.npy`: array (H, W) / (H, W, 1) / (H, W, 3), value > 0.5 = object.
It is resized (nearest) to the working resolution and binarized.

Producing a compatible mask WITH SAM2 (run in any torch environment,
mirrors reference test_real.py:520-533):

    python - <<'PY'
    import numpy as np, torch
    from PIL import Image
    from sam2.build_sam import build_sam2
    from sam2.sam2_image_predictor import SAM2ImagePredictor
    img = np.asarray(Image.open("input.png").convert("RGB"))
    pred = SAM2ImagePredictor(build_sam2(
        "configs/sam2.1/sam2.1_hiera_l.yaml", "sam2.1_hiera_large.pt"))
    pred.set_image(img)
    # center-point prompt (reference default) or box=np.array([x0,y0,x1,y1])
    h, w = img.shape[:2]
    masks, scores, _ = pred.predict(
        point_coords=np.array([[w // 2, h // 2]]),
        point_labels=np.array([1]), multimask_output=False)
    Image.fromarray((masks[0] * 255).astype(np.uint8)).save("mask.png")
    PY

then pass `--mask mask.png` to the CLI / upload it in the app.

When no external mask is supplied, two built-in heuristics cover renders
and simple photos: `auto_mask` (non-white-background) and
`box_prompt_mask` (color-model segmentation inside a 2-click box, the
app's box-prompt flow without the SAM2 dependency).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def auto_mask(img01: np.ndarray, thresh: float = 0.95) -> np.ndarray:
    """Heuristic object mask: non-white-background pixels (works for the
    white-composited renders of the training distribution)."""
    bg = (img01 > thresh).all(axis=-1)
    mask = (~bg).astype(np.float32)
    return mask[..., None].repeat(3, -1)


def box_prompt_mask(img01: np.ndarray, box: Sequence[int],
                    bg_quantile: float = 0.6) -> np.ndarray:
    """Segment the object inside a user box (x0, y0, x1, y1) — the app's
    2-click flow (reference test_app.py:169-192) without SAM2.

    Background color model = pixels OUTSIDE the box; inside the box,
    pixels whose color distance to the background model exceeds the
    `bg_quantile` of the outside distances are foreground; the connected
    component containing the box center is kept.
    Returns (H, W, 3) float mask in {0, 1}.
    """
    from scipy import ndimage

    h, w = img01.shape[:2]
    x0, y0, x1, y1 = (int(v) for v in box)
    x0, x1 = max(0, min(x0, x1)), min(w, max(x0, x1))
    y0, y1 = max(0, min(y0, y1)), min(h, max(y0, y1))
    if x1 - x0 < 2 or y1 - y0 < 2:
        return auto_mask(img01)

    outside = np.ones((h, w), bool)
    outside[y0:y1, x0:x1] = False
    bg_px = img01[outside].reshape(-1, 3)
    if bg_px.size == 0:                      # box covers the whole image
        return auto_mask(img01)
    bg_mean = bg_px.mean(0)
    d_out = np.linalg.norm(bg_px - bg_mean, axis=-1)
    tau = max(np.quantile(d_out, bg_quantile), 0.05)

    dist = np.linalg.norm(img01 - bg_mean, axis=-1)
    fg = np.zeros((h, w), bool)
    fg[y0:y1, x0:x1] = dist[y0:y1, x0:x1] > tau

    lab, n = ndimage.label(fg)
    if n:
        cy, cx = (y0 + y1) // 2, (x0 + x1) // 2
        keep = lab[cy, cx]
        if keep == 0:                        # center not fg: largest blob
            keep = 1 + np.bincount(lab[lab > 0]).argmax()
        fg = lab == keep
        fg = ndimage.binary_closing(fg, np.ones((3, 3)))
    mask = fg.astype(np.float32)
    return mask[..., None].repeat(3, -1)


def load_mask(path: str, size: Optional[int] = None) -> np.ndarray:
    """Load an external mask per the MASK FILE CONTRACT above.

    Returns (H, W, 3) float in {0, 1}, resized to (size, size) if given.
    """
    if path.endswith(".npy"):
        arr = np.load(path)
        if arr.ndim == 3:
            arr = arr[..., 0]
        m = (arr.astype(np.float32) > 0.5).astype(np.float32)
        if size is not None and m.shape != (size, size):
            from PIL import Image
            m = np.asarray(Image.fromarray(
                (m * 255).astype(np.uint8)).resize((size, size),
                                                   Image.NEAREST),
                           np.float32) / 255.0
            m = (m > 0.5).astype(np.float32)
    else:
        from PIL import Image
        img = Image.open(path)
        if size is not None:
            img = img.resize((size, size), Image.NEAREST)
        arr = np.asarray(img)
        if arr.ndim == 3:
            arr = arr[..., 0]
        m = (arr.astype(np.float32) > 127).astype(np.float32)
    return m[..., None].repeat(3, -1)
