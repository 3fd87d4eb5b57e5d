"""Validation-as-testing during training (SURVEY section 4.3: the
reference's `--validation_steps` triggers `log_validation` — which is a
NameError as committed, train/train.py:1461; here it exists and works).

`make_validation_fn` returns a callable for Trainer(validation_fn=...):
runs the inverse pipeline on held-out images, writes maps, and logs PSNR
of each predicted map against ground truth when provided.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from unirenderer_tpu.eval.metrics import psnr


def make_validation_fn(pipe, val_batch: Dict, out_dir: str,
                       num_steps: int = 20, ensemble: int = 1,
                       logger=None):
    """val_batch: {'image','mask', optional ground truths 'normal',
    'albedo','spec_light','diff_light'} each (B,H,W,3) in [-1,1]."""
    os.makedirs(out_dir, exist_ok=True)

    def validation_fn(state, step: int):
        # use the CURRENT training params
        pipe.dual_params = jax.tree.map(lambda x: x, state.params)
        out = pipe.real_image2mask_3mod_albedo(
            image=val_batch["image"], mask=val_batch["mask"],
            rng=jax.random.key(step), num_steps=num_steps,
            ensemble=ensemble)
        metrics = {}
        step_dir = os.path.join(out_dir, f"step-{step}")
        os.makedirs(step_dir, exist_ok=True)
        for name in ("normal", "albedo", "spec_light", "diff_light", "env"):
            pred01 = (np.asarray(out[name]) + 1.0) / 2.0
            _save_png(os.path.join(step_dir, f"{name}.png"), pred01[0])
            if name in val_batch:
                gt01 = (np.asarray(val_batch[name]) + 1.0) / 2.0
                metrics[f"psnr_{name}"] = psnr(pred01, gt01)
        if logger is not None:
            logger.log(step, metrics)
        return metrics

    return validation_fn


def _save_png(path: str, arr01: np.ndarray) -> None:
    try:
        from PIL import Image
        Image.fromarray(
            (np.clip(arr01, 0, 1) * 255).astype(np.uint8)).save(path)
    except ImportError:
        np.save(path + ".npy", arr01)
