"""Validation-as-testing hook (eval/validation.py) — the working
equivalent of the reference's broken log_validation (train/train.py:1461)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from unirenderer_tpu.core import config
from unirenderer_tpu.core.tracing import MetricLogger
from unirenderer_tpu.eval.validation import make_validation_fn
from unirenderer_tpu.pipelines import UniRendererPipeline


def test_validation_fn_writes_maps_and_metrics(tmp_path):
    cfg = config.tiny()
    pipe = UniRendererPipeline.create(cfg, jax.random.key(0),
                                      dtype=jnp.float32)
    s = cfg.vae.sample_size
    val_batch = {
        "image": jax.random.uniform(jax.random.key(1), (1, s, s, 3),
                                    minval=-1, maxval=1),
        "mask": jnp.ones((1, s, s, 3)),
        "albedo": jax.random.uniform(jax.random.key(2), (1, s, s, 3),
                                     minval=-1, maxval=1),
    }
    logger = MetricLogger(str(tmp_path / "val.jsonl"))
    fn = make_validation_fn(pipe, val_batch, str(tmp_path / "val"),
                            num_steps=2, ensemble=1, logger=logger)

    class FakeState:
        params = pipe.dual_params

    metrics = fn(FakeState(), step=100)
    assert "psnr_albedo" in metrics
    assert np.isfinite(metrics["psnr_albedo"])
    assert os.path.exists(tmp_path / "val" / "step-100" / "albedo.png")
    assert os.path.exists(tmp_path / "val" / "step-100" / "normal.png")
    logger.close()
    import json
    rec = json.loads((tmp_path / "val.jsonl").read_text().strip())
    assert rec["step"] == 100
