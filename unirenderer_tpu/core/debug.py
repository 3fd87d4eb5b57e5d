"""Numerical-anomaly detection — the TPU analogue of the reference's
anomaly-mode isfinite asserts (renderutils/ops.py:107-108 et al., SURVEY aux
'Race detection / sanitizers').

`checkify_finite(fn)` wraps a jitted function with jax.experimental.checkify
finiteness checks; `guard_metrics` is the cheap production-path guard used
by the trainer: detect a non-finite loss and surface it instead of training
on garbage.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


def checkify_finite(fn: Callable) -> Callable:
    """Returns fn' that raises on NaN/Inf anywhere inside fn (debug use;
    compiles extra checks — do not leave on in production)."""
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


class AnomalyGuard:
    """Streaming non-finite-loss detector with a consecutive-failure
    budget (failure-detection subsystem the reference lacks)."""

    def __init__(self, patience: int = 3):
        self.patience = patience
        self.consecutive = 0
        self.total = 0

    def check(self, metrics: Dict[str, Any], step: int) -> bool:
        """Returns True if the step is healthy; raises after `patience`
        consecutive bad steps."""
        loss = float(metrics.get("loss", 0.0))
        if loss == loss and abs(loss) != float("inf"):
            self.consecutive = 0
            return True
        self.consecutive += 1
        self.total += 1
        if self.consecutive >= self.patience:
            raise FloatingPointError(
                f"non-finite loss for {self.consecutive} consecutive steps "
                f"(step {step}); aborting training")
        return False
