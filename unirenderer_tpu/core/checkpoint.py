"""Checkpoint management — reference HF-Accelerate save_state with
rotation + 'latest' resume (train/train.py:1000-1045, 1191-1218,
1434-1457; SURVEY aux 'Checkpoint / resume'), rebuilt on orbax.

Layout mirrors the reference's three-component diffusers dirs:
    <dir>/checkpoint-<step>/{unet,controlnet,controldec}  (model params)
plus optimizer state and the step counter; rotation keeps
`checkpoints_total_limit` newest.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, total_limit: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.total_limit = total_limit
        self._ckptr = ocp.StandardCheckpointer()
        self._restored_step: Optional[int] = None

    # -- paths ----------------------------------------------------------
    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"checkpoint-{step}")

    def all_steps(self):
        steps = []
        for d in os.listdir(self.directory):
            m = re.fullmatch(r"checkpoint-(\d+)", d)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restored_step(self) -> Optional[int]:
        """Step of the checkpoint the last restore_params() actually
        loaded (may be older than latest_step() after a fallback)."""
        return (self._restored_step if self._restored_step is not None
                else self.latest_step())

    # -- save / restore -------------------------------------------------
    def save(self, step: int, state: Any) -> None:
        path = self._step_dir(step)
        self._ckptr.save(os.path.join(path, "state"), state, force=True)
        self._rotate()

    def restore(self, step: Optional[int] = None,
                template: Any = None) -> Any:
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        path = os.path.join(self._step_dir(step), "state")
        return self._ckptr.restore(path, template)

    def restore_params(self, step: Optional[int] = None) -> Any:
        """Restore just the MODEL PARAMS from a trainer checkpoint (the
        inference loaders' path: eval CLIs hold no optimizer state).

        The saved tree is a TrainState (step, params, opt_state) NamedTuple,
        serialized by orbax as a nested container; restore without a
        template and dig out the params subtree.

        When `step` is None, steps are tried NEWEST-FIRST and an
        unreadable dir (e.g. the trainer was killed mid-save, leaving an
        un-finalized orbax tmp) falls back to the next older complete
        checkpoint — `latest_step()` afterwards reports the step actually
        restored (the un-finalized dir has no `state` subdir and is
        pruned from `all_steps` consumers via this retry, not deleted).
        """
        if step is None:
            raw = None
            for s in reversed(self.all_steps()):
                try:
                    raw = self.restore(s, template=None)
                except Exception as e:          # un-finalized / corrupt dir
                    print(f"[checkpoint] step {s} unreadable ({e!r}); "
                          f"trying older", flush=True)
                    continue
                if raw is not None:
                    self._restored_step = s
                    break
            if raw is None:
                return None
        else:
            raw = self.restore(step, template=None)
            if raw is None:
                return None
            self._restored_step = step
        if isinstance(raw, dict) and "params" in raw:
            return raw["params"]
        if isinstance(raw, (list, tuple)) and len(raw) == 3:
            return raw[1]                    # (step, params, opt_state)
        return raw                           # params-only checkpoint

    def _rotate(self) -> None:
        """Keep only the newest `total_limit` checkpoints
        (reference --checkpoints_total_limit, train/train.py:1434-1457)."""
        steps = self.all_steps()
        while len(steps) > self.total_limit:
            victim = steps.pop(0)
            import shutil
            shutil.rmtree(self._step_dir(victim), ignore_errors=True)

    def wait(self):
        self._ckptr.wait_until_finished()


class AsyncSaver:
    """Checkpoint a step loop without stalling it on the D2H fetch.

    On a relay-attached TPU the `np.asarray(state)` fetch dominates save
    cost (~190s for a config.small TrainState, PERF.md round 4).  save():
    snapshot the state ON-DEVICE (jnp.copy — the next step is then free to
    donate the live buffers) and fetch + write in a background thread; at
    most one save in flight (a new save joins the previous first).
    """

    def __init__(self, ckpt: CheckpointManager):
        self.ckpt = ckpt
        self._thread = None

    def save(self, step: int, state: Any, blocking: bool = False) -> None:
        import threading

        import jax.numpy as jnp
        import numpy as np

        self.join()
        snap = jax.tree.map(jnp.copy, state)

        def fetch_and_write():
            self.ckpt.save(step, jax.tree.map(np.asarray, snap))

        if blocking:
            fetch_and_write()
        else:
            self._thread = threading.Thread(target=fetch_and_write,
                                            daemon=True)
            self._thread.start()

    def join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None


# ---------------------------------------------------------------------------
# Portable params-only export (round-3 VERDICT weak #8: trained state must
# survive the VM — orbax full-state dirs are ~1.2GB f32; a params-only f16
# .npz is ~200MB and git-committable, so the next round can warm-start).
# ---------------------------------------------------------------------------


def save_params_npz(path: str, params: Any, step: Optional[int] = None,
                    dtype: str = "float16") -> None:
    """Write a flax params tree as one compressed .npz.

    Float leaves are stored as `dtype` (f16 keeps 10 mantissa bits —
    strictly more than the bf16 the model computes in); non-float leaves
    keep their dtype.  The training step is stored under `__step__`.
    """
    import numpy as np

    flat = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, prefix + (str(k),))
        else:
            arr = np.asarray(tree)
            if arr.dtype.kind == "f" and dtype:
                arr = arr.astype(dtype)
            flat["/".join(prefix)] = arr

    walk(params, ())
    np.savez_compressed(
        path, __step__=np.int64(-1 if step is None else step), **flat)


def load_params_npz(path: str):
    """Inverse of save_params_npz -> (nested f32 params dict, step|None)."""
    import numpy as np

    nested: dict = {}
    step = None
    with np.load(path) as z:
        for k in z.files:
            if k == "__step__":
                s = int(z[k])
                step = None if s < 0 else s
                continue
            arr = z[k]
            if arr.dtype.kind == "f":
                arr = arr.astype(np.float32)
            parts = k.split("/")
            d = nested
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = arr
    return nested, step
