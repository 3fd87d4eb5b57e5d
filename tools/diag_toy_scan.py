#!/usr/bin/env python
"""Minimal scan-vs-eager repro for unipc_step (no model, constant x0)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("UNIRENDER_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from unirenderer_tpu.core.config import DiffusionConfig
    from unirenderer_tpu.diffusion.samplers import UniPCState, unipc_step
    from unirenderer_tpu.diffusion.schedule import (
        DiffusionSchedule, inference_timesteps,
    )

    sched = DiffusionSchedule.create(DiffusionConfig())
    n = 4
    ts = inference_timesteps(1000, n)
    ts_next = jnp.concatenate([ts[1:], jnp.zeros((1,), jnp.int32)])
    is_final = jnp.arange(n) == n - 1

    shape = (1, 2, 2, 1)
    x0_const = jnp.full(shape, 0.5, jnp.float32)
    noise = jnp.asarray(np.random.default_rng(0).normal(size=shape),
                        jnp.float32)

    def model(x, t):
        return x0_const + 0.0 * x

    @jax.jit
    def scan_run(x_init):
        st = UniPCState.init(shape, jnp.float32)

        def body(carry, tt):
            x, s = carry
            t, tn, fin = tt
            x0 = model(x, t)
            s, xn = unipc_step(sched, s, x, x0, t, tn, fin)
            return (xn, s), xn

        (_, _), xs = jax.lax.scan(body, (x_init, st),
                                  (ts, ts_next, is_final))
        return xs

    xs_scan = np.asarray(scan_run(noise))
    print("scan done", flush=True)
    ts_np, tsn_np = np.asarray(ts), np.asarray(ts_next)

    # jitted single-step reference (traced t) — avoids eager op-by-op
    # dispatch, which through the axon relay costs ~1s/op
    print("--- jitted single-step (traced t) ---", flush=True)
    step_j = jax.jit(lambda s, x, x0, t, tn, fin:
                     unipc_step(sched, s, x, x0, t, tn, fin))
    x = noise
    st = UniPCState.init(shape, jnp.float32)
    for i in range(n):
        x0 = model(x, int(ts_np[i]))
        st, x = step_j(st, x, x0, jnp.int32(ts_np[i]),
                       jnp.int32(tsn_np[i]), jnp.asarray(i == n - 1))
        d = float(np.abs(xs_scan[i] - np.asarray(x)).max())
        print(f"i={i} d_vs_scan={d:.6f} |x|={float(np.abs(np.asarray(x)).max()):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
