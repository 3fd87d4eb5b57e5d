#!/usr/bin/env python
"""Attention kernel A/B microbenchmark on the real TPU chip.

Times each candidate at the SD UNet self-attention shapes (PERF.md:
attention is 83% of step time; level-0 S=4096/D=40 dominates), with the
honest-timing rules from PERF.md: bf16 inputs, serialized iteration chain
(each iteration's q depends on the previous output, defeating the relay
result-cache), block_until_ready once at the end.

Usage: python tools/bench_attention.py [--iters 20] [--batch 16]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


SHAPES = [  # (seq, head_dim): SD1.x levels at 512^2 (64^2 latent)
    (4096, 40),
    (1024, 80),
    (256, 160),
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--heads", type=int, default=8)
    args = ap.parse_args(argv)

    import jax
    if os.environ.get("UNIRENDER_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["UNIRENDER_PLATFORM"])
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from unirenderer_tpu.models.layers import dmajor_attention
    from unirenderer_tpu.ops.attn_kernel import unet_flash_attention
    from unirenderer_tpu.ops.flash_attention import (
        flash_attention_available, tpu_flash_attention,
    )

    b, h = args.batch, args.heads
    results = {}
    for (s, d) in SHAPES:
        def make_inputs():
            # fresh salt every call: the relay caches identical
            # (program, input) dispatches, so the timed run must use
            # inputs the compile run never saw
            salt = int(time.perf_counter_ns()) % (2 ** 31)
            ks = jax.random.split(jax.random.key(salt), 3)
            q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
            k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
            v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
            return q, k, v

        def chain(fn, iters):
            @jax.jit
            def run(q, k, v):
                def body(carry, i):
                    out = fn(q + carry, k, v)
                    return out[0, 0, 0, :1].astype(jnp.bfloat16) * 1e-6, None
                c0 = jnp.zeros((1,), jnp.bfloat16)
                c, _ = jax.lax.scan(body, c0, jnp.arange(iters))
                return c
            import numpy as np
            np.asarray(run(*make_inputs()))   # compile + 1st run
            # block_until_ready is unreliable through the relay (dispatches
            # can "resolve" in ~0.05ms for a 550ms program, the wait landing
            # on the NEXT sync point); a host transfer of the result is the
            # only trustworthy fence.  Any real round trip costs >= ~20ms;
            # discard sub-10ms phantoms.
            times = []
            for _ in range(12):
                fresh = make_inputs()   # fresh inputs -> real execution
                np.asarray(fresh[0])
                t0 = time.perf_counter()
                out = np.asarray(run(*fresh))
                total_ms = (time.perf_counter() - t0) * 1000.0
                if total_ms > 10.0:
                    times.append(total_ms / iters)
                if len(times) >= 3:
                    break
            if not times:
                return float("nan")
            return sorted(times)[len(times) // 2]

        cands = {"dmajor": dmajor_attention}
        if flash_attention_available(s, d):
            # splash candidates retired after round 4: never beat flash
            # where they compiled, 3/5 configs died with remote-compile
            # HTTP 500 (ATTN_AB_r03/r04.json, PERF.md).
            cands["flash"] = tpu_flash_attention
            cands["unet_flash"] = unet_flash_attention
            cands["unet_flash_nomax"] = functools.partial(
                unet_flash_attention, running_max=False)
            cands["unet_flash_nopipe"] = functools.partial(
                unet_flash_attention, pipelined=False)
            cands["unet_flash_bq1024"] = functools.partial(
                unet_flash_attention, block_q=1024, block_k=1024)
            cands["unet_flash_bk2048"] = functools.partial(
                unet_flash_attention, block_q=512, block_k=2048)

        def xla_dpa(q, k, v):
            return jax.nn.dot_product_attention(q, k, v)

        cands["xla_dpa"] = xla_dpa
        key = f"S{s}_D{d}"
        results[key] = {}
        for name, fn in cands.items():
            try:
                ms = chain(fn, args.iters)
            except Exception as e:          # record, keep comparing
                # first line only, control chars stripped — raw relay
                # errors embed ANSI sequences that pollute the committed
                # artifact (round-3 ADVICE low #4)
                import re
                msg = str(e).splitlines()[0] if str(e) else ""
                msg = re.sub(r"\x1b\[[0-9;]*[A-Za-z]|[\x00-\x08\x0b-\x1f]",
                             "", msg)
                results[key][name] = f"ERROR {type(e).__name__}: {msg}"[:200]
                continue
            results[key][name] = round(ms, 3)
        print(key, results[key], flush=True)

    print(json.dumps({"attention_ab_ms": results, "batch": b, "heads": h}))


if __name__ == "__main__":
    main()
