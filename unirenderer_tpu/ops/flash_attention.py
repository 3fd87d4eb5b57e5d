"""Flash attention for UNet self-attention — TPU replacement for the
reference's xformers memory-efficient attention (train/train.py:1057-1070)
and attention slicing (controlnet.py:1588-1651).

Backed by the JAX library's Pallas TPU flash kernel
(jax.experimental.pallas.ops.tpu.flash_attention — double-buffered K/V
pipeline, online softmax, custom VJP), wrapped for the model's (B, S, H, D)
layout with block sizes tuned for the SD attention shapes (S=4096/D=40,
S=1024/D=80).  The kernel never materialises the (S, S) score matrix in
HBM — the win over the materialising XLA path grows with S (see PERF.md
round-2 A/B).  Falls back for shapes the kernel doesn't tile
(S % 128 != 0, e.g. cross-attention K/V at 77; or head_dim > 128 not a
multiple of 128, i.e. D=160 at the 16^2 level, where S=256 is cheap and
d-major XLA attention is used instead).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp


def flash_attention_available(s: int, d: int, sk: Optional[int] = None,
                              backend: Optional[str] = None) -> bool:
    """Can the Pallas kernel run for (seq, head_dim)?"""
    backend = backend or jax.default_backend()
    if backend != "tpu":
        return False
    sk = sk or s
    if s % 128 != 0 or sk % 128 != 0:
        return False
    return d <= 128 or d % 128 == 0


@functools.lru_cache(maxsize=None)
def _block_sizes(s: int, sk: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    # Swept on v5e at B16/H8/D40 bf16 (tools/bench_attention.py sweep):
    # (block_q, block_k) 2048/1024 -> 10.1ms vs 11.4ms at 512/512; larger
    # q blocks amortise the online-softmax bookkeeping, bq=4096 exceeds
    # VMEM.  Both divide every SD level (4096/1024/256).
    #
    # Training caveat (round 5, flagship 512^2 compile): under jvp the
    # kernel runs its save-residuals variant, whose per-block scratch at
    # bq=2048 needs 22.9MB scoped VMEM vs the v5e's 20.5MB limit — a
    # guaranteed compile-time OOM.  Serving auto-routes the S=4096 bucket
    # to xla_dpa (auto_kernel), so TRAINING is the only flash user there:
    # cap its q block at 1024 (inference cost if forced via
    # UNIRENDER_ATTN=flash: 10.3ms vs 10.1, sweep above) and keep the
    # backward (dq/dkv) passes on the library-default 512 blocks, which
    # are sized to fit scoped VMEM.
    bq = min(2048 if s < 4096 else 1024, s)
    bk = min(1024, sk)
    bwq, bwk = min(512, s), min(512, sk)
    return BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bwq, block_k_major_dkv=bwk,
        block_k_dkv=bwk, block_q_dkv=bwq,
        block_k_major_dq=bwk, block_k_dq=bwk, block_q_dq=bwq,
    )


def tpu_flash_attention(q: jax.Array, k: jax.Array,
                        v: jax.Array) -> jax.Array:
    """Flash attention over (B, S, H, D) tensors (the model layout)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention,
    )

    d = q.shape[-1]
    qt = q.transpose(0, 2, 1, 3)            # (B, H, S, D)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    o = flash_attention(qt, kt, vt, sm_scale=1.0 / math.sqrt(d),
                        block_sizes=_block_sizes(qt.shape[2], kt.shape[2]))
    return o.transpose(0, 2, 1, 3)


@functools.lru_cache(maxsize=None)
def _splash_kernel(h: int, s: int, sk: int, bq: int, bkv: int,
                   interpret: bool = False):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sker,
        splash_attention_mask as smask,
    )
    mask = smask.MultiHeadMask(
        [smask.FullMask((s, sk)) for _ in range(h)])
    bs = sker.BlockSizes(block_q=min(bq, s), block_kv=min(bkv, sk))
    return sker.make_splash_mha(mask, block_sizes=bs,
                                head_shards=1, q_seq_shards=1,
                                interpret=interpret)


def tpu_splash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         block_q: int = 2048,
                         block_kv: int = 1024,
                         interpret: bool = False) -> jax.Array:
    """Splash-attention candidate over (B, S, H, D) — the newer library
    TPU kernel generation (grid over heads, fused mask handling).  Kept as
    an A/B candidate vs `tpu_flash_attention` (tools/bench_attention.py);
    routing picks whichever measures faster on the target shapes."""
    b, s, h, d = q.shape
    kern = _splash_kernel(h, s, k.shape[1], block_q, block_kv, interpret)
    scale = 1.0 / math.sqrt(d)
    qt = (q * scale).transpose(0, 2, 1, 3)      # (B, H, S, D)
    out = jax.vmap(kern)(qt, k.transpose(0, 2, 1, 3),
                         v.transpose(0, 2, 1, 3))
    return out.transpose(0, 2, 1, 3)


def nontile_xla_dpa(s: int, d: int, sk: int) -> bool:
    """Should a shape the Pallas kernels can't tile use XLA's fused
    dot_product_attention instead of the d-major fallback?  Measured on
    the v5e (ATTN_AB_r04.json): SELF-attention at the 16^2 level —
    S=256, D=160 — runs 1.487 ms via xla_dpa vs 1.676 ms d-major.
    Cross-attention (sk=77) and the tiny S=64/D=320 level are unmeasured
    and stay on d-major."""
    return (s == sk and s >= 256 and s % 128 == 0
            and d > 128 and d % 128 != 0)


def auto_kernel(s: int, d: int) -> str:
    """Per-shape kernel choice from the measured A/B (ATTN_AB_r03.json,
    v5e, B16 H8 bf16): at S4096/D40 — the 83%-FLOPs bucket — xla_dpa
    8.39ms beats flash 9.86ms (PERF.md roofline: the flash kernel's
    online-softmax VPU phase doesn't fully hide behind the D=40 padded
    matmuls); at S1024/D80 flash 1.72ms beats xla_dpa 2.84ms."""
    return "xla_dpa" if (s >= 4096 and d <= 64) else "flash"


def maybe_flash_attention(q: jax.Array, k: jax.Array, v: jax.Array
                          ) -> Optional[jax.Array]:
    """Run the fused kernel if shapes/backend allow, else None (caller
    falls back to d-major XLA attention).

    UNIRENDER_ATTN selects the kernel family for the tileable shapes
    without a code edit (A/B plumbing for tools/bench_attention.py +
    bench.py): 'auto' (default, per-shape winner), 'flash', 'splash',
    'xla_dpa' (jax.nn.dot_product_attention — XLA's fused attention
    path), or 'dmajor' (force the d-major XLA fallback everywhere)."""
    import os

    b, s, h, d = q.shape
    which = os.environ.get("UNIRENDER_ATTN", "auto")
    if which == "dmajor":
        return None
    if not flash_attention_available(s, d, sk=k.shape[1]):
        # Pallas kernels can't tile this shape; the measured winner for
        # the non-tileable SELF-attention bucket is still the fused XLA
        # path, not d-major (see nontile_xla_dpa).
        if (which in ("auto", "xla_dpa")
                and jax.default_backend() == "tpu"
                and nontile_xla_dpa(s, d, k.shape[1])):
            return jax.nn.dot_product_attention(q, k, v)
        return None
    if which == "auto":
        which = auto_kernel(s, d)
    if which == "splash":
        return tpu_splash_attention(q, k, v)
    if which == "xla_dpa":
        return jax.nn.dot_product_attention(q, k, v)
    if which == "unet_flash":
        # forward-only specialized kernel (ops/attn_kernel.py) — A/B
        # plumbing for the serving/sampling path; training keeps the
        # library kernel's custom VJP (never select this for training).
        from unirenderer_tpu.ops.attn_kernel import unet_flash_attention
        return unet_flash_attention(q, k, v)
    return tpu_flash_attention(q, k, v)
