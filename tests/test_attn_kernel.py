"""Specialized UNet flash-attention kernel (ops/attn_kernel.py) parity:
interpret mode on CPU across all mode combinations; the compiled path is
A/B'd on the real chip by tools/bench_attention.py (ATTN_AB_r05.json)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirenderer_tpu.ops.attn_kernel import unet_flash_attention


@pytest.mark.parametrize("pipelined", [True, False])
@pytest.mark.parametrize("running_max", [True, False])
def test_parity_modes(pipelined, running_max):
    ks = jax.random.split(jax.random.key(0), 3)
    b, s, h, d = 2, 256, 2, 40
    q, k, v = (jax.random.normal(kk, (b, s, h, d), jnp.float32)
               for kk in ks)
    ref = jax.nn.dot_product_attention(q, k, v)
    out = unet_flash_attention(q, k, v, block_q=128, block_k=128,
                               pipelined=pipelined,
                               running_max=running_max, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_parity_rect_kv_blocks():
    """block_k != block_q and S_k != S_q (the kernel is non-causal and
    supports rectangular attention as long as blocks divide)."""
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (1, 128, 2, 40), jnp.float32)
    k = jax.random.normal(ks[1], (1, 512, 2, 40), jnp.float32)
    v = jax.random.normal(ks[2], (1, 512, 2, 40), jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(40)
    ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1), v)
    out = unet_flash_attention(q, k, v, block_q=128, block_k=256,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_bf16_inputs():
    """bf16 in/out (the serving dtype); accumulation stays f32."""
    ks = jax.random.split(jax.random.key(2), 3)
    q, k, v = (jax.random.normal(kk, (1, 256, 2, 80), jnp.bfloat16)
               for kk in ks)
    ref = jax.nn.dot_product_attention(q, k, v)
    out = unet_flash_attention(q, k, v, block_q=128, block_k=128,
                               interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_rejects_nondivisible_blocks():
    q = jnp.zeros((1, 200, 2, 40))
    with pytest.raises(ValueError, match="not divisible"):
        unet_flash_attention(q, q, q, block_q=128, block_k=128,
                             interpret=True)


def test_routing_env_var_selects_unet_flash(monkeypatch):
    """UNIRENDER_ATTN=unet_flash is honored by maybe_flash_attention on
    TPU-tileable shapes; on CPU the availability gate keeps it off (the
    kernel is TPU-only), so routing returns None."""
    from unirenderer_tpu.ops.flash_attention import maybe_flash_attention
    monkeypatch.setenv("UNIRENDER_ATTN", "unet_flash")
    q = jnp.zeros((1, 128, 2, 40))
    assert maybe_flash_attention(q, q, q) is None  # CPU backend
