"""Flash-attention kernel parity vs reference attention (interpret mode on
CPU; compiled path exercised on TPU by bench/pipelines)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from unirenderer_tpu.ops import _flash_kernel as fk


@pytest.mark.parametrize("s,d", [(128, 40), (256, 64), (128, 160)])
def test_flash_matches_reference(s, d):
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    bh = 4
    q = jax.random.normal(k1, (bh, s, d), jnp.float32)
    k = jax.random.normal(k2, (bh, s, d), jnp.float32)
    v = jax.random.normal(k3, (bh, s, d), jnp.float32)
    ref = fk._reference_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = fk._flash_fwd(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_bshd_wrapper():
    b, s, h, d = 2, 128, 4, 40
    ks = jax.random.split(jax.random.key(1), 3)
    q, k, v = (jax.random.normal(kk, (b, s, h, d)) for kk in ks)
    ref = jax.nn.dot_product_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = fk.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_gradients_flow():
    b, s, h, d = 1, 128, 2, 40
    ks = jax.random.split(jax.random.key(2), 3)
    q, k, v = (jax.random.normal(kk, (b, s, h, d)) for kk in ks)

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fk.flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)
