"""CLIP ViT-L/14 text encoder in flax (reference L0: transformers
CLIPTextModel, loaded at train/train.py:956).

The reference always uses the constant prompt ' ' (train/train.py:1254), so
`blank_context` precomputes the 77x768 context once; the full encoder exists
for API parity and arbitrary prompts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from unirenderer_tpu.core.config import TextEncoderConfig


class CLIPLayer(nn.Module):
    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        d = cfg.hidden_size
        hd = d // cfg.num_heads
        q = nn.Dense(d, dtype=self.dtype, name="q")(h)
        k = nn.Dense(d, dtype=self.dtype, name="k")(h)
        v = nn.Dense(d, dtype=self.dtype, name="v")(h)
        b, s, _ = q.shape
        q = q.reshape(b, s, cfg.num_heads, hd)
        k = k.reshape(b, s, cfg.num_heads, hd)
        v = v.reshape(b, s, cfg.num_heads, hd)
        o = jax.nn.dot_product_attention(q, k, v, bias=mask)
        o = nn.Dense(d, dtype=self.dtype, name="out")(o.reshape(b, s, d))
        x = x + o
        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        # CLIP uses quick-gelu
        h = h * nn.sigmoid(1.702 * h)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.max_length, cfg.hidden_size))
        x = tok + pos[None, :s, :]
        # causal mask (CLIP text transformer is causal)
        causal = jnp.tril(jnp.ones((s, s), bool))
        mask = jnp.where(causal, 0.0, -1e9)[None, None, :, :]
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg, self.dtype, name=f"layer_{i}")(x, mask)
        return nn.LayerNorm(epsilon=1e-5, name="final_ln")(x)


# Tokenization of the constant blank prompt ' ' with the CLIP BPE tokenizer:
# [startoftext] + [' ' token? -> BPE maps ' ' into no token; diffusers pads]
# We reproduce the transformers behaviour: ids = [49406, 49407, 49407, ...].
BLANK_PROMPT_IDS = (49406,) + (49407,) * 76


def blank_ids(cfg: TextEncoderConfig) -> jax.Array:
    ids = list(BLANK_PROMPT_IDS[:cfg.max_length])
    ids = [min(i, cfg.vocab_size - 1) for i in ids]
    return jnp.asarray([ids], jnp.int32)


def blank_context(model: CLIPTextEncoder, params) -> jax.Array:
    """The cached (1, 77, D) context for the constant ' ' prompt."""
    return model.apply(params, blank_ids(model.cfg))


def init_text_encoder(cfg: TextEncoderConfig, rng: jax.Array,
                      dtype=jnp.float32):
    model = CLIPTextEncoder(cfg, dtype)
    params = model.init(rng, blank_ids(cfg))
    return model, params
