"""LPIPS perceptual distance — flax VGG16 backbone + linear calibration
heads, the TPU-native replacement for the `lpips` package the reference
evaluates with (eval/test_real.py:458-464; SURVEY C11).

Architecture follows the published LPIPS method (Zhang et al. 2018,
arXiv 1801.03924): VGG16 features at relu1_2/relu2_2/relu3_3/relu4_3/
relu5_3, per-channel unit normalization, learned 1x1 non-negative linear
heads, spatial mean, layer sum.  The input scaling uses the lpips
package's shift/scale constants so ported weights reproduce its scores.

Weights (zero-egress image: user-supplied):
  * torchvision `vgg16` features state_dict -> `port_vgg16`
  * lpips `vgg.pth` linear heads (lin0..lin4.model.1.weight) -> `port_lins`
Random-weight instances still give a valid (uncalibrated) perceptual
metric for relative comparisons and exercise the full code path in tests.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels per conv, pool after block)
_VGG_BLOCKS = ((64, 64), (128, 128), (256, 256, 256),
               (512, 512, 512), (512, 512, 512))
# lpips package input normalization (whiten to its training stats)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk (NHWC) returning the 5 LPIPS tap activations."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        taps = []
        ci = 0
        for bi, block in enumerate(_VGG_BLOCKS):
            for ch in block:
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{ci}")(x)
                x = nn.relu(x)
                ci += 1
            taps.append(x)
            if bi < len(_VGG_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Full LPIPS distance between two NHWC images in [-1, 1]."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)
        vgg = VGG16Features(self.dtype, name="vgg")
        fa = vgg((a - shift) / scale)
        fb = vgg((b - shift) / scale)
        total = 0.0
        for li, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.sqrt(jnp.sum(xa ** 2, -1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb ** 2, -1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2                       # (B, H, W, C)
            w = self.param(f"lin{li}", nn.initializers.ones,
                           (d.shape[-1],), self.dtype)
            # lpips heads are non-negative 1x1 convs
            total = total + jnp.mean(
                jnp.sum(d * jnp.abs(w), axis=-1), axis=(1, 2))
        return total                                  # (B,)


def make_lpips_fn(params=None, rng=None, dtype=jnp.float32):
    """Jitted (a, b) -> (B,) LPIPS distances.  Random weights if no
    params (valid for relative comparisons; port real ones for parity)."""
    model = LPIPS(dtype)
    if params is None:
        rng = rng if rng is not None else jax.random.key(0)
        z = jnp.zeros((1, 64, 64, 3), dtype)
        params = model.init(rng, z, z)

    @jax.jit
    def fn(a, b):
        return model.apply(params, jnp.asarray(a, dtype),
                           jnp.asarray(b, dtype))
    return fn, params


# ---------------------------------------------------------------------------
# Torch weight ports
# ---------------------------------------------------------------------------

def port_vgg16(features_sd: Dict[str, "np.ndarray"]) -> Dict:
    """torchvision `vgg16().features.state_dict()` -> VGG16Features params.

    Torch layout: features.{idx}.weight (O, I, kh, kw) for conv indices
    [0,2, 5,7, 10,12,14, 17,19,21, 24,26,28]; flax: (kh, kw, I, O).
    """
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out = {}
    for ci, ti in enumerate(conv_idx):
        w = np.asarray(features_sd[f"{ti}.weight"])
        b = np.asarray(features_sd[f"{ti}.bias"])
        out[f"conv{ci}"] = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                            "bias": jnp.asarray(b)}
    return out


def port_lins(lpips_sd: Dict[str, "np.ndarray"]) -> Dict:
    """lpips package `vgg.pth` -> lin0..lin4 params.  Torch keys
    `lin{i}.model.1.weight` with shape (1, C, 1, 1)."""
    out = {}
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        out[f"lin{i}"] = jnp.asarray(
            np.asarray(lpips_sd[key]).reshape(-1))
    return out


def lpips_params_from_torch(features_sd, lpips_sd) -> Dict:
    return {"params": {"vgg": port_vgg16(features_sd),
                       **port_lins(lpips_sd)}}
