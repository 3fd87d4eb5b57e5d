"""InceptionV3 (pool3, 2048-d) feature extractor for FID — flax port of the
backbone the reference vendors for FID (utils_metrics/inception.py:15,
SURVEY C11; itself the torchvision inception_v3 graph).

Weights: `load_torch_inception(params, state_dict)` maps a torchvision
`inception_v3` state_dict (torch CPU is available in-image for conversion;
the weight FILE must be provided by the user — zero-egress environment).
With random weights the module still defines a deterministic feature space
usable for relative comparisons; FID parity with the reference requires the
ported weights (documented).

Inference-mode BatchNorm: running stats are parameters ("batch_stats"
collection), never updated.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicConv(nn.Module):
    out: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: object = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(self.out, self.kernel, self.stride, padding=pad,
                    use_bias=False, name="conv")(x)
        # inference-only BN
        c = x.shape[-1]
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        gamma = self.param("bn_gamma", nn.initializers.ones, (c,))
        beta = self.param("bn_beta", nn.initializers.zeros, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * gamma + beta
        return nn.relu(x)


def _maxpool(x, k=3, s=2):
    return nn.max_pool(x, (k, k), strides=(s, s))


def _avgpool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="b1x1")(x)
        b5 = BasicConv(48, (1, 1), name="b5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=2, name="b5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="b3x3_1")(x)
        b3 = BasicConv(96, (3, 3), padding=1, name="b3x3_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=1, name="b3x3_3")(b3)
        bp = BasicConv(self.pool_features, (1, 1),
                       name="bpool")(_avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], -1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), (2, 2), name="b3x3")(x)
        bd = BasicConv(64, (1, 1), name="bd_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, name="bd_2")(bd)
        bd = BasicConv(96, (3, 3), (2, 2), name="bd_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool(x)], -1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), name="b1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="b7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=[(0, 0), (3, 3)], name="b7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=[(3, 3), (0, 0)], name="b7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="bd_1")(x)
        bd = BasicConv(c7, (7, 1), padding=[(3, 3), (0, 0)], name="bd_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=[(0, 0), (3, 3)], name="bd_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=[(3, 3), (0, 0)], name="bd_4")(bd)
        bd = BasicConv(192, (1, 7), padding=[(0, 0), (3, 3)], name="bd_5")(bd)
        bp = BasicConv(192, (1, 1), name="bpool")(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], -1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="b3_1")(x)
        b3 = BasicConv(320, (3, 3), (2, 2), name="b3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="b7_1")(x)
        b7 = BasicConv(192, (1, 7), padding=[(0, 0), (3, 3)], name="b7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=[(3, 3), (0, 0)], name="b7_3")(b7)
        b7 = BasicConv(192, (3, 3), (2, 2), name="b7_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool(x)], -1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="b1x1")(x)
        b3 = BasicConv(384, (1, 1), name="b3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=[(0, 0), (1, 1)],
                        name="b3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=[(1, 1), (0, 0)],
                        name="b3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], -1)
        bd = BasicConv(448, (1, 1), name="bd_1")(x)
        bd = BasicConv(384, (3, 3), padding=1, name="bd_2")(bd)
        bda = BasicConv(384, (1, 3), padding=[(0, 0), (1, 1)],
                        name="bd_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=[(1, 1), (0, 0)],
                        name="bd_3b")(bd)
        bd = jnp.concatenate([bda, bdb], -1)
        bp = BasicConv(192, (1, 1), name="bpool")(_avgpool3(x))
        return jnp.concatenate([b1, b3, bd, bp], -1)


class InceptionV3Features(nn.Module):
    """images (B,299,299,3) in [0,1] -> (B,2048) pool3 features."""

    @nn.compact
    def __call__(self, x):
        # torchvision FID normalization: scale to [-1,1]
        x = x * 2.0 - 1.0
        x = BasicConv(32, (3, 3), (2, 2), name="Conv2d_1a")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a")(x)
        x = BasicConv(64, (3, 3), padding=1, name="Conv2d_2b")(x)
        x = _maxpool(x)
        x = BasicConv(80, (1, 1), name="Conv2d_3b")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a")(x)
        x = _maxpool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))          # global avg pool -> 2048


def make_feature_fn(params=None, rng=None, batch: int = 8):
    """Returns feature_fn(images [B,H,W,3] in [0,1]) -> (B,2048) numpy,
    resizing to 299 as the reference does (calc_fid.py InceptionV3 port)."""
    import numpy as np

    model = InceptionV3Features()
    if params is None:
        if rng is None:
            rng = jax.random.key(0)
        params = model.init(rng, jnp.zeros((1, 299, 299, 3)))

    @jax.jit
    def run(x):
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        return model.apply(params, x)

    def feature_fn(images):
        out = []
        for i in range(0, len(images), batch):
            out.append(np.asarray(run(jnp.asarray(
                images[i:i + batch], jnp.float32))))
        return np.concatenate(out, 0)

    return feature_fn


# ---------------------------------------------------------------------------
# torch weight mapping
# ---------------------------------------------------------------------------

_TORCH_NAME = {
    "b1x1": "branch1x1", "b5x5_1": "branch5x5_1", "b5x5_2": "branch5x5_2",
    "b3x3_1": "branch3x3dbl_1", "b3x3_2": "branch3x3dbl_2",
    "b3x3_3": "branch3x3dbl_3", "bpool": "branch_pool",
    "b3x3": "branch3x3", "bd_1": "branch3x3dbl_1", "bd_2": "branch3x3dbl_2",
    "bd_3": "branch3x3dbl_3",
    "b7_1": "branch7x7_1", "b7_2": "branch7x7_2", "b7_3": "branch7x7_3",
    "b7_4": "branch7x7_4",
    "b3_1": "branch3x3_1", "b3_2": "branch3x3_2",
    "b3_2a": "branch3x3_2a", "b3_2b": "branch3x3_2b",
    "bd_3a": "branch3x3dbl_3a", "bd_3b": "branch3x3dbl_3b",
    "bd_4": "branch7x7dbl_4", "bd_5": "branch7x7dbl_5",
}


def load_torch_inception(params, state_dict):
    """Map a torchvision inception_v3 state_dict into the flax params.

    NOTE: InceptionC's double-7x7 branch names (bd_*) map to
    branch7x7dbl_*; InceptionE's to branch3x3dbl_*.  The mapping table
    handles the shared prefixes; see tests for shape verification when a
    weight file is supplied.
    """
    import copy

    import numpy as np

    # deep-copy the dict structure: the shallow copy shared nested leaf
    # dicts with the caller's tree, so porting mutated the input params
    # in place (caught by tests/test_metrics.py port-mapping test)
    flat = copy.deepcopy(params["params"])

    def convert(dst_scope, src_prefix):
        p = flat
        for part in dst_scope[:-1]:
            p = p[part]
        leaf = p[dst_scope[-1]]
        w = np.asarray(state_dict[src_prefix + ".conv.weight"])
        leaf["conv"]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
        for ours, theirs in (("bn_gamma", "bn.weight"),
                             ("bn_beta", "bn.bias"),
                             ("bn_mean", "bn.running_mean"),
                             ("bn_var", "bn.running_var")):
            leaf[ours] = jnp.asarray(np.asarray(
                state_dict[f"{src_prefix}.{theirs}"]))

    import re
    for top, sub in _iter_scopes(flat):
        src = _torch_prefix(top, sub)
        if src is not None:
            convert((top, sub) if sub else (top,), src)
    return {"params": flat}


def _iter_scopes(flat):
    for top, v in flat.items():
        if "conv" in v:                      # stem BasicConv
            yield top, None
        else:
            for sub in v:
                yield top, sub


def _torch_prefix(top: str, sub):
    if sub is None:
        stem = {"Conv2d_1a": "Conv2d_1a_3x3", "Conv2d_2a": "Conv2d_2a_3x3",
                "Conv2d_2b": "Conv2d_2b_3x3", "Conv2d_3b": "Conv2d_3b_1x1",
                "Conv2d_4a": "Conv2d_4a_3x3"}
        return stem.get(top)
    name = _TORCH_NAME.get(sub)
    # InceptionC uses branch7x7dbl for bd_*, InceptionE uses branch3x3dbl
    if top.startswith("Mixed_6") and top != "Mixed_6a" and \
            sub.startswith("bd_"):
        name = sub.replace("bd_", "branch7x7dbl_")
    if name is None:
        return None
    return f"{top}.{name}"
