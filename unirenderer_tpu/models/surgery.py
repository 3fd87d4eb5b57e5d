"""Weight porting + model surgery.

Three jobs (SURVEY Phase 2):
 1. Map diffusers-format torch state_dicts (SD-v1.4 UNet / VAE / CLIP text)
    onto our flax parameter trees (torch CPU is in-image for conversion;
    weight files are user-supplied — zero-egress environment).
 2. `from_unet` surgery: build attribute encoder/decoder params as copies
    of the UNet trunk (reference AttributeEncoderModel.from_unet
    models/controlnet.py:1436-1507; AttributeDecoderModel.from_unet
    :2114-2192), with zero convs zero-initialised.
 3. 28-channel inflation: encoder conv_in in-channels x7 * 0.142 and
    decoder conv_out out-channels x7 * 0.142 (reference train/train.py:
    976-996 — including the bias repeat at :989).

All operations are shape-checked against an initialised parameter tree, so
a naming/layout mismatch fails loudly instead of silently drifting.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Generic torch->flax leaf conversion
# ---------------------------------------------------------------------------

def _convert_leaf(name: str, torch_arr: np.ndarray,
                  target_shape) -> jnp.ndarray:
    a = np.asarray(torch_arr)
    if name == "kernel":
        if a.ndim == 4:                       # conv (O,I,kh,kw)->(kh,kw,I,O)
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 2:                     # linear (O,I)->(I,O)
            a = a.T
    if tuple(a.shape) != tuple(target_shape):
        raise ValueError(f"shape mismatch for {name}: torch {a.shape} vs "
                         f"flax {tuple(target_shape)}")
    return jnp.asarray(a)


def fill_from_torch(flax_params: Dict, state_dict: Dict,
                    path_map, strict: bool = True) -> Tuple[Dict, list]:
    """Walk the flax tree; for each leaf, `path_map(path)` returns the torch
    key (without .weight/.bias suffix resolution) or None to keep init."""
    missing = []

    def walk(tree, path):
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                out[k] = walk(v, p)
            else:
                tk = path_map(p)
                if tk is None:
                    out[k] = v
                    continue
                if tk not in state_dict:
                    missing.append(tk)
                    out[k] = v
                    continue
                out[k] = _convert_leaf(k, state_dict[tk], v.shape)
        return out

    filled = walk(flax_params["params"], ())
    if strict and missing:
        raise KeyError(f"{len(missing)} torch keys missing, e.g. "
                       f"{missing[:5]}")
    return {"params": filled}, missing


# ---------------------------------------------------------------------------
# Path maps
# ---------------------------------------------------------------------------

_SUFFIX = {"kernel": "weight", "bias": "bias", "scale": "weight",
           "embedding": "weight"}


def _tx_inner(rest: Tuple[str, ...]) -> str:
    """Transformer2D sub-path -> diffusers attention path."""
    head = rest[0]
    if head == "norm":
        return "norm." + _SUFFIX[rest[-1]]
    if head in ("proj_in", "proj_out"):
        return f"{head}." + _SUFFIX[rest[-1]]
    m = re.fullmatch(r"block_(\d+)", head)
    if m:
        base = f"transformer_blocks.{m.group(1)}."
        sub = rest[1]
        if sub in ("norm1", "norm2", "norm3"):
            return base + sub + "." + _SUFFIX[rest[-1]]
        if sub in ("attn1", "attn2"):
            proj = rest[2]
            if proj == "to_out":
                return base + f"{sub}.to_out.0." + _SUFFIX[rest[-1]]
            return base + f"{sub}.{proj}." + _SUFFIX[rest[-1]]
        if sub == "ff":
            inner = {"proj": "net.0.proj", "out": "net.2"}[rest[2]]
            return base + f"ff.{inner}." + _SUFFIX[rest[-1]]
    raise KeyError(rest)


def _resnet_inner(rest: Tuple[str, ...]) -> str:
    return rest[0] + "." + _SUFFIX[rest[-1]]


def unet_path_map(path: Tuple[str, ...]):
    """Our ImageUNet param path -> diffusers UNet2DConditionModel key."""
    head = path[0]
    sfx = _SUFFIX[path[-1]]
    if head == "conv_in" or head == "conv_out":
        return f"{head}.{sfx}"
    if head == "conv_norm_out":
        return f"conv_norm_out.{sfx}"
    if head == "time_embedding":
        return f"time_embedding.{path[1]}.{sfx}"
    m = re.fullmatch(r"down_(\d+)", head)
    if m:
        i = m.group(1)
        sub = path[1]
        if sub == "downsample":
            return f"down_blocks.{i}.downsamplers.0.conv.{sfx}"
        rm = re.fullmatch(r"resnet_(\d+)", sub)
        if rm:
            return (f"down_blocks.{i}.resnets.{rm.group(1)}."
                    + _resnet_inner(path[2:]))
        am = re.fullmatch(r"attn_(\d+)", sub)
        if am:
            return (f"down_blocks.{i}.attentions.{am.group(1)}."
                    + _tx_inner(path[2:]))
    if head == "mid":
        sub = path[1]
        rm = re.fullmatch(r"resnet_(\d+)", sub)
        if rm:
            return (f"mid_block.resnets.{rm.group(1)}."
                    + _resnet_inner(path[2:]))
        if sub == "attn":
            return "mid_block.attentions.0." + _tx_inner(path[2:])
    m = re.fullmatch(r"up_(\d+)", head)
    if m:
        i = m.group(1)
        sub = path[1]
        if sub == "upsample":
            return f"up_blocks.{i}.upsamplers.0.conv.{sfx}"
        rm = re.fullmatch(r"resnet_(\d+)", sub)
        if rm:
            return (f"up_blocks.{i}.resnets.{rm.group(1)}."
                    + _resnet_inner(path[2:]))
        am = re.fullmatch(r"attn_(\d+)", sub)
        if am:
            return (f"up_blocks.{i}.attentions.{am.group(1)}."
                    + _tx_inner(path[2:]))
    raise KeyError(path)


def vae_path_map(path: Tuple[str, ...]):
    """Our AutoencoderKL param path -> diffusers AutoencoderKL key."""
    sfx = _SUFFIX[path[-1]]
    side = path[0]                                     # encoder / decoder
    sub = path[1]
    if sub == "quant_conv":
        return f"quant_conv.{sfx}"
    if sub == "post_quant_conv":
        return f"post_quant_conv.{sfx}"
    pre = side + "."
    if sub in ("conv_in", "conv_out", "conv_norm_out"):
        return pre + sub + "." + sfx
    m = re.fullmatch(r"(down|up)_(\d+)_res_(\d+)", sub)
    if m:
        d, i, j = m.groups()
        return (pre + f"{d}_blocks.{i}.resnets.{j}."
                + _resnet_inner(path[2:]))
    m = re.fullmatch(r"down_(\d+)_downsample", sub)
    if m:
        return pre + f"down_blocks.{m.group(1)}.downsamplers.0.conv.{sfx}"
    m = re.fullmatch(r"up_(\d+)_upsample", sub)
    if m:
        return pre + f"up_blocks.{m.group(1)}.upsamplers.0.conv.{sfx}"
    m = re.fullmatch(r"mid_res_(\d+)", sub)
    if m:
        return pre + f"mid_block.resnets.{m.group(1)}." \
            + _resnet_inner(path[2:])
    if sub == "mid_attn":
        inner = path[2]
        name = {"norm": "group_norm", "to_q": "to_q", "to_k": "to_k",
                "to_v": "to_v", "to_out": "to_out.0"}[inner]
        return pre + f"mid_block.attentions.0.{name}.{sfx}"
    raise KeyError(path)


def clip_path_map(path: Tuple[str, ...]):
    head = path[0]
    pre = "text_model."
    if head == "token_embedding":
        return pre + "embeddings.token_embedding.weight"
    if head == "position_embedding":          # bare param, no sub-leaf
        return pre + "embeddings.position_embedding.weight"
    sfx = _SUFFIX[path[-1]]
    if head == "final_ln":
        return pre + f"final_layer_norm.{sfx}"
    m = re.fullmatch(r"layer_(\d+)", head)
    if m:
        base = pre + f"encoder.layers.{m.group(1)}."
        name = {"ln1": "layer_norm1", "ln2": "layer_norm2",
                "q": "self_attn.q_proj", "k": "self_attn.k_proj",
                "v": "self_attn.v_proj", "out": "self_attn.out_proj",
                "fc1": "mlp.fc1", "fc2": "mlp.fc2"}[path[1]]
        return base + name + "." + sfx
    raise KeyError(path)


# ---------------------------------------------------------------------------
# from_unet surgery + inflation
# ---------------------------------------------------------------------------

def inflate_conv_in(conv: Dict, repeats: int = 7,
                    scale: float = 0.142) -> Dict:
    """Input-channel inflation: kernel (kh,kw,C,O) -> (kh,kw,C*r,O) * scale
    (reference train/train.py:976)."""
    k = jnp.tile(conv["kernel"], (1, 1, repeats, 1)) * scale
    return {"kernel": k, "bias": jnp.array(conv["bias"], copy=True)}


def inflate_conv_out(conv: Dict, repeats: int = 7,
                     scale: float = 0.142) -> Dict:
    """Output-channel inflation: kernel (kh,kw,I,C) -> (kh,kw,I,C*r)*scale,
    bias likewise (reference train/train.py:988-989)."""
    k = jnp.tile(conv["kernel"], (1, 1, 1, repeats)) * scale
    b = jnp.tile(conv["bias"], (repeats,)) * scale
    return {"kernel": k, "bias": b}


def dual_stream_from_unet(dual_params: Dict, unet_params: Dict) -> Dict:
    """Fill a DualStreamModel parameter tree from standalone UNet params:

      unet       <- copy
      controlnet <- conv_in inflated copy + down/mid/time copies;
                    zero convs keep their zero init
      controldec <- up/conv_norm_out/time copies + conv_out inflated;
                    control zero convs keep zero init
    """
    u = unet_params["params"]
    p = jax.tree.map(lambda x: x, dual_params["params"])  # shallow copy

    # Each subtree gets its OWN buffers: the train step donates params, and
    # XLA rejects the same buffer donated twice (`f(donate(a), donate(a))`).
    def _copy(tree):
        return jax.tree.map(lambda x: jnp.array(x, copy=True), tree)

    p["unet"] = _copy(u)

    enc = dict(p["controlnet"])
    enc["conv_in"] = inflate_conv_in(u["conv_in"])
    enc["time_embedding"] = _copy(u["time_embedding"])
    for k in u:
        if k.startswith("down_") or k == "mid":
            enc[k] = _copy(u[k])
    p["controlnet"] = enc

    dec = dict(p["controldec"])
    dec["time_embedding"] = _copy(u["time_embedding"])
    for k in u:
        if k.startswith("up_"):
            dec[k] = _copy(u[k])
    dec["conv_norm_out"] = _copy(u["conv_norm_out"])
    dec["conv_out"] = inflate_conv_out(u["conv_out"])
    p["controldec"] = dec
    return {"params": p}


# ---------------------------------------------------------------------------
# Checkpoint file loading
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .bin/.pt/.safetensors file into numpy arrays."""
    if path.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file
            return dict(load_file(path))
        except ImportError as e:
            raise RuntimeError("safetensors not available; convert the "
                               "checkpoint to .bin with torch") from e
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


def port_sd_checkpoint(unet_sd: Dict, vae_sd: Dict, text_sd: Dict, cfg,
                       rng=None, dtype=jnp.bfloat16, fast_init: bool = True):
    """Full port: diffusers state_dicts -> (dual_params, vae_params,
    text_params) with the 28-ch surgery applied.

    `fast_init=True` builds the target trees as zero-filled shape-only
    templates (`utils/fast_init.shape_init`) instead of running real
    flax inits — the flagship init costs ~8 minutes through the TPU
    tunnel (PERF.md) and its values are irrelevant here: every
    torch-backed leaf is overwritten by the port (coverage asserted by
    tests/test_sd14_keys.py) and the only surgery-created leaves are the
    zero convs, whose CORRECT initial value is zero (reference
    zero_module, models/controlnet.py:1360-1415).  Equivalence with the
    real-init path is tested (tests/test_sd_port_e2e.py)."""
    from unirenderer_tpu.models.clip_text import init_text_encoder
    from unirenderer_tpu.models.dual_stream import ImageUNet, init_dual_stream
    from unirenderer_tpu.models.vae import init_vae
    from unirenderer_tpu.utils.fast_init import shape_init

    rng = jax.random.key(0) if rng is None else rng
    k1, k2, k3 = jax.random.split(rng, 3)

    unet = ImageUNet(cfg.unet, dtype)
    s = cfg.unet.sample_size
    unet_init_fn = lambda: unet.init(
        k1, jnp.zeros((1, s, s, cfg.unet.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim)))
    unet_init = (shape_init(unet_init_fn, fill="zeros") if fast_init
                 else unet_init_fn())
    unet_params, _ = fill_from_torch(unet_init, unet_sd, unet_path_map)

    dual_init_fn = lambda: init_dual_stream(
        cfg.unet, k1, ctx_len=cfg.text.max_length, dtype=dtype)[1]
    dual_init = (shape_init(dual_init_fn, fill="zeros") if fast_init
                 else dual_init_fn())
    dual_params = dual_stream_from_unet(dual_init, unet_params)

    vae_init_fn = lambda: init_vae(cfg.vae, k2, dtype=dtype)[1]
    vae_init = (shape_init(vae_init_fn, fill="zeros") if fast_init
                else vae_init_fn())
    vae_params, _ = fill_from_torch(vae_init, vae_sd, vae_path_map)

    text_init_fn = lambda: init_text_encoder(cfg.text, k3, dtype=dtype)[1]
    text_init = (shape_init(text_init_fn, fill="zeros") if fast_init
                 else text_init_fn())
    text_params, _ = fill_from_torch(text_init, text_sd, clip_path_map)

    return dual_params, vae_params, text_params
