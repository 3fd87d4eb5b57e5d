"""End-to-end SD checkpoint port on SYNTHETIC diffusers state_dicts
(round-2 VERDICT 'do this' #7): real key inventory, random values, full
load -> map -> surgery -> train path in CI, so real SD-v1.4 weight files
become a drop-in (reference loading sites: train/train.py:954-996,
models/controlnet.py:1436-1507).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirenderer_tpu.core import config
from unirenderer_tpu.models import surgery

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# Synthetic diffusers checkpoints from a flax shape template
# ---------------------------------------------------------------------------


def _torch_shape(name, shape):
    if name == "kernel":
        if len(shape) == 4:                   # (kh,kw,I,O) -> (O,I,kh,kw)
            return (shape[3], shape[2], shape[0], shape[1])
        if len(shape) == 2:                   # (I,O) -> (O,I)
            return (shape[1], shape[0])
    return tuple(shape)


def synthetic_state_dict(template, path_map, seed=0):
    """torch-keyed random state_dict covering every mapped leaf of the
    flax template (shapes inverted through the _convert_leaf layout)."""
    rng = np.random.default_rng(seed)
    sd = {}

    def walk(tree, path):
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                walk(v, p)
            else:
                tk = path_map(p)
                if tk is not None:
                    sd[tk] = rng.standard_normal(
                        _torch_shape(k, v.shape)).astype(np.float32)

    walk(template["params"], ())
    return sd


def _templates(cfg):
    from unirenderer_tpu.models.clip_text import init_text_encoder
    from unirenderer_tpu.models.dual_stream import ImageUNet, init_dual_stream
    from unirenderer_tpu.models.vae import init_vae

    k = jax.random.key(0)
    unet = ImageUNet(cfg.unet, jnp.float32)
    s = cfg.unet.sample_size
    unet_t = jax.eval_shape(lambda: unet.init(
        k, jnp.zeros((1, s, s, cfg.unet.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim))))
    vae_t = jax.eval_shape(lambda: init_vae(cfg.vae, k, dtype=jnp.float32)[1])
    text_t = jax.eval_shape(
        lambda: init_text_encoder(cfg.text, k, dtype=jnp.float32)[1])
    return unet_t, vae_t, text_t


def _synthetic_triplet(cfg, seed=0):
    unet_t, vae_t, text_t = _templates(cfg)
    return (synthetic_state_dict(unet_t, surgery.unet_path_map, seed),
            synthetic_state_dict(vae_t, surgery.vae_path_map, seed + 1),
            synthetic_state_dict(text_t, surgery.clip_path_map, seed + 2))


# ---------------------------------------------------------------------------


def test_fast_init_port_matches_real_init():
    """port_sd_checkpoint(fast_init=True) (shape-only zero templates, no
    flagship init through the tunnel) must produce EXACTLY the params of
    the real-init path — every torch-backed leaf is overwritten and the
    surgery-created zero convs are zero by definition."""
    cfg = config.tiny()
    u, v, t = _synthetic_triplet(cfg)
    fast = surgery.port_sd_checkpoint(u, v, t, cfg, dtype=jnp.float32,
                                      fast_init=True)
    slow = surgery.port_sd_checkpoint(u, v, t, cfg, dtype=jnp.float32,
                                      fast_init=False)
    for name, a, b in zip(("dual", "vae", "text"), fast, slow):
        fa = jax.tree_util.tree_leaves_with_path(a)
        fb = jax.tree_util.tree_leaves_with_path(b)
        assert len(fa) == len(fb)
        for (pa, la), (_, lb) in zip(fa, fb):
            np.testing.assert_array_equal(
                np.asarray(la), np.asarray(lb),
                err_msg=f"{name}:{jax.tree_util.keystr(pa)}")


def test_flagship_port_real_key_inventory():
    """The port at FLAGSHIP geometry consumes the exact real SD-v1.4 key
    inventory (tests/sd14_keys.py) and lands values where the surgery
    says: unet copy, encoder conv_in inflation x7*0.142, decoder conv_out
    inflation, zero convs zero."""
    from tests.sd14_keys import sd14_unet_keys, sd14_vae_keys

    cfg = config.flagship()
    unet_t, vae_t, _ = _templates(cfg)
    unet_sd = synthetic_state_dict(unet_t, surgery.unet_path_map, 3)
    vae_sd = synthetic_state_dict(vae_t, surgery.vae_path_map, 4)

    # our mapped key set IS the real diffusers inventory, both directions
    assert set(unet_sd) == set(sd14_unet_keys())
    assert set(vae_sd) == set(sd14_vae_keys())

    # port the UNet + surgery (text/vae ports are covered at tiny scale by
    # test_fast_init_port_matches_real_init; flagship CLIP adds minutes of
    # single-core copying for no extra coverage)
    unet_params, missing = surgery.fill_from_torch(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), unet_t),
        unet_sd, surgery.unet_path_map)
    assert not missing
    from unirenderer_tpu.models.dual_stream import init_dual_stream
    from unirenderer_tpu.utils.fast_init import shape_init
    dual_t = shape_init(
        lambda: init_dual_stream(cfg.unet, jax.random.key(0),
                                 ctx_len=cfg.text.max_length,
                                 dtype=jnp.float32)[1], fill="zeros")
    dual = surgery.dual_stream_from_unet(dual_t, unet_params)
    p = dual["params"]

    # unet conv_in == transposed torch tensor
    np.testing.assert_allclose(
        np.asarray(p["unet"]["conv_in"]["kernel"]),
        unet_sd["conv_in.weight"].transpose(2, 3, 1, 0), atol=0)
    # encoder conv_in inflation: (3,3,4,320) -> (3,3,28,320) tiled * 0.142
    enc_k = np.asarray(p["controlnet"]["conv_in"]["kernel"])
    assert enc_k.shape[2] == cfg.unet.attr_channels
    np.testing.assert_allclose(
        enc_k[:, :, 4:8, :],
        unet_sd["conv_in.weight"].transpose(2, 3, 1, 0) * 0.142, rtol=1e-6)
    # decoder conv_out inflation: out-channels x7, bias too
    dec_k = np.asarray(p["controldec"]["conv_out"]["kernel"])
    assert dec_k.shape[3] == cfg.unet.attr_channels
    np.testing.assert_allclose(
        np.asarray(p["controldec"]["conv_out"]["bias"])[:4],
        unet_sd["conv_out.bias"] * 0.142, rtol=1e-6)
    # zero convs stayed zero
    zc = [np.asarray(x) for pth, x in
          jax.tree_util.tree_leaves_with_path(p["controlnet"])
          if "zero" in jax.tree_util.keystr(pth)]
    assert zc and all((z == 0).all() for z in zc)


def test_cli_port_path_trains(tmp_path):
    """tools/train.py --sd-unet/--sd-vae/--sd-text: load_torch_state_dict
    -> port -> install_ported -> train steps, end to end (tiny config)."""
    torch = pytest.importorskip("torch")
    cfg = config.tiny()
    u, v, t = _synthetic_triplet(cfg, seed=9)
    paths = {}
    for name, sd in (("unet", u), ("vae", v), ("text", t)):
        f = tmp_path / f"{name}.bin"
        torch.save({k: torch.from_numpy(x) for k, x in sd.items()}, str(f))
        paths[name] = str(f)

    env = dict(os.environ, UNIRENDER_PLATFORM="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--workdir", str(tmp_path / "run"), "--synthetic", "--config",
         "tiny", "--steps", "2",
         "--sd-unet", paths["unet"], "--sd-vae", paths["vae"],
         "--sd-text", paths["text"]],
        capture_output=True, text=True, timeout=540, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "finished at step 2" in r.stdout


def test_ported_activations_diff_smoke():
    """introspect.diff_activations on a ported model: identical params
    diff to zero; perturbing one block shows up in the report."""
    from unirenderer_tpu.models import introspect
    from unirenderer_tpu.models.dual_stream import ImageUNet

    cfg = config.tiny()
    u, v, t = _synthetic_triplet(cfg, seed=11)
    dual, _, _ = surgery.port_sd_checkpoint(u, v, t, cfg, dtype=jnp.float32)
    unet = ImageUNet(cfg.unet, jnp.float32)
    up = {"params": dual["params"]["unet"]}
    s = cfg.unet.sample_size
    x = jax.random.normal(jax.random.key(1), (1, s, s, 4))
    tt = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim))
    a = introspect.capture_activations(unet, up, x, tt, ctx)
    b = introspect.capture_activations(unet, up, x, tt, ctx)
    rep = introspect.diff_activations(a, b)
    assert rep and max(r[1] for r in rep) == 0.0

    up2 = jax.tree.map(lambda x: x, up)
    up2["params"] = dict(up2["params"])
    up2["params"]["conv_in"] = {
        "kernel": up["params"]["conv_in"]["kernel"] + 0.1,
        "bias": up["params"]["conv_in"]["bias"]}
    c = introspect.capture_activations(unet, up2, x, tt, ctx)
    rep2 = introspect.diff_activations(a, c)
    assert max(r[1] for r in rep2) > 0.0
