"""Independent SD-v1.4 diffusers key inventory.

These key lists are written from the diffusers naming scheme itself
(UNet2DConditionModel / AutoencoderKL as shipped for CompVis/
stable-diffusion-v1-4, diffusers>=0.15 "to_q" attention naming — the
reference pins 0.24.0.dev0), NOT derived from this repo's path maps.
They are the ground truth the surgery maps must cover: if any real
checkpoint key would go unmapped, tests/test_sd14_keys.py fails.

Reference loading sites: train/train.py:954-996 (UNet/VAE/CLIP
from_pretrained + 28-ch inflation), models/controlnet.py:1436-1507.
"""

from __future__ import annotations


def _wb(prefix):
    return [prefix + ".weight", prefix + ".bias"]


def _resnet(prefix, shortcut, time_emb=True):
    ks = _wb(prefix + ".norm1") + _wb(prefix + ".conv1")
    if time_emb:
        ks += _wb(prefix + ".time_emb_proj")
    ks += _wb(prefix + ".norm2") + _wb(prefix + ".conv2")
    if shortcut:
        ks += _wb(prefix + ".conv_shortcut")
    return ks


def _transformer2d(prefix):
    ks = _wb(prefix + ".norm") + _wb(prefix + ".proj_in") \
        + _wb(prefix + ".proj_out")
    b = prefix + ".transformer_blocks.0"
    for attn in ("attn1", "attn2"):
        ks += [f"{b}.{attn}.to_q.weight", f"{b}.{attn}.to_k.weight",
               f"{b}.{attn}.to_v.weight"]
        ks += _wb(f"{b}.{attn}.to_out.0")
    ks += _wb(b + ".ff.net.0.proj") + _wb(b + ".ff.net.2")
    ks += _wb(b + ".norm1") + _wb(b + ".norm2") + _wb(b + ".norm3")
    return ks


def sd14_unet_keys():
    """All 686 parameter keys of the SD-v1.4 UNet2DConditionModel."""
    ks = _wb("conv_in")
    ks += _wb("time_embedding.linear_1") + _wb("time_embedding.linear_2")

    # down: CrossAttnDownBlock2D x3 (320, 640, 1280) + DownBlock2D (1280)
    ch = [320, 640, 1280, 1280]
    prev = 320
    for i in range(4):
        cross = i < 3
        for j in range(2):
            cin = prev if j == 0 else ch[i]
            ks += _resnet(f"down_blocks.{i}.resnets.{j}", cin != ch[i])
            if cross:
                ks += _transformer2d(f"down_blocks.{i}.attentions.{j}")
        if i < 3:
            ks += _wb(f"down_blocks.{i}.downsamplers.0.conv")
        prev = ch[i]

    ks += _resnet("mid_block.resnets.0", False)
    ks += _transformer2d("mid_block.attentions.0")
    ks += _resnet("mid_block.resnets.1", False)

    # up: UpBlock2D (1280) + CrossAttnUpBlock2D x3 (1280, 640, 320);
    # every up resnet concatenates a skip => always conv_shortcut
    up_ch = [1280, 1280, 640, 320]
    for i in range(4):
        cross = i > 0
        for j in range(3):
            ks += _resnet(f"up_blocks.{i}.resnets.{j}", True)
            if cross:
                ks += _transformer2d(f"up_blocks.{i}.attentions.{j}")
        if i < 3:
            ks += _wb(f"up_blocks.{i}.upsamplers.0.conv")

    ks += _wb("conv_norm_out") + _wb("conv_out")
    return set(ks)


def _vae_attn(prefix):
    ks = _wb(prefix + ".group_norm")
    for p in ("to_q", "to_k", "to_v"):
        ks += _wb(f"{prefix}.{p}")
    ks += _wb(prefix + ".to_out.0")
    return ks


def sd14_vae_keys():
    """All 248 parameter keys of the SD-v1.4 AutoencoderKL."""
    ks = _wb("encoder.conv_in")
    ch = [128, 256, 512, 512]
    prev = 128
    for i in range(4):
        for j in range(2):
            cin = prev if j == 0 else ch[i]
            ks += _resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                          cin != ch[i], time_emb=False)
        if i < 3:
            ks += _wb(f"encoder.down_blocks.{i}.downsamplers.0.conv")
        prev = ch[i]
    ks += _resnet("encoder.mid_block.resnets.0", False, time_emb=False)
    ks += _vae_attn("encoder.mid_block.attentions.0")
    ks += _resnet("encoder.mid_block.resnets.1", False, time_emb=False)
    ks += _wb("encoder.conv_norm_out") + _wb("encoder.conv_out")

    ks += _wb("decoder.conv_in")
    ks += _resnet("decoder.mid_block.resnets.0", False, time_emb=False)
    ks += _vae_attn("decoder.mid_block.attentions.0")
    ks += _resnet("decoder.mid_block.resnets.1", False, time_emb=False)
    up_ch = [512, 512, 256, 128]
    prev = 512
    for i in range(4):
        for j in range(3):
            cin = prev if j == 0 else up_ch[i]
            ks += _resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                          cin != up_ch[i], time_emb=False)
        if i < 3:
            ks += _wb(f"decoder.up_blocks.{i}.upsamplers.0.conv")
        prev = up_ch[i]
    ks += _wb("decoder.conv_norm_out") + _wb("decoder.conv_out")
    ks += _wb("quant_conv") + _wb("post_quant_conv")
    return set(ks)


def sd14_clip_keys():
    """CLIP ViT-L/14 text-encoder keys, straight from transformers'
    CLIPTextModel (the library the reference loads with) — real external
    inventory, not hand-rolled."""
    from transformers import CLIPTextConfig, CLIPTextModel
    # key NAMES depend only on layer count (12 for ViT-L/14); shrink the
    # width so the test instantiates in milliseconds
    cfg = CLIPTextConfig(num_hidden_layers=12, hidden_size=64,
                         intermediate_size=128, num_attention_heads=4)
    model = CLIPTextModel(cfg)
    return set(model.state_dict().keys())
