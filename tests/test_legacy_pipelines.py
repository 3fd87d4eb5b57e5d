"""Legacy 16-ch/12-ch model-family + pipeline tests (SURVEY C5/C7:
reference ControlNetModel/ControlDecModel generations and the d4p
pipelines)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirenderer_tpu.core import config
from unirenderer_tpu.pipelines import UniRendererPipeline


def _tiny_legacy(attr_channels: int) -> config.SystemConfig:
    cfg = config.tiny()
    return dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet,
                                      attr_channels=attr_channels))


@pytest.mark.parametrize("attr_channels", [16, 12])
def test_legacy_forward_and_inverse(attr_channels):
    cfg = _tiny_legacy(attr_channels)
    pipe = UniRendererPipeline.create(cfg, jax.random.key(0),
                                      dtype=jnp.float32)
    g = attr_channels // 4
    s = cfg.vae.sample_size
    lat = s // cfg.vae.downscale
    attr_latents = jax.random.normal(jax.random.key(1), (g, 1, lat, lat, 4))
    img = pipe.rendering(attr_latents=attr_latents, rng=jax.random.key(2),
                         num_steps=2)
    assert img.shape == (1, s, s, 3)
    assert np.isfinite(np.asarray(img)).all()

    image = jax.random.uniform(jax.random.key(3), (1, s, s, 3),
                               minval=-1, maxval=1)
    attrs = pipe.inverse_rendering(image=image, rng=jax.random.key(4),
                                   num_steps=2)
    assert attrs.shape == (g, 1, lat, lat, 4)
    assert np.isfinite(np.asarray(attrs)).all()


def test_legacy_channel_mismatch_raises():
    cfg = _tiny_legacy(16)
    pipe = UniRendererPipeline.create(cfg, jax.random.key(0),
                                      dtype=jnp.float32)
    bad = jnp.zeros((3, 1, 4, 4, 4))       # 12ch latents on a 16ch model
    with pytest.raises(AssertionError):
        pipe.rendering(attr_latents=bad, rng=jax.random.key(1), num_steps=2)


def test_flagship_legacy_config_factories():
    assert config.legacy16().unet.attr_channels == 16
    assert config.legacy12().unet.attr_channels == 12
