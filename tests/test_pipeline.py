"""End-to-end tiny-model smoke tests for the sampling pipelines
(SURVEY section 4: 'end-to-end tiny-model smoke (4x4 latent, 2 steps)')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirenderer_tpu.core import config
from unirenderer_tpu.pipelines import UniRendererPipeline


@pytest.fixture(scope="module")
def pipe():
    cfg = config.tiny()
    return UniRendererPipeline.create(cfg, jax.random.key(0),
                                      dtype=jnp.float32)


def _maps(cfg, b=1):
    s = cfg.vae.sample_size
    k = jax.random.key(7)
    names = ("normal", "albedo", "spec_light", "diff_light", "env", "mask")
    ks = jax.random.split(k, len(names))
    return {n: jax.random.uniform(kk, (b, s, s, 3), minval=-1, maxval=1)
            for n, kk in zip(names, ks)}


def test_forward_rendering(pipe):
    maps = _maps(pipe.cfg)
    out = pipe.mask2image_3mod_albedo(
        **maps, metallic=jnp.array([0.3]), roughness=jnp.array([0.8]),
        rng=jax.random.key(1), num_steps=3)
    s = pipe.cfg.vae.sample_size
    assert out.shape == (1, s, s, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_inverse_rendering(pipe):
    cfg = pipe.cfg
    s = cfg.vae.sample_size
    image = jax.random.uniform(jax.random.key(2), (1, s, s, 3),
                               minval=-1, maxval=1)
    mask = jnp.ones((1, s, s, 3))
    out = pipe.real_image2mask_3mod_albedo(
        image=image, mask=mask, rng=jax.random.key(3), num_steps=3,
        ensemble=2)
    for k in ("normal", "albedo", "spec_light", "diff_light", "env"):
        assert out[k].shape == (1, s, s, 3)
        assert np.isfinite(np.asarray(out[k])).all()
    assert out["metallic"].shape[0] == 1
    assert np.isfinite(np.asarray(out["metallic"])).all()


def test_joint_sample(pipe):
    cfg = pipe.cfg
    s = cfg.vae.sample_size
    mask = jnp.ones((1, s, s, 3))
    img_lat, attr_groups = pipe.joint_sample(
        batch=1, mask=mask, rng=jax.random.key(4), num_steps=3)
    assert img_lat.shape[-1] == 4
    assert attr_groups.shape[0] == pipe.n_groups
    assert np.isfinite(np.asarray(img_lat)).all()
    assert np.isfinite(np.asarray(attr_groups)).all()


def test_material_latent_roundtrip(pipe):
    m = jnp.array([0.4])
    r = jnp.array([0.9])
    lat = pipe.material_latent(m, r, (1, 8, 8, 4))
    m2, r2 = pipe.material_from_latent(lat)
    np.testing.assert_allclose(float(m2.mean()), 0.4, atol=1e-6)
    np.testing.assert_allclose(float(r2.mean()), 0.9, atol=1e-6)


def test_vae_roundtrip_shapes(pipe):
    cfg = pipe.cfg
    s = cfg.vae.sample_size
    img = jax.random.uniform(jax.random.key(5), (2, s, s, 3),
                             minval=-1, maxval=1)
    z = pipe.encode_images(img, jax.random.key(6))
    assert z.shape == (2, s // cfg.vae.downscale, s // cfg.vae.downscale, 4)
    back = pipe.decode_latents(z)
    assert back.shape == img.shape


def test_inverse_unet_hoist_is_exact():
    """The hoisted-UNet inverse path (unet raw taps computed once outside
    the scan) must reproduce the per-step general path exactly — the taps
    are loop-invariant by construction (recorded pre-residual from a clean
    image latent at t_img=0)."""
    import jax
    import jax.numpy as jnp

    from unirenderer_tpu.core import config
    from unirenderer_tpu.pipelines import UniRendererPipeline

    cfg = config.tiny()
    pipe = UniRendererPipeline.create(cfg, jax.random.key(0),
                                      dtype=jnp.float32)
    s = cfg.vae.sample_size
    img = jax.random.uniform(jax.random.key(1), (1, s, s, 3),
                             minval=-1, maxval=1)
    mask = jnp.ones((1, s, s, 3))
    kwargs = dict(image=img, mask=mask, rng=jax.random.key(2), num_steps=3)

    pipe.hoist_invariant = True
    fast = pipe.image2mask_3mod_albedo(**kwargs)
    pipe.hoist_invariant = False
    slow = pipe.image2mask_3mod_albedo(**kwargs)
    for k in ("normal", "albedo", "spec_light", "diff_light", "env",
              "metallic", "roughness"):
        np.testing.assert_allclose(np.asarray(fast[k]), np.asarray(slow[k]),
                                   atol=1e-5, err_msg=k)


def test_encoder_reuse_forward_sampling():
    """encoder_reuse=2 (Faster-Diffusion encoder propagation) runs the
    cached-taps scan and produces finite output of the right shape;
    encoder_reuse=1 must be bit-identical to the default path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from unirenderer_tpu.core import config
    from unirenderer_tpu.pipelines import UniRendererPipeline

    cfg = config.tiny()
    pipe = UniRendererPipeline.create(cfg, jax.random.key(0),
                                      dtype=jnp.float32)
    s = cfg.vae.sample_size
    ks = jax.random.split(jax.random.key(1), 6)
    maps = {k: jax.random.uniform(ks[i], (1, s, s, 3), minval=-1, maxval=1)
            for i, k in enumerate(("normal", "albedo", "spec_light",
                                   "diff_light", "env", "mask"))}
    kwargs = dict(**maps, metallic=jnp.full((1,), 0.4),
                  roughness=jnp.full((1,), 0.6),
                  rng=jax.random.key(2), num_steps=4)

    base = np.asarray(pipe.mask2image_3mod_albedo(**kwargs))

    pipe.cfg = dataclasses.replace(
        cfg, sampler=dataclasses.replace(cfg.sampler, encoder_reuse=2))
    reused = np.asarray(pipe.mask2image_3mod_albedo(**kwargs))
    assert reused.shape == base.shape
    assert np.isfinite(reused).all()
    # the reuse path genuinely ran: output differs from the exact path
    # (decoder-only steps see stale encoder features) but stays sane
    assert np.abs(reused - base).max() > 0
    assert np.abs(reused - base).mean() < 1.0

    pipe.cfg = dataclasses.replace(
        cfg, sampler=dataclasses.replace(cfg.sampler, encoder_reuse=1))
    exact = np.asarray(pipe.mask2image_3mod_albedo(**kwargs))
    np.testing.assert_array_equal(exact, base)


def test_chunked_vae_decode_matches_unchunked(pipe):
    """decode of a stack larger than VAE_CHUNK (the inverse path's 6-map
    x batch stack) must equal per-chunk == whole-stack decode exactly."""
    c = pipe.VAE_CHUNK
    n = 2 * c
    s = pipe.cfg.unet.sample_size
    lat = jax.random.normal(jax.random.key(3), (n, s, s, 4))
    whole = np.asarray(pipe.decode_latents(lat))
    parts = np.concatenate([
        np.asarray(pipe.decode_latents(lat[i:i + c]))
        for i in range(0, n, c)])
    np.testing.assert_allclose(whole, parts, atol=1e-5)


def test_chunked_vae_remainder_stacks(pipe):
    """Stacks that do NOT divide VAE_CHUNK (e.g. the batch-4 inverse decode
    of 20 latents) must still decode chunk-bounded and match per-image
    decode exactly (round-2 ADVICE medium #1 / VERDICT 'do this' #6)."""
    s = pipe.cfg.unet.sample_size
    for n in (17, pipe.VAE_CHUNK * 2 + 5):
        lat = jax.random.normal(jax.random.key(40 + n), (n, s, s, 4))
        whole = np.asarray(pipe.decode_latents(lat))
        assert whole.shape[0] == n
        ref = np.concatenate([
            np.asarray(pipe.decode_latents(lat[i:i + 1]))
            for i in range(n)])
        np.testing.assert_allclose(whole, ref, atol=1e-4)

        img = jax.random.uniform(jax.random.key(60 + n),
                                 (n, s * 2, s * 2, 3), minval=-1, maxval=1)
        z = np.asarray(pipe.encode_images(img, jax.random.key(0)))
        assert z.shape[0] == n and np.isfinite(z).all()


def test_ensemble_folded_into_batch(pipe):
    """real_image2mask with ensemble>1 runs ONE folded program at
    ensemble*batch and averages after decode: outputs keep the caller's
    batch shape, stay finite, and per-sample independence holds
    (different images in the batch give different maps)."""
    cfg = pipe.cfg
    s = cfg.vae.sample_size
    img = jnp.stack([
        jnp.full((s, s, 3), -0.5), jnp.full((s, s, 3), 0.5)])
    mask = jnp.ones((2, s, s, 3))
    out = pipe.real_image2mask_3mod_albedo(
        image=img, mask=mask, rng=jax.random.key(11), num_steps=2,
        ensemble=3)
    for k in ("normal", "albedo", "spec_light", "diff_light", "env"):
        assert out[k].shape == (2, s, s, 3), k
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert out["metallic"].shape[0] == 2
    # distinct inputs -> distinct decompositions
    alb = np.asarray(out["albedo"])
    assert np.abs(alb[0] - alb[1]).mean() > 1e-4


def test_material_readout_modes(pipe):
    """'decode' readout inverts the training-side encoding (VAE decode ->
    [m,m,r] channels); 'latent' reproduces the reference raw readout
    (test_real.py:557-564).  Both are masked."""
    cfg = pipe.cfg
    s = cfg.vae.sample_size
    img = jax.random.uniform(jax.random.key(21), (1, s, s, 3),
                             minval=-1, maxval=1)
    mask = jnp.ones((1, s, s, 3))
    kw = dict(image=img, mask=mask, rng=jax.random.key(22), num_steps=2)
    dec = pipe.image2mask_3mod_albedo(**kw, material_readout="decode")
    lat = pipe.image2mask_3mod_albedo(**kw, material_readout="latent")
    # decode readout is at image resolution, latent at latent resolution
    assert dec["metallic"].shape == (1, s, s)
    ls = s // cfg.vae.downscale
    assert lat["metallic"].shape == (1, ls, ls)
    for o in (dec, lat):
        assert np.isfinite(np.asarray(o["metallic"])).all()
        assert np.isfinite(np.asarray(o["roughness"])).all()


def test_relight_material_readout_undiluted(pipe, monkeypatch):
    """Regression for round-2 VERDICT weak #2: relight must feed the
    forward re-render a MASKED-mean metallic/roughness.  With a 25%%-
    coverage object at metallic 0.8, the old full-image mean read ~0.2."""
    cfg = pipe.cfg
    s = cfg.vae.sample_size
    cov = np.zeros((1, s, s, 3), np.float32)
    cov[:, : s // 2, : s // 2] = 1.0          # 25% coverage
    mask = jnp.asarray(cov * 2.0 - 1.0)
    maskv = cov[..., 0]

    fake_dec = {
        "normal": jnp.zeros((1, s, s, 3)),
        "albedo": jnp.zeros((1, s, s, 3)),
        "spec_light": jnp.zeros((1, s, s, 3)),
        "diff_light": jnp.zeros((1, s, s, 3)),
        "env": jnp.zeros((1, s, s, 3)),
        # mask-multiplied per-pixel maps, as _inverse returns them
        "metallic": jnp.asarray(maskv * 0.8),
        "roughness": jnp.asarray(maskv * 0.4),
        "material_latents": jnp.zeros((1, s // 2, s // 2, 4)),
    }
    captured = {}
    monkeypatch.setattr(
        pipe, "real_image2mask_3mod_albedo", lambda **kw: fake_dec)

    def fake_forward(**kw):
        captured.update(kw)
        return jnp.zeros((1, s, s, 3))

    monkeypatch.setattr(pipe, "mask2image_3mod_albedo", fake_forward)
    pipe.relight(image=jnp.zeros((1, s, s, 3)), mask=mask,
                 new_env=jnp.ones((8, 16, 3)), rng=jax.random.key(5),
                 num_steps=2)
    np.testing.assert_allclose(float(captured["metallic"][0]), 0.8,
                               atol=1e-3)
    np.testing.assert_allclose(float(captured["roughness"][0]), 0.4,
                               atol=1e-3)
