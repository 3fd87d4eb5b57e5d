"""Metric correctness tests (SURVEY C11)."""

import numpy as np
import pytest

from unirenderer_tpu.eval import metrics
from unirenderer_tpu.eval.inception import InceptionV3Features, make_feature_fn


def test_psnr_known_value():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    assert abs(metrics.psnr(a, b) - 20.0) < 1e-6
    assert metrics.psnr(a, a) == float("inf")


def test_seg_metric_perfect_and_random():
    m = metrics.SegMetric(3)
    lbl = np.random.default_rng(0).integers(0, 3, (32, 32))
    m.update(lbl, lbl)
    assert m.pixel_accuracy() == 1.0
    assert m.miou() == 1.0
    m2 = metrics.SegMetric(2)
    m2.update(np.zeros((4, 4), int), np.ones((4, 4), int))
    assert m2.pixel_accuracy() == 0.0


def test_normal_metric_angles():
    m = metrics.NormalMetric()
    n = np.tile([0, 0, 1.0], (100, 1))
    rot = np.tile([0, np.sin(np.radians(20)), np.cos(np.radians(20))],
                  (100, 1))
    m.update(rot, n)
    s = m.summary()
    assert abs(s["mean"] - 20.0) < 0.1
    assert s["a1"] == 0.0 and s["a2"] == 1.0


def test_depth_metric():
    m = metrics.DepthMetric()
    gt = np.ones((16, 16))
    m.update(gt * 1.1, gt)
    s = m.summary()
    assert abs(s["abs_rel"] - 0.1) < 1e-6
    assert s["delta1"] == 1.0


def test_frechet_distance_identity_and_shift():
    rng = np.random.default_rng(0)
    f = rng.standard_normal((500, 16))
    mu, sig = f.mean(0), np.cov(f, rowvar=False)
    assert abs(metrics.frechet_distance(mu, sig, mu, sig)) < 1e-6
    d = metrics.frechet_distance(mu + 2.0, sig, mu, sig)
    assert abs(d - 4.0 * 16) < 1.0          # ||shift||^2 = 4*16


def test_fid_pipeline_with_random_backbone():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
    b = a.copy()
    feat = make_feature_fn(batch=4)
    assert abs(metrics.fid(a, b, feat)) < 1e-3
    c = rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
    assert metrics.fid(a, c, feat) > 0


def test_inception_feature_shape():
    import jax
    import jax.numpy as jnp
    model = InceptionV3Features()
    params = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
    out = model.apply(params, jnp.zeros((2, 299, 299, 3)))
    assert out.shape == (2, 2048)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    # torchvision inception_v3 backbone ~ 21.8M conv/bn params
    assert 20e6 < n_params < 26e6


# ---------------------------------------------------------------------------
# LPIPS backbone (reference uses the lpips package, test_real.py:458-464)
# ---------------------------------------------------------------------------

def test_lpips_metric_properties():
    """Identity -> 0; distance grows with perturbation; symmetric."""
    import jax
    import jax.numpy as jnp

    from unirenderer_tpu.eval.lpips import make_lpips_fn

    fn, _ = make_lpips_fn()
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    d0 = np.asarray(fn(a, a))
    np.testing.assert_allclose(d0, 0.0, atol=1e-5)
    small = a + 0.05 * jnp.asarray(
        rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    big = a + 0.5 * jnp.asarray(
        rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    ds = np.asarray(fn(a, small))
    db = np.asarray(fn(a, big))
    assert (ds > 0).all() and (db > ds).all()
    np.testing.assert_allclose(np.asarray(fn(small, a)), ds, rtol=1e-4)


def test_lpips_torch_port_mapping():
    """Synthetic torch state dicts with the real torchvision/lpips key
    layout port into the flax params and change the metric's output."""
    import jax
    import jax.numpy as jnp

    from unirenderer_tpu.eval import lpips as L

    rng = np.random.default_rng(1)
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [c for blk in L._VGG_BLOCKS for c in blk]
    feats = {}
    cin = 3
    for ti, co in zip(conv_idx, chans):
        feats[f"{ti}.weight"] = rng.standard_normal(
            (co, cin, 3, 3)).astype(np.float32) * 0.05
        feats[f"{ti}.bias"] = np.zeros((co,), np.float32)
        cin = co
    lins = {f"lin{i}.model.1.weight":
            rng.uniform(0, 1, (1, c, 1, 1)).astype(np.float32)
            for i, c in enumerate([64, 128, 256, 512, 512])}
    params = L.lpips_params_from_torch(feats, lins)
    fn, _ = L.make_lpips_fn(params=params)
    a = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    d = np.asarray(fn(a, b))
    assert np.isfinite(d).all() and (d > 0).all()
    # ported conv kernel really landed (shape + value spot check)
    k = params["params"]["vgg"]["conv0"]["kernel"]
    assert k.shape == (3, 3, 3, 64)
    np.testing.assert_allclose(np.asarray(k)[..., 0, 5],
                               feats["0.weight"][5, 0], rtol=1e-6)


def test_inception_torch_port_mapping():
    """load_torch_inception on a SYNTHETIC torchvision-inception_v3
    state_dict (real key naming via the mapping tables, random values):
    every BasicConv scope ports, kernels land transposed, and the feature
    function's output changes from the random init (round-2 VERDICT 'do
    this' #9 — no weight files in a zero-egress environment)."""
    import jax
    import jax.numpy as jnp

    from unirenderer_tpu.eval import inception as I

    import jax as _jax
    model = I.InceptionV3Features()
    params = model.init(_jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
    feat_fn = I.make_feature_fn(params=params, batch=2)
    rng = np.random.default_rng(3)

    flat = params["params"]
    sd = {}
    scopes = []
    for top, sub in I._iter_scopes(flat):
        src = I._torch_prefix(top, sub)
        if src is None:
            continue
        leaf = flat[top] if sub is None else flat[top][sub]
        k = np.asarray(leaf["conv"]["kernel"])          # (kh,kw,I,O)
        sd[src + ".conv.weight"] = rng.standard_normal(
            (k.shape[3], k.shape[2], k.shape[0], k.shape[1])
        ).astype(np.float32) * 0.05
        for ours, theirs in (("bn_gamma", "bn.weight"),
                             ("bn_beta", "bn.bias"),
                             ("bn_mean", "bn.running_mean"),
                             ("bn_var", "bn.running_var")):
            v = np.asarray(leaf[ours])
            fill = (np.abs(rng.standard_normal(v.shape)) + 0.5
                    if ours == "bn_var" else
                    rng.standard_normal(v.shape))
            sd[f"{src}.{theirs}"] = fill.astype(np.float32)
        scopes.append((top, sub, src))
    assert len(scopes) > 90          # inception_v3 has ~94 BasicConv units

    ported = I.load_torch_inception(params, sd)
    # kernel landed, transposed torch (O,I,kh,kw) -> flax (kh,kw,I,O)
    top, sub, src = scopes[0]
    leaf = ported["params"][top] if sub is None else ported["params"][top][sub]
    np.testing.assert_allclose(
        np.asarray(leaf["conv"]["kernel"]),
        sd[src + ".conv.weight"].transpose(2, 3, 1, 0), atol=0)

    fn2 = I.make_feature_fn(params=ported, batch=2)
    x = rng.uniform(0, 1, (2, 75, 75, 3)).astype(np.float32)
    fa = np.asarray(feat_fn(x))
    fb = np.asarray(fn2(x))
    assert fa.shape == fb.shape == (2, 2048)
    assert np.isfinite(fb).all()
    assert np.abs(fa - fb).max() > 0
