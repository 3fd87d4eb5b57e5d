"""Render-in-step training (the reference's in-loop render regime,
train/train.py:184-439+:1239, fused into ONE XLA program): the fused step
must produce exactly the same update as host-collate + plain train step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from unirenderer_tpu.core import config
from unirenderer_tpu.data.objaverse import (
    collate_render, material_grid, stack_scene,
)
from unirenderer_tpu.render.mesh import make_sphere


def _tiny_cfg():
    cfg = config.tiny()
    # render at the VAE sample size so CPU collate stays cheap; small mesh
    # padding keeps the rasterizer scan short
    return dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data,
                                      resolution=cfg.vae.sample_size,
                                      ssaa=1, v_pad=1024, t_pad=2048,
                                      texture_res=16))


def _items(cfg, n=2):
    import random
    sphere = make_sphere(8)
    kd = np.asarray([0.6, 0.5, 0.4], np.float32)
    mesh = {
        "v_pos": np.asarray(sphere.v_pos),
        "t_idx": np.asarray(sphere.t_pos_idx),
        "v_nrm": np.asarray(sphere.v_nrm),
        "v_tex": np.asarray(sphere.v_tex),
        "v_tng": np.asarray(sphere.v_tng),
        "kd_tex": np.broadcast_to(kd, (cfg.data.texture_res,
                                       cfg.data.texture_res, 3)).copy(),
    }
    # pad like the dataset does
    from unirenderer_tpu.data.objaverse import pad_mesh
    mesh = {**pad_mesh(mesh, cfg.data.v_pad, cfg.data.t_pad),
            "kd_tex": mesh["kd_tex"]}
    env = {"specular_0": np.ones((6, 8, 8, 3), np.float32) * 0.7,
           "specular_1": np.ones((6, 4, 4, 3), np.float32) * 0.5,
           "diffuse": np.ones((6, 4, 4, 3), np.float32) * 0.4}
    rng = random.Random(0)
    grid = material_grid(cfg.data.material_grid)
    out = []
    for _ in range(n):
        m, r = rng.choice(grid)
        out.append(dict(mesh=mesh, env=env, metallic=m, roughness=r,
                        azimuth=rng.uniform(0, 360),
                        elevation=rng.uniform(60, 120),
                        distance=cfg.data.camera_distance))
    return out


def test_render_in_step_equals_host_collate():
    cfg = _tiny_cfg()
    from unirenderer_tpu.diffusion.schedule import DiffusionSchedule
    from unirenderer_tpu.models.dual_stream import init_dual_stream
    from unirenderer_tpu.models.vae import init_vae
    from unirenderer_tpu.train.train_step import (
        BATCH_KEYS, create_train_state, make_render_train_step,
        make_train_step,
    )

    k = jax.random.key(0)
    dual, dual_params = init_dual_stream(cfg.unet, k,
                                         ctx_len=cfg.text.max_length,
                                         dtype=jnp.float32)
    vae, vae_params = init_vae(cfg.vae, k, dtype=jnp.float32)
    schedule = DiffusionSchedule.create(cfg.diffusion)
    ctx = jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim))

    items = _items(cfg)
    scene = jax.tree.map(jnp.asarray, stack_scene(items))
    batch = collate_render(items, resolution=cfg.data.resolution,
                           ssaa=cfg.data.ssaa)
    batch = {kk: batch[kk] for kk in BATCH_KEYS}

    base = make_train_step(cfg, dual, vae, schedule)
    fused = make_render_train_step(cfg, dual, vae, schedule)

    rng = jax.random.key(7)
    s1, m1 = base(create_train_state(cfg, dual_params), vae_params, ctx,
                  batch, rng)
    s2, m2 = fused(create_train_state(cfg, dual_params), vae_params, ctx,
                   scene, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
