"""Device-mesh / sharding utilities.

The reference's distributed story is single-node torch DDP via HF Accelerate
with static YAML topologies (SURVEY section 2.5; accelerate_configs/*.yaml,
train/train.py:882-887,1140-1142).  The TPU-native equivalent: a
`jax.sharding.Mesh` over all devices, batch sharded on the `data` axis,
parameters replicated (pure DP) or FSDP-sharded along `data`, and XLA
inserting the gradient `psum` over ICI inside the one compiled train step —
no NCCL, no wrapper classes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (the reference's `accelerate launch` rdzv role,
    accelerate_configs/*.yaml).  On TPU pods the args auto-detect; no-op
    for single-process runs."""
    import jax

    if num_processes is None and coordinator is None:
        try:
            jax.distributed.initialize()
        except Exception:
            return                      # single-process environment
    else:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def host_local_batch_slice(global_batch: int) -> slice:
    """Each host loads only its shard of the global batch (per-host data
    loading — SURVEY 2.5 'jax.distributed.initialize + per-host data')."""
    import jax

    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_mesh_2d(dp: int, mp: int,
                 axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """2-D (data x model) mesh for hybrid DP x tensor-parallel runs.

    Devices are laid out model-axis-minor so each TP group sits on
    adjacent chips (one ICI hop for the per-layer collectives; DP's
    gradient psum crosses the slower outer dimension once per step)."""
    devs = jax.devices()
    assert dp * mp <= len(devs), (dp, mp, len(devs))
    grid = np.asarray(devs[:dp * mp]).reshape(dp, mp)
    return Mesh(grid, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device-put a host batch with the leading dim sharded over `data`."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def fsdp_param_sharding(params: Any, mesh: Mesh, axis_name: str = "data",
                        min_size: int = 2 ** 18) -> Any:
    """FSDP-style sharding rules: shard the largest-divisible axis of each
    big parameter along `data`; small params stay replicated.

    Optional memory saver for >1 replica (SURVEY 2.5 'optional stretch');
    correctness is unchanged because XLA all-gathers on demand.
    """
    n = mesh.shape[axis_name]

    def rule(x):
        if x.size < min_size:
            return NamedSharding(mesh, P())
        # choose the largest dim divisible by n
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % n == 0:
                spec = [None] * x.ndim
                spec[d] = axis_name
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def apply_sharding(tree: Any, shardings: Any) -> Any:
    return jax.tree.map(jax.device_put, tree, shardings)


# -- tensor parallelism ------------------------------------------------------
#
# Megatron-style TP for the dual-stream transformer blocks (PERF.md: the 16
# transformer blocks are 83% of step time).  Column-parallel qkv / GEGLU-in
# (output dim sharded over `model`), row-parallel out-projections (input dim
# sharded) — GSPMD propagates the activation shardings and inserts the one
# all-reduce per block that hand-written Megatron does, riding ICI.  Convs,
# norms and embeddings stay replicated (channel-sharded convs would force
# cross-chip GroupNorm stats for no FLOP win at SD widths).

_TP_COL = ("to_q", "to_k", "to_v")        # + GEGLU "proj": out-dim sharded
_TP_ROW = ("to_out",)                     # + GEGLU "out": in-dim sharded


def _path_names(path) -> list:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
    return names


def tp_param_sharding(params: Any, mesh: Mesh,
                      model_axis: str = "model",
                      data_axis: Optional[str] = None,
                      fsdp_min_size: int = 2 ** 18) -> Any:
    """Sharding tree for hybrid TP(+optional FSDP-over-data) params.

    With `data_axis` set, kernels the TP rules leave replicated (convs,
    time/cond embeddings, VAE-facing projections) are additionally
    FSDP-sharded over the data axis: the largest dim divisible by the data
    extent is split, small params (< fsdp_min_size elements) stay
    replicated.  XLA all-gathers them on demand inside the step, so
    correctness is unchanged and per-chip param+optimizer memory drops
    toward 1/(dp*tp) (ZeRO-3-style over the 2-D mesh).

    Works on any tree whose key paths contain the flax module names
    (params themselves, or optimizer mu/nu mirrors)."""
    n = mesh.shape[model_axis]
    nd = mesh.shape[data_axis] if data_axis is not None else 0

    def rule(path, x):
        names = _path_names(path)
        if getattr(x, "ndim", 0) >= 2 and names and names[-1] == "kernel":
            parent = names[-2] if len(names) >= 2 else ""
            grandp = names[-3] if len(names) >= 3 else ""
            col = parent in _TP_COL or (parent == "proj"
                                        and "ff" in (grandp, parent))
            row = parent in _TP_ROW or (parent == "out" and grandp == "ff")
            if col and x.shape[-1] % n == 0:
                spec = [None] * x.ndim
                spec[-1] = model_axis
                return NamedSharding(mesh, P(*spec))
            if row and x.shape[0] % n == 0:
                spec = [None] * x.ndim
                spec[0] = model_axis
                return NamedSharding(mesh, P(*spec))
        if data_axis is not None and getattr(x, "size", 0) >= fsdp_min_size:
            # FSDP-over-data for the replicated remainder
            dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
            for d in dims:
                if x.shape[d] % nd == 0:
                    spec = [None] * x.ndim
                    spec[d] = data_axis
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def make_tp_train_step(train_step, mesh: Mesh, state: Any,
                       data_axis: str = "data", model_axis: str = "model",
                       fsdp: bool = False):
    """jit the train step over a 2-D (data, model) mesh: batch sharded on
    `data`, params/opt-state TP-sharded on `model` (plus FSDP-over-data for
    the replicated remainder when `fsdp`), gradient mean psum over `data`
    inserted by sharding propagation — hybrid DP x TP in one compiled
    program, zero hand-written collectives."""
    repl = NamedSharding(mesh, P())
    bs = NamedSharding(mesh, P(data_axis))
    state_sh = tp_param_sharding(state, mesh, model_axis,
                                 data_axis=data_axis if fsdp else None)
    return jax.jit(
        train_step,
        in_shardings=(state_sh, repl, repl, bs, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    ), state_sh


def make_sharded_train_step(train_step, mesh: Mesh,
                            axis_name: str = "data",
                            fsdp: bool = False, state=None,
                            replicate_batch: bool = False):
    """jit the train step with DP shardings: batch split over `data`,
    state/params replicated (or FSDP-sharded), rng replicated.

    The returned function has signature train_step(state, vae_params, ctx,
    batch, rng); gradients are averaged by XLA's sharding propagation (the
    mean over the global batch implies a psum over ICI).

    `replicate_batch` keeps the 4th argument replicated instead — used by
    the scene-bank step, whose "batch" is the device-resident bank (the
    sampled scene is sharded inside the step via a sharding constraint).
    """
    repl = replicated(mesh)
    bs = repl if replicate_batch else batch_sharding(mesh, axis_name)
    if fsdp and state is not None:
        state_sh = fsdp_param_sharding(state, mesh, axis_name)
    else:
        state_sh = repl

    return jax.jit(
        train_step,
        in_shardings=(state_sh, repl, repl, bs, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def shard_pipeline(pipe, mesh: Mesh, axis_name: str = "data",
                   model_axis: str = "model"):
    """Prepare a UniRendererPipeline for multi-chip serving: place all
    parameter stacks over the mesh (in place) and return a helper that
    shards batched image/map inputs over `data` before a pipeline call.

    Sampling then runs as ONE sharded XLA program per mode.  On a 1-D
    `data` mesh this is pure DP (batch split, params replicated,
    collective-free — the reference's only serving story is a single GPU,
    eval/test_real.py).  On a 2-D (data, model) mesh from `make_mesh_2d`
    the dual-stream params are additionally tensor-parallel-sharded
    (tp_param_sharding), so each sample's transformer blocks split across
    the `model` group — the latency axis DP cannot touch.

    Usage:
        shard_call = shard_pipeline(pipe, make_mesh())          # DP
        shard_call = shard_pipeline(pipe, make_mesh_2d(4, 2))   # DP x TP
        out = shard_call(pipe.mask2image_3mod_albedo, normal=..., ...)
    """
    if model_axis in mesh.shape:
        pipe.dual_params = apply_sharding(
            pipe.dual_params,
            tp_param_sharding(pipe.dual_params, mesh, model_axis))
    else:
        pipe.dual_params = replicate(pipe.dual_params, mesh)
    pipe.vae_params = replicate(pipe.vae_params, mesh)
    pipe.text_params = replicate(pipe.text_params, mesh)
    bs = batch_sharding(mesh, axis_name)
    n = mesh.shape[axis_name]

    def shard_call(method, **kwargs):
        def put(v):
            if isinstance(v, jax.Array) and v.ndim >= 1 \
                    and v.shape[0] % n == 0:
                return jax.device_put(v, bs)
            return v
        return method(**{k: put(v) for k, v in kwargs.items()})

    return shard_call
