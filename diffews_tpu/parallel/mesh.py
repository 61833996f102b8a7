"""Device mesh and sharding rules.

The reference scales only by data parallelism (HF Accelerate DDP over NCCL,
`scripts/coco_multigpu.sh:18`, SURVEY.md §2.3).  The TPU-native design is a
2-D `("data", "model")` mesh:

  - batch axes shard over "data" (gradient psum rides ICI, inserted by XLA);
  - optionally, attention/FFN weight matrices shard over "model" (tensor
    parallelism) — not required for parity (SD-2.1 fits one chip) but
    available for large-chip-count serving;
  - everything else is replicated.

Sharding is expressed with `NamedSharding`/`PartitionSpec` and applied via
`jax.jit` in/out shardings, letting XLA insert all collectives.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(force: bool = False) -> tuple[int, int]:
    """Multi-host bootstrap (TPU-native counterpart of the process-group init
    HF Accelerate performs under `accelerate launch`, SURVEY.md §2.3).

    Calls `jax.distributed.initialize()` when `force` or when coordinator
    environment variables are present (`JAX_COORDINATOR_ADDRESS`, or the TPU
    pod runtime's auto-detected env).  A no-op on a single host.  Returns
    (process_index, process_count); after it, `jax.devices()` is the GLOBAL
    device list and `make_mesh` builds a pod-wide mesh whose collectives ride
    ICI/DCN.
    """
    import os

    if jax.process_count() > 1:
        return jax.process_index(), jax.process_count()
    if force or os.environ.get("JAX_COORDINATOR_ADDRESS") \
            or os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def put_global_batch(batch: dict, mesh: Mesh, spec: P) -> dict:
    """Place host batches onto the mesh, multi-host aware.

    Single-process: plain `device_put`.  Multi-host: each process passes its
    LOCAL shard (the episodes it sampled) and the result is a global array
    sharded per `spec` — the jit'd step then runs SPMD with no further
    plumbing (the DDP-equivalent: per-process data, psum'd grads).
    """
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sh) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sh, np.asarray(v))
        for k, v in batch.items()
    }


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"need {n_data * n_model} devices, have {len(devices)}"
    )
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def make_shot_mesh(n_shards: int, n_data: int = 1, devices=None) -> Mesh:
    """("shots",) or ("data", "shots") mesh for shot-parallel serving
    (`DiffewsPipeline(shot_mesh=...)`): the episode's support shots shard
    across chips and the fused KV attention merges partial softmaxes via
    psum over "shots" (`ops/attention.py::shot_parallel_fused_kv_attention`);
    n_data > 1 additionally shards the episode batch over "data" (the axes
    are independent — the merge collective rides only "shots")."""
    devices = devices if devices is not None else jax.devices()
    need = n_shards * n_data
    assert need <= len(devices), (
        f"need {need} devices, have {len(devices)}")
    if n_data > 1:
        return Mesh(np.asarray(devices[:need]).reshape(n_data, n_shards),
                    axis_names=("data", "shots"))
    return Mesh(np.asarray(devices[:n_shards]), axis_names=("shots",))


# Param-tree regexes -> model-parallel PartitionSpec for the weight kernel.
# Attention projections shard heads (out dim of q/k/v, in dim of out-proj);
# FFN shards the hidden dim.  All biases and norms stay replicated.
_TP_RULES = [
    (re.compile(r"attn\d?\.(to_q|to_k|to_v)$"), P(None, "model")),
    (re.compile(r"self_attn\.(q_proj|k_proj|v_proj)$"), P(None, "model")),
    (re.compile(r"attn\d?\.to_out\.0$"), P("model", None)),
    (re.compile(r"self_attn\.out_proj$"), P("model", None)),
    (re.compile(r"ff\.net\.0\.proj$"), P(None, "model")),
    (re.compile(r"ff\.net\.2$"), P("model", None)),
    (re.compile(r"mlp\.fc1$"), P(None, "model")),
    (re.compile(r"mlp\.fc2$"), P("model", None)),
]


# Leaves smaller than this stay replicated under FSDP: sharding a tiny bias
# buys nothing and costs a per-step all-gather dispatch.
_FSDP_MIN_ELEMS = 65536


def _fsdp_dim(shape, n: Optional[int], avoid: Optional[int] = None,
              min_elems: int = _FSDP_MIN_ELEMS) -> Optional[int]:
    """Largest dim of `shape` evenly divisible by `n` (skipping `avoid`,
    the dim a TP rule already owns); None = keep replicated."""
    if not n or n <= 1 or int(np.prod(shape, dtype=np.int64)) < min_elems:
        return None
    for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if i != avoid and shape[i] % n == 0 and shape[i] >= n:
            return i
    return None


def shape_pspec(shape, fsdp_size: Optional[int],
                min_elems: int = _FSDP_MIN_ELEMS) -> P:
    """Shape-only FSDP PartitionSpec: "data" on the largest divisible dim.

    Used for optimizer/EMA leaves (ZeRO: the Adam moments dominate training
    HBM at SD-2.1 scale — f32 nu + mu is 2-3x the bf16 params — and unlike
    the params they are never needed replicated, so their shards stay
    resident and XLA touches them only in the elementwise update)."""
    d = _fsdp_dim(shape, fsdp_size, min_elems=min_elems)
    if d is None:
        return P()
    spec = [None] * len(shape)
    spec[d] = "data"
    return P(*spec)


def param_pspec_tree(params: dict, tensor_parallel: bool = False,
                     fsdp_size: Optional[int] = None,
                     fsdp_min_elems: int = _FSDP_MIN_ELEMS) -> dict:
    """PartitionSpec tree matching `params`.

    Replicated unless a TP rule hits ("model" on the matched matmul dim)
    and/or `fsdp_size` is set (FSDP: "data" on the largest remaining dim of
    every leaf >= 64k elements — ZeRO-3-style; XLA all-gathers a layer's
    weights when the forward/backward needs them and reduce-scatters its
    grads, so per-chip parameter+optimizer HBM scales 1/n_data while the
    math is bit-identical SPMD).  The two compose: a TP'd kernel shards
    "model" on its matmul dim and "data" on the other."""

    def rec(node, path):
        if isinstance(node, dict) and "kernel" not in node and "scale" not in node \
                and "embedding" not in node and not ("bias" in node and len(node) == 1):
            return {k: rec(v, f"{path}.{k}" if path else k) for k, v in node.items()}
        # leaf module
        out = {}
        for leaf in node:
            spec, tp_dim = P(), None
            if tensor_parallel and leaf == "kernel" and np.ndim(node[leaf]) == 2:
                for rx, ps in _TP_RULES:
                    if rx.search(path):
                        spec = ps
                        tp_dim = list(ps).index("model")
                        break
            shape = np.shape(node[leaf])
            fd = _fsdp_dim(shape, fsdp_size, avoid=tp_dim,
                           min_elems=fsdp_min_elems)
            if fd is not None:
                full = list(spec) + [None] * (len(shape) - len(spec))
                full[fd] = "data"
                spec = P(*full)
            out[leaf] = spec
        return out

    return rec(params, "")


def shard_params(params: dict, mesh: Mesh, tensor_parallel: bool = False,
                 fsdp: bool = False) -> dict:
    fsdp_size = mesh.shape["data"] if fsdp else None
    specs = param_pspec_tree(params, tensor_parallel, fsdp_size)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def init_state_fsdp(tcfg, unet_params, mesh: Mesh,
                    tensor_parallel: bool = False,
                    fsdp_min_elems: int = _FSDP_MIN_ELEMS):
    """Build a TrainState born FSDP-sharded; returns (state, shardings).

    The eager `training.state.init_state` materializes the full replicated
    optimizer state on every chip before any sharding — at SD-2.1 scale
    that is ~10 GB and defeats FSDP on a 16 GB chip.  Here the params are
    device_put straight into their (TP x) FSDP layout and the optimizer /
    EMA trees are CREATED sharded (`jax.jit(tx.init, out_shardings=...)`
    over `jax.eval_shape`), so no replicated copy ever exists.

    `shardings` is a TrainState-shaped NamedSharding tree — pass it as the
    train step's `out_shardings` so the layout is pinned across steps
    (donated input buffers are then reused shard-for-shard).

    The reference has no equivalent (DDP replicates params + Adam state on
    every GPU, `train_icl_*_v3.py:1226-1228`); this is the jax.sharding
    counterpart of ZeRO/FSDP.
    """
    from diffews_tpu.training import ema as ema_lib
    from diffews_tpu.training import state as state_lib

    n = mesh.shape["data"]
    tx = state_lib.make_optimizer(tcfg)
    pspecs = param_pspec_tree(unet_params, tensor_parallel, fsdp_size=n,
                              fsdp_min_elems=fsdp_min_elems)
    psh = jax.tree_util.tree_map(
        lambda x, s: NamedSharding(mesh, s), unet_params, pspecs)
    params = jax.tree_util.tree_map(jax.device_put, unet_params, psh)

    opt_shapes = jax.eval_shape(tx.init, params)
    osh = jax.tree_util.tree_map(
        lambda t: NamedSharding(mesh, shape_pspec(t.shape, n, fsdp_min_elems)),
        opt_shapes)
    opt_state = jax.jit(tx.init, out_shardings=osh)(params)

    ema = esh = None
    if tcfg.use_ema:
        ema_shapes = jax.eval_shape(ema_lib.init, params)
        esh = jax.tree_util.tree_map(
            lambda t: NamedSharding(mesh, shape_pspec(t.shape, n,
                                                      fsdp_min_elems)),
            ema_shapes)
        ema = jax.jit(ema_lib.init, out_shardings=esh)(params)

    state = state_lib.TrainState(params, opt_state, ema,
                                 jnp.zeros((), jnp.int32))
    shardings = state_lib.TrainState(psh, osh, esh, replicated(mesh))
    return state, shardings


def put_sharded_host_tree(host_tree, shardings):
    """Commit fully-replicated HOST arrays into (possibly cross-process)
    shardings.

    Multi-host FSDP resume: `jax.device_put` cannot target a sharding
    whose devices span other processes; `make_array_from_callback` builds
    each process's addressable shards from its local host copy (every
    process holds the same checkpoint bytes).  Single-process it is
    equivalent to a plain sharded device_put."""
    def put(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, host_tree, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for episode batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
