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


def param_pspec_tree(params: dict, tensor_parallel: bool = False) -> dict:
    """PartitionSpec tree matching `params` (replicated unless TP rules hit)."""

    def rec(node, path):
        if isinstance(node, dict) and "kernel" not in node and "scale" not in node \
                and "embedding" not in node and not ("bias" in node and len(node) == 1):
            return {k: rec(v, f"{path}.{k}" if path else k) for k, v in node.items()}
        # leaf module
        out = {}
        for leaf in node:
            spec = P()
            if tensor_parallel and leaf == "kernel" and np.ndim(node[leaf]) == 2:
                for rx, ps in _TP_RULES:
                    if rx.search(path):
                        spec = ps
                        break
            out[leaf] = spec
        return out

    return rec(params, "")


def shard_params(params: dict, mesh: Mesh, tensor_parallel: bool = False) -> dict:
    specs = param_pspec_tree(params, tensor_parallel)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for episode batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
