"""Training checkpoint save / rotate / resume.

Layout contract (`train_tools/train_icl_*_v3.py:1128-1160,1407-1431`; SURVEY
§5): `{output_dir}/checkpoint-{step}/unet/` in diffusers format (+
`unet_ema/` when EMA is on) — readable by the reference's eval
`--unet_ckpt_path <dir>/unet` — with rotation to `checkpoints_total_limit`
and `resume_from_checkpoint latest` scanning.  Optimizer/EMA/step state is
serialized alongside as `train_state.msgpack` (flax serialization; the
reference keeps torch-native accelerate state here, which has no JAX
equivalent).
"""

from __future__ import annotations

import os
import re
import shutil
import threading
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

from diffews_tpu import checkpoint as ckpt_lib
from diffews_tpu.configs import UNetConfig
from diffews_tpu.training.state import TrainState

STATE_FILE = "train_state.msgpack"


def host_fetch(tree, collective_only: bool = False):
    """Device -> host snapshot that also works under multi-host FSDP.

    `jax.device_get` raises on a non-fully-addressable array (its shards
    live on other processes' devices).  Those leaves are all-gathered over
    processes instead (`process_allgather` returns the fully-replicated
    value for a non-addressable input) — a COLLECTIVE: under multi-host,
    every process must reach this call (the train CLI runs the snapshot on
    all processes and gates only the disk write on process 0).

    collective_only=True fetches ONLY the non-fully-addressable leaves
    (returning None for the rest): a non-writing process participates in
    the all-gathers — keeping every process's collective program identical
    — without paying a multi-GB device_get for data it will discard.  With
    fully replicated state (multi-host DP without FSDP) this makes the
    non-primary snapshot free."""
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            # tiled=True is REQUIRED for non-addressable inputs (and is a
            # no-op on the value: the result is the fully-replicated array)
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return None if collective_only else jax.device_get(x)

    return jax.tree_util.tree_map(fetch, tree)


def _host_template(tree):
    """Structure-only host mirror (for `serialization.from_bytes` targets):
    no device reads, no collectives — safe on any process at any time."""
    return jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, x.dtype)
        if isinstance(x, jax.Array) else x, tree)

# at most one background serialization in flight (checkpoints are large;
# overlapping writes would thrash disk and could reorder rotation)
_pending: list = []


class AsyncSave:
    """Handle for a background checkpoint write; `.result()` joins and
    re-raises any exception the worker hit (a silently-failed save must not
    look like success — rotation may already have deleted older
    checkpoints)."""

    def __init__(self, thread: threading.Thread, ckpt_dir: str):
        self._thread = thread
        self.ckpt_dir = ckpt_dir
        self.error: Optional[BaseException] = None

    def result(self) -> str:
        self._thread.join()
        if self in _pending:
            _pending.remove(self)
        if self.error is not None:
            raise RuntimeError(
                f"background checkpoint write to {self.ckpt_dir} failed"
            ) from self.error
        return self.ckpt_dir


def wait_for_pending_saves():
    while _pending:
        _pending.pop(0).result()


def save_checkpoint(output_dir: str, step: int, state: TrainState,
                    unet_cfg: UNetConfig, total_limit: Optional[int] = None,
                    background: bool = False, params_override=None,
                    ema_override=None, extra_aux: Optional[dict] = None,
                    write: bool = True):
    """Serialize `state` under `checkpoint-{step}/` (diffusers layout).

    The device->host snapshot happens synchronously either way (the caller
    may mutate `state` right after); with `background=True` the multi-GB
    disk serialization + rotation run in a daemon thread and an
    `AsyncSave` handle is returned — at SD-2.1 scale this keeps the ~10 s
    safetensors write off the training loop's critical path.  Writes land
    in `checkpoint-{step}.tmp` and are renamed at the end, so a crashed
    write is never picked up by `resume_from_checkpoint latest`.

    LoRA mode (`cli/train.py --lora_rank`): `state.params` is the adapter
    tree, which cannot be written as a diffusers UNet — the caller passes
    the MERGED full trees as `params_override`/`ema_override` (so the
    `unet/`/`unet_ema/` dirs stay reference-readable) and the raw adapter
    state via `extra_aux` (e.g. ``{"lora": ..., "lora_ema": ...}``) for
    exact resume.

    Multi-host: the snapshot all-gathers any cross-process-sharded leaves
    (FSDP over a multi-host mesh), which is a collective — call on EVERY
    process, with `write=False` on non-primary processes (they participate
    in the gather and return None without touching disk).
    """
    wait_for_pending_saves()
    ckpt_dir = os.path.join(output_dir, f"checkpoint-{step}")
    tmp_dir = ckpt_dir + ".tmp"
    # A non-writing process only joins the all-gathers (identical collective
    # order on every process) — it skips the multi-GB device_get.
    fetch = lambda t: host_fetch(t, collective_only=not write)  # noqa: E731
    params = fetch(
        params_override if params_override is not None else state.params)
    if ema_override is not None:
        ema_params = fetch(ema_override)
    else:
        ema_params = (fetch(state.ema.params)
                      if state.ema is not None else None)
    aux = {"opt_state": fetch(state.opt_state), "step": int(state.step),
           "ema_step": int(state.ema.step) if state.ema is not None else 0}
    if extra_aux:
        aux.update({k: fetch(v) for k, v in extra_aux.items()})
    if not write:
        return None

    def write_to_disk():
        shutil.rmtree(tmp_dir, ignore_errors=True)
        ckpt_lib.save_unet(params, unet_cfg, os.path.join(tmp_dir, "unet"))
        if ema_params is not None:
            ckpt_lib.save_unet(ema_params, unet_cfg,
                               os.path.join(tmp_dir, "unet_ema"))
        with open(os.path.join(tmp_dir, STATE_FILE), "wb") as f:
            f.write(serialization.to_bytes(aux))
        if os.path.isdir(ckpt_dir):
            # Replace-safe: a checkpoint for this step already exists (e.g.
            # the post-loop save re-saving a step the in-loop cadence already
            # wrote).  Swap via `.old` so a complete checkpoint stays visible
            # except for the instant between the two renames; `.old`/`.tmp`
            # dirs are invisible to list_checkpoints/resume either way.
            old_dir = ckpt_dir + ".old"
            shutil.rmtree(old_dir, ignore_errors=True)
            os.rename(ckpt_dir, old_dir)
            os.rename(tmp_dir, ckpt_dir)
            shutil.rmtree(old_dir, ignore_errors=True)
        else:
            os.rename(tmp_dir, ckpt_dir)
        if total_limit:
            rotate_checkpoints(output_dir, total_limit)

    if background:
        handle = AsyncSave(threading.Thread(), ckpt_dir)

        def guarded():
            try:
                write_to_disk()
            except BaseException as e:  # surfaced by .result()
                handle.error = e

        t = threading.Thread(target=guarded, daemon=True)
        handle._thread = t
        t.start()
        _pending.append(handle)
        return handle
    write_to_disk()
    return ckpt_dir


def list_checkpoints(output_dir: str):
    if not os.path.isdir(output_dir):
        return []
    dirs = [d for d in os.listdir(output_dir)
            if re.fullmatch(r"checkpoint-\d+", d)]
    return sorted(dirs, key=lambda d: int(d.split("-")[1]))


def rotate_checkpoints(output_dir: str, total_limit: int):
    ckpts = list_checkpoints(output_dir)
    while len(ckpts) > total_limit:
        victim = ckpts.pop(0)
        shutil.rmtree(os.path.join(output_dir, victim), ignore_errors=True)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    ckpts = list_checkpoints(output_dir)
    return os.path.join(output_dir, ckpts[-1]) if ckpts else None


def load_checkpoint(ckpt_dir: str, template: TrainState,
                    lora: bool = False) -> Tuple[TrainState, int]:
    """Restore a TrainState from `checkpoint-{step}/` (template supplies the
    pytree structure, e.g. a freshly-initialized state).

    With `lora=True` the trainable params are the adapter tree stored in
    the aux msgpack (`extra_aux` at save time) — `unet/` holds the merged
    model and is NOT loaded into the state (the base weights come from the
    original pretrained checkpoint, which the adapters re-derive)."""
    import jax.numpy as jnp

    # structure-only mirrors: no device reads (works when the template is
    # sharded across processes — multi-host FSDP resume)
    aux_template = {"opt_state": _host_template(template.opt_state),
                    "step": 0, "ema_step": 0}
    if lora:
        aux_template["lora"] = _host_template(template.params)
        if template.ema is not None:
            aux_template["lora_ema"] = _host_template(template.ema.params)
    with open(os.path.join(ckpt_dir, STATE_FILE), "rb") as f:
        aux = serialization.from_bytes(aux_template, f.read())
    params = (aux["lora"] if lora
              else ckpt_lib.load_unet(os.path.join(ckpt_dir, "unet"))[0])
    ema = None
    if template.ema is not None:
        from diffews_tpu.training import ema as ema_lib

        if lora:
            ema_params = aux["lora_ema"]
        else:
            ema_dir = os.path.join(ckpt_dir, "unet_ema")
            ema_params = (ckpt_lib.load_unet(ema_dir)[0]
                          if os.path.isdir(ema_dir) else params)
        ema = ema_lib.EMAState(ema_params, jnp.asarray(aux["ema_step"], jnp.int32))
    step = int(aux["step"])
    return TrainState(params, aux["opt_state"], ema, jnp.asarray(step, jnp.int32)), step
