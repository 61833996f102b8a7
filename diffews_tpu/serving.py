"""AOT serving artifacts: the whole episode program as one StableHLO blob.

`export_predict` serializes a `DiffewsPipeline`'s jitted predict program —
batched VAE encode, joint KV-fusion UNet, degenerate DDIM, VAE decode,
uint8 quantization — via `jax.export`; the weights ship NEXT TO the
program (one msgpack file) and are passed as call arguments.  The
artifact serves episodes without any model code: `load(path)`
deserializes and returns a callable.  This is the TPU-native deployment
story the reference lacks entirely (its serving path is "run the eval
script with torch installed", `evaluation_util/main_oss.py`).

Notes:
- Weights are ARGUMENTS, not baked constants: closing a jit over GB-scale
  param trees inlines them into the HLO and blows compile times (the
  repo's measured const-inlining pathology, CLAUDE.md), and would bloat
  the StableHLO blob by the full weight size.
- Shapes are static (XLA): one artifact per (bsz, nshot, img_size)
  serving configuration; export several if needed.
- The artifact records the lowering platform.  Export on the TPU host for
  TPU serving (the Pallas flash-attention kernels lower to versioned
  Mosaic custom calls); a CPU-process export yields a CPU artifact with
  the dense attention path (attn_impl resolves at trace time).
- Inputs mirror `DiffewsPipeline.predict_async`'s fast ingestion: uint8
  query/supports, {0,1} uint8 masks, bool shot mask; output is the uint8
  decoded prediction (threshold/postprocess stay host-side, as in the
  eval harness).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

ARTIFACT = "predict.stablehlo"
WEIGHTS = "weights.msgpack"
MANIFEST = "manifest.json"


def _serve_fn(pipe) -> Callable:
    def serve(weights, query, supports, masks, shot_mask):
        return pipe._predict_impl(
            weights["unet"], weights["vae"], query, supports, masks,
            weights["text_embed"], shot_mask, denoising_steps=1)

    return serve


def _weights_tree(pipe) -> dict:
    return {"unet": pipe.unet_params, "vae": pipe.vae_params,
            "text_embed": pipe.empty_text_embed}


def export_predict(pipe, *, bsz: int, nshot: int,
                   img_size: int = 512) -> tuple[bytes, bytes, dict]:
    """(program bytes, weights bytes, manifest dict) for one config."""
    from flax import serialization as fser
    from jax import export as jexport

    s = img_size
    weights = _weights_tree(pipe)
    specs = (
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), weights),
        jax.ShapeDtypeStruct((bsz, s, s, 3), jnp.uint8),
        jax.ShapeDtypeStruct((bsz, nshot, s, s, 3), jnp.uint8),
        jax.ShapeDtypeStruct((bsz, nshot, s, s), jnp.uint8),
        jax.ShapeDtypeStruct((bsz, nshot), jnp.bool_),
    )
    fn = jax.jit(_serve_fn(pipe))
    try:
        exp = jexport.export(fn)(*specs)
    except ValueError as e:
        if "tpu_custom_call" not in str(e):
            raise
        # Mosaic kernels serialize as tpu_custom_call; allow it explicitly
        # if this jax version keeps it off the default-stable list.
        exp = jexport.export(
            fn,
            disabled_checks=[
                jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")],
        )(*specs)
    weights_np = jax.tree_util.tree_map(np.asarray, weights)
    weights_bytes = fser.msgpack_serialize(weights_np)
    manifest = {
        "bsz": bsz,
        "nshot": nshot,
        "img_size": img_size,
        "denoising_steps": 1,
        "platforms": list(exp.platforms),
        "inputs": {
            "query": f"uint8[{bsz},{s},{s},3] (0..255 RGB)",
            "supports": f"uint8[{bsz},{nshot},{s},{s},3]",
            "masks": f"uint8[{bsz},{nshot},{s},{s}] {{0,1}}",
            "shot_mask": f"bool[{bsz},{nshot}]",
        },
        "output": f"uint8[{bsz},{s},{s},3] decoded prediction "
                  "(threshold host-side)",
        "jax_version": jax.__version__,
    }
    return exp.serialize(), weights_bytes, manifest


def save_serving_artifact(pipe, out_dir: str, *, bsz: int, nshot: int,
                          img_size: int = 512) -> str:
    """Write `predict.stablehlo` + `weights.msgpack` + `manifest.json`."""
    blob, weights_bytes, manifest = export_predict(
        pipe, bsz=bsz, nshot=nshot, img_size=img_size)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT), "wb") as f:
        f.write(blob)
    with open(os.path.join(out_dir, WEIGHTS), "wb") as f:
        f.write(weights_bytes)
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir


class ServingModule:
    """A loaded artifact: `__call__(query, supports, masks, shot_mask)` ->
    uint8 prediction.  No model code needed — the program and its weights
    both come from the artifact directory."""

    def __init__(self, exported, weights, manifest: dict):
        self._exported = exported
        self._weights = weights
        self.manifest = manifest
        self._call = jax.jit(exported.call)

    def __call__(self, query, supports, masks, shot_mask=None) -> Any:
        if shot_mask is None:
            b, n = self.manifest["bsz"], self.manifest["nshot"]
            import numpy as np

            shot_mask = np.ones((b, n), bool)
        return self._call(self._weights, jnp.asarray(query),
                          jnp.asarray(supports), jnp.asarray(masks),
                          jnp.asarray(shot_mask))


def load(path: str) -> ServingModule:
    """Load a directory written by `save_serving_artifact`."""
    from flax import serialization as fser
    from jax import export as jexport

    with open(os.path.join(path, ARTIFACT), "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(os.path.join(path, WEIGHTS), "rb") as f:
        weights = fser.msgpack_restore(f.read())
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    return ServingModule(exp, weights, manifest)
