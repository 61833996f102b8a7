"""int8 post-training quantization for the frozen VAE's convolutions.

The v5e MXU runs int8 at ~2x the bf16 rate; measured through XLA at the
VAE's dominant conv shapes — INCLUDING the per-layer dequant/requant
elementwise chain — int8 is 1.32-1.40x over bf16
(`tools/tpu_int8_conv_bench.py`: 512^2x128 b8 8.38 -> 6.36 ms,
256^2x256 b24 15.85 -> 11.33, 128^2x512 b8 7.14 -> 5.13).  The VAE is
~270 ms of the 405 ms batch-8 episode, so this is the one measured
lever past the bf16 saturation ceiling (PERF.md).

Scheme (W8A8, symmetric):
  - weights: per-output-channel scales, `k8 = round(k / s_w)`,
    `s_w = amax(|k|, (H,W,I)) / 127`; quantized ONCE at pipeline init,
    original kernel dropped (4x less HBM for the tree).
  - activations: DYNAMIC per-tensor scale `s_a = amax(|x|) / 127`
    computed in-graph right before each conv; the extra reduce fuses
    into the preceding GroupNorm/SiLU epilogue, so no calibration
    subsystem and no static-scale accuracy cliff.
  - conv accumulates int32 on the MXU, dequantizes with `s_a * s_w[c]`
    and adds the f32 bias in the input dtype.

Only 3x3 convolutions with >= MIN_QUANT_CIN input channels quantize:
conv_in (3 input channels, trivial FLOPs) and the 1x1
quant_conv/post_quant_conv (they produce/consume the latent itself,
where rounding error propagates into the UNet) stay in bf16.

This changes eval numerics (the reference runs fp16/bf16 everywhere),
so it is OPT-IN: `--vae_impl int8` on the CLIs /
`DiffewsPipeline(vae_impl="int8")`.  The headline bench stays bf16.
Reference parity baseline: the reference has no quantized path at all
(torch fp16 autocast, `evaluation_util/main_oss.py`).
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

MIN_QUANT_CIN = 32


# ---------------------------------------------------------------------------
# calibration: record per-conv-site activation amax during one traced run
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class SitePath:
    """A conv site's tree path carried INSIDE the param dict as static pytree
    aux data (strings can't be jit leaves), so `layers.conv2d` can attribute
    the activation it sees to the right site during calibration."""

    def __init__(self, path: str):
        self.path = path

    def tree_flatten(self):
        return (), self.path

    @classmethod
    def tree_unflatten(cls, aux, _children):
        return cls(aux)

    def __repr__(self):
        return f"SitePath({self.path!r})"


# site path -> traced amax scalar, populated by layers.conv2d while a
# calibration trace is live (None = off).  Guarded by _CALIB_LOCK: two
# concurrent calibrations would cross-record each other's activations
# under the same site paths (or silently drop records), yielding wrong or
# partial scale dicts with no error.
_CALIB: Optional[dict] = None
_CALIB_LOCK = threading.Lock()


def record_calibration(p: dict, x: jax.Array) -> None:
    """Called by `layers.conv2d` on every conv; records amax(|x|) for tagged
    sites while a calibration trace is live."""
    if _CALIB is not None and "q_site" in p:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        prev = _CALIB.get(p["q_site"].path)
        _CALIB[p["q_site"].path] = (amax if prev is None
                                    else jnp.maximum(prev, amax))


def tag_conv_sites(params: Any) -> Any:
    """Copy of the tree with a `q_site: SitePath` marker in every conv dict
    that `quantize_conv_tree` would quantize.  The kernels stay fp — the
    tagged tree runs the NORMAL conv path (plus amax recording)."""

    def walk(node, path):
        if _is_conv_param(node):
            if not _should_quantize(node["kernel"]):
                return dict(node)
            out = dict(node)
            out["q_site"] = SitePath(path)
            return out
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}" if path else k)
                    for k, v in node.items()}
        return node

    return walk(params, "")


def calibrate_conv_scales(run_fn: Callable, tagged_params: Any, *inputs,
                          margin: float = 1.25) -> dict:
    """{site path: float amax * margin} over one jitted `run_fn(tagged_params,
    *inputs)`.  The collection happens at TRACE time (conv2d appends traced
    amax scalars into a module-global dict keyed by the static site path);
    the jitted wrapper returns that dict, so the values come back concrete.
    `margin` leaves headroom over the calibration batch's observed range —
    activations beyond it saturate at +-127 (symmetric clip, no wrap)."""
    global _CALIB

    def wrapper(p, *i):
        run_fn(p, *i)  # outputs unused; the amax records are the product
        return dict(_CALIB)

    with _CALIB_LOCK:
        _CALIB = {}
        try:
            amaxes = jax.jit(wrapper)(tagged_params, *inputs)
        finally:
            _CALIB = None
    return {k: float(v) * margin for k, v in amaxes.items()}


def calibrate_vae_scales(vae_params: Any, vae_cfg: Any, *,
                         attn_impl: str = "auto",
                         dtype: Any = jnp.bfloat16,
                         resolution: int = 256,
                         margin: float = 1.25) -> dict:
    """Static activation scales for the whole VAE (encode + decode sites)
    from one synthetic low-frequency-noise batch.  Post-GroupNorm
    activation ranges are input-distribution-insensitive, so noise images
    calibrate fine; `margin` saturates (never wraps) anything beyond the
    observed range.  Used by `DiffewsPipeline(vae_impl="int8")` and
    `bench.py int8`."""
    import numpy as np

    from diffews_tpu.models import vae as vae_mod

    rng = np.random.default_rng(0)
    base = rng.uniform(-1.0, 1.0, (2, 16, 16, 3)).astype(np.float32)
    imgs = jax.image.resize(jnp.asarray(base),
                            (2, resolution, resolution, 3), "linear")
    imgs = jnp.clip(
        imgs + jnp.asarray(rng.normal(0, 0.08, imgs.shape),
                           jnp.float32),
        -1.0, 1.0).astype(dtype)

    def run(p, x):
        lat = vae_mod.encode_mean_latent(p, vae_cfg, x, attn_impl=attn_impl,
                                         resnet_impl="xla")
        return vae_mod.decode(p, vae_cfg, lat, attn_impl=attn_impl)

    return calibrate_conv_scales(run, tag_conv_sites(vae_params), imgs,
                                 margin=margin)


def _is_conv_param(node: Any) -> bool:
    return (isinstance(node, dict) and "kernel" in node
            and getattr(node["kernel"], "ndim", 0) == 4)


def _should_quantize(kernel: jax.Array) -> bool:
    kh, kw, cin, _ = kernel.shape
    return (kh, kw) == (3, 3) and cin >= MIN_QUANT_CIN


@jax.jit
def _quantize_kernel(kernel: jax.Array) -> tuple[jax.Array, jax.Array]:
    k = kernel.astype(jnp.float32)
    s_w = jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0      # (cout,)
    s_w = jnp.maximum(s_w, 1e-12)
    k8 = jnp.clip(jnp.round(k / s_w), -127, 127).astype(jnp.int8)
    return k8, s_w


def quantize_conv_tree(params: Any, a_scales: Any = None) -> Any:
    """Copy of a param tree with every eligible conv re-expressed as
    {"kernel_q": int8 HWIO, "w_scale": f32 (cout,), "bias": ...}; the f32/bf16
    kernel is dropped.  `layers.conv2d` dispatches on "kernel_q".

    a_scales: optional STATIC activation scales — None (default) keeps
    dynamic per-tensor scales (an extra HBM pass per conv: the s8 quantize
    cannot fuse with its producer because it serializes on the amax
    scalar — measured 3.5 ms per 512^2 x 24 conv input, which eats half
    the MXU win); a float applies one global static scale (the quantize
    then fuses into the producing GroupNorm/SiLU epilogue); a dict maps
    the conv's tree path (".".join of keys, e.g.
    "encoder.down_blocks.0.resnets.0.conv1") to a per-site float from
    `calibrate_conv_scales`."""

    def walk(node, path):
        if _is_conv_param(node):
            if not _should_quantize(node["kernel"]):
                return dict(node)
            k8, s_w = _quantize_kernel(node["kernel"])
            out = {k: v for k, v in node.items() if k != "kernel"}
            out["kernel_q"] = k8
            out["w_scale"] = s_w
            if isinstance(a_scales, dict):
                if path in a_scales:
                    out["a_scale"] = jnp.float32(a_scales[path])
            elif a_scales is not None:
                out["a_scale"] = jnp.float32(a_scales)
            return out
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}" if path else k)
                    for k, v in node.items()}
        return node

    return walk(params, "")


# ---------------------------------------------------------------------------
# int8 LINEAR layers (opt-in UNet attention/FFN quantization)
# ---------------------------------------------------------------------------


def _is_linear_param(node: Any) -> bool:
    return (isinstance(node, dict) and "kernel" in node
            and getattr(node["kernel"], "ndim", 0) == 2)


def unet_attention_linear(path: str) -> bool:
    """Default site filter for the opt-in int8 UNet (`unet_int8=True`):
    the self-attention and feed-forward projections at the spatial-token
    resolutions (attn1 q/k/v/out, GEGLU ff, transformer proj_in/out) —
    where the joint pass's matmul FLOPs are.  Cross-attention (attn2)
    stays fp: its context is the 2-token empty prompt (negligible
    compute; keeps the text conditioning exact).  Time embeddings and
    conv layers are untouched."""
    return (".attn1." in path or ".ff." in path
            or path.endswith(".proj_in") or path.endswith(".proj_out"))


@jax.jit
def _quantize_linear_kernel(kernel: jax.Array) -> tuple[jax.Array, jax.Array]:
    k = kernel.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(k), axis=0) / 127.0, 1e-12)  # (out,)
    k8 = jnp.clip(jnp.round(k / s_w), -127, 127).astype(jnp.int8)
    return k8, s_w


def quantize_linear_tree(params: Any, path_filter=unet_attention_linear,
                         a_scales: Any = None) -> Any:
    """Copy of a param tree with every 2-D-kernel linear whose path passes
    `path_filter` re-expressed as {"kernel_q": int8 (in, out), "w_scale":
    f32 (out,), ...}; `layers.linear` dispatches on "kernel_q".  Same
    `a_scales` semantics as `quantize_conv_tree` (dict keyed by tree
    path, float, or None = dynamic)."""

    def walk(node, path):
        if _is_linear_param(node) and path_filter(path):
            k8, s_w = _quantize_linear_kernel(node["kernel"])
            out = {k: v for k, v in node.items() if k != "kernel"}
            out["kernel_q"] = k8
            out["w_scale"] = s_w
            if isinstance(a_scales, dict):
                if path in a_scales:
                    out["a_scale"] = jnp.float32(a_scales[path])
            elif a_scales is not None:
                out["a_scale"] = jnp.float32(a_scales)
            return out
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}" if path else k)
                    for k, v in node.items()}
        return node

    return walk(params, "")


def tag_linear_sites(params: Any, path_filter=unet_attention_linear) -> Any:
    """Calibration counterpart of `quantize_linear_tree` (see
    `tag_conv_sites`)."""

    def walk(node, path):
        if _is_linear_param(node) and path_filter(path):
            out = dict(node)
            out["q_site"] = SitePath(path)
            return out
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}" if path else k)
                    for k, v in node.items()}
        return node

    return walk(params, "")


def linear_int8(p: Any, x: jax.Array) -> jax.Array:
    """W8A8 matmul: per-tensor activation scale (static "a_scale" if
    present, else dynamic amax), int8 MXU dot with int32 accumulation,
    per-out-feature dequant + bias in x's dtype."""
    if "a_scale" in p:
        s_a = p["a_scale"] / 127.0
    else:
        s_a = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    s_a = jnp.maximum(s_a, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_a), -127, 127)
    xq = xq.astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["kernel_q"],
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (p["w_scale"] * s_a)
    if "bias" in p:
        out = out + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def conv2d_int8(p: Any, x: jax.Array, *, stride: int = 1,
                padding=((1, 1), (1, 1))) -> jax.Array:
    """W8A8 conv: per-tensor activation scale (static "a_scale" if present,
    else dynamic amax), int8 MXU dot with int32 accumulation, per-channel
    dequant + bias in x's dtype."""
    if "a_scale" in p:
        s_a = p["a_scale"] / 127.0
    else:
        s_a = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    s_a = jnp.maximum(s_a, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_a), -127, 127)
    xq = xq.astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq,
        p["kernel_q"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (p["w_scale"] * s_a)
    if "bias" in p:
        out = out + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)
