"""Op-level device profile of the full b8 episode graph.

Captures a JAX profiler trace of one steady-state episode execution
(device plane works through the axon tunnel) and aggregates TPU op time
by fusion/op category — the ground truth for where the ~400 ms/batch
actually goes, including XLA's layout-conversion copies in the VAE.

Usage: python tools/tpu_profile_episode.py [--batch 8] [--top 40]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def categorize(name: str) -> str:
    n = name.lower()
    if ("custom-call" in n or "pallas" in n or "tpu_custom_call" in n
            or n.startswith("_lambda_")):  # pallas kernels trace by fn name
        return "pallas custom-call"
    if n.startswith(("copy", "copy-start", "copy-done")) or ".copy" in n:
        return "copy / layout"
    if "conv" in n:
        return "conv fusion"
    if "dot" in n or "matmul" in n:
        return "dot fusion"
    if "reduce" in n:
        return "reduce fusion"
    if "fusion" in n:
        return "other fusion"
    if "infeed" in n or "outfeed" in n or "transfer" in n:
        return "transfer"
    return "misc"


def hlo_fusion_signatures(hlo_text: str):
    """instruction name -> 'output-shape op_name source:line' from the
    optimized HLO module text (metadata is authoritative — fusion bodies
    have tuple shapes that defeat naive shape regexes)."""
    sigs = {}
    for line in hlo_text.splitlines():
        m = re.match(r"\s*%?([\w.\-]+)\s*=\s*(.*?)\s+(?:fusion|custom-call|copy)\(",
                     line)
        if not m:
            continue
        name, shape = m.group(1), m.group(2)
        op = re.search(r'op_name="jit\(<lambda>\)/([^"]+)"', line)
        src = re.search(r'source_file="[^"]*/(\w+\.py)" source_line=(\d+)', line)
        sig = shape[:48]
        if op:
            sig += " " + op.group(1).split("/")[-1][:32]
        if src:
            sig += f" {src.group(1)}:{src.group(2)}"
        sigs[name] = sig
    return sigs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--target", choices=["episode", "unet"], default="episode")
    ap.add_argument("--vae", choices=["bf16", "int8"], default="bf16",
                    help="int8: profile the W8A8-quantized VAE episode "
                         "(ops/quant.py) to attribute the quantize/dequant "
                         "chain cost")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffews_tpu.utils import profiling

    b, n, s = args.batch, 1, 512
    r = np.random.default_rng(0)
    dt = jnp.bfloat16
    if args.target == "episode":
        from __graft_entry__ import entry

        fn, a = entry()
        jfn = jax.jit(lambda *t: fn(*t).astype(jnp.int32).sum())
        up, vp = a[0], a[1]
        if args.vae == "int8":
            from diffews_tpu.configs import VAEConfig
            from diffews_tpu.ops import quant

            scales = quant.calibrate_vae_scales(vp, VAEConfig.sd())
            vp = quant.quantize_conv_tree(vp, a_scales=scales)
        inp = (jnp.asarray(r.uniform(-1, 1, (b, s, s, 3)), dt),
               jnp.asarray(r.uniform(-1, 1, (b, n, s, s, 3)), dt),
               jnp.asarray(r.uniform(-1, 1, (b, n, s, s, 3)), dt),
               jnp.asarray(r.normal(size=(b, 2, 1024)), dt))
    else:
        from diffews_tpu.configs import UNetConfig
        from diffews_tpu.models import unet as unet_mod

        ucfg = UNetConfig.sd21()
        up = jax.jit(lambda k: unet_mod.init_params(k, ucfg))(jax.random.PRNGKey(0))
        up = jax.tree_util.tree_map(lambda x: x.astype(dt), up)
        vp = None

        def ufwd(params, q_lat, ref, ctx):
            return unet_mod.forward(params, ucfg, q_lat, 1, ctx,
                                    ref_sample=ref, attn_impl="auto")

        jfn = jax.jit(lambda p, *t: ufwd(p, *t).astype(jnp.float32).sum())
        inp = (jnp.asarray(r.normal(size=(b, 64, 64, 4)), dt),
               jnp.asarray(r.normal(size=(b, n, 64, 64, 8)), dt),
               jnp.asarray(r.normal(size=(b, 2, 1024)), dt))

        def call(*_):
            return jfn(up, *inp)

    print("warming (compile)...", flush=True)
    if args.target == "unet":
        int(jfn(up, *inp))
    else:
        int(jfn(up, vp, *inp))

    logdir = tempfile.mkdtemp(prefix="episode_trace_")
    with profiling.trace(logdir):
        if args.target == "unet":
            int(jfn(up, *inp))
        else:
            int(jfn(up, vp, *inp))

    traces = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                       recursive=True)
    assert traces, f"no trace written under {logdir}"
    with gzip.open(traces[0]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    pid_name = {e["pid"]: e["args"].get("name") for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, nm in pid_name.items()
                if nm and nm.startswith("/device:TPU")}

    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            if name.startswith("jit_"):  # whole-module parent event
                continue
            dur = e.get("dur", 0) / 1e3  # us -> ms
            per_op[name] += dur
            per_cat[categorize(name)] += dur
            total += dur

    print("lowering HLO for fusion signatures (may recompile)...", flush=True)
    sigs = {}
    try:
        if args.target == "unet":
            hlo = jfn.lower(up, *inp).compile().as_text()
        else:
            hlo = jfn.lower(up, vp, *inp).compile().as_text()
        sigs = hlo_fusion_signatures(hlo)
        print(f"  {len(sigs)} fusion signatures", flush=True)
    except Exception as e:
        print(f"  HLO unavailable: {type(e).__name__}: {e}", flush=True)

    print(f"\ndevice op total: {total:.1f} ms (batch {b})")
    print("\n-- by category --")
    for cat, t in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:22s} {t:9.2f} ms  {100 * t / max(total, 1e-9):5.1f}%")
    print(f"\n-- top {args.top} ops --")
    for name, t in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{t:9.2f} ms  {name:14s} {sigs.get(name, '')[:110]}")


if __name__ == "__main__":
    main()
