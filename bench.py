"""Benchmark: query throughput at 1-shot 512px on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Protocol (BASELINE.md): full DiffewS inference per query — VAE-encode of
query+support+mask, joint support/query SD-2.1 UNet forward with KV-fusion
attention, degenerate one-step DDIM, VAE decode, uint8 quantization — at
512px, 1-shot, bf16, batched episodes.  The reference runs the same math on
an RTX-4090 via torch/xformers with bsz=1 per episode
(`scripts/eval_coco2014_rthres_1shot_nosample.sh`).

`vs_baseline` divides by REF_4090_QPS, an estimate of the reference's 4090
query throughput (the repo publishes no numbers — BASELINE.md: "reference
wall-clock must be measured"; no CUDA hardware exists in this environment,
so the estimate derives from the per-episode op inventory: 2 UNet forwards
+ 4 VAE encodes + 1 decode at 512px fp16 ~ 200-300 ms on a 4090 => ~4-5
queries/s; we use 5.0, the generous end).  Target: vs_baseline >= 8.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_4090_QPS = 5.0  # estimated reference throughput (see module docstring)


def main():
    import sys

    from __graft_entry__ import entry

    fn, args = entry()
    # Honest sync on the axon tunnel: block_until_ready can return before
    # remote execution finishes; a host read of a scalar reduction cannot.
    jfn = jax.jit(lambda *a: fn(*a).astype(jnp.int32).sum())
    unet_params, vae_params = args[0], args[1]
    tag = "bf16"
    if "int8" in sys.argv:
        # opt-in A/B mode (NOT the headline: int8 changes eval numerics —
        # ops/quant.py): W8A8 VAE convs on the MXU's 2x int8 rate.
        # Calibrated static activation scales: the s8 quantize fuses into
        # its producer instead of serializing on a dynamic amax (bf16 19.5
        # / int8-dynamic 20.5 / int8-static 22.4 q/s).  "dynamic" selects
        # the amax fallback for the A/B record.
        from diffews_tpu.configs import VAEConfig
        from diffews_tpu.ops import quant

        if "dynamic" in sys.argv:
            vae_params = quant.quantize_conv_tree(vae_params)
            tag = "int8-vae-dynamic"
        else:
            scales = quant.calibrate_vae_scales(vae_params, VAEConfig.sd())
            vae_params = quant.quantize_conv_tree(vae_params,
                                                  a_scales=scales)
            tag = "int8-vae"
        if "unet" in sys.argv:
            # Additionally quantize the UNet attn1/FFN linears (the
            # pipeline's `unet_int8=True` path): same calibrated-static
            # scheme, calibrated on a GN'd-stats latent like pipeline.py.
            from diffews_tpu.configs import UNetConfig
            from diffews_tpu.models import unet as unet_mod

            ucfg = UNetConfig.sd21()
            rng = np.random.default_rng(0)
            lh = 32
            lat = jnp.asarray(rng.normal(size=(1, lh, lh, 4)), jnp.bfloat16)
            ref = jnp.asarray(rng.normal(size=(1, 1, lh, lh, 8)),
                              jnp.bfloat16)
            ctx = jnp.asarray(rng.normal(size=(1, 2, 1024)), jnp.bfloat16)

            def calib_run(p, lat, ref, ctx):
                return unet_mod.forward(p, ucfg, lat, 1, ctx,
                                        ref_sample=ref, attn_impl="auto")

            tagged = quant.tag_linear_sites(unet_params)
            uscales = quant.calibrate_conv_scales(calib_run, tagged,
                                                  lat, ref, ctx)
            unet_params = quant.quantize_linear_tree(unet_params,
                                                     a_scales=uscales)
            tag += "+unet"

    def run(batch):
        b, n, s = batch, 1, 512
        dt = jnp.bfloat16

        def mk(seed):
            rng = np.random.default_rng(seed)
            return (
                jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), dt),
                jnp.asarray(rng.uniform(-1, 1, (b, n, s, s, 3)), dt),
                jnp.asarray(rng.uniform(-1, 1, (b, n, s, s, 3)), dt),
                jnp.asarray(rng.normal(size=(b, 2, 1024)), dt),
            )

        int(jfn(unet_params, vae_params, *mk(0)))  # compile + warm
        # Steady-state throughput, depth-2 pipeline: keep one execution in
        # flight while reading the previous result — exactly how the eval
        # harness runs (predict_async + --dispatch_ahead 2).  Measured on
        # 1x v5e (tools/tpu_dispatch_depth.py): depth 1 = 8.6 q/s, depth 2
        # = 17.4 q/s (the tunnel sync costs ~0.5 s/batch and pipelining
        # hides it); depth 4 adds nothing.
        k_batches = 6
        inputs = [mk(i + 1) for i in range(k_batches)]
        for inp in inputs:  # force h2d uploads to finish before timing
            for a in inp:
                float(a.astype(jnp.float32).sum())
        best = float("inf")
        for _rep in range(2):  # inputs are device-resident; best-of-2 damps
            t0 = time.perf_counter()  # tunnel-load variance
            pending = []
            for inp in inputs:
                pending.append(jfn(unet_params, vae_params, *inp))
                if len(pending) >= 2:
                    int(pending.pop(0))  # host read = honest sync
            while pending:
                int(pending.pop(0))
            best = min(best, time.perf_counter() - t0)
        return batch * k_batches / best

    # b8 is the measured sweet spot on v5e (b16 saturates HBM bandwidth:
    # 9.7 q/s vs 10.2 q/s at b8); a single batch size keeps driver runs fast.
    best_qps, best_bs = 0.0, 1
    for bs in (8,):
        try:
            qps = run(bs)
        except Exception:
            break
        if qps > best_qps:
            best_qps, best_bs = qps, bs

    print(json.dumps({
        "metric": f"query images/sec at 1-shot 512px ({tag}, batch {best_bs}, 1 chip)",
        "value": round(best_qps, 3),
        "unit": "queries/s",
        "vs_baseline": round(best_qps / REF_4090_QPS, 3),
    }))


if __name__ == "__main__":
    main()
