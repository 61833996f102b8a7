"""Quick axon-relay health probe: per-dispatch latency of a trivial graph.

The relay intermittently degrades the EXECUTION path 10-100x (~50-100 s
per dispatched batch vs ~0.5 s; compiles unaffected) for extended periods
(CLAUDE.md 2026-08-17/20).  Benchmarks taken during such a window measure
the outage, not the chip.  This probe takes ~1 min and prints per-dispatch
latency for a tiny chained matmul — healthy: ~25-60 ms/dispatch (tunnel
round-trip-bound); degraded: seconds+.

Usage: python tools/tpu_relay_probe.py [--n 20]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    n = (int(sys.argv[sys.argv.index("--n") + 1])
         if "--n" in sys.argv else 20)
    t0 = time.time()
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((256, 256), jnp.bfloat16)
    float(f(x))  # compile + warm
    print(f"compile+warm: {time.time() - t0:.1f}s", flush=True)
    lats = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x))  # host read = honest sync per dispatch
        lats.append(time.perf_counter() - t0)
    lats.sort()
    p50 = lats[len(lats) // 2]
    print(f"dispatch latency over {n}: p50={p50 * 1e3:.0f}ms "
          f"min={lats[0] * 1e3:.0f}ms max={lats[-1] * 1e3:.0f}ms -> "
          f"{'HEALTHY' if p50 < 0.3 else 'DEGRADED'}", flush=True)


if __name__ == "__main__":
    main()
