"""Episode-batch sweet-spot scan with chained dispatch (steady-state q/s).

Dispatches K batches back-to-back and syncs once, like the eval harness's
--dispatch_ahead pipeline, so the ~25 ms tunnel round-trip amortizes away.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import entry

dt = jnp.bfloat16


def main():
    fn, args = entry()
    jfn = jax.jit(lambda *a: fn(*a).astype(jnp.int32).sum())
    up, vp = args[0], args[1]

    def mk(b, n, seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.uniform(-1, 1, (b, 512, 512, 3)), dt),
                jnp.asarray(r.uniform(-1, 1, (b, n, 512, 512, 3)), dt),
                jnp.asarray(r.uniform(-1, 1, (b, n, 512, 512, 3)), dt),
                jnp.asarray(r.normal(size=(b, 2, 1024)), dt))

    import sys as _sys
    shots = [int(x) for x in (_sys.argv[1:2] or ["1"])]
    batches = [int(x) for x in (_sys.argv[2:] or ["8", "16", "24", "32"])]
    for n in shots:
        for b in batches:
            try:
                t0 = time.time()
                int(jfn(up, vp, *mk(b, n, 0)))
                print(f"b{b} n{n} compile+first {time.time()-t0:.0f}s", flush=True)
                k = 4
                inputs = [mk(b, n, i + 1) for i in range(k)]
                for inp in inputs:  # force h2d before timing
                    for a in inp:
                        float(a.astype(jnp.float32).sum())
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    pending = []
                    for inp in inputs:
                        pending.append(jfn(up, vp, *inp))
                        if len(pending) >= 2:
                            int(pending.pop(0))
                    while pending:
                        int(pending.pop(0))
                    best = min(best, time.perf_counter() - t0)
                print(f"b{b} n{n}: {best / k * 1e3:.0f} ms/batch -> "
                      f"{b * k / best:.2f} q/s (depth-2)", flush=True)
            except Exception as e:
                print(f"b{b} n{n} FAILED: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                break


if __name__ == "__main__":
    main()
