"""How does in-flight dispatch depth affect throughput on the axon tunnel?

Depth 1 = sync every call; depth K = keep K executions in flight.
Informs bench.py methodology and the eval CLI --dispatch_ahead default.
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
    b = 8

    def mk(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.uniform(-1, 1, (b, 512, 512, 3)), dt),
                jnp.asarray(r.uniform(-1, 1, (b, 1, 512, 512, 3)), dt),
                jnp.asarray(r.uniform(-1, 1, (b, 1, 512, 512, 3)), dt),
                jnp.asarray(r.normal(size=(b, 2, 1024)), dt))

    t0 = time.time()
    int(jfn(up, vp, *mk(0)))
    print(f"compile+first {time.time()-t0:.0f}s", flush=True)
    n_calls = 6
    inputs = [mk(i + 1) for i in range(n_calls)]

    for depth in (1, 2, 4):
        t0 = time.perf_counter()
        pending = []
        for inp in inputs:
            pending.append(jfn(up, vp, *inp))
            if len(pending) >= depth:
                int(pending.pop(0))
        while pending:
            int(pending.pop(0))
        dt_all = time.perf_counter() - t0
        print(f"depth {depth}: {dt_all / n_calls * 1e3:.0f} ms/batch -> "
              f"{b * n_calls / dt_all:.2f} q/s", flush=True)


if __name__ == "__main__":
    main()
