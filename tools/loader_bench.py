"""HOST-ONLY episodic loader throughput (no TPU): producer + finalize pool.

Measures episodes/s of the data pipeline alone — seeded episode sampling
(single-threaded, exact RNG order) and the PIL decode/resize/normalize
"finalize" work — across worker counts, on synthetic data written to a real
tempdir so PIL pays real JPEG/PNG decodes.  This isolates the loader fix
that matters for the part benchmarks: their box crops are now LAZY PIL
crops (`data/base.py::_crop_img`), so the JPEG decode lands on the
finalize workers instead of serializing in the producer.

Usage:
    python tools/loader_bench.py [--benchmark paco_part|coco]
        [--episodes 128] [--img_size 512] [--workers 0,2,4]

MEASURED (640x480 synthetic sources, 512px output): host-only worker
counts are a WASH (coco 47/46/40 ep/s at w0/2/4; paco_part 53/54/48) —
with no device work to overlap, the GIL serializes the Python halves of
the finalize work.  The pool's real win is overlap with device/tunnel
time, which only the on-chip harness shows (9.8 -> 11.1 ep/s,
tools/tpu_eval_harness_bench.py).  What this tool DOES establish is that
deferral adds no host-side regression, and (with a log line) that the
part-benchmark decode now happens in finalize, not the producer.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--benchmark", default="paco_part",
                    choices=["coco", "pascal", "paco_part", "pascal_part"])
    ap.add_argument("--episodes", type=int, default=128)
    ap.add_argument("--img_size", type=int, default=512)
    ap.add_argument("--bsz", type=int, default=8)
    ap.add_argument("--workers", type=str, default="0,2,4")
    args = ap.parse_args()

    import numpy as np

    import helpers.synthetic_data as syn
    from diffews_tpu.data.dataset import FSSDataset

    root = tempfile.mkdtemp(prefix="loader_bench_")
    # realistic source sizes: the stock synthetic fixtures write 40x30
    # thumbnails whose decode cost is trivial; COCO-scale sources are what
    # make the finalize-pool question meaningful
    if args.benchmark == "paco_part":
        syn.make_paco(root, size=(640, 480))
    else:
        orig = syn._save_rgb

        def save_big(path, rng, size=(640, 480)):
            return orig(path, rng, size=size)

        syn._save_rgb = save_big
        try:
            mk = {"coco": syn.make_coco, "pascal": syn.make_pascal,
                  "pascal_part": syn.make_pascal_part}
            mk[args.benchmark](root)
        finally:
            syn._save_rgb = orig

    for nworker in [int(w) for w in args.workers.split(",")]:
        FSSDataset.initialize(args.img_size, root, raw_images=True)
        np.random.seed(0)
        import random

        random.seed(0)
        loader = FSSDataset.build_dataloader(
            args.benchmark, args.bsz, nworker, 0, "test", shot=1)
        it = iter(loader)
        # warm one batch (thread spin-up)
        next(it)
        t0 = time.perf_counter()
        seen = 0
        for batch in it:
            seen += batch["query_img"].shape[0]
            if seen >= args.episodes:
                break
        dt = time.perf_counter() - t0
        print(f"{args.benchmark} nworker={nworker}: "
              f"{seen / dt:6.1f} episodes/s host-only "
              f"({seen} in {dt:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
