"""Render a --metrics_jsonl training log to a loss-curve/step-time PNG.

Companion to `cli/train.py --metrics_jsonl`: the sustained-run artifact
(VERDICT r2 #5) is the JSONL itself plus this plot.  Resume boundaries show
up naturally as step-number discontinuities in the windowed steps/s series
(the first post-resume window spans the restart wall time).

Usage: python tools/plot_train_metrics.py RUN.jsonl [OUT.png]
"""

import json
import sys


def main():
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else path.rsplit(".", 1)[0] + ".png"
    rows = [json.loads(l) for l in open(path) if l.strip()]
    if not rows:
        raise SystemExit(f"no records in {path}")
    steps = [r["step"] for r in rows]
    loss = [r["loss"] for r in rows]
    sps = [r["steps_per_s"] for r in rows]

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(2, 1, sharex=True, figsize=(8, 6))
    ax1.plot(steps, loss, lw=1.0)
    ax1.set_ylabel("train loss (MSE)")
    ax1.set_yscale("log")
    ax1.grid(True, alpha=0.3)
    ax2.plot(steps, sps, lw=1.0)
    ax2.set_ylabel("steps/s (windowed)")
    ax2.set_xlabel("optimizer step")
    ax2.grid(True, alpha=0.3)
    nf = rows[-1].get("total_notfinite", 0)
    ax1.set_title(f"{path}: {len(rows)} records, final loss "
                  f"{loss[-1]:.4f}, nonfinite-skipped {nf}")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
