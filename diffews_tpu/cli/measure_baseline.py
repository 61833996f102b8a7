"""Turnkey baseline-throughput measurement (the BASELINE.md denominator).

Every `vs_baseline` this repo has ever emitted divides by REF_4090_QPS, an
op-inventory ESTIMATE (bench.py:50; BASELINE.md sensitivity table) —
BASELINE.md itself says the reference wall-clock "must be measured, not
cited", but no CUDA hardware exists in this environment.  This command is
the measurement instrument for the day it does: the throughput counterpart
of `cli/verify_parity.py`.

Modes (--subject):
  reference  — constructs the reference's exact eval command
               (`/root/reference/scripts/eval_coco2014_rthres_1shot_nosample.sh:14-30`:
               main_oss.py, bsz 1, 512px, denoise 1, threshold 0,
               r_threshold 0.25, seed-0 stream) from --reference_repo /
               --checkpoint / --unet_ckpt_path / --datapath and times it.
               Run this on the CUDA host; fold/nshot are flags.
  self       — times OUR `cli/evaluate.py` under the same protocol flags:
               the CI dry run (works here on a synthetic checkpoint +
               synthetic COCO), and an honest apples-to-apples TPU-side
               counterpart when pointed at real data.
  cmd        — escape hatch: time any command (--cmd "...") that logs the
               meter's progress markers.

Methodology: both stacks print `[Batch: NNNN/NNNN]` progress markers every
50 batches (reference `evaluation_util/main_oss.py:156` via
`common/logger.py:69-73`; ours `evaluation/meter.py:56-63`).  The harness
timestamps each marker AS IT ARRIVES on the subprocess pipe and computes

    qps = bsz * (last_marker_batch - first_marker_batch)
          / (t_last_marker - t_first_marker)

i.e. startup, checkpoint load, compile and warmup before the first marker
are excluded; >= 2 markers (>= 51 batches) are required, >= 200 episodes
recommended (the BASELINE.md protocol).

Output: one JSON line; with --write the result is merged into
`artifacts/ref_qps.json` under its nshot key, where bench.py picks it up
as the MEASURED denominator (replacing the estimate and tagging records
`baseline="measured"`).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_MARKER = re.compile(r"\[Batch:\s*(\d+)/(\d+)\]")
DEFAULT_QPS_FILE = os.path.join(_REPO, "artifacts", "ref_qps.json")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "DiffewS baseline throughput harness", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--subject", choices=["reference", "self", "cmd"],
                   required=True)
    p.add_argument("--reference_repo", default=None,
                   help="reference checkout root (subject=reference)")
    p.add_argument("--cmd", default=None,
                   help="subject=cmd: full command line to time")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--unet_ckpt_path", default=None)
    p.add_argument("--scheduler_load_path", default=None)
    p.add_argument("--datapath", default=None)
    p.add_argument("--benchmark", default="coco")
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--nshot", type=int, default=1)
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--bsz", type=int, default=1,
                   help="episodes per batch of the SUBJECT's run (the "
                        "reference protocol uses 1); scales the marker "
                        "deltas to episodes")
    p.add_argument("--max_episodes", type=int, default=0,
                   help="subject=self only: cap the protocol (0 = full)")
    p.add_argument("--log-root", default="./baseline_logs")
    p.add_argument("--timeout", type=float, default=7200.0)
    p.add_argument("--write", action="store_true",
                   help=f"merge the result into {DEFAULT_QPS_FILE} "
                        "(bench.py's measured-denominator hook). Only the "
                        "reference subject may write — the denominator is "
                        "the REFERENCE's throughput")
    p.add_argument("--force_write", action="store_true",
                   help="allow --write for subject self/cmd (e.g. timing a "
                        "reference install via --cmd)")
    p.add_argument("--qps_file", default=DEFAULT_QPS_FILE)
    return p


def subject_command(args) -> tuple[list[str], str | None, dict]:
    """(argv, cwd, extra_env) for the subject."""
    if args.subject == "cmd":
        if not args.cmd:
            raise SystemExit("--subject cmd needs --cmd")
        import shlex

        return shlex.split(args.cmd), None, {}
    if args.subject == "reference":
        for need in ("reference_repo", "checkpoint", "datapath"):
            if not getattr(args, need):
                raise SystemExit(f"--subject reference needs --{need}")
        argv = [
            sys.executable, "evaluation_util/main_oss.py",
            "--log-root", args.log_root,
            "--denoise_steps", "1",
            "--checkpoint", args.checkpoint,
            "--datapath", args.datapath,
            "--benchmark", args.benchmark,
            "--img-size", str(getattr(args, "img_size")),
            "--ensemble_size", "1",
            "--bsz", str(args.bsz),
            "--nshot", str(args.nshot),
            "--fold", str(args.fold),
            "--threshold", "0",
            "--r_threshold", "0.25",
        ]
        if args.unet_ckpt_path:
            argv += ["--unet_ckpt_path", args.unet_ckpt_path]
        if args.scheduler_load_path:
            argv += ["--scheduler_load_path", args.scheduler_load_path]
        return argv, args.reference_repo, {"PYTHONPATH": "./"}
    # self
    for need in ("checkpoint", "datapath"):
        if not getattr(args, need):
            raise SystemExit(f"--subject self needs --{need}")
    argv = [
        sys.executable, "-m", "diffews_tpu.cli.evaluate",
        "--log-root", args.log_root,
        "--denoise_steps", "1",
        "--checkpoint", args.checkpoint,
        "--datapath", args.datapath,
        "--benchmark", args.benchmark,
        "--img-size", str(getattr(args, "img_size")),
        "--ensemble_size", "1",
        "--bsz", str(args.bsz),
        "--nshot", str(args.nshot),
        "--fold", str(args.fold),
        "--threshold", "0",
        "--r_threshold", "0.25",
    ]
    if args.max_episodes:
        argv += ["--max_episodes", str(args.max_episodes)]
    if args.unet_ckpt_path:
        argv += ["--unet_ckpt_path", args.unet_ckpt_path]
    if args.scheduler_load_path:
        argv += ["--scheduler_load_path", args.scheduler_load_path]
    return argv, _REPO, {}


def time_subject(argv, cwd, extra_env, bsz, timeout) -> dict:
    """Run the subject, timestamp its [Batch:] markers, compute qps."""
    env = dict(os.environ)
    env.update(extra_env)
    t_start = time.monotonic()
    proc = subprocess.Popen(argv, cwd=cwd, env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    markers: list[tuple[float, int, int]] = []  # (t, batch_idx, datalen)
    tail: list[str] = []
    try:
        assert proc.stdout is not None
        for line in proc.stdout:
            tail.append(line.rstrip())
            if len(tail) > 40:
                tail.pop(0)
            m = _MARKER.search(line)
            if m:
                markers.append(
                    (time.monotonic(), int(m.group(1)), int(m.group(2))))
                print(f"[measure +{time.monotonic() - t_start:7.1f}s] "
                      f"marker batch {m.group(1)}/{m.group(2)}",
                      file=sys.stderr, flush=True)
            if time.monotonic() - t_start > timeout:
                proc.kill()
                raise SystemExit(f"subject exceeded --timeout after "
                                 f"{len(markers)} markers")
        rc = proc.wait()
    finally:
        if proc.poll() is None:
            proc.kill()
    wall_total = time.monotonic() - t_start
    if rc != 0:
        raise SystemExit("subject failed rc=%d; tail:\n%s"
                         % (rc, "\n".join(tail)))
    if len(markers) < 2:
        raise SystemExit(
            f"only {len(markers)} progress marker(s) seen — need >= 2 "
            "(>= 51 batches at the 50-batch cadence) to exclude warmup; "
            "run more episodes")
    (t0, b0, _), (t1, b1, _) = markers[0], markers[-1]
    episodes = bsz * (b1 - b0)
    qps = episodes / (t1 - t0)
    return {
        "qps": round(qps, 4),
        "episodes_timed": episodes,
        "wall_timed_s": round(t1 - t0, 2),
        "wall_total_s": round(wall_total, 2),
        "markers": len(markers),
        "warmup_excluded_s": round(t0 - t_start, 2),
    }


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cmd, cwd, extra_env = subject_command(args)
    print(f"[measure] timing: {' '.join(cmd)}", file=sys.stderr, flush=True)
    res = time_subject(cmd, cwd, extra_env, args.bsz, args.timeout)
    key = f"{args.nshot}shot"
    rec = {
        "subject": args.subject,
        "protocol": {"benchmark": args.benchmark, "fold": args.fold,
                     "nshot": args.nshot,
                     "img_size": getattr(args, "img_size"),
                     "bsz": args.bsz},
        **res,
    }
    if args.write:
        if args.subject != "reference" and not args.force_write:
            raise SystemExit(
                "--write records the BASELINE DENOMINATOR; refusing for "
                f"subject '{args.subject}' (our own throughput is not the "
                "baseline). Pass --force_write only if this command really "
                "timed the reference stack.")
        data = {}
        if os.path.exists(args.qps_file):
            with open(args.qps_file) as f:
                data = json.load(f)
        data[key] = rec
        os.makedirs(os.path.dirname(args.qps_file), exist_ok=True)
        with open(args.qps_file, "w") as f:
            json.dump(data, f, indent=2)
        rec["written_to"] = args.qps_file
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
