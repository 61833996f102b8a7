"""CI dry run of the baseline-throughput harness (cli/measure_baseline.py).

No CUDA host or reference install exists here, so these pin the HARNESS:
marker-based timing excludes warmup and computes qps correctly (cmd
subject), the full self-subject path times OUR eval CLI end-to-end on a
synthetic checkpoint + synthetic COCO, and the denominator file is guarded
against being overwritten by a non-reference subject.
"""

import json
import os
import sys

import jax
import numpy as np
import pytest

from diffews_tpu import checkpoint as C
from diffews_tpu.cli.measure_baseline import main as mb_main
from diffews_tpu.configs import (CLIPTextConfig, SchedulerConfig, UNetConfig,
                                 VAEConfig)
from diffews_tpu.models import clip_text, unet, vae
from helpers import synthetic_data as syn

# a fake subject: prints meter markers with known inter-marker delays
_FAKE_SUBJECT = (
    "import time\n"
    "print('[Batch: 0001/0120] mIoU: 1.0', flush=True)\n"
    "time.sleep(0.5)\n"
    "print('[Batch: 0051/0120] mIoU: 1.0', flush=True)\n"
    "time.sleep(0.5)\n"
    "print('[Batch: 0101/0120] mIoU: 1.0', flush=True)\n"
)


def test_cmd_subject_times_markers_and_excludes_warmup(tmp_path, capsys):
    rc = mb_main(["--subject", "cmd",
                  "--cmd", f"{sys.executable} -c \"{_FAKE_SUBJECT}\"",
                  "--bsz", "2"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # markers at batches 1, 51, 101 -> 100 batches * bsz 2 over ~1.0 s
    assert rec["markers"] == 3
    assert rec["episodes_timed"] == 200
    assert 0.8 <= rec["wall_timed_s"] <= 3.0
    # wall_timed_s is rounded to 2 decimals in the record; loose tolerance
    assert rec["qps"] == pytest.approx(200 / rec["wall_timed_s"], rel=2e-2)


def test_too_few_markers_is_an_error():
    one = "print('[Batch: 0001/0002] x', flush=True)"
    with pytest.raises(SystemExit, match="progress marker"):
        mb_main(["--subject", "cmd",
                 "--cmd", f"{sys.executable} -c \"{one}\""])


def test_write_guard_refuses_non_reference(tmp_path):
    qps_file = str(tmp_path / "ref_qps.json")
    with pytest.raises(SystemExit, match="refusing"):
        mb_main(["--subject", "cmd",
                 "--cmd", f"{sys.executable} -c \"{_FAKE_SUBJECT}\"",
                 "--write", "--qps_file", qps_file])
    assert not os.path.exists(qps_file)
    # force_write merges under the nshot key (the documented escape hatch)
    rc = mb_main(["--subject", "cmd",
                  "--cmd", f"{sys.executable} -c \"{_FAKE_SUBJECT}\"",
                  "--write", "--force_write", "--qps_file", qps_file,
                  "--nshot", "5"])
    assert rc == 0
    data = json.load(open(qps_file))
    assert "5shot" in data and data["5shot"]["qps"] > 0


@pytest.mark.slow
def test_self_subject_dry_run(tmp_path, monkeypatch, capsys):
    """End-to-end: the harness times our real eval CLI as a subprocess on
    synthetic data — the exact flow that will time the reference on a CUDA
    host, with only the subject command differing."""
    root = tmp_path
    ucfg, vcfg, tcfg = (UNetConfig.tiny(), VAEConfig.tiny(),
                        CLIPTextConfig.tiny())
    ck = root / "ckpt"
    C.save_unet(jax.jit(lambda r: unet.init_params(r, ucfg))(
        jax.random.PRNGKey(0)), ucfg, str(ck / "unet"))
    C.save_vae(jax.jit(lambda r: vae.init_params(r, vcfg))(
        jax.random.PRNGKey(1)), vcfg, str(ck / "vae"))
    tp = clip_text.init_params(jax.random.PRNGKey(2), tcfg)
    state = {"text_model." + k: v
             for k, v in C.pytree_to_torch_state(tp).items()}
    C.save_torch_weights(state, str(ck / "text_encoder"), C.TEXT_SAFETENSORS)
    with open(ck / "text_encoder" / "config.json", "w") as f:
        json.dump({"vocab_size": 1000, "hidden_size": 32,
                   "intermediate_size": 64, "num_hidden_layers": 2,
                   "num_attention_heads": 4}, f)
    (ck / "scheduler").mkdir()
    with open(ck / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump(SchedulerConfig.diffews().to_diffusers_dict(), f)
    syn.make_coco(str(root / "data"))

    monkeypatch.setenv("DIFFEWS_PLATFORM", "cpu")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/diffews_tpu_jax_cache"))
    rc = mb_main(["--subject", "self",
                  "--checkpoint", str(ck),
                  "--datapath", str(root / "data"),
                  "--img-size", "32", "--max_episodes", "120",
                  "--log-root", str(root / "logs"),
                  "--timeout", "1500"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["subject"] == "self"
    assert rec["markers"] >= 2
    assert rec["episodes_timed"] >= 100
    assert rec["qps"] > 0
    assert rec["warmup_excluded_s"] > 0


# --- training-subject mode (round 5) ----------------------------------------

# our trainer's marker style (cli/train.py:631): step N/M loss ...
_FAKE_TRAINER_SELF = (
    "import time\n"
    "print('step 1/300 loss 0.12345 (1.00 opt-steps/s)', flush=True)\n"
    "time.sleep(0.4)\n"
    "print('step 10/300 loss 0.10000 (1.00 opt-steps/s)', flush=True)\n"
    "time.sleep(0.4)\n"
    "print('step 20/300 loss 0.09000 (1.00 opt-steps/s)', flush=True)\n"
)

# the reference trainer's tqdm bar: \r-separated redraws, desc 'Steps',
# including the bar-creation 0-tick that precedes model load/compile
# (train_icl_*_v3.py:1311-1316) and a repeated redraw of the same step
_FAKE_TRAINER_TQDM = (
    "import sys, time\n"
    "w = sys.stdout\n"
    "w.write('Steps:   0%|          | 0/300 [00:00<?, ?it/s]\\r')\n"
    "w.flush()\n"
    "time.sleep(0.3)\n"  # 'compile' — must be excluded
    "w.write('Steps:   0%|          | 1/300 [00:01<05:00,  1.0it/s, "
    "step_loss=0.1]\\r')\n"
    "w.flush()\n"
    "time.sleep(0.4)\n"
    "w.write('Steps:   7%|7         | 21/300 [00:02<04:00,  1.2it/s, "
    "step_loss=0.09]\\r')\n"
    "w.write('Steps:   7%|7         | 21/300 [00:02<04:00,  1.2it/s, "
    "step_loss=0.09]\\r')\n"
    "w.flush()\n"
    "print()\n"
)


def test_train_markers_self_style(capsys):
    rc = mb_main(["--subject", "cmd", "--train_markers",
                  "--cmd", f"{sys.executable} -c \"{_FAKE_TRAINER_SELF}\"",
                  "--min_steps", "15"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["steps_timed"] == 19  # steps 1 -> 20
    assert 0.6 <= rec["wall_timed_s"] <= 3.0
    assert rec["steps_per_s"] == pytest.approx(
        19 / rec["wall_timed_s"], rel=2e-2)


def test_train_markers_tqdm_style_excludes_zero_tick(capsys):
    """\\r-separated tqdm redraws parse as markers; the pre-compile 0-tick
    is dropped so warmup stays excluded; duplicate redraws dedupe."""
    rc = mb_main(["--subject", "cmd", "--train_markers",
                  "--cmd", f"{sys.executable} -c \"{_FAKE_TRAINER_TQDM}\"",
                  "--min_steps", "15"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["steps_timed"] == 20  # steps 1 -> 21 (0-tick dropped)
    # measured span is the 0.4 s between step 1 and step 21, NOT the 0.3 s
    # 'compile' before step 1
    assert rec["wall_timed_s"] < 0.75
    assert rec["steps_per_s"] > 0


def test_watchdog_kills_silent_hang():
    """ADVICE round-4: a subject that hangs while producing no output must
    still be killed at the --timeout deadline (the old implementation only
    checked the deadline when a line arrived)."""
    import time as _t

    hang = "import time\ntime.sleep(60)\n"
    t0 = _t.monotonic()
    with pytest.raises(SystemExit, match="watchdog"):
        mb_main(["--subject", "cmd",
                 "--cmd", f"{sys.executable} -c \"{hang}\"",
                 "--timeout", "1.5"])
    assert _t.monotonic() - t0 < 30


def test_train_write_records_train_key(tmp_path):
    qps_file = str(tmp_path / "ref_qps.json")
    rc = mb_main(["--subject", "cmd", "--train_markers",
                  "--cmd", f"{sys.executable} -c \"{_FAKE_TRAINER_SELF}\"",
                  "--min_steps", "15",
                  "--write", "--force_write", "--qps_file", qps_file])
    assert rc == 0
    data = json.load(open(qps_file))
    assert data["train"]["steps_per_s"] > 0
    assert data["train"]["steps_timed"] == 19


@pytest.mark.slow
def test_self_train_subject_dry_run(tmp_path, capsys, monkeypatch):
    """End-to-end trainer-subject: the harness times our REAL train CLI as
    a subprocess on synthetic data — the flow that will time the reference
    trainer on a CUDA host with only the subject command differing."""
    root = tmp_path
    ucfg, vcfg, tcfg = (UNetConfig.tiny(), VAEConfig.tiny(),
                        CLIPTextConfig.tiny())
    ck = root / "ckpt"
    C.save_unet(jax.jit(lambda r: unet.init_params(r, ucfg))(
        jax.random.PRNGKey(0)), ucfg, str(ck / "unet"))
    C.save_vae(jax.jit(lambda r: vae.init_params(r, vcfg))(
        jax.random.PRNGKey(1)), vcfg, str(ck / "vae"))
    tp = clip_text.init_params(jax.random.PRNGKey(2), tcfg)
    state = {"text_model." + k: v
             for k, v in C.pytree_to_torch_state(tp).items()}
    C.save_torch_weights(state, str(ck / "text_encoder"), C.TEXT_SAFETENSORS)
    with open(ck / "text_encoder" / "config.json", "w") as f:
        json.dump({"vocab_size": 1000, "hidden_size": 32,
                   "intermediate_size": 64, "num_hidden_layers": 2,
                   "num_attention_heads": 4}, f)
    (ck / "scheduler").mkdir()
    with open(ck / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump(SchedulerConfig.diffews().to_diffusers_dict(), f)
    syn.make_coco(str(root / "data"))

    monkeypatch.setenv("DIFFEWS_PLATFORM", "cpu")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/diffews_tpu_jax_cache"))
    rc = mb_main(["--subject", "self-train",
                  "--checkpoint", str(ck),
                  "--datapath", str(root / "data"),
                  "--img-size", "32",
                  "--max_train_steps", "40", "--gas", "1",
                  "--logging_steps", "5", "--min_steps", "20",
                  "--train_output_dir", str(root / "train_logs"),
                  "--timeout", "1500"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["subject"] == "self-train"
    assert rec["steps_timed"] >= 20
    assert rec["steps_per_s"] > 0
    assert rec["warmup_excluded_s"] > 0
    assert rec["protocol"]["gas"] == 1
