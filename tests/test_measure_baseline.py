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
