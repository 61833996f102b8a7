"""Synthetic dry run of the turnkey parity runbook (cli/verify_parity.py).

Real weights don't exist in CI, so this pins the RUNBOOK itself: tiny
synthetic checkpoint + synthetic COCO through the full phase flow (golden
phase skips gracefully without diffusers), report JSON lands on disk, and
the verdict logic passes/fails around --ref_miou correctly — so the day a
real checkpoint exists, the one-command BASELINE.md bar actually runs.
"""

import json

import jax
import numpy as np
import pytest

from diffews_tpu import checkpoint as C
from diffews_tpu.configs import (CLIPTextConfig, SchedulerConfig, UNetConfig,
                                 VAEConfig)
from diffews_tpu.models import clip_text, unet, vae
from helpers import synthetic_data as syn


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("verify_parity")
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
    return root


def _run(workdir, out, extra):
    from diffews_tpu.cli.verify_parity import main

    return main([
        "--checkpoint", str(workdir / "ckpt"),
        "--datapath", str(workdir / "data"),
        "--benchmark", "coco", "--fold", "0", "--nshot", "1",
        "--img-size", "32", "--max_episodes", "2",
        "--out", str(out),
    ] + extra)


def test_record_mode_writes_report(workdir, tmp_path, capsys):
    rc = _run(workdir, tmp_path / "rec", [])
    assert rc == 0
    report = json.loads((tmp_path / "rec" / "parity_report.json").read_text())
    assert np.isfinite(report["miou"]) and np.isfinite(report["fb_iou"])
    assert report["verdict"].startswith("recorded")
    # torch exists in CI: phase A must actually RUN via the torch-only
    # oracle path and PASS — loader + plain forwards + the conv_in_ref/
    # KV-fusion ref branch all compared against the state-dict oracle
    assert report["golden"]["status"] == "pass", report["golden"]
    assert report["golden"]["unet_ref_max_abs"] is not None
    assert report["golden"]["unet_ref_max_abs"] < 5e-3
    # the printed line is the same JSON (drivers/scripts parse stdout)
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["miou"] == report["miou"]


def test_verdict_pass_and_fail_around_ref(workdir, tmp_path):
    rc = _run(workdir, tmp_path / "a", [])
    assert rc == 0
    miou = json.loads((tmp_path / "a" / "parity_report.json").read_text()
                      )["miou"]
    # same protocol, ref set to our own number -> PASS, exit 0
    rc_pass = _run(workdir, tmp_path / "b", ["--ref_miou", str(miou)])
    rep = json.loads((tmp_path / "b" / "parity_report.json").read_text())
    assert rc_pass == 0 and rep["verdict"] == "PASS" and rep["delta"] == 0.0
    # ref 10 points away -> FAIL, exit 1
    rc_fail = _run(workdir, tmp_path / "c",
                   ["--ref_miou", str(miou + 10.0)])
    rep = json.loads((tmp_path / "c" / "parity_report.json").read_text())
    assert rc_fail == 1 and rep["verdict"] == "FAIL"
