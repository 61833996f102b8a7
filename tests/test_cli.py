"""End-to-end CLI smoke tests on synthetic data and tiny checkpoints."""

import json
import os

import jax
import numpy as np
import pytest

from diffews_tpu import checkpoint as C
from diffews_tpu.configs import CLIPTextConfig, SchedulerConfig, UNetConfig, VAEConfig
from diffews_tpu.models import clip_text, unet, vae
from helpers import synthetic_data as syn


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    ucfg, vcfg, tcfg = UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny()
    ck = root / "ckpt"
    C.save_unet(jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0)),
                ucfg, str(ck / "unet"))
    C.save_vae(jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1)),
               vcfg, str(ck / "vae"))
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


def test_evaluate_cli_end_to_end(workdir):
    from diffews_tpu.cli.evaluate import main

    miou, fb_iou = main([
        "--checkpoint", str(workdir / "ckpt"),
        "--datapath", str(workdir / "data"),
        "--benchmark", "coco", "--fold", "0", "--nshot", "1",
        "--img-size", "32", "--denoise_steps", "1", "--ensemble_size", "1",
        "--threshold", "0", "--r_threshold", "0.25",
        "--log-root", str(workdir / "logs"),
        "--max_episodes", "2",
    ])
    assert np.isfinite(miou) and np.isfinite(fb_iou)
    # eval log dir with log.txt exists
    logdirs = [d for d in os.listdir(workdir / "logs") if d.startswith("_TEST_coco_")]
    assert logdirs
    assert os.path.exists(workdir / "logs" / logdirs[0] / "log.txt")


def test_evaluate_cli_shot_sharded_matches_unsharded(workdir):
    """--num_shot_shards 2: same metrics as the single-device run (the
    partial-softmax merge is exact up to reduction order)."""
    from diffews_tpu.cli.evaluate import main

    common = [
        "--checkpoint", str(workdir / "ckpt"),
        "--datapath", str(workdir / "data"),
        "--benchmark", "coco", "--fold", "0", "--nshot", "2",
        "--img-size", "32", "--denoise_steps", "1", "--ensemble_size", "1",
        "--threshold", "0", "--r_threshold", "0.25",
        "--log-root", str(workdir / "logs"),
        "--max_episodes", "2",
    ]
    miou1, fb1 = main(common)
    miou2, fb2 = main(common + ["--num_shot_shards", "2"])
    assert abs(miou1 - miou2) < 1e-4 and abs(fb1 - fb2) < 1e-4
    # composed 2-D data x shots serving mesh (2*2 = 4 of the 8 CPU devices);
    # --max_episodes counts BATCHES, so bsz 2 x 1 batch = the same two
    # episodes the bsz-1 runs above scored
    assert common[-2:] == ["--max_episodes", "2"]
    miou3, fb3 = main(common[:-2] + ["--max_episodes", "1", "--bsz", "2",
                               "--num_shot_shards", "2",
                               "--num_data_shards", "2"])
    assert abs(miou1 - miou3) < 1e-4 and abs(fb1 - fb3) < 1e-4


def test_export_cli_artifact_serves(workdir, tmp_path):
    """Export CLI writes a StableHLO serving artifact that loads and runs
    without model code (`diffews_tpu/serving.py`)."""
    import jax.numpy as jnp

    from diffews_tpu import serving
    from diffews_tpu.cli.export import main

    out = main([
        "--checkpoint", str(workdir / "ckpt"),
        "--out", str(tmp_path / "art"),
        "--bsz", "1", "--nshot", "1", "--img-size", "32",
    ])
    mod = serving.load(out)
    rng = np.random.default_rng(0)
    pred = mod(rng.integers(0, 255, (1, 32, 32, 3), np.uint8),
               rng.integers(0, 255, (1, 1, 32, 32, 3), np.uint8),
               rng.integers(0, 2, (1, 1, 32, 32), np.uint8))
    assert pred.shape == (1, 32, 32, 3) and pred.dtype == jnp.uint8


def test_launcher_dry_run(workdir, capsys):
    from diffews_tpu.cli.launcher import main

    main([
        "--checkpoints", "ckA", "ckB",
        "--base_checkpoint", str(workdir / "ckpt"),
        "--folds", "0", "1",
        "--dry_run",
    ])
    out = capsys.readouterr().out
    assert out.count("diffews_tpu.cli.evaluate") == 4
    assert "--fold 1" in out


def test_launcher_slurm_emission(workdir, tmp_path):
    from diffews_tpu.cli.launcher import main

    main([
        "--checkpoints", "ckA",
        "--base_checkpoint", str(workdir / "ckpt"),
        "--folds", "0",
        "--mode", "slurm", "--slurm_dir", str(tmp_path / "jobs"),
    ])
    files = os.listdir(tmp_path / "jobs")
    assert len(files) == 1
    body = open(tmp_path / "jobs" / files[0]).read()
    assert "#SBATCH" in body and "diffews_tpu.cli.evaluate" in body


def test_surgery_cli(workdir, tmp_path):
    from diffews_tpu.cli.surgery import main

    # build a vanilla checkpoint without conv_in_ref
    params, ucfg = C.load_unet(str(workdir / "ckpt" / "unet"))
    vanilla = {k: v for k, v in params.items() if k != "conv_in_ref"}
    src = tmp_path / "sd"
    C.save_unet(vanilla, ucfg, str(src / "unet"))
    main([str(src), str(tmp_path / "sd-ref8")])
    p2, cfg2 = C.load_unet(str(tmp_path / "sd-ref8" / "unet"))
    assert "conv_in_ref" in p2 and cfg2.ref_in_channels == 8


def test_reference_script_invocations_accepted():
    """The exact flag sets the reference's launch scripts pass
    (`scripts/eval_coco2014_rthres_1shot_nosample.sh`,
    `scripts/train_cocofold0_*_v3.sh`) must parse — drop-in CLI parity."""
    import shlex

    from diffews_tpu.cli.evaluate import build_parser as eval_parser
    from diffews_tpu.cli.train import build_parser as train_parser

    eval_parser().parse_args(shlex.split(
        "--log-root X --denoise_steps 1 --checkpoint W --unet_ckpt_path M/unet"
        " --datapath F --benchmark coco --img-size 512 --ensemble_size 1"
        " --bsz 1 --scheduler_load_path ./s --nshot 1 --fold 0 --threshold 0"
        " --r_threshold 0.25"))
    args = train_parser().parse_args(shlex.split(
        "--mixed_precision=fp16 --train_batch_size=1 --checkpointing_steps 2000"
        " --pretrained_model_name_or_path=/x --output_dir=/o"
        " --train_data_dir /data --resolution=512 --learning_rate=1e-5"
        " --lr_warmup_steps 0 --max_train_steps=20000 --validation_steps 2000"
        " --lr_scheduler polynomial --lr_scheduler_power 1.0"
        " --gradient_accumulation_steps=4"
        " --enable_xformers_memory_efficient_attention --max_grad_norm=1.0"
        " --adam_weight_decay=1e-2 --tracker_project_name sd21 --seed=42"
        " --image_ref_column img_ref --image_tag_column img_tag"
        " --conditioning_image_ref_column a --conditioning_image_tag_column b"
        " --caption_column text --cache_dir ./cache --allow_tf32"
        " --dataloader_num_workers=16 --checkpoints_total_limit 10 --nshot 7"
        " --fold=0 --scheduler_load_path ./s"))
    assert args.datapath == "/data"  # --train_data_dir alias
    assert args.mixed_precision == "fp16"  # accepted, runs as bf16


def test_train_cli_end_to_end(workdir, tmp_path):
    """Two optimizer steps through the real train CLI on synthetic COCO
    (raw-uint8 episode path), then resume from the written checkpoint."""
    from diffews_tpu.cli.train import main

    out = tmp_path / "run"
    common = [
        "--pretrained_model_name_or_path", str(workdir / "ckpt"),
        "--datapath", str(workdir / "data"),
        "--benchmark", "coco", "--fold", "0", "--nshot", "2",
        "--resolution", "32", "--train_batch_size", "2",
        "--num_data_shards", "2", "--gradient_accumulation_steps", "2",
        "--checkpointing_steps", "2", "--logging_steps", "1",
        "--output_dir", str(out), "--mixed_precision", "no", "--no_remat",
        "--seed", "0",
    ]
    main(common + ["--max_train_steps", "4", "--validation_steps", "2",
                   "--validation_episodes", "2",
                   "--validation_image_grids", "1",
                   "--metrics_jsonl", str(out / "metrics.jsonl"),
                   "--profile_step", "2", "--profile_num_steps", "1"])
    assert (out / "checkpoint-2" / "unet").is_dir()
    assert (out / "checkpoint-4" / "unet").is_dir()
    # --metrics_jsonl wrote one record per logging interval with the
    # sustained-run artifact fields, and the plot tool renders it
    recs = [json.loads(l) for l in (out / "metrics.jsonl").open()]
    assert [r["step"] for r in recs] == [1, 2, 3, 4]
    assert all({"loss", "steps_per_s", "wall_s", "total_notfinite"}
               <= set(r) for r in recs)
    import subprocess
    import sys as _sys
    subprocess.run([_sys.executable, "tools/plot_train_metrics.py",
                    str(out / "metrics.jsonl")], check=True,
                   cwd=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
    assert (out / "metrics.png").is_file()
    # --profile_step captured a profiler trace (numerics-neutral: the
    # resumed leg below runs unprofiled and must still match bitwise)
    assert any((out / "profile").rglob("*.xplane.pb"))
    # periodic validation wrote its episode strip grid + metric line
    assert (out / "validation" / "step-2_ep-0.jpg").is_file()
    assert "val mIoU" in (out / "eval_results.txt").read_text()
    # diffusers-layout checkpoint is loadable and has the dual input convs
    p, cfg = C.load_unet(str(out / "checkpoint-2" / "unet"))
    assert "conv_in_ref" in p
    # EXACT resume: the training stream is a pure function of (seed, step)
    # — episode sampling, shot subsets and noise keys are all counter-keyed
    # — so resuming the straight run's mid-run checkpoint-2 in a FRESH
    # output dir must land bitwise on the straight run's checkpoint-4
    # weights.  max_train_steps is identical in both legs (the polynomial
    # LR decay is a function of it, as in the reference), and only the
    # straight run ran periodic validation: the bitwise match also proves
    # validation (which replays the seeded eval protocol) cannot perturb
    # the training stream.
    out2 = tmp_path / "resumed"
    common2 = [a if a != str(out) else str(out2) for a in common]
    main(common2 + ["--max_train_steps", "4", "--resume_from_checkpoint",
                    str(out / "checkpoint-2")])
    assert (out2 / "checkpoint-4" / "unet").is_dir()
    p_straight, _ = C.load_unet(str(out / "checkpoint-4" / "unet"))
    p_resumed, _ = C.load_unet(str(out2 / "checkpoint-4" / "unet"))
    import jax

    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           p_resumed, p_straight)


def test_train_cli_foreign_resume_writes_final_checkpoint(workdir, tmp_path):
    """Resuming a checkpoint from ANOTHER run's output_dir with no further
    steps to take must still write that step's checkpoint into THIS
    output_dir — the final-save skip may only trigger for checkpoints this
    run's own cadence wrote (regression: last_saved_step used to be seeded
    from the resumed step unconditionally, leaving the new output_dir
    empty)."""
    from diffews_tpu.cli.train import main

    a, b = tmp_path / "a", tmp_path / "b"
    common = [
        "--pretrained_model_name_or_path", str(workdir / "ckpt"),
        "--datapath", str(workdir / "data"),
        "--benchmark", "coco", "--fold", "0", "--nshot", "1",
        "--resolution", "32", "--train_batch_size", "1",
        "--num_data_shards", "1", "--gradient_accumulation_steps", "1",
        "--checkpointing_steps", "2", "--logging_steps", "1",
        "--mixed_precision", "no", "--no_remat", "--seed", "0",
        "--max_train_steps", "2",
    ]
    main(common + ["--output_dir", str(a)])
    assert (a / "checkpoint-2" / "unet").is_dir()
    main(common + ["--output_dir", str(b),
                   "--resume_from_checkpoint", str(a / "checkpoint-2")])
    assert (b / "checkpoint-2" / "unet").is_dir()


def test_train_cli_preemption_checkpoint_and_exact_resume(workdir, tmp_path,
                                                          monkeypatch):
    """Graceful preemption: when the stop event trips mid-run (here,
    deterministically after optimizer step 3 — an off-cadence step, so the
    preemption save itself is exercised, not the cadence save), the CLI
    must write checkpoint-{step} and exit cleanly, and resuming `latest`
    must land bitwise on the straight run's final weights (the counter-
    keyed stream makes a preempted+resumed run identical to an
    uninterrupted one)."""
    import diffews_tpu.cli.train as train_mod
    from diffews_tpu.cli.train import main

    out = tmp_path / "straight"
    common = [
        "--pretrained_model_name_or_path", str(workdir / "ckpt"),
        "--datapath", str(workdir / "data"),
        "--benchmark", "coco", "--fold", "0", "--nshot", "2",
        "--resolution", "32", "--train_batch_size", "2",
        "--num_data_shards", "2", "--gradient_accumulation_steps", "2",
        "--checkpointing_steps", "2", "--logging_steps", "1",
        "--output_dir", str(out), "--mixed_precision", "no", "--no_remat",
        "--seed", "0", "--max_train_steps", "4",
    ]
    main(common)

    class _TripAfter:
        """Duck-typed stop event whose is_set() turns true at the Nth
        per-step check (the loop checks once per optimizer step)."""

        def __init__(self, n):
            self.n = n
            self.calls = 0

        def is_set(self):
            self.calls += 1
            return self.calls >= self.n

    monkeypatch.setattr(train_mod, "_install_preemption_handler",
                        lambda: (_TripAfter(3), lambda: None))
    out2 = tmp_path / "preempted"
    common2 = [a if a != str(out) else str(out2) for a in common]
    main(common2)
    # preempted after step 3 (off the step-2/4 cadence): the preemption
    # save wrote checkpoint-3, and checkpoint-4 must NOT exist
    assert (out2 / "checkpoint-3" / "unet").is_dir()
    assert not (out2 / "checkpoint-4").exists()
    monkeypatch.undo()
    main(common2 + ["--resume_from_checkpoint", "latest"])
    p_straight, _ = C.load_unet(str(out / "checkpoint-4" / "unet"))
    p_resumed, _ = C.load_unet(str(out2 / "checkpoint-4" / "unet"))
    import jax

    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           p_resumed, p_straight)


def test_preemption_handler_sets_event_and_restores():
    """First SIGTERM sets the stop event without killing the process;
    restore() reinstates the previous disposition."""
    import signal as _signal

    from diffews_tpu.cli.train import _install_preemption_handler

    before = _signal.getsignal(_signal.SIGTERM)
    stop, restore = _install_preemption_handler()
    assert not stop.is_set()
    _signal.raise_signal(_signal.SIGTERM)
    assert stop.is_set()  # and we are still alive
    restore()
    assert _signal.getsignal(_signal.SIGTERM) is before


def test_train_cli_fsdp_end_to_end(workdir, tmp_path):
    """--fsdp (ZeRO state sharding over "data") through the real train CLI:
    step runs, checkpoint save gathers the sharded state, and resume
    re-commits the FSDP layout (cli/train.py re-put after restore)."""
    from diffews_tpu.cli.train import main

    out = tmp_path / "run_fsdp"
    common = [
        "--pretrained_model_name_or_path", str(workdir / "ckpt"),
        "--datapath", str(workdir / "data"),
        "--benchmark", "coco", "--fold", "0", "--nshot", "2",
        "--resolution", "32", "--train_batch_size", "2",
        "--num_data_shards", "2", "--gradient_accumulation_steps", "2",
        "--checkpointing_steps", "2", "--logging_steps", "1",
        "--output_dir", str(out), "--mixed_precision", "no", "--no_remat",
        "--seed", "0", "--fsdp", "--use_ema",
    ]
    main(common + ["--max_train_steps", "2"])
    assert (out / "checkpoint-2" / "unet").is_dir()
    assert (out / "checkpoint-2" / "unet_ema").is_dir()
    main(common + ["--max_train_steps", "3",
                   "--resume_from_checkpoint", "latest"])
    assert (out / "checkpoint-3" / "unet").is_dir()


def test_train_cli_lora_end_to_end(workdir, tmp_path):
    """--lora_rank through the real train CLI: adapters train, the written
    checkpoint's unet/ is the MERGED model in diffusers layout (readable
    by eval / the reference's --unet_ckpt_path), and resume restores the
    raw adapter tree from the aux msgpack."""
    from diffews_tpu.cli.train import main

    out = tmp_path / "run_lora"
    common = [
        "--pretrained_model_name_or_path", str(workdir / "ckpt"),
        "--datapath", str(workdir / "data"),
        "--benchmark", "coco", "--fold", "0", "--nshot", "2",
        "--resolution", "32", "--train_batch_size", "2",
        "--num_data_shards", "2", "--gradient_accumulation_steps", "2",
        "--checkpointing_steps", "2", "--logging_steps", "1",
        "--output_dir", str(out), "--mixed_precision", "no", "--no_remat",
        "--seed", "0", "--lora_rank", "2", "--use_ema",
    ]
    main(common + ["--max_train_steps", "2"])
    p, _ = C.load_unet(str(out / "checkpoint-2" / "unet"))
    assert "conv_in_ref" in p  # merged diffusers layout, not an adapter tree
    assert (out / "checkpoint-2" / "unet_ema").is_dir()
    main(common + ["--max_train_steps", "3",
                   "--resume_from_checkpoint", "latest"])
    assert (out / "checkpoint-3" / "unet").is_dir()


def test_train_cli_lora_bf16_writes_f32_checkpoint(workdir, tmp_path):
    """Under bf16 training, the LoRA-merged unet/ must still carry f32
    weights like a full-FT checkpoint (the merge happens on the host f32
    base, not the compute-dtype base) — a silent bf16 round in an artifact
    documented as reference-compatible would be a precision downgrade."""
    from diffews_tpu.cli.train import main

    out = tmp_path / "run_lora_bf16"
    main([
        "--pretrained_model_name_or_path", str(workdir / "ckpt"),
        "--datapath", str(workdir / "data"),
        "--benchmark", "coco", "--fold", "0", "--nshot", "2",
        "--resolution", "32", "--train_batch_size", "2",
        "--num_data_shards", "2", "--gradient_accumulation_steps", "2",
        "--checkpointing_steps", "1", "--logging_steps", "1",
        "--output_dir", str(out), "--mixed_precision", "bf16", "--no_remat",
        "--seed", "0", "--lora_rank", "2", "--max_train_steps", "1",
    ])
    p, _ = C.load_unet(str(out / "checkpoint-1" / "unet"))
    leaves = jax.tree_util.tree_leaves(p)
    assert all(np.asarray(x).dtype == np.float32 for x in leaves)
    # and the adapted sites actually moved (non-zero delta was merged)
    base, _ = C.load_unet(str(workdir / "ckpt" / "unet"))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max()),
        p, base)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0


def test_batched_eval_reproduces_bsz1_metrics(workdir):
    """--bsz N draws the identical seeded episode stream (sequential
    __getitem__ order) and per-episode thresholds, so the mIoU must match
    the bsz=1 protocol exactly — batching is a pure throughput lever."""
    from diffews_tpu.cli.evaluate import main

    common = [
        "--checkpoint", str(workdir / "ckpt"),
        "--datapath", str(workdir / "data"),
        "--benchmark", "coco", "--fold", "0", "--nshot", "1",
        "--img-size", "32", "--denoise_steps", "1", "--ensemble_size", "1",
        "--threshold", "0", "--r_threshold", "0.25",
        "--log-root", str(workdir / "logs_b"),
    ]
    m1, f1 = main(common + ["--bsz", "1", "--max_episodes", "4"])
    m2, f2 = main(common + ["--bsz", "2", "--max_episodes", "2"])
    assert abs(m1 - m2) < 1e-9
    assert abs(f1 - f2) < 1e-9


# every registered benchmark through the eval CLI end-to-end (COCO is
# covered above); folds follow the dataset-level tests (pascal_cd metadata
# is per-fold, pascal_part fold indexes the super-category list)
@pytest.mark.parametrize("benchmark,builder,fold", [
    ("pascal", "make_pascal", 0),
    ("pascal_cd", "make_pascal_cd", 1),
    ("fss", "make_fss", 0),
    ("lvis", "make_lvis", 0),
    ("paco_part", "make_paco", 0),
    ("pascal_part", "make_pascal_part", 0),
])
def test_evaluate_cli_every_benchmark(workdir, tmp_path, benchmark, builder,
                                      fold):
    """The reference's eval entry point serves all 7 benchmarks
    (`evaluation_util/data/dataset.py:22-30`); pin that each one runs
    through OUR harness end-to-end — registry dispatch, episode sampling,
    the jitted episode program, scoring, and the log-dir contract."""
    from diffews_tpu.cli.evaluate import main

    getattr(syn, builder)(str(tmp_path))
    miou, fb_iou = main([
        "--checkpoint", str(workdir / "ckpt"),
        "--datapath", str(tmp_path),
        "--benchmark", benchmark, "--fold", str(fold), "--nshot", "1",
        "--img-size", "32", "--denoise_steps", "1", "--ensemble_size", "1",
        "--threshold", "0", "--r_threshold", "0.25",
        "--log-root", str(tmp_path / "logs"),
        "--max_episodes", "2",
    ])
    assert np.isfinite(miou) and np.isfinite(fb_iou)
    logdirs = [d for d in os.listdir(tmp_path / "logs")
               if d.startswith(f"_TEST_{benchmark}_")]
    assert logdirs and os.path.exists(
        tmp_path / "logs" / logdirs[0] / "log.txt")


def test_evaluate_cli_mask_on_device_matches_host(workdir):
    """--mask_on_device (in-graph threshold, masks-only d2h) must score
    identically to the default host-threshold protocol (ulp-exact on the
    CPU backend; pipeline.device_mask_from_seg)."""
    from diffews_tpu.cli.evaluate import main

    base_argv = [
        "--checkpoint", str(workdir / "ckpt"),
        "--datapath", str(workdir / "data"),
        "--benchmark", "coco", "--fold", "0", "--nshot", "1",
        "--img-size", "32", "--denoise_steps", "1", "--ensemble_size", "1",
        "--threshold", "0", "--r_threshold", "0.25",
        "--log-root", str(workdir / "logs_mod"),
        "--max_episodes", "3",
    ]
    host = main(base_argv)
    dev = main(base_argv + ["--mask_on_device"])
    assert host == dev
