"""Real multi-process test of the multi-host bootstrap + global batch path.

Launches 2 CPU processes that `jax.distributed.initialize` against a local
coordinator, build a global 2-device mesh, assemble a global batch from
per-process local shards via `put_global_batch`
(`jax.make_array_from_process_local_data`), and run a jitted global
reduction — validating the code path HF Accelerate's DDP process-group init
covers in the reference (`scripts/coco_multigpu.sh:18`, SURVEY.md §2.3)
without TPU pod hardware.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

os.environ["JAX_COORDINATOR_ADDRESS"] = sys.argv[1]
os.environ.setdefault("JAX_NUM_PROCESSES", "2")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)

from jax.sharding import PartitionSpec as P
from diffews_tpu.parallel import mesh as mesh_lib

pi, pc = mesh_lib.maybe_initialize_distributed()
assert pc == 2, pc
assert pi == int(sys.argv[2]), (pi, sys.argv[2])
assert jax.device_count() == 2 and jax.local_device_count() == 1

m = mesh_lib.make_mesh(n_data=2, n_model=1)

# Each process contributes ITS half of the global batch: global rows 0..3
# live on process 0, rows 4..7 on process 1.
local = np.arange(8, dtype=np.float32).reshape(8, 1)[pi * 4:(pi + 1) * 4]
batch = mesh_lib.put_global_batch({"x": local}, m, P("data"))
x = batch["x"]
assert x.shape == (8, 1), x.shape

total = jax.jit(lambda a: a.sum())(x)
# full gather of the global array must see both halves
np.testing.assert_allclose(float(total), np.arange(8, dtype=np.float32).sum())
glob = np.asarray(jax.device_get(
    jax.jit(lambda a: a + 0.0, out_shardings=mesh_lib.replicated(m))(x)))
np.testing.assert_array_equal(glob[:, 0], np.arange(8, dtype=np.float32))
print(f"proc {pi} OK")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_global_batch(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets cpu in-process
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.getcwd()

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed CPU init timed out on this platform")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out


_FSDP_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

jax.distributed.initialize(
    coordinator_address=sys.argv[1], num_processes=2,
    process_id=int(sys.argv[2]))
pi = jax.process_index()
out_dir = sys.argv[3]

from diffews_tpu.configs import UNetConfig
from diffews_tpu.models import unet
from diffews_tpu.parallel import mesh as mesh_lib
from diffews_tpu.training import checkpoints as tck
from diffews_tpu.training.state import TrainerConfig

ucfg = UNetConfig.tiny()
params = jax.tree_util.tree_map(
    np.asarray, unet.init_params(jax.random.PRNGKey(0), ucfg))
m = mesh_lib.make_mesh(n_data=2, n_model=1)
tcfg = TrainerConfig(learning_rate=1e-4, use_ema=True)
state, state_sh = mesh_lib.init_state_fsdp(tcfg, params, m,
                                           fsdp_min_elems=16)

# some leaf must actually be cross-process sharded for this test to bite
leaves = jax.tree_util.tree_leaves(state.params)
assert any(not l.is_fully_addressable for l in leaves), \
    "no cross-process shards; test is vacuous"

# every process snapshots (collective all-gather); only proc 0 writes
res = tck.save_checkpoint(out_dir, 7, state, ucfg, write=(pi == 0))
assert (res is not None) == (pi == 0)

# barrier so proc 1 doesn't read before proc 0 finished writing
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("ckpt-written")

restored, step = tck.load_checkpoint(os.path.join(out_dir, "checkpoint-7"),
                                     state)
assert step == 0  # aux records state.step (0 for a fresh state)
resharded = mesh_lib.put_sharded_host_tree(restored, state_sh)
for a, b in zip(jax.tree_util.tree_leaves(state.params),
                jax.tree_util.tree_leaves(resharded.params)):
    assert a.sharding == b.sharding, (a.sharding, b.sharding)
    np.testing.assert_array_equal(
        np.asarray(multihost_utils.process_allgather(a, tiled=True)),
        np.asarray(multihost_utils.process_allgather(b, tiled=True)))
# EMA + optimizer state survive the round trip too
for a, b in zip(jax.tree_util.tree_leaves(state.ema.params),
                jax.tree_util.tree_leaves(resharded.ema.params)):
    np.testing.assert_array_equal(
        np.asarray(multihost_utils.process_allgather(a, tiled=True)),
        np.asarray(multihost_utils.process_allgather(b, tiled=True)))
print(f"proc {pi} FSDP-CKPT OK")
"""


def test_two_process_fsdp_checkpoint_roundtrip(tmp_path):
    """Multi-host FSDP checkpointing: the device->host snapshot all-gathers
    cross-process shards (write=False on the non-primary process), and
    resume re-commits the host trees into the global sharding via
    make_array_from_callback."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.getcwd()

    script = tmp_path / "worker_fsdp.py"
    script.write_text(_FSDP_WORKER)
    out_dir = str(tmp_path / "ckpts")
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i), out_dir],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed CPU init timed out on this platform")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} FSDP-CKPT OK" in out
