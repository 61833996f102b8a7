"""utils/profiling.py — the tracing/StageTimer hooks.

The reference has no profiling subsystem (SURVEY.md §5: commented-out
time.time() probes); these pin the rebuild's replacement so the harness
`--profile_step` path and the tools/ stage breakdowns stay trustworthy.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from diffews_tpu.utils import profiling


def test_stage_timer_accumulates_and_formats():
    st = profiling.StageTimer(sync=False)
    with st.stage("a"):
        pass
    with st.stage("a"):
        pass
    with st.stage("b"):
        pass
    assert st.counts["a"] == 2 and st.counts["b"] == 1
    assert st.totals["a"] >= 0.0
    s = st.summary()
    assert "a:" in s and "x2" in s and "b:" in s and "x1" in s


def test_stage_timer_counts_raising_stage():
    """A crashing stage still spent the time — it must not vanish from
    the breakdown."""
    st = profiling.StageTimer(sync=False)
    with pytest.raises(RuntimeError):
        with st.stage("boom"):
            raise RuntimeError("x")
    assert st.counts["boom"] == 1


def test_stage_timer_syncs_device_work():
    st = profiling.StageTimer(sync=True)
    with st.stage("jit"):
        x = jax.jit(lambda v: (v * 2).sum())(jnp.ones((64, 64)))
    assert st.counts["jit"] == 1
    assert float(x) == 64 * 64 * 2


def test_trace_writes_profile_dir(tmp_path):
    logdir = str(tmp_path / "trace")
    with profiling.trace(logdir):
        with profiling.annotate("annotated-step"):
            jax.jit(lambda v: v + 1)(jnp.zeros((8,))).block_until_ready()
    # the profiler writes plugins/profile/<ts>/*.xplane.pb under logdir
    found = [f for root, _dirs, files in os.walk(logdir)
             for f in files if f.endswith(".xplane.pb")]
    assert found, f"no xplane capture under {logdir}"
