"""Run each examples/ script as a real subprocess (CPU).

The quickstart examples are the library's front door; nothing else in the
suite imports them, so API drift (renamed configs, moved helpers) would
surface only when a user runs them.  Each script forces the CPU platform
in-process, so the subprocess never touches the machine's pinned TPU
backend.
"""

import glob
import os
import subprocess
import sys

import pytest

_EXAMPLES = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "..", "examples", "*.py"))
)


@pytest.mark.parametrize("script", _EXAMPLES,
                         ids=[os.path.basename(p) for p in _EXAMPLES])
def test_example_runs(script):
    env = dict(os.environ)
    env.pop("DIFFEWS_EXAMPLE_TPU", None)  # examples default to CPU
    proc = subprocess.run(
        [sys.executable, script], capture_output=True, text=True,
        timeout=900, env=env,
    )
    assert proc.returncode == 0, (
        f"{os.path.basename(script)} failed:\n{proc.stdout}\n{proc.stderr}"
    )
