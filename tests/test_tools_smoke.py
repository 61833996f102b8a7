"""Import smoke for the `tools/` scripts.

The TPU micro-benchmarks under tools/ are run by hand on the chip and are
never imported by the suite, so API drift in the library (renamed config
fields, moved helpers) used to surface only at the next on-chip session.
Importing each module catches syntax errors and stale imports; every tool
guards its work under `if __name__ == "__main__"` so importing runs
nothing device-side (the conftest pins the CPU backend regardless).
"""

import glob
import importlib
import os
import sys

import pytest

_TOOLS_DIR = os.path.join(os.path.dirname(__file__), "..", "tools")
_TOOLS = sorted(
    os.path.splitext(os.path.basename(p))[0]
    for p in glob.glob(os.path.join(_TOOLS_DIR, "*.py")))


@pytest.mark.parametrize("name", _TOOLS)
def test_tool_imports(name):
    sys.path.insert(0, os.path.abspath(_TOOLS_DIR))
    try:
        importlib.import_module(name)
    finally:
        sys.path.pop(0)
