"""Self-regression pins: recompute the tiny-config goldens and compare.

`tools/make_self_golden.py` commits deterministic tiny-model outputs
(fixed init keys + fixed NumPy inputs, CPU f32) to
`tests/golden/self_golden.npz`.  These tests recompute every pinned
quantity through the live code and assert it still matches — catching
silent numeric drift from refactors of the UNet/VAE/CLIP/scheduler/
pipeline/training-loss paths (the diffusers-anchored goldens in
`test_golden.py` can't run in this environment, so this is the suite's
standing numeric tripwire).

If a change is INTENTIONALLY numeric (new kernel defaults, different
reduction order), regenerate with `python tools/make_self_golden.py` and
say why in the commit message.
"""

import os
import sys

import numpy as np
import pytest

_TOOLS = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "tools"))
FIXTURE = os.path.join(os.path.dirname(__file__), "golden", "self_golden.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason="no self-golden fixture (run tools/make_self_golden.py)",
)

# Tight-but-not-bitwise: XLA CPU codegen may re-associate reductions across
# versions; drift from a real semantic change is orders of magnitude larger.
RTOL, ATOL = 1e-4, 1e-5


@pytest.fixture(scope="module")
def got_want():
    sys.path.insert(0, _TOOLS)
    try:
        import make_self_golden
    finally:
        sys.path.pop(0)
    got = make_self_golden.compute_fixtures()
    want = dict(np.load(FIXTURE))
    return got, want


FLOAT_KEYS = [
    "unet_joint", "unet_attnmask", "vae_moments", "vae_mean", "vae_dec",
    "clip_out", "sched_x0", "sched_prev", "train_loss", "train_grad_norm",
]


def test_fixture_covers_all_keys(got_want):
    got, want = got_want
    assert set(got) == set(want), (
        "pinned-surface set changed; regenerate tests/golden/self_golden.npz"
    )


@pytest.mark.parametrize("key", FLOAT_KEYS)
def test_float_surface_unchanged(got_want, key):
    got, want = got_want
    np.testing.assert_allclose(got[key], want[key], rtol=RTOL, atol=ATOL)


def test_exact_int_surfaces(got_want):
    got, want = got_want
    np.testing.assert_array_equal(got["clip_ids"], want["clip_ids"])
    np.testing.assert_array_equal(got["sched_t"], want["sched_t"])


def test_pipeline_episode_unchanged(got_want):
    """uint8 seg + mask: allow a 1-count quantization wiggle on <1% of
    pixels (threshold pixels sit on a rounding boundary)."""
    got, want = got_want
    seg_d = np.abs(got["pipe_seg"].astype(np.int16) - want["pipe_seg"].astype(np.int16))
    assert seg_d.max() <= 1
    assert (seg_d > 0).mean() < 0.01
    mask_d = got["pipe_mask"] != want["pipe_mask"]
    assert mask_d.mean() < 0.01
