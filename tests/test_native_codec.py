"""Native C++ mask codec vs the pure-Python oracle (masks.py fallbacks).

The char codec, RLE expansion and mask->RLE must be bit-identical between
the two paths; polygon rasterization (different convention: COCO
crossing-parity vs PIL scanline) must agree to high IoU and exactly on
axis-aligned integer rectangles.
"""

import numpy as np
import pytest

from diffews_tpu import native
from diffews_tpu.data import masks


pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native codec unavailable (no compiler)")


@pytest.fixture
def py_path(monkeypatch):
    """Force the pure-Python fallback inside the `with` scope."""
    monkeypatch.setenv("DIFFEWS_TPU_NATIVE", "0")
    yield


def _random_mask(rng, h, w):
    # blobby mask: threshold of a blurred random field (long runs, like real
    # annotations) plus salt noise (short runs)
    base = rng.random((h // 4 + 1, w // 4 + 1))
    up = np.kron(base, np.ones((4, 4)))[:h, :w]
    return ((up > 0.6) | (rng.random((h, w)) > 0.995)).astype(np.uint8)


class TestRLEBitParity:
    def test_roundtrip_and_cross_path_equality(self, monkeypatch):
        rng = np.random.default_rng(0)
        for h, w in [(1, 1), (7, 3), (64, 64), (333, 217), (480, 640)]:
            m = _random_mask(rng, h, w)
            rle_n = masks.rle_encode(m)
            monkeypatch.setenv("DIFFEWS_TPU_NATIVE", "0")
            rle_p = masks.rle_encode(m)
            monkeypatch.setenv("DIFFEWS_TPU_NATIVE", "1")
            assert rle_n["counts"] == rle_p["counts"], (h, w)
            dec_n = masks.rle_decode(rle_n)
            monkeypatch.setenv("DIFFEWS_TPU_NATIVE", "0")
            dec_p = masks.rle_decode(rle_n)
            monkeypatch.setenv("DIFFEWS_TPU_NATIVE", "1")
            np.testing.assert_array_equal(dec_n, dec_p)
            np.testing.assert_array_equal(dec_n, m)

    def test_all_zero_and_all_one(self):
        for m in [np.zeros((5, 9), np.uint8), np.ones((5, 9), np.uint8)]:
            np.testing.assert_array_equal(masks.rle_decode(masks.rle_encode(m)), m)

    def test_uncompressed_counts_list(self):
        # list counts skip the char codec entirely; expansion must match
        rle = {"size": [4, 3], "counts": [2, 5, 5]}
        m = masks.rle_decode(rle)
        flat = np.zeros(12, np.uint8)
        flat[2:7] = 1
        np.testing.assert_array_equal(m, flat.reshape(3, 4).T)

    def test_negative_delta_counts_chars(self, monkeypatch):
        # delta coding goes negative when runs shrink: exercise the
        # sign-extension branch in both encoder and decoder
        counts = [100, 3, 1, 200, 4, 2, 1, 50]
        monkeypatch.setenv("DIFFEWS_TPU_NATIVE", "0")
        s_p = masks._encode_counts(counts)
        d_p = masks._decode_counts(s_p)
        monkeypatch.setenv("DIFFEWS_TPU_NATIVE", "1")
        s_n = masks._encode_counts(counts)
        d_n = masks._decode_counts(s_n)
        assert s_n == s_p
        assert d_n == d_p == counts


class TestPolygons:
    def test_integer_rectangle(self):
        # COCO crossing-parity rasterization samples pixel x at continuous
        # coordinate x + 2/5 (upsample x5, centers at column 5x+2), so the
        # continuous square [1,4]^2 contains samples for pixels 1..3 only
        m = masks.polygons_to_bitmask(
            [np.array([1, 1, 1, 4, 4, 4, 4, 1], np.float64)], 6, 7)
        exp = np.zeros((6, 7), bool)
        exp[1:4, 1:4] = True
        np.testing.assert_array_equal(m, exp)

    def test_degenerate_skipped(self):
        m = masks.polygons_to_bitmask(
            [np.array([2, 2, 3, 3], np.float64)], 5, 5)
        assert not m.any()

    def test_union_of_polygons(self):
        polys = [np.array([0, 0, 0, 2, 2, 2, 2, 0], np.float64),
                 np.array([4, 4, 4, 6, 6, 6, 6, 4], np.float64)]
        m = masks.polygons_to_bitmask(polys, 8, 8)
        assert m[1, 1] and m[5, 5] and not m[3, 3]

    def test_bit_identical_to_numpy_fallback(self, monkeypatch):
        """Both paths implement the COCO crossing-parity convention; masks
        must reproduce EXACTLY between hosts with and without a compiler
        (non-convex, multi-polygon, and tiny shapes included)."""
        rng = np.random.default_rng(1)
        for trial in range(16):
            k = int(rng.integers(3, 13))
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            r = rng.uniform(3, 80, k)  # wildly varying radii -> non-convex
            cx, cy = rng.uniform(30, 170, 2)
            xs = cx + r * np.cos(ang)
            ys = cy + r * np.sin(ang)
            poly = [np.stack([xs, ys], -1).reshape(-1)]
            if trial % 3 == 0:  # multi-polygon union
                poly.append(poly[0] + rng.uniform(-15, 15))
            m_n = masks.polygons_to_bitmask(poly, 200, 200)
            monkeypatch.setenv("DIFFEWS_TPU_NATIVE", "0")
            m_p = masks.polygons_to_bitmask(poly, 200, 200)
            monkeypatch.setenv("DIFFEWS_TPU_NATIVE", "1")
            assert m_n.sum() > 0
            np.testing.assert_array_equal(m_n, m_p)

    def test_fallback_rectangle_and_clipping(self, monkeypatch):
        """Pure-NumPy path alone: same convention pins as the native tests."""
        monkeypatch.setenv("DIFFEWS_TPU_NATIVE", "0")
        m = masks.polygons_to_bitmask(
            [np.array([1, 1, 1, 4, 4, 4, 4, 1], np.float64)], 6, 7)
        exp = np.zeros((6, 7), bool)
        exp[1:4, 1:4] = True
        np.testing.assert_array_equal(m, exp)
        m = masks.polygons_to_bitmask(
            [np.array([-10, -10, -10, 30, 30, 30, 30, -10], np.float64)],
            20, 20)
        assert m.all()

    def test_out_of_bounds_clipped(self):
        # polygon hanging off every edge must clip, not crash
        m = masks.polygons_to_bitmask(
            [np.array([-10, -10, -10, 30, 30, 30, 30, -10], np.float64)],
            20, 20)
        assert m.all()

    def test_segmentation_dispatch(self):
        seg = [[1, 1, 1, 4, 4, 4, 4, 1]]
        m = masks.segmentation_to_mask(seg, 6, 7)
        assert m.dtype == bool and m[2, 2]
