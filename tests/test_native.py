"""Native host-ops: correctness vs scipy and fallback behaviour."""

import numpy as np
import pytest
from scipy import ndimage

from ukbb_cardiac_tpu import native
from ukbb_cardiac_tpu.ops import cc


@pytest.mark.skipif(not native.available(), reason="toolchain unavailable")
def test_native_matches_scipy():
    rng = np.random.RandomState(0)
    for density in (0.3, 0.5, 0.7):
        b = rng.rand(48, 56) > density
        # largest CC (4-connectivity)
        lab, n = ndimage.label(b)
        if n:
            areas = np.bincount(lab.ravel())[1:]
            ref = lab == (np.argmax(areas) + 1)
        else:
            ref = np.zeros_like(b)
        np.testing.assert_array_equal(native.largest_cc_2d(b, 1), ref)
        # significant-CC count (8-connectivity)
        s = ndimage.generate_binary_structure(2, 2)
        lab8, n8 = ndimage.label(b, structure=s)
        ref_count = int(np.sum(np.bincount(lab8.ravel())[1:] > 10)) if n8 else 0
        assert native.count_significant_cc_2d(b, 10, 2) == ref_count
        # remove-small (4-connectivity)
        ref_rm = b.copy()
        if n:
            small = np.bincount(lab.ravel()) < 10
            small[0] = False
            ref_rm[small[lab]] = 0
        np.testing.assert_array_equal(
            native.remove_small_cc_2d(b, 10, 1).astype(bool), ref_rm)


def test_ops_cc_fallback(monkeypatch):
    """ops.cc works identically with the native path disabled."""
    rng = np.random.RandomState(1)
    b = rng.rand(32, 32) > 0.5
    with_native = (cc.get_largest_cc(b), cc.count_significant_cc(b),
                   cc.remove_small_cc(b))
    monkeypatch.setattr(native, "available", lambda: False)
    without = (cc.get_largest_cc(b), cc.count_significant_cc(b),
               cc.remove_small_cc(b))
    np.testing.assert_array_equal(with_native[0], without[0])
    assert with_native[1] == without[1]
    np.testing.assert_array_equal(np.asarray(with_native[2], dtype=bool),
                                  np.asarray(without[2], dtype=bool))


@pytest.mark.skipif(not native.available(), reason="toolchain unavailable")
def test_label_areas_per_frame():
    rng = np.random.RandomState(2)
    vol = rng.randint(0, 4, (10, 12, 2, 5)).astype(np.int16)
    counts = native.label_areas_per_frame(vol, 4)
    assert counts.shape == (5, 4)
    for t in range(5):
        for k in range(4):
            assert counts[t, k] == np.sum(vol[:, :, :, t] == k)
