"""Tests for the adaptive lossless transfer packing (infer/transfer.py).

The packed up-leg must be EXACT — the engines' voxel outputs with a
packed transfer are pinned bit-identical to the raw path, for both the
plane-split and the temporal-delta encodings.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ukbb_cardiac_tpu.infer import transfer
from ukbb_cardiac_tpu.infer.engine import InferenceEngine, SegmentationModel
from ukbb_cardiac_tpu.models import convlstm, fcn as fcn_mod
from ukbb_cardiac_tpu.models import unet as unet_mod


def _degraded():
    bw = transfer.BandwidthTracker()
    bw.update(1_000_000, 0.1)  # 10 MB/s
    return bw


def _fast():
    bw = transfer.BandwidthTracker()
    bw.update(100_000_000, 0.1)  # 1 GB/s
    return bw


@pytest.mark.parametrize("hi_max", [255, 1023, 4095])
def test_plane_roundtrip_exact(hi_max):
    rng = np.random.RandomState(0)
    img = rng.randint(0, hi_max + 1, size=(13, 17, 3, 5)).astype(np.int16)
    plan = transfer.plan_pack(img, _degraded())
    assert plan is not None and plan.mode == "plane"  # T=5 < 8: no delta
    expected_bits = 8 if hi_max == 255 else (10 if hi_max == 1023 else 12)
    assert plan.hi_bits == expected_bits - 8
    buf = transfer.pack_buffer(img, plan)
    assert buf.nbytes == transfer.packed_nbytes(plan) < img.nbytes
    rec = np.asarray(transfer.unpack_jax(jnp.asarray(buf), plan))
    assert rec.dtype == img.dtype
    np.testing.assert_array_equal(rec, img)


@pytest.mark.parametrize("dtype", [np.int16, np.uint16])
def test_delta_roundtrip_exact(dtype):
    """A quiet cine (small temporal deltas) engages delta mode and
    reconstructs bit-exactly through the device cumsum."""
    rng = np.random.RandomState(1)
    base = rng.randint(0, 4000, size=(32, 36, 4, 1)).astype(np.int32)
    walk = rng.randint(-40, 41, size=(32, 36, 4, 24)).astype(np.int32)
    walk[..., 0] = 0
    img = np.clip(base + np.cumsum(walk, axis=-1), 0, 4095).astype(dtype)
    plan = transfer.plan_pack(img, _degraded())
    assert plan is not None and plan.mode == "delta"
    # 12-bit frame 0, ~7-bit zigzag deltas: delta must ship fewer bytes
    plane = transfer.PackPlan(img.shape, np.dtype(dtype).str, "plane", 4)
    assert transfer.packed_nbytes(plan) < \
        transfer.DELTA_MIN_SAVING * transfer.packed_nbytes(plane)
    buf = transfer.pack_buffer(img, plan)
    rec = np.asarray(transfer.unpack_jax(jnp.asarray(buf), plan))
    assert rec.dtype == img.dtype
    np.testing.assert_array_equal(rec, img)


def test_delta_not_chosen_on_noisy_data():
    """Independent per-frame noise makes deltas need MORE bits than the
    raw values (the measured DESIGN.md round-5 result) — the planner
    must keep the plane pack."""
    rng = np.random.RandomState(2)
    img = np.clip(500 + 80 * rng.randn(24, 24, 2, 20), 0,
                  1023).astype(np.int16)
    plan = transfer.plan_pack(img, _degraded())
    assert plan is not None and plan.mode == "plane" and plan.hi_bits == 2


def test_delta_roundtrip_with_moving_edge():
    """Large but <12-bit deltas (a moving bright edge) still reconstruct
    exactly when delta mode is forced."""
    img = np.zeros((8, 8, 1, 16), np.int16)
    for t in range(16):
        img[t % 8, :, 0, t] = 2000  # |Δ|=2000 → zigzag 4000 < 4096
    plan = transfer.PackPlan(img.shape, img.dtype.str, "delta",
                             hi_bits=4, f0_hi_bits=4)
    buf = transfer.pack_buffer(img, plan)
    rec = np.asarray(transfer.unpack_jax(jnp.asarray(buf), plan))
    np.testing.assert_array_equal(rec, img)


def test_plan_pack_decisions():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 1000, size=(8, 8, 2, 3)).astype(np.int16)
    # fast link -> raw
    assert transfer.plan_pack(img, _fast()) is None
    # unknown bandwidth counts as degraded -> packed
    assert transfer.plan_pack(img, transfer.BandwidthTracker()) is not None
    # negative values -> raw
    neg = img.copy()
    neg[0, 0, 0, 0] = -1
    assert transfer.plan_pack(neg, _degraded()) is None
    # >12-bit range -> raw
    wide = img.copy()
    wide[0, 0, 0, 0] = 5000
    assert transfer.plan_pack(wide, _degraded()) is None
    # float -> raw; uint8 -> raw (already minimal)
    assert transfer.plan_pack(img.astype(np.float32), _degraded()) is None
    assert transfer.plan_pack((img % 200).astype(np.uint8),
                              _degraded()) is None


def test_single_buffer_single_transfer():
    """The packed path must ship exactly ONE array (one H2D transfer —
    each extra costs ~0.25 s fixed through the degraded tunnel)."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 1000, size=(32, 32, 4, 12)).astype(np.int16)
    plan = transfer.plan_pack(img, _degraded())
    stats = transfer.TransferStats()
    pieces = transfer.pack_and_dispatch(img, plan, None, stats)
    assert len(pieces) == 1
    assert stats.h2d_dispatches == 1
    assert stats.h2d_bytes == transfer.packed_nbytes(plan)
    assert stats.h2d_raw_bytes == img.nbytes
    assert stats.packed_dispatches == 1


def test_bandwidth_tracker_ema():
    bw = transfer.BandwidthTracker()
    assert bw.degraded  # unknown
    bw.update(40_000_000, 0.04)  # 1 GB/s
    assert not bw.degraded
    bw.update(4_000_000, 1.0)  # 4 MB/s sample
    bw.update(4_000_000, 1.0)
    assert bw.degraded  # EMA pulled under the threshold


TINY = fcn_mod.FCNConfig(n_class=4, n_level=5, n_filter=(4, 8, 8, 8, 8),
                         n_block=(1, 1, 1, 1, 1), same_dim=4, fc=8)


def test_engine_packed_dispatch_bit_identical():
    """Fused deploy with the packed up-leg == raw up-leg, voxel for voxel."""
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), TINY)
    model = SegmentationModel.from_fcn(params, state, names, TINY)
    rng = np.random.RandomState(7)
    cine = (rng.rand(48, 52, 3, 9) * 1000).astype(np.int16)

    eng_raw = InferenceEngine(model, chunk=8)
    eng_raw._bw = _fast()
    seg_raw = eng_raw.segment_sequence_fused(cine)
    assert eng_raw._stats.packed_dispatches == 0
    assert eng_raw._stats.h2d_bytes == cine.nbytes

    eng_pack = InferenceEngine(model, chunk=8)
    eng_pack._bw = _degraded()
    plan = transfer.plan_pack(cine, eng_pack._bw)
    assert plan is not None and plan.hi_bits == 2
    seg_pack = eng_pack.segment_sequence_fused(cine)
    np.testing.assert_array_equal(seg_pack, seg_raw)
    assert eng_pack._stats.packed_dispatches == 1
    assert eng_pack._stats.h2d_bytes < cine.nbytes
    assert eng_pack._stats.d2h_fetches == 1
    assert eng_pack._stats.d2h_bytes > 0


def test_engine_delta_dispatch_bit_identical():
    """A quiet cine routes through delta mode inside the fused deploy
    and still produces identical labels."""
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), TINY)
    model = SegmentationModel.from_fcn(params, state, names, TINY)
    rng = np.random.RandomState(11)
    base = (rng.rand(48, 52, 3, 1) * 3800).astype(np.int32)
    walk = rng.randint(-30, 31, size=(48, 52, 3, 12))
    walk[..., 0] = 0
    cine = np.clip(base + np.cumsum(walk, axis=-1), 0, 4095).astype(np.int16)

    eng_raw = InferenceEngine(model, chunk=8)
    eng_raw._bw = _fast()
    seg_raw = eng_raw.segment_sequence_fused(cine)

    eng_pack = InferenceEngine(model, chunk=8)
    eng_pack._bw = _degraded()
    assert transfer.plan_pack(cine, eng_pack._bw).mode == "delta"
    seg_pack = eng_pack.segment_sequence_fused(cine)
    np.testing.assert_array_equal(seg_pack, seg_raw)
    assert eng_pack._stats.delta_dispatches == 1


def test_aortic_packed_dispatch_bit_identical():
    cfg = unet_mod.UNetConfig(n_class=3, n_level=3, n_filter=(4, 8, 8),
                              n_block=(1, 1, 1))
    params, state, names = unet_mod.init_unet(jax.random.PRNGKey(0), cfg)
    params.update(convlstm.init_biconv_lstm(jax.random.PRNGKey(1), 4, 4, 3))
    from ukbb_cardiac_tpu.infer.deploy_ao import AorticEngine

    rng = np.random.RandomState(3)
    cine = (rng.rand(40, 44, 1, 6) * 1000).astype(np.int16)

    eng = AorticEngine("unet_lstm", cfg, names, params, state,
                       bidirectional=True)
    eng._bw = _fast()
    seg_raw = eng.segment_cine(cine, z_score=True, pad_to=48)
    eng._bw = _degraded()
    seg_pack = eng.segment_cine(cine, z_score=True, pad_to=48)
    np.testing.assert_array_equal(seg_pack, seg_raw)
    assert eng._stats.packed_dispatches == 1


def test_native_pack_into_matches_numpy():
    """pack_buffer's native one-pass path produces a bit-identical
    buffer to the numpy fallback, for int16/uint16 and ragged tails."""
    import unittest.mock as mock

    from ukbb_cardiac_tpu import native

    rng = np.random.RandomState(0)
    for dtype in (np.int16, np.uint16):
        for hi_bits, mx in ((2, 1024), (4, 4096)):
            for n in (8, 11, 100003):
                vals = rng.randint(0, mx, size=n).astype(dtype)
                plan = transfer.PackPlan((n,), np.dtype(dtype).str,
                                         "plane", hi_bits)
                got = transfer.pack_buffer(vals, plan)
                with mock.patch.object(native, "pack_lo_hi_i16_into",
                                       return_value=False):
                    want = transfer.pack_buffer(vals, plan)
                np.testing.assert_array_equal(got, want)
