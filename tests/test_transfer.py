"""Tests for the adaptive lossless transfer packing (infer/transfer.py).

The packed up-leg must be EXACT — the engines' voxel outputs with a
packed transfer are pinned bit-identical to the raw path.
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
def test_pack_roundtrip_exact(hi_max):
    rng = np.random.RandomState(0)
    img = rng.randint(0, hi_max + 1, size=(13, 17, 3, 5)).astype(np.int16)
    plan = transfer.plan_pack(img, _degraded())
    assert plan is not None
    expected_bits = 8 if hi_max == 255 else (10 if hi_max == 1023 else 12)
    assert plan.hi_bits == expected_bits - 8
    flat = img.reshape(-1)
    arrs = [a for i in range(plan.n_pieces)
            for a in transfer.pack_piece(flat, plan, i)]
    rec = np.asarray(transfer.unpack_jax([jnp.asarray(a) for a in arrs],
                                         plan))
    assert rec.dtype == img.dtype
    np.testing.assert_array_equal(rec, img)


def test_pack_multi_piece_roundtrip_exact(monkeypatch):
    # force several pieces by shrinking the piece size
    monkeypatch.setattr(transfer, "PACK_PIECE_BYTES", 1024)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 1000, size=(9, 11, 2, 7)).astype(np.int16)
    plan = transfer.plan_pack(img, _degraded())
    assert plan.n_pieces > 1
    flat = img.reshape(-1)
    arrs = [a for i in range(plan.n_pieces)
            for a in transfer.pack_piece(flat, plan, i)]
    rec = np.asarray(transfer.unpack_jax([jnp.asarray(a) for a in arrs],
                                         plan))
    np.testing.assert_array_equal(rec, img)
    assert transfer.packed_nbytes(plan) < img.nbytes


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
    cine = (rng.rand(48, 52, 3, 5) * 1000).astype(np.int16)

    eng_raw = InferenceEngine(model, chunk=8)
    eng_raw._bw = _fast()
    seg_raw = eng_raw.segment_sequence_fused(cine)

    eng_pack = InferenceEngine(model, chunk=8)
    eng_pack._bw = _degraded()
    plan = transfer.plan_pack(cine, eng_pack._bw)
    assert plan is not None and plan.hi_bits == 2
    seg_pack = eng_pack.segment_sequence_fused(cine)
    np.testing.assert_array_equal(seg_pack, seg_raw)


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


def test_native_pack_matches_numpy():
    """pack_piece's native one-pass path produces bit-identical planes to
    the numpy path, for both int16 and uint16 and ragged tails."""
    import unittest.mock as mock

    import numpy as np

    from ukbb_cardiac_tpu import native
    from ukbb_cardiac_tpu.infer import transfer

    rng = np.random.RandomState(0)
    for dtype in (np.int16, np.uint16):
        for hi_bits, mx in ((2, 1024), (4, 4096)):
            for n in (8, 11, 100003):
                vals = rng.randint(0, mx, size=n).astype(dtype)
                plan = transfer.PackPlan((n,), np.dtype(dtype).str,
                                         hi_bits, (0, n))
                got = transfer.pack_piece(vals, plan, 0)
                with mock.patch.object(native, "pack_lo_hi_i16",
                                       return_value=None):
                    want = transfer.pack_piece(vals, plan, 0)
                assert len(got) == len(want) == 2
                np.testing.assert_array_equal(got[0], want[0])
                np.testing.assert_array_equal(got[1], want[1])
