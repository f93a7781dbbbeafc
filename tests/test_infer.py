"""Tests for the batched inference engine and deploy twins."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ukbb_cardiac_tpu.ckpt import store
from ukbb_cardiac_tpu.infer import (
    InferenceEngine,
    SegmentationModel,
    deploy_dataset,
    deploy_dataset_ao,
    es_frame,
    pad_to_factor,
    window_weights,
)
from ukbb_cardiac_tpu.models import fcn as fcn_mod
from ukbb_cardiac_tpu.models import unet as unet_mod
from ukbb_cardiac_tpu.models import convlstm

import jax

from phantom import sax_phantom, write_subject


TINY = fcn_mod.FCNConfig(n_class=4, n_level=5, n_filter=(4, 8, 8, 8, 8),
                         n_block=(1, 1, 1, 1, 1), same_dim=4, fc=8)


@pytest.fixture(scope="module")
def tiny_fcn():
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), TINY)
    return params, state, names


def test_pad_to_factor_matches_reference_arithmetic():
    # deploy_network.py:97-100 semantics
    (xp, xq), (yp, yq) = pad_to_factor(90, 100, 16)
    assert (90 + xp + xq) % 16 == 0 and (100 + yp + yq) % 16 == 0
    assert xp == (96 - 90) // 2 and yp == (112 - 100) // 2
    # already-multiple is a no-op
    assert pad_to_factor(96, 112, 16) == ((0, 0), (0, 0))


def test_engine_batches_match_slicewise(tiny_fcn):
    params, state, names = tiny_fcn
    model = SegmentationModel.from_fcn(params, state, names, TINY)
    engine = InferenceEngine(model, chunk=8)
    rng = np.random.RandomState(0)
    slices = rng.rand(13, 40, 44).astype(np.float32)  # crosses chunk boundary
    pred = engine.run_slices(slices)
    assert pred.shape == (13, 40, 44)
    # batched result equals per-slice result (BN eval mode is batch-invariant)
    pred_one = engine.run_slices(slices[3:4])
    np.testing.assert_array_equal(pred[3], pred_one[0])


def test_engine_sequence_roundtrip(tiny_fcn):
    params, state, names = tiny_fcn
    model = SegmentationModel.from_fcn(params, state, names, TINY)
    engine = InferenceEngine(model, chunk=16)
    image = np.random.RandomState(1).rand(48, 52, 3, 4).astype(np.float32)
    seg = engine.segment_sequence(image)
    assert seg.shape == image.shape
    # frame t / slice z of the 4D path equals the 3D path on that volume
    vol = engine.segment_volume(image[:, :, :, 2])
    np.testing.assert_array_equal(seg[:, :, :, 2], vol)


def test_es_frame_rules():
    pred = np.zeros((4, 4, 1, 5))
    counts = [10, 8, 2, 5, 9]  # label-1 voxels per frame
    for t, c in enumerate(counts):
        pred[:, :, :, t].flat[:c] = 1
    assert es_frame(pred, "sa", False) == 2       # argmin for SA (LV)
    assert es_frame(pred, "la_4ch", True) == 2    # argmin for seg4
    assert es_frame(pred, "la_2ch", False) == 0   # argmax for LA views
    assert es_frame(pred, "la_4ch", False) == 0


def test_deploy_dataset_end_to_end(tmp_path, tiny_fcn):
    params, state, names = tiny_fcn
    bundle = str(tmp_path / "fcn_sa.npz")
    store.save_model(bundle, "fcn", TINY, names, params, state)

    data_dir = tmp_path / "data"
    write_subject(str(data_dir / "1000000"), seqs=("sa",), X=64, Y=72, Z=2, T=3)
    deploy_dataset(bundle, str(data_dir), seq_name="sa", chunk=8)

    subj = data_dir / "1000000"
    for f in ("seg_sa.nii.gz", "sa_ED.nii.gz", "sa_ES.nii.gz",
              "seg_sa_ED.nii.gz", "seg_sa_ES.nii.gz"):
        assert (subj / f).exists(), f
    from ukbb_cardiac_tpu.io import nifti
    seg = nifti.load(str(subj / "seg_sa.nii.gz"))
    assert seg.dataobj.shape == (64, 72, 2, 3)
    assert set(np.unique(seg.dataobj)) <= {0.0, 1.0, 2.0, 3.0}
    # idempotent resume: second run skips (no exception, file untouched)
    mtime = os.path.getmtime(subj / "seg_sa.nii.gz")
    deploy_dataset(bundle, str(data_dir), seq_name="sa", chunk=8)
    assert os.path.getmtime(subj / "seg_sa.nii.gz") == mtime


def test_window_weights_triangular():
    w = window_weights(5, 1.0)
    assert len(w) == 9
    assert w[4] == 1.0 and w[0] == pytest.approx(0.2) and np.all(np.diff(w[:5]) > 0)
    # r=0 → flat window (reference default weight_r flag)
    np.testing.assert_allclose(window_weights(5, 0.0), np.ones(9))


TINY_AO = unet_mod.UNetConfig(n_class=3, n_level=3, n_filter=(4, 8, 8), n_block=(1, 1, 1))


def _tiny_unet_lstm_bundle(path):
    key = jax.random.PRNGKey(0)
    params, state, names = unet_mod.init_unet(key, TINY_AO)
    lstm = convlstm.init_biconv_lstm(jax.random.PRNGKey(1), TINY_AO.n_filter[0], 8,
                                     TINY_AO.n_class)
    params.update(lstm)
    store.save_model(path, "unet_lstm", TINY_AO, names, params, state,
                     extra_meta={"bidirectional": True})


def test_deploy_ao_full_scan_vs_compat(tmp_path):
    bundle = str(tmp_path / "unet_lstm_ao.npz")
    _tiny_unet_lstm_bundle(bundle)
    data_dir = tmp_path / "data"
    write_subject(str(data_dir / "2000000"), seqs=("ao",), X=60, Y=64, T=6)

    deploy_dataset_ao(bundle, str(data_dir), window="full", weight_R=2)
    from ukbb_cardiac_tpu.io import nifti
    seg = nifti.load(str(data_dir / "2000000" / "seg_ao.nii.gz"))
    assert seg.dataobj.shape == (60, 64, 1, 6)
    assert set(np.unique(seg.dataobj)) <= {0.0, 1.0, 2.0}

    # compat (windowed) mode also runs and produces the same shape
    os.remove(data_dir / "2000000" / "seg_ao.nii.gz")
    deploy_dataset_ao(bundle, str(data_dir), window="compat", weight_R=2)
    seg2 = nifti.load(str(data_dir / "2000000" / "seg_ao.nii.gz"))
    assert seg2.dataobj.shape == (60, 64, 1, 6)


def test_fused_path_matches_host_path(tiny_fcn):
    """Device-fused rescale+segment equals the host rescale + batched path."""
    params, state, names = tiny_fcn
    model = SegmentationModel.from_fcn(params, state, names, TINY)
    engine = InferenceEngine(model, chunk=8)
    rng = np.random.RandomState(7)
    cine = (rng.rand(48, 52, 3, 5) * 1000).astype(np.float32)

    from ukbb_cardiac_tpu.ops import rescale_intensity
    host = engine.segment_sequence(rescale_intensity(cine, (1.0, 99.0)))
    fused = engine.segment_sequence_fused(cine)
    assert fused.shape == host.shape
    agree = np.mean(fused == host)
    assert agree > 0.999, agree  # device/host percentile float differences only


def test_fused_path_int16_matches_f32(tiny_fcn):
    """An int16 cine through the fused deploy (16-round percentile fast
    path) segments identically to the same cine shipped as f32 (32-round
    path) — the integer order statistics are exact, so the normalised
    image and every downstream label must match bit-for-bit."""
    params, state, names = tiny_fcn
    model = SegmentationModel.from_fcn(params, state, names, TINY)
    engine = InferenceEngine(model, chunk=8)
    rng = np.random.RandomState(11)
    cine = (rng.rand(48, 52, 3, 5) * 2000 - 300).astype(np.int16)

    seg_i16 = engine.segment_sequence_fused(cine)
    seg_f32 = engine.segment_sequence_fused(cine.astype(np.float32))
    np.testing.assert_array_equal(seg_i16, seg_f32)


def test_deploy_ao_ed_es_mode(tmp_path):
    """UNet frame-wise ED/ES aortic mode (deploy_network_ao.py:206-268)."""
    from ukbb_cardiac_tpu.models import unet as unet_mod
    from ukbb_cardiac_tpu.io import nifti
    from phantom import ao_phantom

    key = jax.random.PRNGKey(0)
    params, state, names = unet_mod.init_unet(key, TINY_AO)
    bundle = str(tmp_path / "unet_ao.npz")
    store.save_model(bundle, "unet", TINY_AO, names, params, state)

    data_dir = tmp_path / "data"
    subj = data_dir / "9"
    subj.mkdir(parents=True)
    image, _ = ao_phantom(48, 48, 4)
    affine = np.diag([1.0, 1.0, 10.0, 1.0])
    for fr, t in (("ED", 0), ("ES", 2)):
        nifti.save(nifti.Nifti1Image(image[:, :, :, t], affine),
                   str(subj / f"ao_{fr}.nii.gz"))
    deploy_dataset_ao(bundle, str(data_dir), process_seq=False)
    for fr in ("ED", "ES"):
        seg = nifti.load(str(subj / f"seg_ao_{fr}.nii.gz"))
        assert seg.dataobj.shape == (48, 48, 1)


def test_fused_path_int16_input(tiny_fcn):
    """Native-dtype transfer path: int16 cine gives identical labels to
    the same data as float32."""
    params, state, names = tiny_fcn
    model = SegmentationModel.from_fcn(params, state, names, TINY)
    engine = InferenceEngine(model, chunk=8)
    rng = np.random.RandomState(11)
    cine16 = (rng.rand(48, 52, 3, 4) * 1000).astype(np.int16)
    seg_a = engine.segment_sequence_fused(cine16)
    seg_b = engine.segment_sequence_fused(cine16.astype(np.float32))
    np.testing.assert_array_equal(seg_a, seg_b)


def test_deploy_ed_es_mode_sa(tmp_path, tiny_fcn):
    """ED/ES-only SA mode (deploy_network.py:152-216): segments the two
    still frames and writes seg_<seq>_{ED,ES}."""
    params, state, names = tiny_fcn
    bundle = str(tmp_path / "fcn_sa.npz")
    store.save_model(bundle, "fcn", TINY, names, params, state)

    from ukbb_cardiac_tpu.io import nifti
    data_dir = tmp_path / "data"
    data = write_subject(str(data_dir / "8"), seqs=("sa",), X=48, Y=48, Z=2, T=3)
    subj = data_dir / "8"
    image, _ = data["sa"]
    affine = nifti.load(str(subj / "sa.nii.gz")).affine
    for fr, t in (("ED", 0), ("ES", 1)):
        nifti.save(nifti.Nifti1Image(image[:, :, :, t], affine),
                   str(subj / f"sa_{fr}.nii.gz"))

    deploy_dataset(bundle, str(data_dir), seq_name="sa", process_seq=False,
                   chunk=4)
    for fr in ("ED", "ES"):
        seg = nifti.load(str(subj / f"seg_sa_{fr}.nii.gz"))
        assert seg.dataobj.shape == (48, 48, 2)


def test_deploy_ao_temporal_unet(tmp_path):
    """Temporal-UNet bundles route through the 3D-conv path, not the LSTM."""
    from ukbb_cardiac_tpu.models import unet as unet_mod
    from ukbb_cardiac_tpu.infer.deploy_ao import AorticEngine
    from phantom import ao_phantom

    cfg3 = unet_mod.UNetConfig(n_class=3, n_level=2, n_filter=(4, 4),
                               n_block=(1, 1))
    params, state, names = unet_mod.init_unet(jax.random.PRNGKey(0), cfg3,
                                              conv3d_=True)
    eng = AorticEngine("temporal_unet", cfg3, names, params, state)
    image, _ = ao_phantom(48, 48, 4)
    seg = eng.segment_cine(image.astype(np.int16), z_score=True, pad_to=48)
    assert seg.shape == (48, 48, 1, 4)
    assert set(np.unique(seg)) <= {0, 1, 2}


def test_dispatch_matches_fused_and_overlaps(tiny_fcn):
    """Async dispatch handles resolve to exactly the fused result, and
    several can be in flight at once."""
    params, state, names = tiny_fcn
    model = SegmentationModel.from_fcn(params, state, names, TINY)
    engine = InferenceEngine(model, chunk=8)
    rng = np.random.RandomState(11)
    cines = [(rng.rand(48, 52, 2, 4) * 1000).astype(np.int16)
             for _ in range(3)]
    handles = [engine.segment_sequence_dispatch(c) for c in cines]
    fused = [engine.segment_sequence_fused(c) for c in cines]
    for h, f in zip(handles, fused):
        np.testing.assert_array_equal(h.result(), f)


def test_deploy_dataset_pipelined_multi_subject(tmp_path, tiny_fcn):
    """The one-deep deploy pipeline writes every subject's outputs
    (including the last, which drains after the loop)."""
    params, state, names = tiny_fcn
    bundle = str(tmp_path / "fcn_sa.npz")
    store.save_model(bundle, "fcn", TINY, names, params, state)

    data_dir = tmp_path / "data"
    eids = ["1000000", "1000001", "1000002"]
    for eid in eids:
        write_subject(str(data_dir / eid), seqs=("sa",), X=64, Y=72, Z=2, T=3)
    # middle subject already segmented -> skipped, pipeline must not stall
    (data_dir / "1000001" / "seg_sa.nii.gz").write_bytes(b"")
    deploy_dataset(bundle, str(data_dir), seq_name="sa", chunk=8)
    for eid in ("1000000", "1000002"):
        for f in ("seg_sa.nii.gz", "sa_ED.nii.gz", "seg_sa_ES.nii.gz"):
            assert (data_dir / eid / f).exists(), (eid, f)
    assert (data_dir / "1000001" / "seg_sa.nii.gz").stat().st_size == 0


def test_deploy_dataset_ao_pipelined_multi_subject(tmp_path):
    """Aortic fused deploy pipeline covers all subjects incl. skips."""
    cfg = unet_mod.UNetConfig(n_class=3, n_level=3, n_filter=(4, 8, 16),
                              n_block=(1, 1, 1))
    params, state, names = unet_mod.init_unet(jax.random.PRNGKey(0), cfg)
    params.update(convlstm.init_biconv_lstm(jax.random.PRNGKey(1), 4, 4, 3))
    bundle = str(tmp_path / "unet_lstm_ao.npz")
    store.save_model(bundle, "unet_lstm", cfg, names, params, state,
                     extra_meta={"bidirectional": True})
    data_dir = tmp_path / "data"
    for eid in ("2000000", "2000001"):
        write_subject(str(data_dir / eid), seqs=("ao",), X=40, Y=44, Z=1, T=4)
    deploy_dataset_ao(bundle, str(data_dir), window="full")
    from ukbb_cardiac_tpu.io import nifti
    for eid in ("2000000", "2000001"):
        seg = nifti.load(str(data_dir / eid / "seg_ao.nii.gz"))
        assert seg.dataobj.shape == (40, 44, 1, 4)


def test_deploy_3d_image_single_frame(tmp_path, tiny_fcn):
    """A 3D (X, Y, Z) image deploys as a single-frame sequence
    (deploy_network.py handles both; the T axis is synthesised)."""
    from ukbb_cardiac_tpu.io import nifti as nifti_mod
    from ukbb_cardiac_tpu.infer.deploy import deploy_subject_sequence
    params, state, names = tiny_fcn
    model = SegmentationModel.from_fcn(params, state, names, TINY)
    engine = InferenceEngine(model, chunk=8)
    rng = np.random.RandomState(2)
    vol = (rng.rand(48, 52, 3) * 1000).astype(np.int16)
    subj = tmp_path / "s"
    subj.mkdir()
    nifti_mod.save(nifti_mod.Nifti1Image(vol.astype(np.float64),
                                         np.diag([1.8, 1.8, 10.0, 1.0])),
                   str(subj / "sa.nii.gz"))
    t = deploy_subject_sequence(engine, str(subj), "sa")
    assert t is not None
    seg = np.asanyarray(nifti_mod.load(str(subj / "seg_sa.nii.gz")).dataobj)
    assert seg.shape == (48, 52, 3, 1)


def test_deploy_dataset_mixed_shapes(tmp_path, tiny_fcn):
    """Subjects with different Z/T compile separate fused programs but
    pipeline through the same engine without interference."""
    params, state, names = tiny_fcn
    bundle = str(tmp_path / "fcn_sa.npz")
    store.save_model(bundle, "fcn", TINY, names, params, state)
    data_dir = tmp_path / "data"
    write_subject(str(data_dir / "a"), seqs=("sa",), X=64, Y=72, Z=2, T=3)
    write_subject(str(data_dir / "b"), seqs=("sa",), X=64, Y=72, Z=3, T=2)
    write_subject(str(data_dir / "c"), seqs=("sa",), X=48, Y=56, Z=2, T=4)
    deploy_dataset(bundle, str(data_dir), seq_name="sa", chunk=8)
    from ukbb_cardiac_tpu.io import nifti
    for eid, shape in (("a", (64, 72, 2, 3)), ("b", (64, 72, 3, 2)),
                       ("c", (48, 56, 2, 4))):
        seg = nifti.load(str(data_dir / eid / "seg_sa.nii.gz"))
        assert seg.dataobj.shape == shape, eid


def test_from_unet_forward_uses_passed_params():
    """from_unet's forward must run with the params/state it is CALLED
    with, not the construction-time ones (regression: the closure used to
    capture the outer pytrees, silently ignoring updated weights and
    baking them into jitted programs as constants)."""
    params, state, names = unet_mod.init_unet(jax.random.PRNGKey(0), TINY_AO)
    model = SegmentationModel.from_unet(params, state, names, TINY_AO)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 1),
                    dtype=jnp.float32)
    base = model.forward(params, state, x)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    out_zero = model.forward(zeroed, state, x)
    assert not np.allclose(np.asarray(base), np.asarray(out_zero))


def test_segment_cine_packs_wide_label_sets(tmp_path):
    """segment_cine's packed readback must scale its bit width with
    n_class (regression: 2-bit packing was hard-coded, truncating labels
    >= 4 modulo 4)."""
    from ukbb_cardiac_tpu.infer.deploy_ao import AorticEngine

    cfg5 = unet_mod.UNetConfig(n_class=5, n_level=2, n_filter=(4, 4),
                               n_block=(1, 1))
    params, state, names = unet_mod.init_unet(jax.random.PRNGKey(2), cfg5,
                                              conv3d_=True)
    eng = AorticEngine("temporal_unet", cfg5, names, params, state)
    rng = np.random.RandomState(3)
    image = (rng.rand(48, 48, 1, 4) * 1000).astype(np.int16)
    seg = eng.segment_cine(image, z_score=True, pad_to=48)
    # compare against the unpacked prob path on the SAME device-side
    # normalisation: identical labels, incl. >= 4
    from ukbb_cardiac_tpu.ops import normalise_intensity_jax

    norm = np.asarray(normalise_intensity_jax(
        jnp.asarray(image, dtype=jnp.float32), 10.0))
    prob = eng.prob_sequence(norm, window="full")
    ref = np.argmax(prob, axis=-1).astype(np.uint8)
    np.testing.assert_array_equal(seg, ref)
    assert seg.max() == 4  # labels above the old 2-bit ceiling survive


def test_compat_window_short_cine_duplicate_frames():
    """T shorter than the sliding window makes the circular index list
    contain DUPLICATE frames; the triangular blend must accumulate every
    contribution (buffered fancy-index += keeps only the last) and the
    normalised probabilities must still sum to 1."""
    import jax

    from ukbb_cardiac_tpu.infer.deploy_ao import AorticEngine
    from ukbb_cardiac_tpu.models import convlstm, unet as unet_mod

    cfg = unet_mod.UNetConfig(n_class=3, n_level=2, n_filter=(4, 4),
                              n_block=(1, 1))
    params, state, names = unet_mod.init_unet(jax.random.PRNGKey(0), cfg)
    params.update(convlstm.init_biconv_lstm(jax.random.PRNGKey(1),
                                            cfg.n_filter[0], 4, cfg.n_class))
    eng = AorticEngine("unet_lstm", cfg, names, params, state,
                       bidirectional=True)
    rng = np.random.RandomState(3)
    # T=3 < window 2*2-1=3? use weight_R=3 -> window 5 > T=3
    cine = rng.rand(24, 24, 1, 3).astype(np.float32)
    prob = eng.prob_sequence(cine, weight_R=3, weight_r=1.0, time_step=1,
                             window="compat")
    assert prob.shape == (24, 24, 1, 3, 3)
    np.testing.assert_allclose(prob.sum(axis=-1), 1.0, atol=1e-4)
    assert np.isfinite(prob).all()


def test_pad_stack_empty_raises():
    """An empty subject stack raises a clear ValueError rather than an
    opaque ZeroDivisionError (ADVICE r2)."""
    import pytest

    from ukbb_cardiac_tpu.infer.engine import pad_stack_to_multiple

    with pytest.raises(ValueError, match="empty subject stack"):
        pad_stack_to_multiple(np.zeros((0, 8, 8), np.float32), 4)
