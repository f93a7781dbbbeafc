"""Data augmentation.

Reference semantics: ``common/image_utils.py:80-168`` (``data_augmenter``
per-slice, ``aortic_data_augmenter`` sequence-consistent).  The reference
does this on host with cv2 + scipy per slice inside the training loop — a
major input-pipeline bottleneck (SURVEY.md §3.3).  Here the same random
affine model (Gaussian-clipped shift/rotate/scale/intensity + random flip)
runs **on device**: one jitted, vmapped program over the whole batch, keyed
by ``jax.random`` so it is reproducible and trace-safe.

A host/numpy twin is kept for parity tests and CPU-only data preparation.
One documented twin divergence: with ``flip=True`` the HOST
``aortic_data_augmenter`` reproduces the reference's per-frame flip
re-draw quirk (``image_utils.py:161-167``), while the device
``aortic_data_augmenter_jax`` consciously draws one flip per sequence
(see its docstring) — so flip-enabled aortic runs are not bit-comparable
between the twins; every other parameter is.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from ukbb_cardiac_tpu.ops.resample import affine_transform_2d


def _rotation_matrix(centre, angle_deg, scale):
    """cv2.getRotationMatrix2D-compatible 2x3 matrix (numpy, float64)."""
    angle = math.radians(angle_deg)
    a = scale * math.cos(angle)
    b = scale * math.sin(angle)
    cx, cy = centre
    return np.array(
        [[a, b, (1 - a) * cx - b * cy], [-b, a, b * cx + (1 - a) * cy]], dtype=np.float64
    )


def data_augmenter(image, label, shift, rotate, scale, intensity, flip, rng=None):
    """Host twin of the reference augmenter (``image_utils.py:80-120``).

    image: (N, X, Y, C) float; label: (N, X, Y) int.  Each slice gets an
    independent random affine; Gaussian draws are clipped to ±3σ.
    """
    rng = np.random if rng is None else rng
    image = np.asarray(image)
    label = np.asarray(label)
    image2 = np.zeros(image.shape, dtype=np.float32)
    label2 = np.zeros(label.shape, dtype=np.int32)
    for i in range(image.shape[0]):
        shift_val = [np.clip(rng.normal(), -3, 3) * shift, np.clip(rng.normal(), -3, 3) * shift]
        rotate_val = np.clip(rng.normal(), -3, 3) * rotate
        scale_val = 1 + np.clip(rng.normal(), -3, 3) * scale
        intensity_val = 1 + np.clip(rng.normal(), -3, 3) * intensity

        row, col = image.shape[1:3]
        M = _rotation_matrix((row / 2, col / 2), rotate_val, 1.0 / scale_val)
        M[:, 2] += shift_val
        for c in range(image.shape[3]):
            image2[i, :, :, c] = ndimage.affine_transform(image[i, :, :, c], M[:, :2], M[:, 2], order=1)
        label2[i, :, :] = ndimage.affine_transform(label[i, :, :], M[:, :2], M[:, 2], order=0)
        image2[i] *= intensity_val

        if flip:
            if rng.uniform() >= 0.5:
                image2[i] = image2[i, ::-1, :, :]
                label2[i] = label2[i, ::-1, :]
            else:
                image2[i] = image2[i, :, ::-1, :]
                label2[i] = label2[i, :, ::-1]
    return image2, label2


def _sample_params(key, shift, rotate, scale, intensity):
    k = jax.random.split(key, 5)
    clip = lambda kk: jnp.clip(jax.random.normal(kk), -3, 3)
    shift_val = jnp.stack([clip(k[0]) * shift, clip(k[1]) * shift])
    rotate_val = clip(k[2]) * rotate
    scale_val = 1 + clip(k[3]) * scale
    intensity_val = 1 + clip(k[4]) * intensity
    return shift_val, rotate_val, scale_val, intensity_val


def _affine_from_params(row, col, shift_val, rotate_val, scale_val):
    """Traced 2x3 affine identical to cv2.getRotationMatrix2D + shift."""
    angle = rotate_val * (jnp.pi / 180.0)
    s = 1.0 / scale_val
    a = s * jnp.cos(angle)
    b = s * jnp.sin(angle)
    cx, cy = row / 2.0, col / 2.0
    matrix = jnp.array([[1.0, 0.0], [0.0, 1.0]]) * a + jnp.array([[0.0, 1.0], [-1.0, 0.0]]) * b
    offset = jnp.stack(
        [(1 - a) * cx - b * cy + shift_val[0], b * cx + (1 - a) * cy + shift_val[1]]
    )
    return matrix, offset


def _augment_one(key, image, label, shift, rotate, scale, intensity, flip,
                 sample_dtype=None):
    """image: (X, Y, C); label: (X, Y)."""
    kp, kf = jax.random.split(key)
    shift_val, rotate_val, scale_val, intensity_val = _sample_params(
        kp, shift, rotate, scale, intensity
    )
    row, col = image.shape[0], image.shape[1]
    matrix, offset = _affine_from_params(row, col, shift_val, rotate_val, scale_val)

    img2 = jax.vmap(lambda ch: affine_transform_2d(ch, matrix, offset, order=1,
                                                   sample_dtype=sample_dtype),
                    in_axes=2, out_axes=2)(image.astype(jnp.float32))
    lab2 = affine_transform_2d(label.astype(jnp.float32), matrix, offset, order=0,
                               sample_dtype=sample_dtype).astype(jnp.int32)
    img2 = img2 * intensity_val

    if flip:
        flip_x = jax.random.uniform(kf) >= 0.5
        img2 = jnp.where(flip_x, img2[::-1, :, :], img2[:, ::-1, :])
        lab2 = jnp.where(flip_x, lab2[::-1, :], lab2[:, ::-1])
    return img2, lab2


def data_augmenter_jax(key, image, label, shift, rotate, scale, intensity, flip,
                       sample_dtype=None):
    """Device augmenter, independent transform per slice (N, X, Y, C)/(N, X, Y).

    ``sample_dtype``: interpolation matmul dtype (see
    ``resample.tent_sample_2d``).  bf16 halves the warp's HBM traffic;
    the nearest-neighbour label path is exact either way, image values
    pick up ~4e-3 relative interpolation noise — immaterial for
    augmentation (the transform itself is random)."""
    keys = jax.random.split(key, image.shape[0])
    return jax.vmap(
        lambda k, im, la: _augment_one(k, im, la, shift, rotate, scale,
                                       intensity, flip, sample_dtype)
    )(keys, jnp.asarray(image), jnp.asarray(label))


def aortic_data_augmenter(image, label, shift, rotate, scale, intensity, flip, rng=None):
    """Host twin of the sequence-consistent augmenter (``image_utils.py:123-168``):
    one transform shared by all N frames of a subject."""
    rng = np.random if rng is None else rng
    image = np.asarray(image)
    label = np.asarray(label)
    image2 = np.zeros(image.shape, dtype=np.float32)
    label2 = np.zeros(label.shape, dtype=np.int32)
    shift_val = [np.clip(rng.normal(), -3, 3) * shift, np.clip(rng.normal(), -3, 3) * shift]
    rotate_val = np.clip(rng.normal(), -3, 3) * rotate
    scale_val = 1 + np.clip(rng.normal(), -3, 3) * scale
    intensity_val = 1 + np.clip(rng.normal(), -3, 3) * intensity

    row, col = image.shape[1:3]
    M = _rotation_matrix((row / 2, col / 2), rotate_val, 1.0 / scale_val)
    M[:, 2] += shift_val
    for i in range(image.shape[0]):
        for c in range(image.shape[3]):
            image2[i, :, :, c] = ndimage.affine_transform(image[i, :, :, c], M[:, :2], M[:, 2], order=1)
        label2[i, :, :] = ndimage.affine_transform(label[i, :, :], M[:, :2], M[:, 2], order=0)
        image2[i] *= intensity_val
        if flip:
            if rng.uniform() >= 0.5:
                image2[i] = image2[i, ::-1, :, :]
                label2[i] = label2[i, ::-1, :]
            else:
                image2[i] = image2[i, :, ::-1, :]
                label2[i] = label2[i, :, ::-1]
    return image2, label2


def aortic_data_augmenter_jax(key, image, label, shift, rotate, scale, intensity, flip,
                              sample_dtype=None):
    """Device sequence-consistent augmenter: one transform for all frames.

    Note: the reference re-draws the flip direction per frame even in the
    "subject-consistent" variant (``image_utils.py:161-167``) — a quirk that
    can flip half a sequence one way and half the other.  We consciously fix
    it here: one flip decision per sequence (documented deviation).

    ``sample_dtype``: interpolation matmul dtype (see
    :func:`data_augmenter_jax`).
    """
    kp, kf = jax.random.split(key)
    shift_val, rotate_val, scale_val, intensity_val = _sample_params(
        kp, shift, rotate, scale, intensity
    )
    row, col = image.shape[1], image.shape[2]
    matrix, offset = _affine_from_params(row, col, shift_val, rotate_val, scale_val)

    def one(im, la):
        img2 = jax.vmap(
            lambda ch: affine_transform_2d(ch, matrix, offset, order=1,
                                           sample_dtype=sample_dtype),
            in_axes=2, out_axes=2
        )(im.astype(jnp.float32))
        lab2 = affine_transform_2d(la.astype(jnp.float32), matrix, offset, order=0,
                                   sample_dtype=sample_dtype).astype(jnp.int32)
        return img2 * intensity_val, lab2

    img2, lab2 = jax.vmap(one)(jnp.asarray(image), jnp.asarray(label))
    if flip:
        flip_x = jax.random.uniform(kf) >= 0.5
        img2 = jnp.where(flip_x, img2[:, ::-1, :, :], img2[:, :, ::-1, :])
        lab2 = jnp.where(flip_x, lab2[:, ::-1, :], lab2[:, :, ::-1])
    return img2, lab2


def aortic_batch_augmenter_jax(key, images, labels, shift, rotate, scale,
                               intensity, flip, sample_dtype=None):
    """Batch of windows (B, T, X, Y, C)/(B, T, X, Y): an independent
    sequence-consistent transform per window — the device twin of drawing
    ``aortic_data_augmenter`` once per window in the host sampler
    (``train_network_ao.py:190-196``)."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(
        lambda k, im, la: aortic_data_augmenter_jax(
            k, im, la, shift, rotate, scale, intensity, flip, sample_dtype)
    )(keys, jnp.asarray(images), jnp.asarray(labels))
