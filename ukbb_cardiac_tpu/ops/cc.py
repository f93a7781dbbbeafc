"""Connected-component utilities.

Reference semantics: ``common/image_utils.py:227-249`` (``get_largest_cc``,
``remove_small_cc``) and the QC fragmentation criterion
(``cardiac_utils.py:1629-1643``).  2D masks route through the native
C++ union-find library (``ukbb_cardiac_tpu/native``) when available —
these run O(labels x frames) per subject in the QC gates — with scipy as
the always-correct fallback; 3D inputs use scipy.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

from ukbb_cardiac_tpu import native


def _use_native(binary) -> bool:
    return binary.ndim == 2 and native.available()


def get_largest_cc(binary):
    """Largest foreground connected component as a boolean mask
    (4-connectivity, matching scipy.ndimage.label defaults)."""
    binary = np.asarray(binary)
    if _use_native(binary):
        return native.largest_cc_2d(binary, connectivity=1)
    cc, n_cc = ndimage.label(binary)
    if n_cc == 0:
        return np.zeros_like(binary, dtype=bool)
    areas = np.bincount(cc.ravel())[1:]  # skip background
    return cc == (int(np.argmax(areas)) + 1)


def label_cc(binary, connectivity=1):
    """Connected-component labelling with selectable connectivity.

    connectivity=1 → faces only (scipy default, used by get_largest_cc);
    connectivity=ndim → full neighbourhood (the ``skimage.measure.label(
    ..., connectivity=2)`` the reference QC gates use,
    ``cardiac_utils.py:1633,1770``). Returns (labels, n)."""
    binary = np.asarray(binary)
    structure = ndimage.generate_binary_structure(binary.ndim, connectivity)
    return ndimage.label(binary, structure=structure)


def count_significant_cc(binary, pixel_thres=10, connectivity=2):
    """Number of connected components larger than ``pixel_thres`` pixels
    (the reference's fragmentation criterion, ``cardiac_utils.py:1629-1643``)."""
    binary = np.asarray(binary)
    if _use_native(binary):
        return native.count_significant_cc_2d(binary, pixel_thres, connectivity)
    cc, n_cc = label_cc(binary, connectivity)
    if n_cc == 0:
        return 0
    areas = np.bincount(cc.ravel())[1:]
    return int(np.sum(areas > pixel_thres))


def remove_small_cc(binary, thres=10):
    """Zero out connected components smaller than `thres` pixels."""
    binary = np.asarray(binary)
    if _use_native(binary):
        # the native routine returns the kept-region MASK; preserve the
        # input's voxel values like the scipy path and the reference
        # (image_utils.py:244 copies the input) so both backends agree
        kept = native.remove_small_cc_2d(binary, thres, connectivity=1)
        out = np.copy(binary)
        out[kept == 0] = 0
        return out
    cc, n_cc = ndimage.label(binary)
    if n_cc == 0:
        return np.copy(binary)
    areas = np.bincount(cc.ravel())
    small = areas < thres
    small[0] = False
    out = np.copy(binary)
    out[small[cc]] = 0
    return out


def get_trusted_mask(label_map, radius=5):
    """Trusted-region mask: union of eroded foreground and eroded
    background (``train_network_ao.py:81-95``).

    Pixels near the foreground/background boundary — where a propagated
    label from another time frame is least reliable — are zeroed; the
    erosion uses an elliptical structuring element of size
    ``2*radius - 1``, matching cv2's MORPH_ELLIPSE.
    """
    label_map = np.asarray(label_map)
    fg = (label_map > 0).astype(np.uint8)
    size = radius * 2 - 1
    try:
        import cv2
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size))
        fg2 = cv2.erode(fg, kernel)
        bg2 = cv2.erode(1 - fg, kernel)
    except ImportError:
        # cv2's MORPH_ELLIPSE: row i keeps |dx| <= r*sqrt(1-(dy/r)^2)
        r = (size - 1) / 2.0
        dy, dx = np.mgrid[-r:r + 1, -r:r + 1]
        with np.errstate(invalid="ignore"):
            kernel = (np.abs(dx) <= r * np.sqrt(
                np.maximum(0.0, 1.0 - (dy / r) ** 2)) + 1e-9)
        fg2 = ndimage.binary_erosion(fg, structure=kernel, border_value=1)
        bg2 = ndimage.binary_erosion(1 - fg, structure=kernel, border_value=1)
    return np.logical_or(fg2, bg2).astype(np.int8)
