"""Intensity normalisation ops.

Reference semantics: ``common/image_utils.py:60-77`` (``normalise_intensity``,
``rescale_intensity``).  The reference's ``rescale_intensity`` mutates its
input array in place (``image_utils.py:73-75``); these implementations are
pure — same output values, no mutation.  Both numpy (host) and jnp (device,
jit-safe) versions are provided; the jnp versions run inside the deploy
engine's single device program.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rescale_intensity(image, thres=(1.0, 99.0)):
    """Clip to [p_lo, p_hi] percentiles and rescale to [0, 1] (host/numpy)."""
    image = np.asarray(image)
    val_l, val_h = np.percentile(image, thres)
    out = np.clip(image, val_l, val_h)
    return (out.astype(np.float32) - val_l) / (val_h - val_l)


def rescale_intensity_jax(image, thres=(1.0, 99.0)):
    """Device version of :func:`rescale_intensity`; jit/vmap friendly."""
    image = jnp.asarray(image)
    val_l = jnp.percentile(image.astype(jnp.float32), thres[0])
    val_h = jnp.percentile(image.astype(jnp.float32), thres[1])
    out = jnp.clip(image.astype(jnp.float32), val_l, val_h)
    return (out - val_l) / (val_h - val_l)


def normalise_intensity(image, thres_roi=10.0):
    """Z-score normalise over the ROI of voxels >= thres_roi-th percentile (host)."""
    image = np.asarray(image)
    val_l = np.percentile(image, thres_roi)
    roi = image >= val_l
    mu, sigma = np.mean(image[roi]), np.std(image[roi])
    eps = 1e-6
    return (image - mu) / (sigma + eps)


def normalise_intensity_jax(image, thres_roi=10.0):
    """Device version of :func:`normalise_intensity`.

    Boolean-mask indexing is not jit-compatible, so the ROI mean/std are
    computed with masked reductions (identical result).
    """
    image = jnp.asarray(image).astype(jnp.float32)
    val_l = jnp.percentile(image, thres_roi)
    roi = (image >= val_l).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(roi), 1.0)
    mu = jnp.sum(image * roi) / n
    var = jnp.sum(roi * (image - mu) ** 2) / n
    sigma = jnp.sqrt(var)
    eps = 1e-6
    return (image - mu) / (sigma + eps)
