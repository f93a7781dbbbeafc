"""On-device image resampling.

JAX equivalents of the interpolation the reference gets from scipy
(``image_utils.py:102-107`` affine warps) and from ``mirtk transform-image``
(``cardiac_utils.py:850,852``): linear and nearest-neighbour sampling on a
dense coordinate grid.  Everything is jit/vmap-safe with static shapes; the
registration module builds its warp on top of these.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def sample_2d(image, coords_x, coords_y, order=1, cval=0.0):
    """Sample `image[x, y]` at float coordinates; order 0 (NN) or 1 (linear)."""
    return map_coordinates(image, [coords_x, coords_y], order=order, mode="constant", cval=cval)


def affine_transform_2d(image, matrix, offset, order=1, cval=0.0):
    """Pull-back affine warp: out[i] = image[matrix @ i + offset].

    Matches ``scipy.ndimage.affine_transform(image, matrix, offset, order)``
    as used by the reference augmenter (``image_utils.py:102-107``).
    """
    X, Y = image.shape
    xs = jnp.arange(X, dtype=jnp.float32)
    ys = jnp.arange(Y, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    sx = matrix[0, 0] * gx + matrix[0, 1] * gy + offset[0]
    sy = matrix[1, 0] * gx + matrix[1, 1] * gy + offset[1]
    return sample_2d(image, sx, sy, order=order, cval=cval)


def warp_image_2d(image, disp, order=1, cval=0.0):
    """Warp by a dense displacement field: out[i] = image[i + disp[i]].

    `disp` has shape (2, X, Y) in voxel units — the TPU-era replacement for
    ``mirtk transform-image`` with a free-form deformation.
    """
    X, Y = image.shape
    gx, gy = jnp.meshgrid(
        jnp.arange(X, dtype=jnp.float32), jnp.arange(Y, dtype=jnp.float32), indexing="ij"
    )
    return sample_2d(image, gx + disp[0], gy + disp[1], order=order, cval=cval)
