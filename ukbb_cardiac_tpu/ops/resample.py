"""On-device image resampling.

JAX equivalents of the interpolation the reference gets from scipy
(``image_utils.py:102-107`` affine warps) and from ``mirtk transform-image``
(``cardiac_utils.py:850,852``): linear and nearest-neighbour sampling on a
dense coordinate grid.  Everything is jit/vmap-safe with static shapes; the
registration module builds its warp on top of these.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def sample_2d(image, coords_x, coords_y, order=1, cval=0.0):
    """Sample `image[x, y]` at float coordinates; order 0 (NN) or 1 (linear)."""
    return map_coordinates(image, [coords_x, coords_y], order=order, mode="constant", cval=cval)


def tent_sample_2d(image, cx, cy, precision="float32", dtype=None):
    """Bilinear sampling as tent-basis matmuls (MXU path).

    Arbitrary-index gathers lower to scalar loads on TPU (~8 ns/element —
    they dominated both the registration warp and the on-device training
    augmenter, measured); the same bilinear interpolation written as
    ``out = Σ_rk img[r,k]·tent(cx-r)·tent(cy-k)`` is two matmuls XLA
    tiles onto the MXU (see ``reg/register.py`` for the gradient-carrying
    variant).  Out-of-range coordinates fade to 0 exactly like
    ``map_coordinates(mode='constant', cval=0)``.

    ``dtype``: storage dtype for the tent matrices, the image operand,
    the (X, Y, X) intermediate and the RESULT.  Default f32 (with f32
    accumulation via ``preferred_element_type``); ``jnp.bfloat16``
    halves the tent tensors' HBM traffic and runs the einsum at native
    MXU bf16 rate — the MXU still accumulates f32 internally, but the
    intermediate and output round to bf16, so interpolation error is
    ~4e-3 of the value range, fine for data augmentation.  Integer-coordinate
    sampling (the rounded order-0 label path) stays EXACT in bf16: the
    tents evaluate to exactly {0, 1} because coords and indices below
    2^8 are representable, so the matmuls reduce to an exact one-hot
    selection of small-integer labels.
    """
    dtype = dtype or jnp.float32
    X, Y = image.shape
    r = jnp.arange(X, dtype=jnp.float32)
    k = jnp.arange(Y, dtype=jnp.float32)
    TY = jax.nn.relu(1.0 - jnp.abs(cy[..., None] - k)).astype(dtype)  # (X, Y, k)
    # the intermediate M is (X, Y, X) — the dominant HBM term of this
    # formulation (67 MB/frame in f32 at 256²).  On the bf16 path it is
    # stored bf16 too (MXU accumulation is f32 internally regardless;
    # only the output rounds): the one-hot label path stays exact (M
    # entries are small integers), images pick up one extra bf16
    # rounding on top of the existing tent rounding.
    M = jnp.einsum("ijk,rk->ijr", TY, image.astype(dtype),
                   precision=(precision if dtype == jnp.float32 else None),
                   preferred_element_type=(jnp.float32
                                           if dtype == jnp.float32
                                           else dtype))
    TX = jax.nn.relu(1.0 - jnp.abs(cx[..., None] - r)).astype(dtype)  # (X, Y, r)
    return jnp.sum(TX * M, axis=-1)


def affine_transform_2d(image, matrix, offset, order=1, cval=0.0,
                        backend="auto", sample_dtype=None):
    """Pull-back affine warp: out[i] = image[matrix @ i + offset].

    Matches ``scipy.ndimage.affine_transform(image, matrix, offset, order)``
    as used by the reference augmenter (``image_utils.py:102-107``).
    ``backend='auto'`` routes to the tent-basis MXU sampler on TPU when
    ``cval == 0`` (order 0 samples at rounded coordinates — exactly one
    tent is active, reproducing NN); 'gather' keeps ``map_coordinates``.
    ``sample_dtype`` is forwarded to :func:`tent_sample_2d` (bf16 mixed
    precision on the MXU path; exact for order 0, see there).
    """
    X, Y = image.shape
    xs = jnp.arange(X, dtype=jnp.float32)
    ys = jnp.arange(Y, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    sx = matrix[0, 0] * gx + matrix[0, 1] * gy + offset[0]
    sy = matrix[1, 0] * gx + matrix[1, 1] * gy + offset[1]
    if backend == "auto":
        backend = "mxu" if (jax.default_backend() == "tpu"
                            and cval == 0.0) else "gather"
    if backend == "mxu":
        if order == 0:
            sx, sy = jnp.round(sx), jnp.round(sy)
        return tent_sample_2d(image, sx, sy, dtype=sample_dtype)
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
