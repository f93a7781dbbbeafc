"""Cubic B-spline free-form deformation (FFD) — the transform model.

Replaces MIRTK's CPU FFD machinery (SURVEY.md §2.3): a control-point
lattice of spacing ``s`` pixels parameterises a smooth dense displacement
field via the cubic B-spline tensor product.

TPU-native synthesis: the dense field is an *input-dilated separable
convolution* of the control lattice with the cubic B-spline kernel
sampled at 1/s steps — two 1D depthwise convs that XLA maps straight
onto the vector/matrix units, instead of MIRTK's per-voxel CPU loops.
Gradients w.r.t. the control points flow through the conv, so the same
op serves forward synthesis and the registration adjoint.

Geometry convention: control point ``i`` sits at pixel ``(i - 1) * s``
(one-control-point margin before pixel 0); a lattice of
``ceil((dim-1)/s) + 3`` controls covers the image, matching the classic
Rueckert FFD layout.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def cubic_bspline(t):
    """Cubic B-spline basis B(t) on support |t| < 2 (vectorised)."""
    t = jnp.abs(t)
    return jnp.where(
        t < 1.0,
        (4.0 - 6.0 * t * t + 3.0 * t ** 3) / 6.0,
        jnp.where(t < 2.0, ((2.0 - t) ** 3) / 6.0, 0.0),
    )


def lattice_shape(image_shape: Tuple[int, int], spacing: int) -> Tuple[int, int]:
    """Number of control points per axis for an image of ``image_shape``."""
    return tuple(int(math.ceil((d - 1) / spacing)) + 3 for d in image_shape)


def _cubic_bspline_np(t: np.ndarray) -> np.ndarray:
    """Pure-numpy twin of :func:`cubic_bspline` (safe inside jit traces)."""
    t = np.abs(np.asarray(t, dtype=np.float64))
    return np.where(
        t < 1.0,
        (4.0 - 6.0 * t * t + 3.0 * t ** 3) / 6.0,
        np.where(t < 2.0, ((2.0 - t) ** 3) / 6.0, 0.0),
    )


def _upsample_kernel(spacing: int) -> np.ndarray:
    """1D kernel: tap j = B((j - (2s-1)) / s), length 4s-1.  Placing it in
    a stride-s input-dilated conv with lo-padding s-1 makes output pixel x
    equal  sum_i B((x - (i-1)s)/s) * c_i  exactly."""
    j = np.arange(4 * spacing - 1)
    return _cubic_bspline_np((j - (2 * spacing - 1)) / spacing).astype(np.float32)


def bspline_dense_field(control: jnp.ndarray, image_shape: Tuple[int, int],
                        spacing: int) -> jnp.ndarray:
    """Synthesise the dense displacement field from the control lattice.

    control: (Cx, Cy, 2) — x/y displacement components at control points.
    Returns (X, Y, 2) dense displacements (pixel units).
    """
    X, Y = image_shape
    s = spacing
    K = jnp.asarray(_upsample_kernel(s))
    L = 4 * s - 1
    p_lo = s - 1

    def conv1d_axis(x, n_out, axis):
        # x: (N, A, B, C) — dilate+convolve along `axis` (1 or 2), depthwise.
        Cn = x.shape[-1]
        if axis == 1:
            kern = K.reshape(L, 1, 1, 1) * jnp.eye(Cn).reshape(1, 1, Cn, Cn)
            dil = (s, 1)
            n_in = (x.shape[1] - 1) * s + 1
            p_hi = n_out - 1 + L - 1 - p_lo - n_in + 1
            pad = ((p_lo, p_hi), (0, 0))
        else:
            kern = K.reshape(1, L, 1, 1) * jnp.eye(Cn).reshape(1, 1, Cn, Cn)
            dil = (1, s)
            n_in = (x.shape[2] - 1) * s + 1
            p_hi = n_out - 1 + L - 1 - p_lo - n_in + 1
            pad = ((0, 0), (p_lo, p_hi))
        # follow the input dtype (bf16 synthesis runs the convs on the
        # MXU at twice the f32 rate; accumulation is f32 in hardware) and
        # avoid a preferred_element_type upcast, which would break the
        # VJP's cotangent dtype for bf16 (see models/layers.py)
        return jax.lax.conv_general_dilated(
            x, kern.astype(x.dtype), window_strides=(1, 1), padding=pad,
            lhs_dilation=dil, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = control[None]  # (1, Cx, Cy, 2)
    x = conv1d_axis(x, X, axis=1)
    x = conv1d_axis(x, Y, axis=2)
    return x[0]


def bspline_point_disp(control: jnp.ndarray, points: jnp.ndarray,
                       spacing: int) -> jnp.ndarray:
    """Evaluate the FFD displacement at arbitrary (pixel) coordinates.

    control: (Cx, Cy, 2); points: (N, 2) pixel coords.
    Returns (N, 2) displacements — the ``mirtk transform-points``
    equivalent (``cardiac_utils.py:940,1506``), vmapped over points.
    """
    s = float(spacing)
    g = points / s  # in control-grid units; control i is at (i-1)*s
    i0 = jnp.floor(g).astype(jnp.int32)  # base control offset
    u = g - i0

    Cx, Cy, _ = control.shape

    def eval_one(i0_pt, u_pt):
        acc = jnp.zeros(2)
        for a in range(4):
            wa = cubic_bspline(u_pt[0] - (a - 1))
            ia = jnp.clip(i0_pt[0] + a, 0, Cx - 1)
            for b in range(4):
                wb = cubic_bspline(u_pt[1] - (b - 1))
                ib = jnp.clip(i0_pt[1] + b, 0, Cy - 1)
                acc = acc + wa * wb * control[ia, ib]
        return acc

    return jax.vmap(eval_one)(i0, u)


def basis_matrix(dim: int, spacing: int) -> np.ndarray:
    """Dense 1D B-spline basis: B[x, i] = B((x - (i-1)s)/s), shape
    (dim, n_controls) — the synthesis operator along one axis."""
    Cn = int(math.ceil((dim - 1) / spacing)) + 3
    x = np.arange(dim)[:, None]
    i = np.arange(Cn)[None, :]
    return _cubic_bspline_np((x - (i - 1) * spacing) / spacing).astype(np.float32)


def fit_lattice_to_field(field: jnp.ndarray, spacing: int) -> jnp.ndarray:
    """Exact least-squares fit of a control lattice to a dense field —
    re-parameterises composed deformations onto a single lattice (the
    ``mirtk compose-dofs -approximate`` refit, SURVEY.md §2.3).

    The synthesis operator is separable (field = Bx @ C @ By^T per
    channel), so the normal equations solve exactly with two small
    pseudo-inverses — no iteration.
    """
    X, Y, _ = field.shape
    Bx = jnp.asarray(basis_matrix(X, spacing))
    By = jnp.asarray(basis_matrix(Y, spacing))
    Bx_pinv = jnp.linalg.pinv(Bx)
    By_pinv = jnp.linalg.pinv(By)
    # (Cx, X) @ (X, Y) @ (Y, Cy) per displacement component
    return jnp.einsum("cx,xyk,yd->cdk", Bx_pinv, field, By_pinv.T)
