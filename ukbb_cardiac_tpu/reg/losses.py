"""Similarity metrics and regularisers for FFD registration.

Replaces the MIRTK energy terms configured in ``par/ffd_cine_2d_motion.cfg``
(SSD + bending energy, weight 1e-1) and ``par/ffd_aortic_motion.cfg``
(NMI + bending energy 1e-4).  All fully differentiable jnp.
"""

from __future__ import annotations

import jax.numpy as jnp


def ssd(a: jnp.ndarray, b: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Sum-of-squared-differences (mean over voxels)."""
    d = (a - b) ** 2
    if mask is not None:
        return jnp.sum(d * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(d)


def bending_energy(field: jnp.ndarray) -> jnp.ndarray:
    """Thin-plate bending energy of a dense displacement field (X, Y, 2):
    mean of squared second derivatives  u_xx² + 2 u_xy² + u_yy²."""
    u = field
    dxx = u[2:, :, :] - 2 * u[1:-1, :, :] + u[:-2, :, :]
    dyy = u[:, 2:, :] - 2 * u[:, 1:-1, :] + u[:, :-2, :]
    dxy = (u[2:, 2:, :] - u[2:, :-2, :] - u[:-2, 2:, :] + u[:-2, :-2, :]) / 4.0
    return (jnp.mean(dxx ** 2) + 2 * jnp.mean(dxy ** 2) + jnp.mean(dyy ** 2))


def nmi(a: jnp.ndarray, b: jnp.ndarray, n_bins: int = 32) -> jnp.ndarray:
    """Normalised mutual information  (H(A) + H(B)) / H(A,B)  with a
    linear-Parzen joint histogram — differentiable; higher is better.

    The MIRTK aortic config optimises NMI (``par/ffd_aortic_motion.cfg:5``).
    """
    af = a.reshape(-1)
    bf = b.reshape(-1)
    a_lo, a_hi = jnp.min(af), jnp.max(af)
    b_lo, b_hi = jnp.min(bf), jnp.max(bf)
    ta = jnp.clip((af - a_lo) / (a_hi - a_lo + 1e-8) * (n_bins - 1), 0, n_bins - 1)
    tb = jnp.clip((bf - b_lo) / (b_hi - b_lo + 1e-8) * (n_bins - 1), 0, n_bins - 1)
    centres = jnp.arange(n_bins, dtype=jnp.float32)
    wa = jnp.maximum(1.0 - jnp.abs(ta[:, None] - centres[None, :]), 0.0)
    wb = jnp.maximum(1.0 - jnp.abs(tb[:, None] - centres[None, :]), 0.0)
    joint = wa.T @ wb  # (n_bins, n_bins) — one MXU matmul
    joint = joint / jnp.sum(joint)
    pa = jnp.sum(joint, axis=1)
    pb = jnp.sum(joint, axis=0)

    def entropy(p):
        # double-where: keep log's argument strictly positive on the dead
        # branch so the gradient stays finite (NaN otherwise)
        safe_p = jnp.where(p > 1e-12, p, 1.0)
        return -jnp.sum(jnp.where(p > 1e-12, p * jnp.log(safe_p), 0.0))

    return (entropy(pa) + entropy(pb)) / jnp.maximum(entropy(joint), 1e-8)
