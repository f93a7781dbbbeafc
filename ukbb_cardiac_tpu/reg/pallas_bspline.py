"""Pallas TPU kernel: cubic B-spline lattice → dense displacement field.

The default synthesis path expresses the field as two input-dilated
depthwise convolutions (``reg/bspline.py``), which XLA handles well.
This kernel computes the same field tile-by-tile as two small matmuls in
VMEM:

    field[tile] = Bx[tile] @ C[window] @ By[tile]^T   (per component)

where ``Bx``/``By`` are the dense 1D basis matrices restricted to the
tile and ``C[window]`` is the small control window the tile depends on
(tile/spacing + 3 controls per axis).  The whole lattice is tiny (a few
tens of KB) so it lives in VMEM and each tile takes a dynamic slice —
no gathers, pure MXU work.

Numerically identical to :func:`reg.bspline.bspline_dense_field`
(tests run the Pallas interpreter on CPU).  Whether it beats the conv
formulation depends on spacing/shape; see DESIGN.md for the measurement
on this machine.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ukbb_cardiac_tpu.reg.bspline import basis_matrix


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pallas_dense_field(control: jnp.ndarray, image_shape, spacing: int,
                       tile: int = 128, interpret: bool = False) -> jnp.ndarray:
    """Dense (X, Y, 2) displacement field from a (Cx, Cy, 2) lattice.

    tile: square output tile edge (rounded up to a multiple of
    ``spacing``).  ``interpret=True`` runs the Pallas interpreter (CPU
    tests).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    X, Y = image_shape
    Cx, Cy, _ = control.shape
    tile = _round_up(tile, spacing)
    Xp, Yp = _round_up(X, tile), _round_up(Y, tile)
    gx, gy = Xp // tile, Yp // tile
    step = tile // spacing
    win = step + 3  # controls per axis a tile depends on

    Bx_np = basis_matrix(Xp, spacing)
    By_np = basis_matrix(Yp, spacing)
    # every tile's window [t*step, t*step + win) must exist
    need_cx = (gx - 1) * step + win
    need_cy = (gy - 1) * step + win
    ctl = jnp.pad(control.astype(jnp.float32),
                  ((0, max(0, need_cx - Cx)), (0, max(0, need_cy - Cy)),
                   (0, 0)))
    Bx_np = np.pad(Bx_np, ((0, 0), (0, max(0, need_cx - Bx_np.shape[1]))))
    By_np = np.pad(By_np, ((0, 0), (0, max(0, need_cy - By_np.shape[1]))))

    # per-tile basis blocks: (g, tile, win)
    Bx_tiles = np.stack([Bx_np[t * tile:(t + 1) * tile,
                               t * step:t * step + win] for t in range(gx)])
    By_tiles = np.stack([By_np[t * tile:(t + 1) * tile,
                               t * step:t * step + win] for t in range(gy)])

    def kernel(bx_ref, by_ref, ctl_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        bx = bx_ref[0]                       # (tile, win)
        by = by_ref[0]                       # (tile, win)
        cwin = ctl_ref[pl.ds(i * step, win), pl.ds(j * step, win), :]
        for k in range(2):
            t1 = jnp.dot(bx, cwin[:, :, k],
                         preferred_element_type=jnp.float32)  # (tile, win)
            out_ref[:, :, k] = jnp.dot(
                t1, by.T, preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(gx, gy),
        in_specs=[
            pl.BlockSpec((1, tile, win), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tile, win), lambda i, j: (j, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole lattice (tiny)
        ],
        out_specs=pl.BlockSpec((tile, tile, 2), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((Xp, Yp, 2), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(Bx_tiles), jnp.asarray(By_tiles), ctl)
    return out[:X, :Y]
