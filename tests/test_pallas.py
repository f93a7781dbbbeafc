"""Pallas B-spline synthesis kernel: parity with the conv formulation.

Runs the Pallas interpreter (CPU backend in tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ukbb_cardiac_tpu.reg.bspline import bspline_dense_field, lattice_shape
from ukbb_cardiac_tpu.reg.pallas_bspline import pallas_dense_field


@pytest.mark.parametrize("shape,spacing,tile", [
    ((96, 96, 8), 8, 80),
    ((192, 208, 10), 10, 80),
    ((100, 120, 20), 20, 80),
])
def test_pallas_matches_conv_synthesis(shape, spacing, tile):
    X, Y, _ = shape
    Cx, Cy = lattice_shape((X, Y), spacing)
    rng = np.random.RandomState(0)
    ctl = jnp.asarray(rng.randn(Cx, Cy, 2).astype(np.float32))
    ref = np.asarray(bspline_dense_field(ctl, (X, Y), spacing))
    got = np.asarray(pallas_dense_field(ctl, (X, Y), spacing, tile=tile,
                                        interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)
