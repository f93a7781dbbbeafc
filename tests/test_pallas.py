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


class TestFusedHead:
    """Fused FCN multiscale-head kernel (models/pallas_head.py), run under
    the Pallas interpreter on CPU — same kernel the TPU compiles."""

    def _setup(self, X=96, Y=112, N=2):
        import jax
        from ukbb_cardiac_tpu.models import fcn as fcn_mod

        cfg = fcn_mod.FCNConfig(n_class=4, n_level=5,
                                n_filter=(16, 32, 64, 128, 256),
                                n_block=(2, 2, 3, 3, 3), same_dim=32, fc=64)
        p, s, n = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
        x = np.random.RandomState(0).rand(N, X, Y, 1).astype(np.float32)
        return cfg, p, s, n, x

    def test_matches_xla_head_f32(self):
        import jax.numpy as jnp
        from ukbb_cardiac_tpu.models import fcn as fcn_mod
        from ukbb_cardiac_tpu.models.pallas_head import apply_fcn_pallas

        cfg, p, s, n, x = self._setup()
        lo_ref, _ = fcn_mod.apply_fcn(p, s, n, cfg, x, train=False)
        lo_pal = apply_fcn_pallas(p, s, n, cfg, jnp.asarray(x),
                                  compute_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.transpose(np.asarray(lo_pal), (0, 2, 3, 1)),
            np.asarray(lo_ref), atol=2e-5)

    def test_fori_loop_form_matches_unrolled(self):
        import jax.numpy as jnp
        from ukbb_cardiac_tpu.models.pallas_head import (apply_fcn_pallas,
                                                         make_fused_head)

        cfg, p, s, n, x = self._setup()
        h_u = make_fused_head(p, s, n, cfg, jnp.float32, unroll=True)
        h_f = make_fused_head(p, s, n, cfg, jnp.float32, unroll=False)
        a = np.asarray(apply_fcn_pallas(p, s, n, cfg, jnp.asarray(x),
                                        jnp.float32, head=h_u))
        b = np.asarray(apply_fcn_pallas(p, s, n, cfg, jnp.asarray(x),
                                        jnp.float32, head=h_f))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_fold_conv_bn(self):
        import jax
        import jax.numpy as jnp
        from ukbb_cardiac_tpu.models import layers as L
        from ukbb_cardiac_tpu.models.pallas_head import fold_conv_bn

        rng = np.random.RandomState(1)
        k = jnp.asarray(rng.randn(1, 1, 8, 6).astype(np.float32)) * 0.3
        bn_p = {"gamma": jnp.asarray(rng.rand(6).astype(np.float32) + 0.5),
                "beta": jnp.asarray(rng.randn(6).astype(np.float32))}
        bn_s = {"moving_mean": jnp.asarray(rng.randn(6).astype(np.float32)),
                "moving_variance": jnp.asarray(
                    rng.rand(6).astype(np.float32) + 0.1)}
        x = jnp.asarray(rng.randn(2, 5, 7, 8).astype(np.float32))
        ref = L.conv2d(x, k)
        ref, _ = L.batch_norm(ref, bn_p, bn_s, train=False)
        W, b = fold_conv_bn(k, bn_p, bn_s)
        got = jnp.einsum("nxyc,cd->nxyd", x, W) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
