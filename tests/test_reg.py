"""Registration-core tests: B-spline synthesis, losses, pair registration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ukbb_cardiac_tpu.reg import (
    RegConfig,
    average_fields,
    bending_energy,
    bspline_dense_field,
    bspline_point_disp,
    compose_fields,
    cubic_bspline,
    lattice_shape,
    make_register_pair,
    nmi,
    ssd,
    total_field,
    transform_points,
    warp_image,
)


def test_cubic_bspline_partition_of_unity():
    # sum of B(t - k) over integer shifts == 1 everywhere
    t = np.linspace(0, 1, 11)
    total = sum(np.asarray(cubic_bspline(t - k)) for k in range(-2, 3))
    np.testing.assert_allclose(total, 1.0, atol=1e-6)


def test_dense_field_matches_direct_evaluation():
    rng = np.random.RandomState(0)
    X, Y, s = 23, 31, 5
    Cx, Cy = lattice_shape((X, Y), s)
    control = jnp.asarray(rng.randn(Cx, Cy, 2).astype(np.float32))
    field = np.asarray(bspline_dense_field(control, (X, Y), s))

    # direct evaluation: u(x) = sum_i B((x-(i-1)s)/s) c_i
    c = np.asarray(control)
    for (x, y) in [(0, 0), (7, 3), (22, 30), (11, 17)]:
        ref = np.zeros(2)
        for i in range(Cx):
            for j in range(Cy):
                w = (np.asarray(cubic_bspline(jnp.asarray((x - (i - 1) * s) / s))) *
                     np.asarray(cubic_bspline(jnp.asarray((y - (j - 1) * s) / s))))
                ref += w * c[i, j]
        np.testing.assert_allclose(field[x, y], ref, atol=1e-4)


def test_point_disp_matches_dense_field():
    rng = np.random.RandomState(1)
    X, Y, s = 32, 32, 8
    Cx, Cy = lattice_shape((X, Y), s)
    control = jnp.asarray(rng.randn(Cx, Cy, 2).astype(np.float32))
    field = np.asarray(bspline_dense_field(control, (X, Y), s))
    pts = jnp.asarray([[0.0, 0.0], [5.0, 9.0], [31.0, 31.0], [16.0, 4.0]])
    disp = np.asarray(bspline_point_disp(control, pts, s))
    for k, (x, y) in enumerate(np.asarray(pts).astype(int)):
        np.testing.assert_allclose(disp[k], field[x, y], atol=1e-4)


def test_bending_energy_zero_for_affine():
    X, Y = 24, 24
    gx, gy = np.meshgrid(np.arange(X), np.arange(Y), indexing="ij")
    affine_disp = jnp.asarray(
        np.stack([0.1 * gx + 0.2 * gy, -0.05 * gx], axis=-1), dtype=jnp.float32)
    assert float(bending_energy(affine_disp)) < 1e-10
    rnd = jnp.asarray(np.random.RandomState(0).randn(X, Y, 2), dtype=jnp.float32)
    assert float(bending_energy(rnd)) > 1e-2


def test_nmi_higher_for_identical():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(32, 32).astype(np.float32))
    b = jnp.asarray(rng.rand(32, 32).astype(np.float32))
    assert float(nmi(a, a)) > float(nmi(a, b))


def test_compose_and_average_fields():
    X, Y = 16, 16
    d1 = jnp.full((X, Y, 2), 1.0)
    d2 = jnp.full((X, Y, 2), 2.0)
    comp = compose_fields(d1, d2)
    # constant fields compose additively (away from boundary clamping)
    np.testing.assert_allclose(np.asarray(comp)[4:-4, 4:-4], 3.0, atol=1e-5)
    avg = average_fields(jnp.stack([d1, d2]), jnp.asarray([0.25, 0.75]))
    np.testing.assert_allclose(np.asarray(avg), 1.75, atol=1e-6)


def _gaussian_blob(X, Y, cx, cy, r):
    gx, gy = np.meshgrid(np.arange(X), np.arange(Y), indexing="ij")
    return np.exp(-((gx - cx) ** 2 + (gy - cy) ** 2) / (2 * r * r)).astype(np.float32)


def test_register_recovers_translation():
    X = Y = 48
    target = _gaussian_blob(X, Y, 24, 24, 6)
    source = _gaussian_blob(X, Y, 27, 22, 6)  # shifted by (+3, -2)

    cfg = RegConfig(spacing=8, levels=2, iters=60, lr=0.5, be_weight=1e-2)
    register = make_register_pair((X, Y), cfg)
    controls = register(jnp.asarray(target), jnp.asarray(source))

    disp = total_field(controls, (X, Y), cfg)
    warped = np.asarray(warp_image(jnp.asarray(source), disp))
    err_before = np.mean((source - target) ** 2)
    err_after = np.mean((warped - target) ** 2)
    assert err_after < 0.2 * err_before, (err_before, err_after)

    # displacement at the blob centre approximates the true shift (+3, -2)
    centre_disp = np.asarray(disp)[24, 24]
    assert abs(centre_disp[0] - 3) < 1.2 and abs(centre_disp[1] + 2) < 1.2, centre_disp


def test_transform_points_consistent_with_field():
    X = Y = 48
    target = _gaussian_blob(X, Y, 24, 24, 6)
    source = _gaussian_blob(X, Y, 27, 22, 6)
    cfg = RegConfig(spacing=8, levels=2, iters=40, lr=0.5, be_weight=1e-2)
    controls = make_register_pair((X, Y), cfg)(
        jnp.asarray(target), jnp.asarray(source))
    pts = jnp.asarray([[24.0, 24.0], [20.0, 28.0]])
    moved = np.asarray(transform_points(controls, pts, cfg))
    disp = np.asarray(total_field(controls, (X, Y), cfg))
    for k, (x, y) in enumerate(np.asarray(pts).astype(int)):
        np.testing.assert_allclose(moved[k], [x, y] + disp[x, y], atol=1e-3)


def test_compose_chain_matches_sequential():
    from ukbb_cardiac_tpu.reg.register import compose_chain

    rng = np.random.RandomState(0)
    K, X, Y = 4, 24, 24
    # smooth small pair fields
    pair = jnp.asarray(np.cumsum(rng.randn(K, X, Y, 2) * 0.02, axis=1),
                       dtype=jnp.float32)
    chain = np.asarray(compose_chain(pair))
    assert chain.shape == (K + 1, X, Y, 2)
    np.testing.assert_allclose(chain[0], 0.0)
    acc = jnp.zeros((X, Y, 2))
    for k in range(K):
        acc = compose_fields(pair[k], acc)
        np.testing.assert_allclose(chain[k + 1], np.asarray(acc), atol=1e-5)


def test_fit_lattice_exact_roundtrip():
    """A field synthesised from a lattice fits back to (nearly) the same
    lattice, and the refit field matches the original."""
    from ukbb_cardiac_tpu.reg.bspline import fit_lattice_to_field

    rng = np.random.RandomState(3)
    X, Y, s = 40, 36, 8
    Cx, Cy = lattice_shape((X, Y), s)
    control = jnp.asarray(rng.randn(Cx, Cy, 2).astype(np.float32))
    field = bspline_dense_field(control, (X, Y), s)
    refit = fit_lattice_to_field(field, s)
    field2 = bspline_dense_field(refit, (X, Y), s)
    np.testing.assert_allclose(np.asarray(field2), np.asarray(field),
                               atol=1e-3)


def test_nmi_registration_recovers_translation():
    """NMI metric (the aortic propagation config) also recovers motion —
    multimodal-style: source has a different intensity mapping."""
    X = Y = 48
    target = _gaussian_blob(X, Y, 24, 24, 6)
    src_geom = _gaussian_blob(X, Y, 27, 22, 6)
    source = 1.0 - 0.8 * src_geom  # inverted/offset intensities
    from ukbb_cardiac_tpu.reg import make_register_batch

    cfg = RegConfig(spacing=8, levels=1, iters=60, lr=0.5, be_weight=1e-4,
                    metric="nmi", n_bins=16)
    controls = make_register_batch((X, Y), cfg)(target[None], source[None])
    disp = np.asarray(total_field(tuple(c[0] for c in controls), (X, Y), cfg))
    centre = disp[24, 24]
    assert abs(centre[0] - 3) < 1.5 and abs(centre[1] + 2) < 1.5, centre


def test_padding_value_mask_ignores_padded_region():
    """With padding_value set, padded (-1) target regions don't drag the
    registration: a shifted blob plus a big -1 region still registers."""
    from ukbb_cardiac_tpu.reg import make_register_batch

    X = Y = 48
    target = _gaussian_blob(X, Y, 24, 24, 6)
    source = _gaussian_blob(X, Y, 27, 22, 6)
    target_pad = target.copy()
    target_pad[:, :12] = -1.0  # padded strip in the target only

    cfg = RegConfig(spacing=8, levels=2, iters=40, lr=0.5, be_weight=1e-2,
                    padding_value=-1.0)
    controls = make_register_batch((X, Y), cfg)(target_pad[None], source[None])
    disp = np.asarray(total_field(tuple(c[0] for c in controls), (X, Y), cfg))
    centre = disp[24, 24]
    assert abs(centre[0] - 3) < 1.5 and abs(centre[1] + 2) < 1.5, centre


def test_batched_warp_matches_vmapped():
    """The global-gather batched warp equals the vmapped per-item warp in
    value and coordinate gradient (the step's grad path)."""
    import jax
    import jax.numpy as jnp
    from ukbb_cardiac_tpu.reg.register import _warp, _warp_batch

    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.rand(4, 18, 21).astype(np.float32))
    disp = jnp.asarray((rng.rand(4, 18, 21, 2) * 10 - 5).astype(np.float32))
    np.testing.assert_allclose(np.asarray(_warp_batch(src, disp)),
                               np.asarray(jax.vmap(_warp)(src, disp)),
                               rtol=1e-6, atol=1e-7)
    g_ref = jax.grad(lambda d: jnp.sum(jax.vmap(_warp)(src, d) ** 2))(disp)
    g_new = jax.grad(lambda d: jnp.sum(_warp_batch(src, d) ** 2))(disp)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_warp_coordinate_grad_matches_full_ad():
    """The custom gather-free VJP equals full AD through map_coordinates
    for the coordinate gradient (including out-of-bounds regions)."""
    import jax
    import jax.numpy as jnp
    from ukbb_cardiac_tpu.reg.register import _warp
    from ukbb_cardiac_tpu.ops import sample_2d

    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.rand(16, 18).astype(np.float32))
    disp = jnp.asarray((rng.rand(16, 18, 2) * 8 - 4).astype(np.float32))
    gx, gy = jnp.meshgrid(jnp.arange(16.0), jnp.arange(18.0), indexing="ij")
    g_ref = jax.grad(lambda d: jnp.sum(
        sample_2d(src, gx + d[..., 0], gy + d[..., 1]) ** 2))(disp)
    g_new = jax.grad(lambda d: jnp.sum(_warp(src, d) ** 2))(disp)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_invert_field_batch_matches_per_item():
    # Batched inversion == per-item inversion on SMOOTH fields (the
    # fixed-point map only contracts for smooth displacements; white-noise
    # fields amplify float-ordering eps across the 10 iterations).
    import jax
    import jax.numpy as jnp
    from ukbb_cardiac_tpu.reg.register import (gaussian_blur, invert_field,
                                               invert_field_batch)

    rng = np.random.RandomState(5)
    raw = (rng.rand(6, 20, 22, 2) * 6 - 3).astype(np.float32)
    smooth = np.stack([np.stack([np.asarray(gaussian_blur(jnp.asarray(f), 2.0))
                                 for f in item.transpose(2, 0, 1)], axis=-1)
                       for item in raw])
    d = jnp.asarray(smooth)
    np.testing.assert_allclose(np.asarray(invert_field_batch(d)),
                               np.asarray(jax.vmap(invert_field)(d)),
                               rtol=1e-5, atol=1e-5)


def test_mxu_tent_warp_matches_gather():
    """The tent-basis MXU warp is the same function as the clipped-corner
    gather warp (register.py module comment): values AND coordinate
    gradients, including at exactly-integer coordinates (the zero-
    displacement initial iterate) and beyond-boundary samples."""
    import jax
    import jax.numpy as jnp
    from ukbb_cardiac_tpu.reg.register import _warp_batch, invert_field_batch

    rng = np.random.RandomState(7)
    src = jnp.asarray(rng.rand(4, 18, 21).astype(np.float32))
    cases = {
        "random": jnp.asarray((rng.rand(4, 18, 21, 2) * 10 - 5)
                              .astype(np.float32)),
        "zero": jnp.zeros((4, 18, 21, 2)),
        "integer": jnp.asarray(rng.randint(-4, 5, (4, 18, 21, 2))
                               .astype(np.float32)),
    }
    for name, disp in cases.items():
        o_g = _warp_batch(src, disp, backend="gather")
        o_m = _warp_batch(src, disp, backend="mxu", precision="float32")
        np.testing.assert_allclose(np.asarray(o_m), np.asarray(o_g),
                                   rtol=1e-6, atol=1e-6, err_msg=name)
        g_g = jax.grad(lambda d: jnp.sum(
            jnp.sin(_warp_batch(src, d, backend="gather"))))(disp)
        g_m = jax.grad(lambda d: jnp.sum(
            jnp.sin(_warp_batch(src, d, backend="mxu",
                                precision="float32"))))(disp)
        np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_g),
                                   rtol=1e-5, atol=1e-6, err_msg=name)

    # one fixed-point inversion sweep through the mxu sampler on a smooth
    # field stays close to the gather path
    from ukbb_cardiac_tpu.reg.register import gaussian_blur
    raw = (rng.rand(3, 20, 22, 2) * 6 - 3).astype(np.float32)
    smooth = np.stack([np.stack([np.asarray(gaussian_blur(jnp.asarray(f), 2.0))
                                 for f in item.transpose(2, 0, 1)], axis=-1)
                       for item in raw])
    d = jnp.asarray(smooth)
    np.testing.assert_allclose(
        np.asarray(invert_field_batch(d, backend="mxu")),
        np.asarray(invert_field_batch(d, backend="gather")),
        rtol=1e-4, atol=1e-4)


def test_register_batch_mxu_backend_recovers_shift():
    """End-to-end registration with the forced MXU warp backend recovers a
    known translation (CPU runs the same code path the TPU default picks)."""
    import jax.numpy as jnp
    from ukbb_cardiac_tpu.reg import (RegConfig, make_register_batch,
                                      total_field)

    X = Y = 48
    rng = np.random.RandomState(11)
    from scipy import ndimage
    src = ndimage.gaussian_filter(rng.rand(X, Y), 2.0).astype(np.float32)
    shift = (2.0, -1.5)
    tgt = ndimage.shift(src, shift, order=1)
    cfg = RegConfig(spacing=8, levels=2, iters=40, lr=0.5, be_weight=1e-2,
                    warp_backend="mxu")
    reg = make_register_batch((X, Y), cfg)
    controls = reg(jnp.asarray(tgt)[None], jnp.asarray(src)[None])
    disp = np.asarray(total_field(tuple(c[0] for c in controls), (X, Y), cfg))
    centre = disp[20:28, 20:28].mean(axis=(0, 1))
    # pull-back: target coords + disp = source coords, so disp ≈ -shift
    assert abs(centre[0] + shift[0]) < 0.7, centre
    assert abs(centre[1] + shift[1]) < 0.7, centre


def test_compose_fields_mxu_matches_gather():
    """compose_fields' MXU resample equals the gather/map_coordinates
    path (same zero-boundary bilinear), including beyond-edge samples."""
    import jax.numpy as jnp
    from ukbb_cardiac_tpu.reg.register import compose_fields

    rng = np.random.RandomState(9)
    d1 = jnp.asarray((rng.rand(20, 24, 2) * 6 - 3).astype(np.float32))
    d2 = jnp.asarray((rng.rand(20, 24, 2) * 6 - 3).astype(np.float32))
    a = compose_fields(d1, d2, backend="gather")
    b = compose_fields(d1, d2, backend="mxu")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-6)
