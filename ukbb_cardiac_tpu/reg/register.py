"""Multi-level B-spline FFD registration — the MIRTK ``register``
replacement and the flagship TPU win (SURVEY.md §2.3, §3.4).

The reference shells out to ``mirtk register`` ~300 times per subject,
sequentially, on CPU (several minutes).  Here a registration is ONE jitted
program — multi-level additive FFD (the classic Rueckert / MIRTK
multi-level model: total displacement = sum of per-level lattices of
halving spacing), Adam on control points, Gaussian-pyramid image
smoothing per level — and the whole (slice, frame-pair) population of a
cine is vmapped into a single batched device call.

Energy matches ``par/ffd_cine_2d_motion.cfg``: SSD + 1e-1 bending energy,
3 levels, finest control spacing 10 px (NMI variant for the aortic config).
"""

from __future__ import annotations


import functools

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ukbb_cardiac_tpu.ops.resample import sample_2d
from ukbb_cardiac_tpu.reg import bspline, losses


@dataclass(frozen=True)
class RegConfig:
    spacing: int = 10            # finest control spacing, px (ffd_cine_2d_motion.cfg:11)
    levels: int = 3              # resolution levels (cfg:6 "No. of levels = 3")
    iters: int = 30              # Adam steps per level (phantom warp-Dice
    #                              measured on TPU: 30 steps = LV 0.981 /
    #                              Myo 0.947 vs 40 steps = 0.979 / 0.943 —
    #                              equal-or-better at 25% less work; 80
    #                              steps gains nothing either)
    lr: float = 0.5              # px per step at coarse level
    be_weight: float = 1e-1      # bending energy weight (cfg:9)
    metric: str = "ssd"          # 'ssd' | 'nmi' (ffd_aortic_motion.cfg:5)
    n_bins: int = 32             # NMI histogram bins
    smooth_sigma: float = 1.0    # per-level Gaussian blur factor
    padding_value: float | None = None  # ignore-below mask (cfg:12 "Padding value = -1")
    warp_backend: str = "auto"   # 'auto' | 'mxu' | 'gather' (see _warp_batch)
    warp_precision: str = "float32"  # matmul precision for the 'mxu' warp

    @staticmethod
    def cine_2d_motion() -> "RegConfig":
        """The ``par/ffd_cine_2d_motion.cfg`` operating point (also
        ``par/ffd_cine_la_2d_motion.cfg``): 3 levels, SSD + 1e-1 bending
        energy, control spacing 10 px."""
        return RegConfig(spacing=10, levels=3, be_weight=1e-1, metric="ssd")

    @staticmethod
    def aortic_motion() -> "RegConfig":
        """The ``par/ffd_aortic_motion.cfg`` operating point: 1 level,
        NMI + 1e-4 bending energy, control spacing 10 px."""
        return RegConfig(spacing=10, levels=1, iters=100, be_weight=1e-4,
                         metric="nmi")


def _gaussian_kernel(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(image: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of a 2D image (static radius 3*sigma)."""
    if sigma <= 0:
        return image
    radius = max(1, int(3 * sigma))
    k = _gaussian_kernel(sigma, radius)
    x = image[None, :, :, None]
    kx = k.reshape(-1, 1, 1, 1)
    ky = k.reshape(1, -1, 1, 1)
    pad = ((radius, radius), (0, 0))
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), (pad[0], pad[1]),
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), (pad[1], pad[0]),
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x[0, :, :, 0]


def _bilinear_impl(source, cx, cy):
    """Bilinear sampling with 'constant' (zero) boundary — the four corner
    gathers plus the fractional weights, returned for VJP reuse."""
    X, Y = source.shape
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(dx, dy):
        xi = x0i + dx
        yi = y0i + dy
        valid = (xi >= 0) & (xi < X) & (yi >= 0) & (yi < Y)
        v = source[jnp.clip(xi, 0, X - 1), jnp.clip(yi, 0, Y - 1)]
        return jnp.where(valid, v, 0.0)

    v00, v01 = corner(0, 0), corner(0, 1)
    v10, v11 = corner(1, 0), corner(1, 1)
    out = (v00 * (1 - fx) * (1 - fy) + v01 * (1 - fx) * fy
           + v10 * fx * (1 - fy) + v11 * fx * fy)
    return out, (v00, v01, v10, v11, fx, fy)


@jax.custom_vjp
def _bilinear_const_src(source, cx, cy):
    """Bilinear sample treating ``source`` as a CONSTANT.

    The registration loss differentiates only through the sampling
    coordinates (the images are fixed data), but generic AD of a gather
    re-gathers the corner values in the backward pass — on TPU the
    arbitrary-index gather is the whole cost of a registration step.
    This custom VJP computes the coordinate cotangents from the corners
    already gathered in the forward pass: the backward pass is purely
    elementwise.  The source cotangent is ZERO by construction — do not
    use this where gradients w.r.t. the image are needed (the public
    :func:`warp_image` keeps full AD).
    """
    out, _ = _bilinear_impl(source, cx, cy)
    return out


def _bilinear_fwd(source, cx, cy):
    out, res = _bilinear_impl(source, cx, cy)
    return out, (res, source)


def _bilinear_bwd(residuals, g):
    (v00, v01, v10, v11, fx, fy), source = residuals
    dcx = ((v10 - v00) * (1 - fy) + (v11 - v01) * fy) * g
    dcy = ((v01 - v00) * (1 - fx) + (v11 - v10) * fx) * g
    return jnp.zeros_like(source), dcx, dcy


_bilinear_const_src.defvjp(_bilinear_fwd, _bilinear_bwd)


def _bilinear_batch_impl(source, cx, cy):
    """Batched bilinear sampling (constant boundary) as ONE flat gather
    across the whole (B, X, Y) batch — XLA lowers the single global
    ``take`` ~20% faster than the vmapped per-item gather (measured)."""
    B, X, Y = source.shape
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    sf = source.reshape(-1)
    boff = (jnp.arange(B, dtype=jnp.int32) * (X * Y))[:, None, None]

    def corner(dx, dy):
        xi = x0i + dx
        yi = y0i + dy
        valid = (xi >= 0) & (xi < X) & (yi >= 0) & (yi < Y)
        idx = boff + jnp.clip(xi, 0, X - 1) * Y + jnp.clip(yi, 0, Y - 1)
        return jnp.where(valid, jnp.take(sf, idx.reshape(-1)).reshape(B, X, Y),
                         0.0)

    v00, v01 = corner(0, 0), corner(0, 1)
    v10, v11 = corner(1, 0), corner(1, 1)
    out = (v00 * (1 - fx) * (1 - fy) + v01 * (1 - fx) * fy
           + v10 * fx * (1 - fy) + v11 * fx * fy)
    return out, (v00, v01, v10, v11, fx, fy)


@jax.custom_vjp
def _bilinear_const_src_batch(source, cx, cy):
    """Batched twin of :func:`_bilinear_const_src` (constant source,
    gather-free backward)."""
    out, _ = _bilinear_batch_impl(source, cx, cy)
    return out


def _bilinear_batch_fwd(source, cx, cy):
    out, res = _bilinear_batch_impl(source, cx, cy)
    return out, (res, source)


_bilinear_const_src_batch.defvjp(_bilinear_batch_fwd, _bilinear_bwd)


# ---------------------------------------------------------------------------
# MXU tent-basis warp — the registration hot loop's sampling kernel.
#
# Bilinear sampling with constant-zero boundary is EXACTLY a tent-basis
# expansion:  out[b,i,j] = sum_r sum_k S[b,r,k] * tent(cx-r) * tent(cy-k)
# with tent(d) = relu(1 - |d|): for interior coordinates only the two
# corners per axis have non-zero weight (1-f and f), and out-of-range
# rows/columns simply never appear in the sum — the same masking the
# clipped gather performs.  Written this way the warp is two batched
# matmuls plus elementwise tent evaluations, which XLA tiles straight
# onto the MXU — measured 0.39 ms (bf16 passes) / 1.8 ms (f32) against
# 45.8 ms for the clipped-gather formulation at B=150, 96x96: the
# arbitrary-index gather lowers to scalar loads on TPU and was the
# entire cost of a registration step (VERDICT r1 weak #4 / next #6).
# ---------------------------------------------------------------------------

def _tent(d):
    return jax.nn.relu(1.0 - jnp.abs(d))


def _tent_grad(d):
    """One-sided tent subgradient matching the gather-corner convention:
    slope -1 on [0, 1), +1 on [-1, 0) — the forward difference at integer
    coordinates, so the zero-displacement initial iterate gets the same
    gradient as the gather VJP (plain sign(d) would zero it)."""
    one = jnp.ones((), d.dtype)
    return (jnp.where((d >= -1.0) & (d < 0.0), one, 0.0)
            - jnp.where((d >= 0.0) & (d < 1.0), one, 0.0))


def _tent_warp_primal(source, cx, cy, precision):
    B, X, Y = source.shape
    r = jnp.arange(X, dtype=jnp.float32)
    k = jnp.arange(Y, dtype=jnp.float32)
    TY = _tent(cy[..., None] - k)                         # (B, X, Y, k)
    M = jnp.einsum("bijk,brk->bijr", TY, source,
                   precision=precision,
                   preferred_element_type=jnp.float32)    # y-interp rows
    TX = _tent(cx[..., None] - r)                         # (B, X, Y, r)
    return jnp.sum(TX * M, axis=-1)


_TENT_WARP_CACHE = {}


def _tent_warp_fn(precision: str):
    """Build (and cache) the custom-VJP tent warp for one matmul precision.

    Constant-source semantics like :func:`_bilinear_const_src_batch`; the
    backward pass is elementwise (g*Jx, g*Jy) from residuals computed in
    the forward trace with one extra matmul.
    """
    if precision in _TENT_WARP_CACHE:
        return _TENT_WARP_CACHE[precision]

    @jax.custom_vjp
    def warp(source, cx, cy):
        return _tent_warp_primal(source, cx, cy, precision)

    def fwd(source, cx, cy):
        B, X, Y = source.shape
        r = jnp.arange(X, dtype=jnp.float32)
        k = jnp.arange(Y, dtype=jnp.float32)
        ddy = cy[..., None] - k
        TY = _tent(ddy)
        M = jnp.einsum("bijk,brk->bijr", TY, source, precision=precision,
                       preferred_element_type=jnp.float32)
        ddx = cx[..., None] - r
        TX = _tent(ddx)
        out = jnp.sum(TX * M, axis=-1)
        Jx = jnp.sum(_tent_grad(ddx) * M, axis=-1)
        M2 = jnp.einsum("bijk,brk->bijr", _tent_grad(ddy), source,
                        precision=precision,
                        preferred_element_type=jnp.float32)
        Jy = jnp.sum(TX * M2, axis=-1)
        return out, (Jx, Jy, source)

    def bwd(residuals, g):
        Jx, Jy, source = residuals
        return jnp.zeros_like(source), g * Jx, g * Jy

    warp.defvjp(fwd, bwd)
    _TENT_WARP_CACHE[precision] = warp
    return warp


def resolve_warp_backend(backend: str) -> str:
    """'auto' → 'mxu' on TPU (tent-basis matmuls), 'gather' elsewhere
    (on CPU the dense tent sum does X-times the work of the gather)."""
    if backend != "auto":
        return backend
    return "mxu" if jax.default_backend() == "tpu" else "gather"


def _warp_batch(source: jnp.ndarray, disp: jnp.ndarray,
                backend: str = "gather",
                precision: str = "float32") -> jnp.ndarray:
    """Batched pull-back warp: out[b, x] = source[b, x + disp[b, x]];
    source (B, X, Y), disp (B, X, Y, 2).  Constant-source gradient
    semantics (see :func:`_bilinear_const_src`).  ``backend``:
    'gather' (clipped corner gathers) or 'mxu' (tent-basis matmuls, same
    math — see module comment above); ``precision`` is the matmul
    precision for 'mxu' ('float32' is exact to ~1e-7 vs the gather,
    'default' uses bf16 MXU passes at ~4.5x the speed and ~4e-3 abs
    error on unit-scale images)."""
    B, X, Y = source.shape
    gx, gy = jnp.meshgrid(jnp.arange(X, dtype=jnp.float32),
                          jnp.arange(Y, dtype=jnp.float32), indexing="ij")
    cx = gx[None] + disp[..., 0]
    cy = gy[None] + disp[..., 1]
    if backend == "mxu":
        return _tent_warp_fn(precision)(source, cx, cy)
    return _bilinear_const_src_batch(source, cx, cy)


def _warp(source: jnp.ndarray, disp: jnp.ndarray, order: int = 1) -> jnp.ndarray:
    """Pull-back warp: out[x] = source[x + disp[x]]; disp (X, Y, 2).

    Order-1 uses the constant-source bilinear sampler (gather-free
    backward; see :func:`_bilinear_const_src`) — gradients flow through
    the displacement only, which is what every registration/composition
    caller differentiates."""
    X, Y = source.shape
    gx, gy = jnp.meshgrid(jnp.arange(X, dtype=jnp.float32),
                          jnp.arange(Y, dtype=jnp.float32), indexing="ij")
    if order == 1:
        return _bilinear_const_src(source, gx + disp[..., 0],
                                   gy + disp[..., 1])
    return sample_2d(source, gx + disp[..., 0], gy + disp[..., 1], order=order)


def make_register_pair(image_shape: Tuple[int, int], cfg: RegConfig = RegConfig()):
    """Single-pair registration: ``register(target, source) -> controls``.

    Thin wrapper over :func:`make_register_batch` with batch size 1 (same
    pyramid optimiser, same compile-friendly step structure).  The
    returned transform maps target coordinates to source coordinates
    (pull-back), the convention of ``mirtk register -dofout`` in the
    frame-to-frame tracking (``cardiac_utils.py:882-890``); consume the
    per-level lattices with :func:`total_field` / :func:`transform_points`.
    """
    batch = make_register_batch(image_shape, cfg)

    def register(target, source):
        controls = batch(jnp.asarray(target)[None], jnp.asarray(source)[None])
        return tuple(c[0] for c in controls)

    return register


def total_field(controls: Sequence[jnp.ndarray], image_shape: Tuple[int, int],
                cfg: RegConfig = RegConfig()) -> jnp.ndarray:
    """Dense displacement (X, Y, 2) of a multi-level control stack."""
    X, Y = image_shape
    disp = jnp.zeros((X, Y, 2))
    for l, c in enumerate(controls):
        s_l = cfg.spacing * (2 ** (cfg.levels - 1 - l))
        disp = disp + bspline.bspline_dense_field(c, (X, Y), s_l)
    return disp


def transform_points(controls, points: jnp.ndarray,
                     cfg: RegConfig = RegConfig()) -> jnp.ndarray:
    """Map (N, 2) pixel points through the multi-level FFD — the
    ``mirtk transform-points`` twin (exact B-spline evaluation, no dense
    resampling error)."""
    out = points.astype(jnp.float32)
    disp = jnp.zeros_like(out)
    for l, c in enumerate(controls):
        s_l = cfg.spacing * (2 ** (cfg.levels - 1 - l))
        disp = disp + bspline.bspline_point_disp(c, points, s_l)
    return out + disp


def warp_image(source: jnp.ndarray, disp: jnp.ndarray, order: int = 1) -> jnp.ndarray:
    """Public pull-back warp (``mirtk transform-image`` twin)."""
    return _warp(source.astype(jnp.float32), disp, order=order)


def compose_fields(d1: jnp.ndarray, d2: jnp.ndarray,
                   backend: str = "auto",
                   precision: str = "float32") -> jnp.ndarray:
    """Compose pull-back displacement fields:  (d1 ∘ d2)(x) = d2(x) + d1(x + d2(x)).

    Matches transform composition T1(T2(x)) for pull-back warps — the
    ``mirtk compose-dofs`` replacement (``cardiac_utils.py:892-922``),
    carried as dense fields instead of refitting a lattice.  The inner
    resample uses the same zero-boundary bilinear semantics on both
    backends (tent-basis MXU matmuls on TPU; see :func:`_warp_batch`).
    """
    backend = resolve_warp_backend(backend)
    X, Y, _ = d1.shape
    gx, gy = jnp.meshgrid(jnp.arange(X, dtype=jnp.float32),
                          jnp.arange(Y, dtype=jnp.float32), indexing="ij")
    px = gx + d2[..., 0]
    py = gy + d2[..., 1]
    if backend == "mxu":
        srcs = jnp.stack([d1[..., 0], d1[..., 1]])        # (2, X, Y)
        out = _tent_warp_primal(srcs, jnp.stack([px, px]),
                                jnp.stack([py, py]), precision)
        return d2 + jnp.stack([out[0], out[1]], axis=-1)
    d1x = sample_2d(d1[..., 0], px, py)
    d1y = sample_2d(d1[..., 1], px, py)
    return d2 + jnp.stack([d1x, d1y], axis=-1)


def invert_field(disp: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Invert a pull-back displacement field by fixed-point iteration:
    v = -u(x + v(x)).  Converges fast for the smooth, small inter-frame
    deformations of cine tracking; lets the motion driver register each
    adjacent frame pair ONCE and derive the reverse transform (the
    reference registers every pair in both directions,
    ``cardiac_utils.py:882-910``)."""
    X, Y, _ = disp.shape
    gx, gy = jnp.meshgrid(jnp.arange(X, dtype=jnp.float32),
                          jnp.arange(Y, dtype=jnp.float32), indexing="ij")

    def body(_, v):
        px = gx + v[..., 0]
        py = gy + v[..., 1]
        ux = sample_2d(disp[..., 0], px, py)
        uy = sample_2d(disp[..., 1], px, py)
        return -jnp.stack([ux, uy], axis=-1)

    return jax.lax.fori_loop(0, iters, body, jnp.zeros_like(disp))


def invert_field_batch(disp: jnp.ndarray, iters: int = 10,
                       backend: str = "auto",
                       precision: str = "float32") -> jnp.ndarray:
    """Batched :func:`invert_field` for (B, X, Y, 2) fields: the two
    displacement channels of all B fields sample through ONE batched
    resample per iteration — tent-basis MXU matmuls on TPU, a single
    global flat gather elsewhere (see :func:`_warp_batch`)."""
    B, X, Y, _ = disp.shape
    backend = resolve_warp_backend(backend)
    gx, gy = jnp.meshgrid(jnp.arange(X, dtype=jnp.float32),
                          jnp.arange(Y, dtype=jnp.float32), indexing="ij")
    srcs = jnp.concatenate([disp[..., 0], disp[..., 1]], axis=0)  # (2B,X,Y)

    def body(_, v):
        px = gx[None] + v[..., 0]
        py = gy[None] + v[..., 1]
        cx = jnp.concatenate([px, px], axis=0)
        cy = jnp.concatenate([py, py], axis=0)
        if backend == "mxu":
            out = _tent_warp_primal(srcs, cx, cy, precision)
        else:
            out, _ = _bilinear_batch_impl(srcs, cx, cy)
        return -jnp.stack([out[:B], out[B:]], axis=-1)

    return jax.lax.fori_loop(0, iters, body, jnp.zeros_like(disp))


def compose_chain(pair_fields: jnp.ndarray, backend: str = "auto",
                  precision: str = "float32") -> jnp.ndarray:
    """Prefix-compose a chain of pull-back pair transforms in ONE program.

    pair_fields: (K, X, Y, 2) where entry k maps frame k → k+1 (the
    forward inter-frame chain, ``cardiac_utils.py:891-900``).  Returns
    (K+1, X, Y, 2): entry t is the 0→t composition (entry 0 = identity).
    A ``lax.scan`` replaces K sequential host-dispatched compositions —
    each a full tunnel round-trip in the reference-style loop.
    """
    K, X, Y, _ = pair_fields.shape
    backend = resolve_warp_backend(backend)

    def step(acc, d):
        new = compose_fields(d, acc, backend=backend, precision=precision)
        return new, new

    init = jnp.zeros((X, Y, 2))
    _, outs = jax.lax.scan(step, init, pair_fields)
    return jnp.concatenate([init[None], outs], axis=0)


def average_fields(fields: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted average of displacement fields — the ``average_3d_ffd``
    C++ tool collapses to one weighted sum (``average_3d_ffd.cc:102-120``)."""
    w = weights.reshape((-1,) + (1,) * (fields.ndim - 1))
    return jnp.sum(fields * w, axis=0)


@functools.lru_cache(maxsize=64)
def make_register_batch(image_shape: Tuple[int, int],
                        cfg: RegConfig = RegConfig(), mesh=None,
                        axis: str = "data"):
    """Batched registration: (N, X, Y) targets x sources → per-level
    control stacks with a leading batch axis.  One batched device program
    per optimisation step replaces the reference's ~300 sequential MIRTK
    subprocesses (SURVEY.md §3.4).

    Structure: the jitted unit is ONE vmapped Adam step per level (a small
    graph that compiles in seconds) driven by a Python loop — jitting the
    whole multi-level optimisation as a single program produces a graph
    the XLA compiler chews on for many minutes at no runtime benefit
    (dispatch overhead ~1 ms against ~10 ms steps).

    The factory is lru_cached on (image_shape, cfg, mesh, axis): cohort
    loops that rebuild it per subject reuse the jitted level programs
    whenever the crop shape repeats, instead of retracing every subject.

    ``mesh``: optional ``jax.sharding.Mesh`` — the pair population shards
    over ``axis`` (registrations are mutually independent, so scaling
    over ICI-attached chips is embarrassingly parallel; the batch pads up
    to the axis size internally).  Results are identical to the
    single-device path (tested on the virtual mesh).
    """
    X, Y = image_shape
    warp_backend = resolve_warp_backend(cfg.warp_backend)
    factors = [2 ** (cfg.levels - 1 - l) for l in range(cfg.levels)]
    # pad once so every pyramid level divides exactly (edge replicate —
    # introduces no new intensity extremes)
    f0 = factors[0]
    Xp = -(-X // f0) * f0
    Yp = -(-Y // f0) * f0
    level_shapes = [(Xp // f, Yp // f) for f in factors]
    sigmas = [cfg.smooth_sigma * (f - 1) for f in factors]  # anti-alias blur
    opt = optax.adam(cfg.lr)

    def make_level(l):
        """Jitted (step-block, cross-synth) for pyramid level l.

        The level optimises a lattice of spacing ``cfg.spacing`` on images
        downsampled by ``factors[l]`` — MIRTK's actual multi-resolution
        scheme.  A coarse lattice c at factor f is EXACTLY the full-res
        lattice (f*c) at spacing f*spacing (the B-spline basis rescales),
        so the public consumers (total_field / transform_points) stay
        unchanged.
        """
        Xl, Yl = level_shapes[l]
        f_l = factors[l]

        def batch_loss(c, base_disp, tgt, src, mask):
            # SUM of the independent per-item energies: its gradient is
            # exactly the stack of per-item gradients, but the hot warp
            # runs as ONE global gather across the batch instead of a
            # vmapped per-item gather (measured 45.5 vs 56.5 ms per step
            # at B=150, 96² — XLA lowers the batched gather better)
            disp = base_disp + jax.vmap(
                lambda cc: bspline.bspline_dense_field(
                    cc, (Xl, Yl), cfg.spacing))(c)
            warped = _warp_batch(src, disp, backend=warp_backend,
                                 precision=cfg.warp_precision)
            if cfg.metric == "nmi":
                sim = -jnp.sum(jax.vmap(
                    lambda t, w: losses.nmi(t, w, cfg.n_bins))(tgt, warped))
            elif cfg.padding_value is not None:
                sim = jnp.sum(jax.vmap(
                    lambda t, w, m: losses.ssd(t, w, m))(tgt, warped, mask))
            else:
                sim = jnp.sum(jax.vmap(
                    lambda t, w: losses.ssd(t, w))(tgt, warped))
            be = jnp.sum(jax.vmap(losses.bending_energy)(disp))
            return sim + cfg.be_weight * be

        grad = jax.grad(batch_loss)
        # ALL of a level's steps in one dispatch: the fori_loop graph is
        # one step regardless of trip count, so compile cost is flat,
        # while each extra dispatch costs ~0.26 s on this host's tunnel
        steps_per_call = cfg.iters

        @jax.jit
        def step_block(c, opt_state, base, tgt, src, mask):
            def body(_, carry):
                c, opt_state = carry
                g = grad(c, base, tgt, src, mask)
                updates, opt_state2 = opt.update(g, opt_state, c)
                return optax.apply_updates(c, updates), opt_state2

            return jax.lax.fori_loop(0, steps_per_call, body, (c, opt_state))

        @jax.jit
        def synth_prev_levels(prev_controls):
            """Displacement of all finished levels, evaluated at THIS
            level's resolution in this level's pixel units."""
            base = jnp.zeros((Xl, Yl, 2))
            for m, c_m in enumerate(prev_controls):
                ratio = factors[m] // f_l          # ≥ 2, integer
                base = base + ratio * bspline.bspline_dense_field(
                    c_m, (Xl, Yl), cfg.spacing * ratio)
            return base

        return (step_block, jax.jit(jax.vmap(synth_prev_levels)),
                steps_per_call)

    levels = [make_level(l) for l in range(cfg.levels)]

    @jax.jit
    def normalise_pair(targets, sources):
        t32 = targets.astype(jnp.float32)
        s32 = sources.astype(jnp.float32)
        lo = jnp.min(t32, axis=(1, 2), keepdims=True)
        scale = jnp.maximum(
            jnp.max(t32, axis=(1, 2), keepdims=True) - lo, 1e-6)
        return (t32 - lo) / scale, (s32 - lo) / scale

    blurs = {}
    for l, sig in enumerate(sigmas):
        if sig > 0:
            f = factors[l]
            blurs[l] = jax.jit(jax.vmap(
                lambda x, sig=sig, f=f: gaussian_blur(x, sig)[::f, ::f]))
        elif factors[l] > 1:
            f = factors[l]
            blurs[l] = jax.jit(jax.vmap(lambda x, f=f: x[::f, ::f]))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_sharding = NamedSharding(mesh, P(axis))
        n_shard = mesh.shape[axis]
    else:
        batch_sharding, n_shard = None, 1

    def register(targets, sources):
        targets = jnp.asarray(targets)
        sources = jnp.asarray(sources)
        B_in = targets.shape[0]
        if B_in == 0:
            raise ValueError("empty registration batch: no frame pairs")
        if n_shard > 1:
            # pad the pair population to the mesh axis and shard it; the
            # padded (cycled) pairs register to redundant lattices that
            # are sliced off below.  Cycling (not a [:pad_n] slice)
            # handles B_in smaller than the mesh axis.
            pad_n = (-B_in) % n_shard
            if pad_n:
                reps = -(-pad_n // B_in)
                targets = jnp.concatenate(
                    [targets] + [targets] * reps, axis=0)[:B_in + pad_n]
                sources = jnp.concatenate(
                    [sources] + [sources] * reps, axis=0)[:B_in + pad_n]
            targets = jax.device_put(targets, batch_sharding)
            sources = jax.device_put(sources, batch_sharding)
        B = targets.shape[0]
        # MIRTK's "Padding value": voxels at/below it in the TARGET are
        # excluded from the similarity (par/ffd_cine_2d_motion.cfg:12)
        mask_full = (targets.astype(jnp.float32)
                     > (cfg.padding_value if cfg.padding_value is not None
                        else -jnp.inf)).astype(jnp.float32)
        tgt_n, src_n = normalise_pair(targets, sources)
        if (Xp, Yp) != (X, Y):
            tgt_n = jnp.pad(tgt_n, ((0, 0), (0, Xp - X), (0, Yp - Y)),
                            mode="edge")
            src_n = jnp.pad(src_n, ((0, 0), (0, Xp - X), (0, Yp - Y)),
                            mode="edge")
            mask_full = jnp.pad(mask_full, ((0, 0), (0, Xp - X), (0, Yp - Y)),
                                mode="edge")

        controls = []
        for l in range(cfg.levels):
            step, synth_prev, steps_per_call = levels[l]
            Xl, Yl = level_shapes[l]
            tgt_l = blurs[l](tgt_n) if l in blurs else tgt_n
            src_l = blurs[l](src_n) if l in blurs else src_n
            f = factors[l]
            mask_l = mask_full[:, ::f, ::f] if f > 1 else mask_full
            base = (synth_prev(tuple(controls)) if controls
                    else jnp.zeros((B, Xl, Yl, 2)))
            Cx, Cy = bspline.lattice_shape((Xl, Yl), cfg.spacing)
            c = jnp.zeros((B, Cx, Cy, 2))
            opt_state = opt.init(c)
            for _ in range(cfg.iters // steps_per_call):
                c, opt_state = step(c, opt_state, base, tgt_l, src_l, mask_l)
            controls.append(c)

        # rescale to full-resolution lattices: values in full-res pixels,
        # spacing cfg.spacing * factor (what total_field expects)
        return tuple(c[:B_in] * f for c, f in zip(controls, factors))

    return register
