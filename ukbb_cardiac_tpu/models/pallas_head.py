"""Fused FCN multiscale head as a Pallas TPU kernel (inference).

The FCN head (``/root/reference/common/network.py:201-229``) projects every
encoder level to 32 channels, upsamples all levels to full resolution with
fixed bilinear transposed convs, concatenates (160 channels at full res —
the model's largest tensor), and applies a 3-layer 1x1 head.  In XLA this
is HBM-traffic-bound: the five upsampled planes, the concat and the fc
activations all round-trip through HBM (~9 ms of a 22 ms forward for a
125-slice chunk at 192x208, measured).

This kernel fuses the ENTIRE head per slice with every full-resolution
intermediate living in VMEM:

  per slice (one grid step):
    y_l   = relu(feats_l @ Wsd_l + bsd_l)          per level, BN folded
    M1_l  = Y-upsample(y_l)  -> (X_l, 32, Y)       once per slice (scratch)
    per row block (XB rows):
      acc  = y0_block @ W1[0:32]                   level-0 fc1 slice
      acc += (A_x_block @ M1_l) @ W1[32l:32l+32]   levels 1..4
      z    = relu(acc + b1);  z = relu(z @ W2 + b2)
      out  = Wout^T z + bout  -> (n_class, XB, Y)  channels-first write

Only the channels-first logits leave the chip (the class axis never lands
on the 128-lane dimension, so no lane-padding write amplification).
Inference-mode BatchNorm folds into the 1x1 kernels on the host
(:func:`fold_conv_bn`).  The bilinear upsample uses the exact
interpolation matrices of ``layers.transpose_upsample2d``, so the kernel
computes the same function as ``fcn.apply_fcn``'s head — only bf16/f32
summation order differs (pinned by ``tests/test_pallas.py``).

STATUS: experimental, NOT wired into the deploy engine — measured SLOWER
than the XLA head on the chip.  At 125 slices, 192x208, bf16: full
forward 38.0 ms (fori_loop form) / 36.9 ms (unrolled) with this kernel
vs 24.6 ms XLA, and Mosaic compiles it in 2-8 minutes.  The
HBM traffic the fusion saves (~6 GB/chunk of upsample/concat/fc
intermediates, ~7 ms at bandwidth) is outweighed by the in-kernel
layout changes: Mosaic supports dot_general only when the 3D operand
contracts its middle/last dim, so the X-upsample and the channels-first
logits write each require vector transposes ((1,0,2)/(2,1,0)) whose
relayout shuffles dominate.  Kept as working, tested Mosaic machinery
(tests/test_pallas.py runs it in interpret mode) and as the written
measurement that the XLA head is already near this kernel's achievable
bound; the deploy engine keeps the XLA head (this kernel deliberately
has no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ukbb_cardiac_tpu.models import layers as L


def fold_conv_bn(kernel, bn_p, bn_s):
    """Fold an inference-mode BatchNorm into a 1x1 conv (no bias).

    conv -> BN(eval) == conv with a scaled kernel plus a bias:
      scale = gamma / sqrt(var + eps);  W' = W * scale;
      b' = beta - moving_mean * scale.
    kernel: (1, 1, Cin, Cout) or (Cin, Cout).  Returns (W2d, b).
    """
    W = jnp.asarray(kernel, jnp.float32)
    if W.ndim == 4:
        W = W[0, 0]
    scale = (jnp.asarray(bn_p["gamma"], jnp.float32)
             * jax.lax.rsqrt(jnp.asarray(bn_s["moving_variance"],
                                         jnp.float32) + L.BN_EPSILON))
    bias = (jnp.asarray(bn_p["beta"], jnp.float32)
            - jnp.asarray(bn_s["moving_mean"], jnp.float32) * scale)
    return W * scale[None, :], bias


def _make_kernel(n_level, same_dim, XB, shapes, unroll=True):
    """Kernel body factory; see module docstring for the dataflow."""
    X, Y = shapes[0][0], shapes[0][1]

    def kernel(*refs):
        i = 0
        feats = refs[i:i + n_level]; i += n_level
        Wsd = refs[i:i + n_level]; i += n_level
        bsd = refs[i:i + n_level]; i += n_level           # (1, 32) each
        Ax = refs[i:i + n_level - 1]; i += n_level - 1    # (X, X_l)
        Ay = refs[i:i + n_level - 1]; i += n_level - 1    # (Y, Y_l)
        W1, b1, W2, b2, Wout, bout = refs[i:i + 6]; i += 6
        out = refs[i]; i += 1                             # (1, nc, X, Y)
        M1 = refs[i:]                                     # scratch per level

        cdt = feats[0].dtype

        def dot3(a, b):
            """(..., K) x (K, D) -> (..., D), f32 accumulation on the MXU."""
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        # --- per-slice: coarse same-dim projections + Y-upsample --------
        # Stored channels-first (32, X_l, Y): Mosaic supports dot_general
        # contractions on a 3D operand's MIDDLE dim (the X-upsample below)
        # but not ones that would flatten lane dims; the (1,0,2) transpose
        # here keeps every downstream contraction in that supported form.
        for l in range(1, n_level):
            f = feats[l][0]                               # (X_l, Y_l, C_l)
            y = jnp.maximum(dot3(f, Wsd[l][:].astype(cdt)) + bsd[l][:], 0.0)
            # contract Y_l with the (Y, Y_l) interpolation matrix
            m = jax.lax.dot_general(
                y.astype(cdt), Ay[l - 1][:].astype(cdt),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (X_l, 32, Y)
            M1[l - 1][:] = jnp.transpose(m, (1, 0, 2)).astype(cdt)

        # --- per row block: X-upsample + fc head -------------------------
        def row_block(xb, _):
            r0 = xb * XB
            f0 = feats[0][0, pl.ds(r0, XB)]               # (XB, Y, C0)
            y0 = jnp.maximum(dot3(f0, Wsd[0][:].astype(cdt)) + bsd[0][:],
                             0.0)
            acc = dot3(y0.astype(cdt),
                       W1[0:same_dim].astype(cdt))        # (XB, Y, fc) f32
            for l in range(1, n_level):
                axb = Ax[l - 1][pl.ds(r0, XB)]            # (XB, X_l)
                m2 = jax.lax.dot_general(
                    M1[l - 1][:], axb.astype(cdt),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (32, Y, XB)
                m2 = jnp.transpose(m2, (2, 1, 0))         # (XB, Y, 32)
                acc = acc + dot3(
                    m2.astype(cdt),
                    W1[l * same_dim:(l + 1) * same_dim].astype(cdt))
            z = jnp.maximum(acc + b1[:], 0.0).astype(cdt)
            z = jnp.maximum(dot3(z, W2[:].astype(cdt)) + b2[:],
                            0.0).astype(cdt)
            # logits channels-last, then channels-first for the write
            blk = dot3(z, Wout[:].astype(cdt))            # (XB, Y, nc)
            blk = jnp.transpose(blk, (2, 0, 1))           # (nc, XB, Y)
            out[0, :, pl.ds(r0, XB)] = blk + bout[:][:, :, None]
            return 0

        if unroll:
            # straight-line row blocks: Mosaic compiles this ~20x faster
            # than the fori_loop form (dynamic-index loop: 231 s vs ~10 s
            # measured), at a larger-but-fitting VMEM stack
            for xb in range(X // XB):
                row_block(xb, 0)
        else:
            # fori_loop: one iteration's stack footprint — the fallback
            # for shapes whose unrolled stack would exceed VMEM
            jax.lax.fori_loop(0, X // XB, row_block, 0)

    return kernel


def _replicated(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _run(meta, shapes, interpret, unroll, feats, weights):
    n_level = len(shapes)
    same_dim, n_class = meta
    X, Y = shapes[0][0], shapes[0][1]
    XB = 32 if X % 32 == 0 else 16
    N = feats[0].shape[0]
    cdt = feats[0].dtype

    in_specs = [pl.BlockSpec((1,) + tuple(s), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
                for s in [f.shape[1:] for f in feats]]
    in_specs += [_replicated(w.shape) for w in weights]

    out = pl.pallas_call(
        _make_kernel(n_level, same_dim, XB, shapes, unroll=unroll),
        grid=(N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_class, X, Y), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, n_class, X, Y), jnp.float32),
        scratch_shapes=[pltpu.VMEM((same_dim, shapes[l][0], Y), cdt)
                        for l in range(1, n_level)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*feats, *weights)
    return out


def make_fused_head(params, state, names, cfg, compute_dtype=jnp.bfloat16,
                    interpret=None, unroll=True):
    """Build ``head(feats) -> logits (N, n_class, X, Y) float32`` running
    the fused Pallas kernel.  ``feats``: per-level encoder outputs (level 0
    at the full padded resolution).  BN folds into the 1x1 kernels once,
    here.  ``interpret=None`` auto-selects the Pallas interpreter off-TPU
    (so CPU tests execute the same kernel)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_level = cfg.n_level

    Wsd, bsd = [], []
    for l in range(n_level):
        cname, bname = names["same_dim"][l]
        W, b = fold_conv_bn(params[cname]["kernel"], params[bname],
                            state[bname])
        Wsd.append(W)
        bsd.append(b.reshape(1, -1))
    (c1n, b1n), (c2n, b2n) = names["fc"]
    W1, b1 = fold_conv_bn(params[c1n]["kernel"], params[b1n], state[b1n])
    W2, b2 = fold_conv_bn(params[c2n]["kernel"], params[b2n], state[b2n])
    Wout = jnp.asarray(params[names["out"]]["kernel"][0, 0], jnp.float32)
    bout = jnp.asarray(params[names["out"]]["bias"],
                       jnp.float32).reshape(-1, 1)
    meta = (cfg.same_dim, cfg.n_class)

    def head(feats):
        shapes = tuple(tuple(f.shape[1:]) for f in feats)
        Ax = [jnp.asarray(L._upsample_matrix(shapes[l][0], 2 ** l))
              for l in range(1, n_level)]
        Ay = [jnp.asarray(L._upsample_matrix(shapes[l][1], 2 ** l))
              for l in range(1, n_level)]
        fs = tuple(f.astype(compute_dtype) for f in feats)
        weights = tuple(Wsd + bsd + Ax + Ay
                        + [W1, b1.reshape(1, -1), W2, b2.reshape(1, -1),
                           Wout, bout])
        return _run(meta, shapes, interpret, unroll, fs, weights)

    return head


def apply_fcn_pallas(params, state, names, cfg, image,
                     compute_dtype=jnp.bfloat16, head=None):
    """FCN forward: XLA encoder + fused Pallas head.
    Returns channels-first logits (N, n_class, X, Y) float32 — take
    ``argmax(axis=1)`` for predictions (no transpose needed)."""
    x = image.astype(compute_dtype)
    feats = []
    for l in range(cfg.n_level):
        for i, nm in enumerate(names["levels"][l]):
            strides = (2, 2) if (l > 0 and i == 0) else (1, 1)
            x, _ = L.conv2d_bn_relu(x, params, state, nm, False,
                                    strides=strides)
        feats.append(x)
    if head is None:
        head = make_fused_head(params, state, names, cfg, compute_dtype)
    return head(feats)
