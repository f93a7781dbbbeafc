"""Neural-net building blocks: conv/BN/ReLU units, fixed bilinear upsampling.

Functional JAX equivalents of the reference's graph builders
(``common/network.py:19-167``).  Parameters live in explicit pytrees whose
leaf names mirror TensorFlow's ``tf.layers`` auto-naming (``conv2d``,
``conv2d_1``, …, ``batch_normalization_k/{gamma,beta,moving_mean,
moving_variance}``) so that converting the reference's released checkpoints
is a name-for-name copy (SURVEY.md §5 "checkpoint/resume").

Layout is NHWC (TPU-friendly); convolution kernels are HWIO, the same
layout TF uses, so checkpoint tensors need no transposition.  All apply
functions are jit/vmap-safe, take a ``train`` flag resolved at trace time,
and thread BatchNorm moving statistics through an explicit ``state`` pytree.

TF-semantics notes (needed for Dice parity with released checkpoints):
- ``tf.layers.batch_normalization`` defaults: epsilon=1e-3, momentum=0.99.
- ``tf.layers.conv2d`` 'same' padding == XLA 'SAME'.
- ``tf.nn.conv2d_transpose`` == input-dilated convolution with a spatially
  flipped, channel-swapped kernel; the checkpoint converter performs that
  flip once at load time so runtime stays a pure `conv_general_dilated`.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np

BN_EPSILON = 1e-3  # tf.layers.batch_normalization default
BN_MOMENTUM = 0.99


class Namer:
    """Reproduces tf.layers' graph-order unique naming: conv2d, conv2d_1, ..."""

    def __init__(self):
        self.counts = {}

    def __call__(self, base: str) -> str:
        n = self.counts.get(base, 0)
        self.counts[base] = n + 1
        return base if n == 0 else f"{base}_{n}"


# ---------------------------------------------------------------------------
# Initialisers (match tf.layers defaults: glorot_uniform for conv kernels)
# ---------------------------------------------------------------------------

def glorot_uniform(key, shape, dtype=jnp.float32):
    """Glorot/Xavier uniform for HWIO (or HWDIO) conv kernels."""
    receptive = int(np.prod(shape[:-2]))
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------

def conv2d(x, kernel, strides=(1, 1), padding="SAME", bias=None):
    """NHWC 2D convolution (HWIO kernel), MXU-targeted.

    The TPU MXU accumulates bf16 operands in f32 natively (rounding only
    at the output), so no explicit upcast is needed — and an explicit
    ``preferred_element_type`` upcast would break AD dtype consistency
    for bf16 training (f32 cotangent against bf16 primals).
    """
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=tuple(strides),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv3d(x, kernel, strides=(1, 1, 1), padding="SAME", bias=None):
    """NDHWC 3D convolution (DHWIO kernel)."""
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=tuple(strides),
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _same_transpose_padding(kernel: int, stride: int):
    """Per-dim (lo, hi) padding for an input-dilated conv equivalent to
    TF conv2d_transpose(padding='SAME', stride s): output size = s * input."""
    # Forward SAME conv with stride s and kernel k pads a total of
    # max(k - s, 0) (for input divisible by s); transposed conv pads
    # k - 1 - fwd_pad on each side.
    pad_total_fwd = max(kernel - stride, 0)
    fwd_lo = pad_total_fwd // 2
    fwd_hi = pad_total_fwd - fwd_lo
    return (kernel - 1 - fwd_lo, kernel - 1 - fwd_hi)


def conv2d_transpose(x, kernel, stride=2, bias=None, feature_group_count=1):
    """TF-SAME transposed conv via input dilation (kernel HWIO, pre-flipped).

    The kernel here is in *correlation* orientation: the checkpoint
    converter flips TF's conv2d_transpose kernels spatially and swaps the
    channel axes once at load, so the hot path is a single
    conv_general_dilated (XLA lowers this straight onto the MXU).
    """
    k = kernel.shape[0]
    pad = _same_transpose_padding(k, stride)
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=(pad, pad),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv3d_transpose(x, kernel, strides=(1, 2, 2), bias=None):
    """TF-SAME 3D transposed conv via input dilation (kernel DHWIO, pre-flipped)."""
    ks = kernel.shape[:3]
    pads = tuple(_same_transpose_padding(k, s) for k, s in zip(ks, strides))
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding=pads,
        lhs_dilation=tuple(strides),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def batch_norm(x, p, s, train: bool):
    """TF-semantics batch norm over all but the channel axis.

    p: {'gamma','beta'}; s: {'moving_mean','moving_variance'}.
    Returns (y, new_s).  In train mode the batch statistics normalise and
    the moving stats update with momentum 0.99 (biased variance, as TF's
    fused BN does); in eval mode the moving stats normalise.
    """
    axes = tuple(range(x.ndim - 1))
    if train:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=axes)
        var = jnp.var(x32, axis=axes)
        new_s = {
            "moving_mean": s["moving_mean"] * BN_MOMENTUM + mean * (1 - BN_MOMENTUM),
            "moving_variance": s["moving_variance"] * BN_MOMENTUM + var * (1 - BN_MOMENTUM),
        }
    else:
        mean, var = s["moving_mean"], s["moving_variance"]
        new_s = s
    inv = jax.lax.rsqrt(var + BN_EPSILON) * p["gamma"]
    y = (x.astype(jnp.float32) - mean) * inv + p["beta"]
    return y.astype(x.dtype), new_s


# ---------------------------------------------------------------------------
# Composite units (conv + BN + ReLU), init/apply pairs
# ---------------------------------------------------------------------------

def init_conv_bn(key, namer: Namer, in_ch, out_ch, kernel_size=3, conv3d_=False,
                 transpose=False):
    """Create one conv(-no-bias)+BN unit's params/state under TF-style names."""
    params, state = {}, {}
    base = ("conv3d" if conv3d_ else "conv2d") + ("_transpose" if transpose else "")
    cname = namer(base)
    bname = namer("batch_normalization")
    if conv3d_:
        kshape = (kernel_size, kernel_size, kernel_size, in_ch, out_ch)
    else:
        kshape = (kernel_size, kernel_size, in_ch, out_ch)
    params[cname] = {"kernel": glorot_uniform(key, kshape)}
    params[bname] = {
        "gamma": jnp.ones((out_ch,), jnp.float32),
        "beta": jnp.zeros((out_ch,), jnp.float32),
    }
    state[bname] = {
        "moving_mean": jnp.zeros((out_ch,), jnp.float32),
        "moving_variance": jnp.ones((out_ch,), jnp.float32),
    }
    return (cname, bname), params, state


def conv2d_bn_relu(x, params, state, names, train, strides=(1, 1)):
    """conv2d (no bias) → BN → ReLU (``network.py:19-25``).

    The conv accumulates and BN normalises in f32; the unit's output is
    cast back to its INPUT dtype so a bf16 compute dtype carries through
    the whole network instead of decaying to f32 after the first conv.
    """
    cname, bname = names
    dtype = x.dtype
    x = conv2d(x, params[cname]["kernel"], strides=strides)
    x, new_bn = batch_norm(x, params[bname], state[bname], train)
    return jax.nn.relu(x).astype(dtype), {bname: new_bn}


def conv2d_transpose_bn_relu(x, params, state, names, train, stride=2):
    """conv2d_transpose (no bias) → BN → ReLU (``network.py:28-34``)."""
    cname, bname = names
    dtype = x.dtype
    x = conv2d_transpose(x, params[cname]["kernel"], stride=stride)
    x, new_bn = batch_norm(x, params[bname], state[bname], train)
    return jax.nn.relu(x).astype(dtype), {bname: new_bn}


def conv3d_bn_relu(x, params, state, names, train, strides=(1, 1, 1)):
    """conv3d (no bias) → BN → ReLU (``network.py:37-43``)."""
    cname, bname = names
    dtype = x.dtype
    x = conv3d(x, params[cname]["kernel"], strides=strides)
    x, new_bn = batch_norm(x, params[bname], state[bname], train)
    return jax.nn.relu(x).astype(dtype), {bname: new_bn}


def conv3d_transpose_bn_relu(x, params, state, names, train, strides=(1, 2, 2)):
    """conv3d_transpose (no bias) → BN → ReLU (``network.py:46-52``)."""
    cname, bname = names
    dtype = x.dtype
    x = conv3d_transpose(x, params[cname]["kernel"], strides=strides)
    x, new_bn = batch_norm(x, params[bname], state[bname], train)
    return jax.nn.relu(x).astype(dtype), {bname: new_bn}


# ---------------------------------------------------------------------------
# Fixed bilinear upsampling (transpose_upsample2d, network.py:117-167)
# ---------------------------------------------------------------------------

def linear_1d(sz: int) -> np.ndarray:
    """1D triangular interpolation kernel (``network.py:117-124``)."""
    if sz % 2 == 0:
        raise NotImplementedError("`Linear kernel` requires odd filter size.")
    c = (sz + 1) // 2
    h = np.array(list(range(1, c + 1)) + list(range(c - 1, 0, -1)), dtype=np.float32)
    return h / float(c)


def linear_2d(sz: int) -> np.ndarray:
    """Separable 2D triangular kernel (``network.py:127-135``)."""
    h = linear_1d(sz)
    return np.outer(h, h).astype(np.float32)


def _upsample_matrix(n_in: int, factor: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix equal to TF's 'SAME'
    conv2d_transpose with the 1D triangular kernel of size 2*factor-1.

    Each output row has at most two non-zeros (triangular kernel support),
    so the whole upsample is linear interpolation; materialising it as a
    small dense matrix lets the 2D upsample run as two MXU matmuls instead
    of a (2f-1)^2 input-dilated depthwise conv (f=16 -> 961-tap kernel).
    """
    k = 2 * factor - 1
    h = linear_1d(k).astype(np.float64)  # kernel taps
    n_out = n_in * factor
    pad_lo, _ = _same_transpose_padding(k, factor)
    # input-dilated signal: value c[i] at dilated index i*factor;
    # out[x] = sum_j h[j] * dilated[x - pad_lo + j]
    A = np.zeros((n_out, n_in), dtype=np.float32)
    for x in range(n_out):
        for j in range(k):
            d = x - pad_lo + j
            if d % factor == 0:
                i = d // factor
                if 0 <= i < n_in:
                    A[x, i] += h[j]
    return A


def transpose_upsample2d(x, factor: int):
    """Fixed-bilinear 2^l upsampling: TF conv2d_transpose('SAME', stride
    factor) with the frozen ``linear_2d`` kernel (``network.py:138-167``),
    computed as two small dense interpolation matmuls.

    The reference materialises a dense (sz, sz, n, n) transposed-conv
    kernel that is diagonal over channels (``network.py:146-149``).  The
    separable triangular kernel touches at most 2 input pixels per output
    pixel per axis, so the exact same math is  A_x @ img @ A_y^T  with
    (out, in) matrices — MXU matmuls with no dead lanes, ~500x fewer MACs
    than the 31x31 depthwise form at factor 16.
    """
    N, X, Y, C = x.shape
    Ax = jnp.asarray(_upsample_matrix(X, factor), dtype=x.dtype)
    Ay = jnp.asarray(_upsample_matrix(Y, factor), dtype=x.dtype)
    # (N, X, Y, C): upsample X then Y via tensordot (MXU)
    out = jnp.einsum("ax,nxyc->nayc", Ax, x)
    out = jnp.einsum("by,nayc->nabc", Ay, out)
    return out


# ---------------------------------------------------------------------------
# Residual units (network.py:55-114) — pre-activation
# ---------------------------------------------------------------------------

def init_residual_unit(key, namer: Namer, in_ch, out_ch, strides=1, bottleneck=False):
    """Parameters for a (pre-activation) residual or bottleneck unit."""
    keys = jax.random.split(key, 4)
    params, state, names = {}, {}, {"convs": [], "bns": [], "shortcut": None}

    def add_bn(ch):
        bname = namer("batch_normalization")
        params[bname] = {"gamma": jnp.ones((ch,), jnp.float32), "beta": jnp.zeros((ch,), jnp.float32)}
        state[bname] = {
            "moving_mean": jnp.zeros((ch,), jnp.float32),
            "moving_variance": jnp.ones((ch,), jnp.float32),
        }
        names["bns"].append(bname)

    def add_conv(k, kin, kout, kk):
        cname = namer("conv2d")
        params[cname] = {"kernel": glorot_uniform(k, (kk, kk, kin, kout))}
        names["convs"].append(cname)

    if bottleneck:
        mid = out_ch // 4
        add_bn(in_ch); add_conv(keys[0], in_ch, mid, 1)
        add_bn(mid); add_conv(keys[1], mid, mid, 3)
        add_bn(mid); add_conv(keys[2], mid, out_ch, 1)
    else:
        add_bn(in_ch); add_conv(keys[0], in_ch, out_ch, 3)
        add_bn(out_ch); add_conv(keys[1], out_ch, out_ch, 3)

    if in_ch != out_ch or strides != 1:
        sname = namer("conv2d")
        params[sname] = {"kernel": glorot_uniform(keys[3], (1, 1, in_ch, out_ch))}
        names["shortcut"] = sname
    names["strides"] = strides
    names["bottleneck"] = bottleneck
    return names, params, state


def residual_unit(x, params, state, names, train):
    """Pre-activation residual/bottleneck unit (``network.py:55-114``)."""
    orig_x = x
    dtype = x.dtype
    new_state = {}
    strides = names["strides"]
    stride_list = [strides] + [1] * (len(names["convs"]) - 1)
    for i, (cname, bname) in enumerate(zip(names["convs"], names["bns"])):
        x, new_bn = batch_norm(x, params[bname], state[bname], train)
        new_state[bname] = new_bn
        x = jax.nn.relu(x).astype(dtype)
        s = stride_list[i]
        x = conv2d(x, params[cname]["kernel"], strides=(s, s))
    if names["shortcut"] is not None:
        shortcut = conv2d(orig_x, params[names["shortcut"]]["kernel"], strides=(strides, strides))
    else:
        shortcut = orig_x
    return (shortcut + x).astype(dtype), new_state
