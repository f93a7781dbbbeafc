"""FCN and ResNet-FCN segmenters — the main SA/LA models.

Reference: ``common/network.py:170-300`` (``build_FCN``, ``build_ResNet``).
VGG-style encoder with stride-2 downsampling, every level projected to
``same_dim`` channels with a 1x1 conv, upsampled back to full resolution
with *fixed* bilinear transposed convs of factor 2^l, concatenated, then a
two-layer 1x1 head producing class logits.

TPU-native design notes:
- One functional ``apply`` traced once per (padded) shape; the deploy
  engine feeds the full (Z*T, X, Y, 1) slice batch of a cine through a
  single jit call instead of the reference's per-frame session.run loop
  (``deploy_network.py:103-116``).
- The fixed bilinear upsampling runs as a depthwise input-dilated conv
  (see ``layers.transpose_upsample2d``) instead of the reference's dense
  channel-diagonal kernel.
- Parameter names replicate tf.layers graph-order naming so the released
  ``FCN_sa`` / ``FCN_la_2ch`` / ``FCN_la_4ch`` / ``FCN_la_4ch_seg4``
  checkpoints convert name-for-name.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp

from ukbb_cardiac_tpu.models import layers as L


@dataclass(frozen=True)
class FCNConfig:
    n_class: int = 4
    n_level: int = 5
    n_filter: Sequence[int] = (16, 32, 64, 128, 256)
    n_block: Sequence[int] = (2, 2, 3, 3, 3)
    same_dim: int = 32
    fc: int = 64
    in_ch: int = 1


def init_fcn(key, cfg: FCNConfig):
    """Create (params, state, names) for the FCN.

    Creation order matches the TF graph build order in
    ``network.py:170-230``: encoder blocks level by level, then the
    same-dim 1x1 projections, then the two fc 1x1 convs, then the final
    logits conv (which has a bias, unlike every other conv).
    """
    namer = L.Namer()
    params, state = {}, {}
    names = {"levels": [], "same_dim": [], "fc": []}

    n_keys = sum(cfg.n_block) + cfg.n_level + 3
    keys = iter(jax.random.split(key, n_keys))

    in_ch = cfg.in_ch
    for l in range(cfg.n_level):
        level_names = []
        for i in range(cfg.n_block[l]):
            nm, p, s = L.init_conv_bn(next(keys), namer, in_ch, cfg.n_filter[l], 3)
            params.update(p)
            state.update(s)
            level_names.append(nm)
            in_ch = cfg.n_filter[l]
        names["levels"].append(level_names)

    for l in range(cfg.n_level):
        nm, p, s = L.init_conv_bn(next(keys), namer, cfg.n_filter[l], cfg.same_dim, 1)
        params.update(p)
        state.update(s)
        names["same_dim"].append(nm)

    in_ch = cfg.same_dim * cfg.n_level
    for _ in range(2):
        nm, p, s = L.init_conv_bn(next(keys), namer, in_ch, cfg.fc, 1)
        params.update(p)
        state.update(s)
        names["fc"].append(nm)
        in_ch = cfg.fc

    out_name = namer("conv2d")
    params[out_name] = {
        "kernel": L.glorot_uniform(next(keys), (1, 1, cfg.fc, cfg.n_class)),
        "bias": jnp.zeros((cfg.n_class,), jnp.float32),
    }
    names["out"] = out_name
    return params, state, names


def _multiscale_head(params, state, names, cfg, feats, train, compute_dtype,
                     fused: bool):
    """Same-dim projections → multiscale merge → two-layer fc head.

    The reference materialises a full-resolution concat of every level's
    upsampled ``same_dim`` projection — (N, X, Y, same_dim*n_level), the
    model's largest tensor — then convolves it 1x1 to ``fc`` channels
    (``network.py:207-221``).  That tensor exists only to feed a linear
    map, and the fixed bilinear upsample is spatial-only linear while the
    1x1 fc conv is channel-only linear, so the two commute:

        W_l @ Up_l(f_l) == Up_l(W_l @ f_l)
        fc1(concat_l Up_l(f_l)) == sum_l Up_l(f_l @ W_l) + BN/ReLU

    The fused head therefore applies each level's slice of the fc kernel
    at *coarse* resolution (1/4^l of the pixels) and accumulates the
    upsampled ``fc``-channel partial sums in f32 — the concat is never
    written to or read from HBM, removing the head's dominant memory
    traffic.  Mathematically identical up to f32 reassociation
    (``tests/test_models.py`` pins fused vs unfused to ~1e-4).

    Measured on the chip (192x208, bf16): the fused form wins in
    *training* (272 vs 258 img/s — the backward pass never forms the
    concat's gradient) while the concat form wins in *inference*
    (0.163 vs 0.199 s/SAX-cine — eval is forward-only, and the wider
    fc-channel upsamples cost more than the concat they avoid), so the
    default follows the ``train`` flag.
    """
    new_state = {}
    fc1_cname, fc1_bname = names["fc"][0]
    W = params[fc1_cname]["kernel"]  # (1, 1, same_dim*n_level, fc)

    if fused:
        z = None
        for l in range(cfg.n_level):
            f, ns = L.conv2d_bn_relu(feats[l], params, state,
                                     names["same_dim"][l], train)
            new_state.update(ns)
            Wl = W[:, :, l * cfg.same_dim:(l + 1) * cfg.same_dim, :]
            y = L.conv2d(f, Wl)
            if l > 0:
                y = L.transpose_upsample2d(y, factor=2 ** l)
            y = y.astype(jnp.float32)
            z = y if z is None else z + y
        x, new_bn = L.batch_norm(z, params[fc1_bname], state[fc1_bname], train)
        new_state[fc1_bname] = new_bn
        x = jax.nn.relu(x).astype(compute_dtype)
    else:
        ups = []
        for l in range(cfg.n_level):
            f, ns = L.conv2d_bn_relu(feats[l], params, state,
                                     names["same_dim"][l], train)
            new_state.update(ns)
            if l > 0:
                f = L.transpose_upsample2d(f, factor=2 ** l)
            ups.append(f)
        x = jnp.concatenate(ups, axis=-1)
        x, ns = L.conv2d_bn_relu(x, params, state, names["fc"][0], train)
        new_state.update(ns)

    x, ns = L.conv2d_bn_relu(x, params, state, names["fc"][1], train)
    new_state.update(ns)
    out = params[names["out"]]
    logits = L.conv2d(x, out["kernel"], bias=out["bias"])
    return logits.astype(jnp.float32), new_state


def apply_fcn(params, state, names, cfg: FCNConfig, image, train: bool = False,
              compute_dtype=jnp.float32, fused_head=None):
    """Forward pass: image (N, X, Y, C) → logits (N, X, Y, n_class).

    X and Y must be multiples of 2^(n_level-1) (the deploy engine pads to a
    multiple of 16, matching ``deploy_network.py:94-100``).
    ``fused_head`` selects the sum-of-levels head (True) or the literal
    concat formulation of ``network.py:207-221`` (False); both compute
    the same function (see :func:`_multiscale_head`), and ``None``
    (default) picks the measured-faster form for the mode: fused when
    training, concat for inference.
    Returns (logits, new_state).
    """
    if fused_head is None:
        fused_head = train
    x = image.astype(compute_dtype)
    new_state = {}
    feats = []

    for l in range(cfg.n_level):
        for i, nm in enumerate(names["levels"][l]):
            strides = (2, 2) if (l > 0 and i == 0) else (1, 1)
            x, ns = L.conv2d_bn_relu(x, params, state, nm, train, strides=strides)
            new_state.update(ns)
        feats.append(x)

    logits, ns = _multiscale_head(params, state, names, cfg, feats, train,
                                  compute_dtype, fused_head)
    new_state.update(ns)
    return logits, new_state


@dataclass(frozen=True)
class ResNetConfig(FCNConfig):
    use_bottleneck: bool = False


def init_resnet(key, cfg: ResNetConfig):
    """ResNet-FCN params (``network.py:233-300``): plain conv blocks at
    levels 0-1, residual/bottleneck units from level 2, same multiscale head."""
    namer = L.Namer()
    params, state = {}, {}
    names = {"levels": [], "res_levels": [], "same_dim": [], "fc": []}
    keys = iter(jax.random.split(key, 4 * sum(cfg.n_block) + cfg.n_level + 3))

    in_ch = cfg.in_ch
    for l in range(2):
        level_names = []
        for i in range(cfg.n_block[l]):
            nm, p, s = L.init_conv_bn(next(keys), namer, in_ch, cfg.n_filter[l], 3)
            params.update(p)
            state.update(s)
            level_names.append(nm)
            in_ch = cfg.n_filter[l]
        names["levels"].append(level_names)

    for l in range(2, cfg.n_level):
        level_names = []
        for i in range(cfg.n_block[l]):
            strides = 2 if i == 0 else 1
            nm, p, s = L.init_residual_unit(
                next(keys), namer, in_ch, cfg.n_filter[l], strides, cfg.use_bottleneck
            )
            params.update(p)
            state.update(s)
            level_names.append(nm)
            in_ch = cfg.n_filter[l]
        names["res_levels"].append(level_names)

    for l in range(cfg.n_level):
        nm, p, s = L.init_conv_bn(next(keys), namer, cfg.n_filter[l], cfg.same_dim, 1)
        params.update(p)
        state.update(s)
        names["same_dim"].append(nm)

    in_ch = cfg.same_dim * cfg.n_level
    for _ in range(2):
        nm, p, s = L.init_conv_bn(next(keys), namer, in_ch, cfg.fc, 1)
        params.update(p)
        state.update(s)
        names["fc"].append(nm)
        in_ch = cfg.fc

    out_name = namer("conv2d")
    params[out_name] = {
        "kernel": L.glorot_uniform(next(keys), (1, 1, cfg.fc, cfg.n_class)),
        "bias": jnp.zeros((cfg.n_class,), jnp.float32),
    }
    names["out"] = out_name
    return params, state, names


def apply_resnet(params, state, names, cfg: ResNetConfig, image, train: bool = False,
                 compute_dtype=jnp.float32, fused_head=None):
    """Forward pass of the ResNet-FCN; returns (logits, new_state).
    ``fused_head`` as in :func:`apply_fcn` (None = fused iff training)."""
    if fused_head is None:
        fused_head = train
    x = image.astype(compute_dtype)
    new_state = {}
    feats = []

    for l in range(2):
        for i, nm in enumerate(names["levels"][l]):
            strides = (2, 2) if (l > 0 and i == 0) else (1, 1)
            x, ns = L.conv2d_bn_relu(x, params, state, nm, train, strides=strides)
            new_state.update(ns)
        feats.append(x)

    for level_names in names["res_levels"]:
        for nm in level_names:
            x, ns = L.residual_unit(x, params, state, nm, train)
            new_state.update(ns)
        feats.append(x)

    logits, ns = _multiscale_head(params, state, names, cfg, feats, train,
                                  compute_dtype, fused_head)
    new_state.update(ns)
    return logits, new_state


def prob_and_pred(logits):
    """Softmax probability and argmax prediction — the graph-contract
    tensors named ``prob``/``pred`` in the reference
    (``train_network.py:198-199``)."""
    prob = jax.nn.softmax(logits, axis=-1)
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return prob, pred
