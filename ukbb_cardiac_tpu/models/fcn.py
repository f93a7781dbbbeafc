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


def apply_fcn(params, state, names, cfg: FCNConfig, image, train: bool = False,
              compute_dtype=jnp.float32):
    """Forward pass: image (N, X, Y, C) → logits (N, X, Y, n_class).

    X and Y must be multiples of 2^(n_level-1) (the deploy engine pads to a
    multiple of 16, matching ``deploy_network.py:94-100``).
    Returns (logits, new_state).
    """
    x = image.astype(compute_dtype)
    new_state = {}
    feats = []

    for l in range(cfg.n_level):
        for i, nm in enumerate(names["levels"][l]):
            strides = (2, 2) if (l > 0 and i == 0) else (1, 1)
            x, ns = L.conv2d_bn_relu(x, params, state, nm, train, strides=strides)
            new_state.update(ns)
        feats.append(x)

    ups = []
    for l in range(cfg.n_level):
        f, ns = L.conv2d_bn_relu(feats[l], params, state, names["same_dim"][l], train)
        new_state.update(ns)
        if l > 0:
            f = L.transpose_upsample2d(f, factor=2 ** l)
        ups.append(f)

    x = jnp.concatenate(ups, axis=-1)
    for nm in names["fc"]:
        x, ns = L.conv2d_bn_relu(x, params, state, nm, train)
        new_state.update(ns)

    out = params[names["out"]]
    logits = L.conv2d(x, out["kernel"], bias=out["bias"])
    return logits.astype(jnp.float32), new_state


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
                 compute_dtype=jnp.float32):
    """Forward pass of the ResNet-FCN; returns (logits, new_state)."""
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

    ups = []
    for l in range(cfg.n_level):
        f, ns = L.conv2d_bn_relu(feats[l], params, state, names["same_dim"][l], train)
        new_state.update(ns)
        if l > 0:
            f = L.transpose_upsample2d(f, factor=2 ** l)
        ups.append(f)

    x = jnp.concatenate(ups, axis=-1)
    for nm in names["fc"]:
        x, ns = L.conv2d_bn_relu(x, params, state, nm, train)
        new_state.update(ns)

    out = params[names["out"]]
    logits = L.conv2d(x, out["kernel"], bias=out["bias"])
    return logits.astype(jnp.float32), new_state


def prob_and_pred(logits):
    """Softmax probability and argmax prediction — the graph-contract
    tensors named ``prob``/``pred`` in the reference
    (``train_network.py:198-199``)."""
    prob = jax.nn.softmax(logits, axis=-1)
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return prob, pred
