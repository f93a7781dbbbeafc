"""U-Net and Temporal (2D+t) U-Net — the aortic segmenters.

Reference: ``common/network_ao.py:18-114`` (``UNet``, ``Temporal_UNet``).
Classic encoder/decoder with transpose-conv upsampling and skip
concatenation; the temporal variant uses 3D convs with stride (1, s, s) so
the time axis keeps full resolution (``network_ao.py:87,100``).

Parameter pytrees are nested by TF variable scope (``UNet/conv0/conv2d``)
so the released ``UNet-LSTM_ao`` checkpoint — which restores only the
``UNet/`` scope in phase-2 training (``train_network_ao.py:407-414``) —
converts scope-for-scope.  ``apply_unet`` also returns the ``conv0_up``
feature map, the tensor the UNet-LSTM head consumes
(``network_ao.py:342``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp

from ukbb_cardiac_tpu.models import layers as L


@dataclass(frozen=True)
class UNetConfig:
    n_class: int = 3
    n_level: int = 5
    n_filter: Sequence[int] = (16, 32, 64, 128, 256)
    n_block: Sequence[int] = (2, 2, 2, 2, 2)
    in_ch: int = 1


def _init_scope_conv(key, namer, in_ch, out_ch, k=3, conv3d_=False, transpose=False):
    return L.init_conv_bn(key, namer, in_ch, out_ch, k, conv3d_=conv3d_, transpose=transpose)


def init_unet(key, cfg: UNetConfig, conv3d_=False, scope: str = "UNet"):
    """Create nested (params, state, names) for the (Temporal) U-Net."""
    params, state = {scope: {}}, {scope: {}}
    names = {"down": [], "up": [], "scope": scope}
    keys = iter(jax.random.split(key, 4 * sum(cfg.n_block) + 2 * cfg.n_level + 2))

    in_ch = cfg.in_ch
    for l in range(cfg.n_level):
        sub = f"conv{l}"
        namer = L.Namer()
        params[scope][sub], state[scope][sub] = {}, {}
        level_names = []
        for i in range(cfg.n_block[l]):
            nm, p, s = _init_scope_conv(next(keys), namer, in_ch, cfg.n_filter[l], 3, conv3d_)
            params[scope][sub].update(p)
            state[scope][sub].update(s)
            level_names.append(nm)
            in_ch = cfg.n_filter[l]
        names["down"].append((sub, level_names))

    # Decoder: for l = n_level-2 .. 0, a transpose conv + n_block[l] convs.
    for l in range(cfg.n_level - 2, -1, -1):
        sub = f"conv{l}_up"
        namer = L.Namer()
        params[scope][sub], state[scope][sub] = {}, {}
        up_in = cfg.n_filter[l + 1]
        nm_t, p, s = _init_scope_conv(
            next(keys), namer, up_in, cfg.n_filter[l], 3, conv3d_, transpose=True
        )
        params[scope][sub].update(p)
        state[scope][sub].update(s)
        level_names = [nm_t]
        in_ch = cfg.n_filter[l] * 2  # skip concat
        for i in range(cfg.n_block[l]):
            nm, p, s = _init_scope_conv(next(keys), namer, in_ch, cfg.n_filter[l], 3, conv3d_)
            params[scope][sub].update(p)
            state[scope][sub].update(s)
            level_names.append(nm)
            in_ch = cfg.n_filter[l]
        names["up"].append((sub, level_names))

    # Output conv (with bias, tf.layers.conv2d default)
    sub = "conv_out"
    namer = L.Namer()
    cname = namer("conv3d" if conv3d_ else "conv2d")
    kshape = (
        (1, 1, 1, cfg.n_filter[0], cfg.n_class) if conv3d_ else (1, 1, cfg.n_filter[0], cfg.n_class)
    )
    params[scope][sub] = {
        cname: {"kernel": L.glorot_uniform(next(keys), kshape), "bias": jnp.zeros((cfg.n_class,))}
    }
    names["out"] = (sub, cname)
    return params, state, names


def apply_unet(params, state, names, cfg: UNetConfig, image, train: bool = False,
               compute_dtype=jnp.float32):
    """U-Net forward: (N, X, Y, C) → (logits, conv0_up features, new_state)."""
    scope = names["scope"]
    x = image.astype(compute_dtype)
    new_state = {scope: {}}
    skips = {}

    for l, (sub, level_names) in enumerate(names["down"]):
        new_state[scope].setdefault(sub, {})
        for i, nm in enumerate(level_names):
            strides = (2, 2) if (l > 0 and i == 0) else (1, 1)
            x, ns = L.conv2d_bn_relu(x, params[scope][sub], state[scope][sub], nm, train, strides)
            new_state[scope][sub].update(ns)
        skips[l] = x

    for (sub, level_names), l in zip(names["up"], range(cfg.n_level - 2, -1, -1)):
        new_state[scope].setdefault(sub, {})
        nm_t = level_names[0]
        x, ns = L.conv2d_transpose_bn_relu(x, params[scope][sub], state[scope][sub], nm_t, train, 2)
        new_state[scope][sub].update(ns)
        x = jnp.concatenate([skips[l], x], axis=-1)
        for nm in level_names[1:]:
            x, ns = L.conv2d_bn_relu(x, params[scope][sub], state[scope][sub], nm, train)
            new_state[scope][sub].update(ns)

    features = x  # conv0_up — consumed by the LSTM head
    sub, cname = names["out"]
    out = params[scope][sub][cname]
    logits = L.conv2d(features, out["kernel"], bias=out["bias"]).astype(jnp.float32)
    return logits, features, new_state


def apply_temporal_unet(params, state, names, cfg: UNetConfig, image, train: bool = False,
                        compute_dtype=jnp.float32):
    """Temporal U-Net forward: (N, T, X, Y, C) → (logits, features, new_state).

    3D convs with stride (1, s, s): time keeps full resolution
    (``network_ao.py:67-114``).
    """
    scope = names["scope"]
    x = image.astype(compute_dtype)
    new_state = {scope: {}}
    skips = {}

    for l, (sub, level_names) in enumerate(names["down"]):
        new_state[scope].setdefault(sub, {})
        for i, nm in enumerate(level_names):
            strides = (1, 2, 2) if (l > 0 and i == 0) else (1, 1, 1)
            x, ns = L.conv3d_bn_relu(x, params[scope][sub], state[scope][sub], nm, train, strides)
            new_state[scope][sub].update(ns)
        skips[l] = x

    for (sub, level_names), l in zip(names["up"], range(cfg.n_level - 2, -1, -1)):
        new_state[scope].setdefault(sub, {})
        nm_t = level_names[0]
        x, ns = L.conv3d_transpose_bn_relu(
            x, params[scope][sub], state[scope][sub], nm_t, train, (1, 2, 2)
        )
        new_state[scope][sub].update(ns)
        x = jnp.concatenate([skips[l], x], axis=-1)
        for nm in level_names[1:]:
            x, ns = L.conv3d_bn_relu(x, params[scope][sub], state[scope][sub], nm, train)
            new_state[scope][sub].update(ns)

    features = x
    sub, cname = names["out"]
    out = params[scope][sub][cname]
    logits = L.conv3d(features, out["kernel"], bias=out["bias"]).astype(jnp.float32)
    return logits, features, new_state
