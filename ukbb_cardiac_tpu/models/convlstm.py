"""Convolutional LSTM heads for temporally-consistent aortic segmentation.

Reference: ``common/network_ao.py:214-319`` (``Conv_LSTM``, ``BiConv_LSTM``)
which unroll ``tf.contrib.rnn.Conv2DLSTMCell`` over a *fixed* window of
``n_step`` frames in python — forcing deploy to slide a 9-frame circular
window over the cine with triangular-weight blending
(``deploy_network_ao.py:129-183``).

TPU-native design: the recurrence is a ``jax.lax.scan`` — one compiled
step body, any sequence length as a static shape — so deploy covers the
full T-frame cine in one device program with no window approximation
(SURVEY.md §2.4(c)).  A window-compat mode is kept in the deploy engine
for parity testing with the released ``UNet-LSTM_ao`` checkpoint.

Cell semantics match TF's ConvLSTMCell for checkpoint parity: one conv
over concat([x, h]) producing 4*n_hidden channels, gate order
(input, new_input, forget, output), forget-gate bias 1.0:
  c' = sigmoid(f + 1) * c + sigmoid(i) * tanh(j);  h' = tanh(c') * sigmoid(o)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ukbb_cardiac_tpu.models import layers as L

FORGET_BIAS = 1.0


def init_convlstm_cell(key, in_ch: int, n_hidden: int, kernel_size: int = 3):
    """Cell params: kernel (k, k, in_ch + n_hidden, 4*n_hidden) + biases."""
    return {
        "kernel": L.glorot_uniform(key, (kernel_size, kernel_size, in_ch + n_hidden, 4 * n_hidden)),
        "biases": jnp.zeros((4 * n_hidden,), jnp.float32),
    }


def convlstm_cell(params, x, c, h):
    """One ConvLSTM step. x: (N, X, Y, C); c, h: (N, X, Y, n_hidden)."""
    xh = jnp.concatenate([x, h.astype(x.dtype)], axis=-1)
    gates = L.conv2d(xh, params["kernel"], bias=params["biases"])
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f + FORGET_BIAS) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
    h_new = jnp.tanh(c_new) * jax.nn.sigmoid(o)
    return c_new, h_new


def _scan_cell(params, features, reverse: bool = False):
    """Scan the cell over time. features: (N, T, X, Y, C) → h: (N, T, X, Y, H)."""
    N, T, X, Y, _ = features.shape
    n_hidden = params["kernel"].shape[-1] // 4
    c0 = jnp.zeros((N, X, Y, n_hidden), jnp.float32)
    h0 = jnp.zeros((N, X, Y, n_hidden), jnp.float32)

    def step(carry, x_t):
        c, h = carry
        c, h = convlstm_cell(params, x_t, c, h)
        return (c, h), h

    xs = jnp.moveaxis(features, 1, 0)  # (T, N, X, Y, C)
    _, hs = jax.lax.scan(step, (c0, h0), xs, reverse=reverse)
    return jnp.moveaxis(hs, 0, 1)  # (N, T, X, Y, H)


def init_conv_lstm(key, in_ch: int, n_hidden: int, n_class: int):
    """Unidirectional head (``network_ao.py:214-252``): cell + 1x1 logits conv."""
    k1, k2 = jax.random.split(key)
    return {
        "LSTM": {
            "conv_2d_lstm_cell": init_convlstm_cell(k1, in_ch, n_hidden),
            "conv2d": {
                "kernel": L.glorot_uniform(k2, (1, 1, n_hidden, n_class)),
                "bias": jnp.zeros((n_class,), jnp.float32),
            },
        }
    }


def apply_conv_lstm(params, features):
    """features: (N, T, X, Y, C) → per-frame logits (N, T, X, Y, n_class)."""
    p = params["LSTM"]
    hs = _scan_cell(p["conv_2d_lstm_cell"], features)
    N, T, X, Y, H = hs.shape
    flat = hs.reshape(N * T, X, Y, H)
    logits = L.conv2d(flat, p["conv2d"]["kernel"], bias=p["conv2d"]["bias"])
    return logits.reshape(N, T, X, Y, -1).astype(jnp.float32)


def init_biconv_lstm(key, in_ch: int, n_hidden: int, n_class: int):
    """Bidirectional head (``network_ao.py:255-319``): forward + backward
    cells, concatenated hidden states, shared 1x1 logits conv."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "LSTM": {
            "forward": {"conv_2d_lstm_cell": init_convlstm_cell(k1, in_ch, n_hidden)},
            "backward": {"conv_2d_lstm_cell": init_convlstm_cell(k2, in_ch, n_hidden)},
            "output": {
                "conv2d": {
                    "kernel": L.glorot_uniform(k3, (1, 1, 2 * n_hidden, n_class)),
                    "bias": jnp.zeros((n_class,), jnp.float32),
                }
            },
        }
    }


def apply_biconv_lstm(params, features):
    """features: (N, T, X, Y, C) → per-frame logits (N, T, X, Y, n_class).

    The backward pass consumes the sequence reversed; output t concatenates
    forward h[t] with backward h[t] (the reference indexes its backward
    list with n_step-1-t, which after its reversed loop order is the
    backward hidden state *at frame t* — same thing).
    """
    p = params["LSTM"]
    h_fw = _scan_cell(p["forward"]["conv_2d_lstm_cell"], features, reverse=False)
    h_bw = _scan_cell(p["backward"]["conv_2d_lstm_cell"], features, reverse=True)
    hs = jnp.concatenate([h_fw, h_bw], axis=-1)
    N, T, X, Y, H = hs.shape
    flat = hs.reshape(N * T, X, Y, H)
    out = p["output"]["conv2d"]
    logits = L.conv2d(flat, out["kernel"], bias=out["bias"])
    return logits.reshape(N, T, X, Y, -1).astype(jnp.float32)
