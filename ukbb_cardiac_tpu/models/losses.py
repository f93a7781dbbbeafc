"""Loss functions for segmentation training.

Reference: softmax cross-entropy (``train_network.py:204-206``,
``network_ao.py:151-154``), focal loss (``network_ao.py:117-135``) and the
triangular time-window-weighted CE of the temporal models
(``network_ao.py:179-204,354-381``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits, labels, n_class: int):
    """Mean softmax CE with integer labels. logits (..., C), labels (...)."""
    log_p = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, n_class, dtype=log_p.dtype)
    return -jnp.mean(jnp.sum(onehot * log_p, axis=-1))


def focal_loss(labels, logits, n_class: int, alpha: float):
    """Class-balanced loss as implemented by the reference
    (``network_ao.py:117-135``).

    Note: despite its name, the reference implements an *alpha-balanced CE*
    (no (1-p)^gamma modulation): the one-hot target is scaled by alpha for
    foreground / (1-alpha) for background before
    softmax_cross_entropy_with_logits, which simply scales each pixel's CE.
    Preserved verbatim for parity.
    """
    log_p = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, n_class, dtype=log_p.dtype)
    alpha_t = jnp.where(labels != 0, alpha, 1.0 - alpha)[..., None]
    return -jnp.mean(jnp.sum(alpha_t * onehot * log_p, axis=-1))


def temporal_window_weights(n_step: int, weight_R: int, weight_r: float):
    """Triangular window weights w_t = (1 - d/R)^r for |d| <= R else 0,
    centred at s = (n_step-1)//2 (``network_ao.py:179-195``)."""
    s = (n_step - 1) // 2
    w = []
    for t in range(n_step):
        d = abs(t - s)
        w.append(pow(1.0 - float(d) / weight_R, weight_r) if d <= weight_R else 0.0)
    return jnp.asarray(w, jnp.float32)


def weighted_temporal_cross_entropy(logits, labels, n_class: int, weight_R: int,
                                    weight_r: float):
    """Per-frame CE averaged with triangular window weights.

    logits: (N, T, X, Y, C); labels: (N, T, X, Y).
    Matches ``network_ao.py:178-204``: each frame's mean CE is weighted by
    w_t and the sum is normalised by sum(w).
    """
    n_step = logits.shape[1]
    w = temporal_window_weights(n_step, weight_R, weight_r)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, n_class, dtype=log_p.dtype)
    per_frame = -jnp.mean(jnp.sum(onehot * log_p, axis=-1), axis=(0, 2, 3))  # (T,)
    return jnp.sum(w * per_frame) / jnp.sum(w)


def centre_frame_cross_entropy(logits, labels, n_class: int):
    """CE on the centre frame only (``network_ao.py:382-392``, seq2seq=False)."""
    t = (logits.shape[1] - 1) // 2
    return softmax_cross_entropy(logits[:, t], labels[:, t], n_class)
