"""Model heads: loss + prob + pred wrappers over the backbone networks.

Reference: ``common/network_ao.py:138-211,322-399`` (``UNet_Model``,
``Temporal_UNet_Model``, ``UNet_LSTM_Model``).  Each wrapper returns
``(loss, prob, pred, new_state)`` — the jittable unit the trainers
differentiate.
"""

from __future__ import annotations

import jax.numpy as jnp

from ukbb_cardiac_tpu.models import convlstm, losses, unet
from ukbb_cardiac_tpu.models.fcn import prob_and_pred


def unet_model(params, state, names, cfg, images, labels, train=False,
               compute_dtype=None):
    """2D U-Net + softmax CE (``network_ao.py:138-161``).

    images: (N, X, Y, C); labels: (N, X, Y).  ``compute_dtype``:
    activation dtype (bf16 mixed precision — params/BN/logits/loss stay
    f32, see ``models/layers.py``); default f32.
    """
    logits, _, new_state = unet.apply_unet(
        params, state, names, cfg, images, train,
        compute_dtype=compute_dtype or jnp.float32)
    loss = losses.softmax_cross_entropy(logits, labels, cfg.n_class)
    prob, pred = prob_and_pred(logits)
    return loss, prob, pred, new_state


def temporal_unet_model(params, state, names, cfg, images, labels, train=False,
                        weight_R=1, weight_r=0.0, compute_dtype=None):
    """2D+t U-Net + triangular-weighted temporal CE (``network_ao.py:164-211``).

    images: (N, T, X, Y, C); labels: (N, T, X, Y).
    """
    logits, _, new_state = unet.apply_temporal_unet(
        params, state, names, cfg, images, train,
        compute_dtype=compute_dtype or jnp.float32)
    loss = losses.weighted_temporal_cross_entropy(logits, labels, cfg.n_class, weight_R, weight_r)
    prob, pred = prob_and_pred(logits)
    return loss, prob, pred, new_state


def unet_lstm_features(params, state, names, cfg, images, train_unet=False,
                       compute_dtype=None):
    """Run the UNet backbone per frame and return (N, T, X, Y, n_filter[0])
    features (``network_ao.py:332-345``).

    images: (N, T, X, Y, C).  The temporal axis folds into the batch for the
    UNet — on TPU this is the ideal layout: (N*T) slices fill the MXU.
    """
    N, T, X, Y, C = images.shape
    flat = images.reshape(N * T, X, Y, C)
    _, features, new_state = unet.apply_unet(
        params, state, names, cfg, flat, train_unet,
        compute_dtype=compute_dtype or jnp.float32)
    return features.reshape(N, T, X, Y, -1), new_state


def unet_lstm_model(params, state, names, cfg, images, labels, train=False,
                    train_unet=False, bidirectional=True, seq2seq=True,
                    weight_R=1, weight_r=0.0, compute_dtype=None):
    """UNet features → (Bi)ConvLSTM → per-frame logits + loss
    (``network_ao.py:322-399``).

    params must contain both the nested UNet scope and the LSTM head
    (as produced by ``train.train_ao.init_unet_lstm``).
    images: (N, T, X, Y, C); labels: (N, T, X, Y).
    """
    features, new_state = unet_lstm_features(params, state, names, cfg, images,
                                             train_unet,
                                             compute_dtype=compute_dtype)
    if bidirectional:
        logits = convlstm.apply_biconv_lstm(params, features)
    else:
        logits = convlstm.apply_conv_lstm(params, features)

    if seq2seq:
        loss = losses.weighted_temporal_cross_entropy(
            logits, labels, cfg.n_class, weight_R, weight_r
        )
    else:
        loss = losses.centre_frame_cross_entropy(logits, labels, cfg.n_class)
    prob, pred = prob_and_pred(logits)
    return loss, prob, pred, new_state
