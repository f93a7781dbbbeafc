"""One-command released-checkpoint verification (VERDICT r2 #4).

Given a reference TF checkpoint (``FCN_sa``, ``FCN_la_2ch``,
``FCN_la_4ch``, ``FCN_la_4ch_seg4``, ``UNet-LSTM_ao`` — the files
``demo_pipeline.py:50-54`` downloads), this command:

1. converts it to a native bundle (``ckpt/tf_reader.py``), printing the
   inferred architecture;
2. when tensorflow is importable, recomputes the reference forward with
   raw eager ``tf.nn`` ops from the SAME checkpoint values and prints
   the PER-LAYER max-abs activation difference against the JAX forward
   (FCN/UNet; the UNet-LSTM compares the per-frame probability output);
3. with ``--data_dir``, segments each subject's ED frame with the
   converted bundle and prints per-class Dice between the JAX and TF
   predictions.

Exit code 0 = everything within tolerance; 1 = mismatch; 2 = could not
run (no tensorflow for steps 2-3).  The day network egress exists,
real-checkpoint parity is:

    python -m ukbb_cardiac_tpu.cli.verify_checkpoint \\
        --model_path trained_model/FCN_sa --data_dir demo_image
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def resolve_prefix(model_path: str) -> str:
    """Accept a TF checkpoint prefix, a directory containing one, or an
    already-converted .npz bundle."""
    if model_path.endswith(".npz"):
        return model_path
    if os.path.isdir(model_path):
        metas = sorted(glob.glob(os.path.join(model_path, "*.meta")))
        if not metas:
            raise FileNotFoundError(
                f"no .meta checkpoint file under {model_path}")
        return metas[-1][:-len(".meta")]
    if os.path.exists(model_path + ".index") or \
            os.path.exists(model_path + ".meta"):
        return model_path
    raise FileNotFoundError(f"no checkpoint at {model_path}")


# --- eager tf.nn reference forwards (weights = converted values) ----------

def _tf_conv_bn_relu(tf, x, params, state, nm, strides=1):
    cname, bname = nm
    x = tf.nn.conv2d(x, np.asarray(params[cname]["kernel"], np.float32),
                     strides=strides, padding="SAME")
    s, p = state[bname], params[bname]
    x = tf.nn.batch_normalization(
        x, np.asarray(s["moving_mean"]), np.asarray(s["moving_variance"]),
        np.asarray(p["beta"]), np.asarray(p["gamma"]), 1e-3)
    return tf.nn.relu(x)


def tf_fcn_layers(tf, params, state, names, cfg, image):
    """Yield (layer_label, activation) through the reference FCN
    (``network.py:170-230``) with eager tf.nn ops."""
    from ukbb_cardiac_tpu.models import layers as L

    x = tf.constant(image)
    feats = []
    for l in range(cfg.n_level):
        for i, nm in enumerate(names["levels"][l]):
            x = _tf_conv_bn_relu(tf, x, params, state, nm,
                                 2 if (l > 0 and i == 0) else 1)
            yield f"level{l}/{nm[0]}", x
        feats.append(x)
    ups = []
    for l in range(cfg.n_level):
        f = _tf_conv_bn_relu(tf, feats[l], params, state, names["same_dim"][l])
        yield f"same_dim{l}/{names['same_dim'][l][0]}", f
        if l > 0:
            factor = 2 ** l
            sz = factor * 2 - 1
            W = L.linear_2d(sz)
            n = int(f.shape[-1])
            kernel = np.zeros((sz, sz, n, n), np.float32)
            for c in range(n):
                kernel[:, :, c, c] = W
            N, H, Wd, C = [int(v) for v in f.shape]
            f = tf.nn.conv2d_transpose(
                f, kernel, output_shape=[N, H * factor, Wd * factor, C],
                strides=factor, padding="SAME")
            yield f"upsample{l}", f
        ups.append(f)
    x = tf.concat(ups, axis=-1)
    for nm in names["fc"]:
        x = _tf_conv_bn_relu(tf, x, params, state, nm)
        yield f"fc/{nm[0]}", x
    out = params[names["out"]]
    x = tf.nn.conv2d(x, np.asarray(out["kernel"], np.float32),
                     strides=1, padding="SAME") + np.asarray(out["bias"])
    yield f"out/{names['out']}", x


def jax_fcn_layers(params, state, names, cfg, image):
    """The same walk through our JAX forward (``models/fcn.py``)."""
    import jax.numpy as jnp

    from ukbb_cardiac_tpu.models import layers as L

    x = jnp.asarray(image)
    feats = []
    for l in range(cfg.n_level):
        for i, nm in enumerate(names["levels"][l]):
            strides = (2, 2) if (l > 0 and i == 0) else (1, 1)
            x, _ = L.conv2d_bn_relu(x, params, state, nm, False,
                                    strides=strides)
            yield f"level{l}/{nm[0]}", x
        feats.append(x)
    ups = []
    for l in range(cfg.n_level):
        f, _ = L.conv2d_bn_relu(feats[l], params, state, names["same_dim"][l],
                                False)
        yield f"same_dim{l}/{names['same_dim'][l][0]}", f
        if l > 0:
            f = L.transpose_upsample2d(f, 2 ** l)
            yield f"upsample{l}", f
        ups.append(f)
    x = jnp.concatenate(ups, axis=-1)
    for nm in names["fc"]:
        x, _ = L.conv2d_bn_relu(x, params, state, nm, False)
        yield f"fc/{nm[0]}", x
    out = params[names["out"]]
    x = L.conv2d(x, out["kernel"], bias=out["bias"])
    yield f"out/{names['out']}", x


def tf_unet_forward(tf, params, state, names, cfg, image):
    """Eager tf.nn reference UNet (``network_ao.py:18-64``); returns
    (logits, conv0_up features).  Mirrors ``unet.apply_unet``'s walk of
    the nested names structure exactly."""
    scope = names["scope"]
    p, s = params[scope], state[scope]
    x = tf.constant(image)
    skips = {}
    for l, (sub, level_names) in enumerate(names["down"]):
        for i, nm in enumerate(level_names):
            x = _tf_conv_bn_relu(tf, x, p[sub], s[sub], nm,
                                 2 if (l > 0 and i == 0) else 1)
        skips[l] = x
    for (sub, level_names), l in zip(names["up"],
                                     range(cfg.n_level - 2, -1, -1)):
        cname, bname = level_names[0]
        k = np.asarray(p[sub][cname]["kernel"], np.float32)
        # ours stores flipped (H, W, in, out) correlation kernels
        # (ckpt/tf_reader.py); tf.nn.conv2d_transpose wants (H, W, out, in)
        k_tf = np.ascontiguousarray(k[::-1, ::-1].transpose(0, 1, 3, 2))
        N, H, W, _ = [int(v) for v in x.shape]
        x = tf.nn.conv2d_transpose(
            x, k_tf, output_shape=[N, H * 2, W * 2, int(k.shape[3])],
            strides=2, padding="SAME")
        sb, pb = s[sub][bname], p[sub][bname]
        x = tf.nn.batch_normalization(
            x, np.asarray(sb["moving_mean"]),
            np.asarray(sb["moving_variance"]),
            np.asarray(pb["beta"]), np.asarray(pb["gamma"]), 1e-3)
        x = tf.nn.relu(x)
        x = tf.concat([skips[l], x], axis=-1)
        for nm in level_names[1:]:
            x = _tf_conv_bn_relu(tf, x, p[sub], s[sub], nm)
    sub, cname = names["out"]
    out = p[sub][cname]
    logits = tf.nn.conv2d(x, np.asarray(out["kernel"], np.float32),
                          strides=1, padding="SAME") + np.asarray(out["bias"])
    return logits, x


def tf_unet_lstm_prob(tf, params, state, names, cfg, images_ntxyc, bidir):
    """Eager reference UNet-LSTM forward (``network_ao.py:322-399``)."""
    N, T, X, Y, C = images_ntxyc.shape
    flat = images_ntxyc.reshape(N * T, X, Y, C)
    _, feats = tf_unet_forward(tf, params, state, names, cfg, flat)
    feats = tf.reshape(feats, [N, T, X, Y, int(feats.shape[-1])])

    def cell_seq(cp, xs):
        kernel = np.asarray(cp["kernel"], np.float32)
        biases = np.asarray(cp["biases"], np.float32)
        n_hidden = kernel.shape[-1] // 4
        c = tf.zeros([N, X, Y, n_hidden])
        h = tf.zeros([N, X, Y, n_hidden])
        hs = []
        for x_t in xs:
            g = tf.nn.conv2d(tf.concat([x_t, h], axis=-1), kernel,
                             strides=1, padding="SAME") + biases
            i, j, f, o = tf.split(g, 4, axis=3)
            c = tf.sigmoid(f + 1.0) * c + tf.sigmoid(i) * tf.tanh(j)
            h = tf.tanh(c) * tf.sigmoid(o)
            hs.append(h)
        return hs

    xs = [feats[:, t] for t in range(T)]
    lstm = params["LSTM"]
    if bidir:
        h_fw = cell_seq(lstm["forward"]["conv_2d_lstm_cell"], xs)
        h_bw = cell_seq(lstm["backward"]["conv_2d_lstm_cell"], xs[::-1])
        out = lstm["output"]["conv2d"]
        logits = [tf.nn.conv2d(tf.concat([h_fw[t], h_bw[T - 1 - t]], -1),
                               np.asarray(out["kernel"], np.float32),
                               strides=1, padding="SAME")
                  + np.asarray(out["bias"]) for t in range(T)]
    else:
        hs = cell_seq(lstm["conv_2d_lstm_cell"], xs)
        out = lstm["conv2d"]
        logits = [tf.nn.conv2d(hs[t], np.asarray(out["kernel"], np.float32),
                               strides=1, padding="SAME")
                  + np.asarray(out["bias"]) for t in range(T)]
    return tf.nn.softmax(tf.stack(logits, axis=1)).numpy()


def _dice(a, b, cls):
    from ukbb_cardiac_tpu.ops import np_categorical_dice

    if not ((a == cls).any() or (b == cls).any()):
        return 1.0  # class absent in both predictions: perfect agreement
    return float(np_categorical_dice(a, b, cls))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--model_path", default="",
                        help="TF checkpoint prefix, its directory, or a "
                             "converted .npz bundle (required except "
                             "with --fingerprint_diff)")
    parser.add_argument("--data_dir", default="",
                        help="Subject directories with <seq_name>.nii.gz "
                             "for the Dice check")
    parser.add_argument("--seq_name", default="sa")
    parser.add_argument("--atol", type=float, default=2e-4,
                        help="Max-abs activation tolerance vs the TF ops")
    parser.add_argument("--dice_min", type=float, default=0.999,
                        help="Per-class JAX-vs-TF label Dice threshold")
    parser.add_argument("--fingerprint", default="", metavar="OUT.json",
                        help="After conversion, write per-tensor content "
                             "fingerprints (name, shape, dtype, sha256, "
                             "moments) to this JSON — the offline "
                             "conversion-audit artifact (ckpt/"
                             "fingerprint.py); diff two dumps with "
                             "--fingerprint_diff")
    parser.add_argument("--fingerprint_diff", nargs=2, default=None,
                        metavar=("A.json", "B.json"),
                        help="Diff two fingerprint dumps and exit: lists "
                             "missing/extra/changed tensors (exit 1 on "
                             "any difference)")
    args = parser.parse_args(argv)

    from ukbb_cardiac_tpu.ckpt import store

    if args.fingerprint_diff:
        import json as _json

        from ukbb_cardiac_tpu.ckpt.fingerprint import diff_fingerprints
        with open(args.fingerprint_diff[0]) as f:
            a = _json.load(f)
        with open(args.fingerprint_diff[1]) as f:
            b = _json.load(f)
        d = diff_fingerprints(a, b)
        print(_json.dumps(d, indent=1))
        return 1 if (d["missing"] or d["extra"] or d["changed"]) else 0

    if not args.model_path:
        parser.error("--model_path is required (except with "
                     "--fingerprint_diff)")
    prefix = resolve_prefix(args.model_path)
    if prefix.endswith(".npz"):
        bundle = prefix
        print(f"Using converted bundle {bundle}")
    else:
        from ukbb_cardiac_tpu.ckpt.tf_reader import convert_tf_checkpoint
        bundle = convert_tf_checkpoint(prefix)
        print(f"Converted {prefix} -> {bundle}")
    if args.fingerprint:
        from ukbb_cardiac_tpu.ckpt.fingerprint import write_fingerprint
        fp = write_fingerprint(bundle, args.fingerprint)
        print(f"Fingerprinted {fp['n_tensors']} tensors -> "
              f"{args.fingerprint}")
    kind, cfg, names, params, state, extra = store.load_model(bundle)
    print(f"kind={kind} config={cfg}")

    try:
        import tensorflow as tf
    except ImportError:
        print("tensorflow not importable: conversion checked, forward "
              "parity NOT verified. Install tensorflow to complete.")
        return 2

    failures = []
    rng = np.random.RandomState(0)
    if kind == "fcn":
        image = rng.rand(1, 64, 64, 1).astype(np.float32)
        print(f"{'layer':40s} {'max|Δ|':>12s}")
        for (name_tf, a_tf), (name_j, a_j) in zip(
                tf_fcn_layers(tf, params, state, names, cfg, image),
                jax_fcn_layers(params, state, names, cfg, image)):
            assert name_tf == name_j
            d = float(np.max(np.abs(np.asarray(a_j) - a_tf.numpy())))
            flag = "" if d <= args.atol else "  <-- MISMATCH"
            print(f"{name_tf:40s} {d:12.3e}{flag}")
            if d > args.atol:
                failures.append((name_tf, d))
    elif kind == "resnet":
        print("resnet (unused by the released pipeline): conversion "
              "checked; no TF-op reference walk implemented")
        return 2
    elif kind in ("unet", "unet_lstm"):
        import jax.numpy as jnp

        from ukbb_cardiac_tpu.models import unet as unet_mod

        if kind == "unet":
            image = rng.rand(1, 64, 64, 1).astype(np.float32)
            ref, _ = tf_unet_forward(tf, params, state, names, cfg, image)
            ours, _, _ = unet_mod.apply_unet(params, state, names, cfg,
                                             jnp.asarray(image), train=False)
            d = float(np.max(np.abs(np.asarray(ours) - ref.numpy())))
            print(f"UNet logits max|Δ| = {d:.3e}")
            if d > args.atol:
                failures.append(("unet_logits", d))
        else:
            bidir = bool(extra.get("bidirectional", True))
            seq = rng.rand(1, 4, 64, 64, 1).astype(np.float32)
            ref_prob = tf_unet_lstm_prob(tf, params, state, names, cfg,
                                         seq, bidir)
            from ukbb_cardiac_tpu.infer.deploy_ao import AorticEngine
            eng = AorticEngine(kind, cfg, names, params, state,
                               bidirectional=bidir)
            arr = np.transpose(seq[0, :, :, :, 0], (1, 2, 0))[:, :, None, :]
            ours = eng.prob_sequence(arr, window="full")
            ours_ntxyc = np.transpose(ours[:, :, 0], (2, 0, 1, 3))[None]
            d = float(np.max(np.abs(ours_ntxyc - ref_prob)))
            print(f"UNet-LSTM prob max|Δ| = {d:.3e}")
            if d > args.atol:
                failures.append(("unet_lstm_prob", d))
    else:
        print(f"unknown model kind {kind}")
        return 2

    # --- Dice on real subjects -------------------------------------------
    if args.data_dir and kind != "fcn":
        print(f"NOTE: --data_dir Dice check is implemented for FCN "
              f"checkpoints only; SKIPPED for kind={kind} (the forward "
              "comparison above still ran)")
    if args.data_dir and kind == "fcn":
        from ukbb_cardiac_tpu.infer.engine import (InferenceEngine,
                                                   SegmentationModel)
        from ukbb_cardiac_tpu.io import nifti
        from ukbb_cardiac_tpu.ops import rescale_intensity
        from ukbb_cardiac_tpu.ops.crop import pad_to_multiple

        engine = InferenceEngine(
            SegmentationModel.from_fcn(params, state, names, cfg))
        for subject in sorted(os.listdir(args.data_dir)):
            image_name = os.path.join(args.data_dir, subject,
                                      f"{args.seq_name}.nii.gz")
            if not os.path.exists(image_name):
                continue
            image = np.asanyarray(nifti.load(image_name).dataobj)
            if image.ndim == 3:
                image = image[..., None]
            ed = image[:, :, :, 0].astype(np.float32)
            resc = rescale_intensity(ed, (1.0, 99.0))
            pred = engine.segment_volume(resc)
            # TF-op prediction on the same preprocessed frame
            X, Y = resc.shape[:2]
            x_pre, x_post, y_pre, y_post = pad_to_multiple(X, Y, 16)
            batch = np.pad(np.transpose(resc, (2, 0, 1))[..., None],
                           ((0, 0), (x_pre, x_post), (y_pre, y_post),
                            (0, 0)))
            *_, (_, logits) = tf_fcn_layers(tf, params, state, names, cfg,
                                            batch.astype(np.float32))
            tf_pred = np.transpose(
                np.argmax(logits.numpy(), axis=-1),
                (1, 2, 0))[x_pre:x_pre + X, y_pre:y_pre + Y]
            dices = [(c, _dice(pred, tf_pred, c))
                     for c in range(1, cfg.n_class)]
            line = " ".join(f"class{c}={d:.4f}" for c, d in dices)
            print(f"{subject}: ED JAX-vs-TF Dice {line}")
            for c, d in dices:
                if d < args.dice_min:
                    failures.append((f"{subject}_dice_class{c}", d))

    if failures:
        print(f"FAILED: {len(failures)} mismatches: {failures[:5]}")
        return 1
    print("OK: checkpoint converts and matches the TF forward within "
          f"atol={args.atol}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
