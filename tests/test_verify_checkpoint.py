"""verify_checkpoint CLI tests (VERDICT r2 #4): the one-command
released-checkpoint parity check, exercised on TF-autonamed checkpoints
generated the way the released files were."""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax

from ukbb_cardiac_tpu.cli import verify_checkpoint as vc


def _write_fcn_checkpoint(tmp_path, n_class=2):
    """A genuine-TF-autonamed FCN checkpoint (same recipe as
    test_tf_parity.py's genuine-autonaming test)."""
    import tensorflow.compat.v1 as tf1

    from tests.test_tf_parity import CFG, _auto_conv, _auto_conv_bn_relu
    from ukbb_cardiac_tpu.models import layers as L

    cfg = CFG
    graph = tf1.Graph()
    with graph.as_default():
        tf1.set_random_seed(5)
        image_ph = tf1.placeholder(tf1.float32, [1, 32, 32, 1])
        x = image_ph
        feats = []
        for l in range(cfg.n_level):
            for i in range(cfg.n_block[l]):
                s = 2 if (l > 0 and i == 0) else 1
                x = _auto_conv_bn_relu(tf1, x, cfg.n_filter[l], 3, s)
            feats.append(x)
        ups = []
        for l in range(cfg.n_level):
            f = _auto_conv_bn_relu(tf1, feats[l], cfg.same_dim, 1)
            ups.append(f)
        # head convs so every variable exists (upsample is constant)
        x = tf1.concat([ups[0]] * cfg.n_level, axis=-1)
        for _ in range(2):
            x = _auto_conv_bn_relu(tf1, x, cfg.fc, 1)
        _auto_conv(tf1, x, cfg.n_class, 1, use_bias=True)
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            prefix = str(tmp_path / "FCN_test.ckpt")
            saver.save(sess, prefix)
    return prefix


def test_verify_fcn_checkpoint_ok(tmp_path, capsys):
    prefix = _write_fcn_checkpoint(tmp_path)
    rc = vc.main(["--model_path", prefix])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "OK" in out
    assert "max|Δ|" in out  # per-layer table printed


def test_verify_failure_path(tmp_path, capsys):
    """The mismatch-detection path end-to-end: with an impossible
    tolerance the CLI must report per-layer MISMATCH lines and exit 1.
    (A semantics bug in conversion or in the JAX forward surfaces the
    same way — as a layer whose diff exceeds the real tolerance.)"""
    prefix = _write_fcn_checkpoint(tmp_path)
    rc = vc.main(["--model_path", prefix, "--atol", "0"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "MISMATCH" in out and "FAILED" in out


def test_resolve_prefix_forms(tmp_path):
    prefix = _write_fcn_checkpoint(tmp_path)
    # directory form resolves to the .meta prefix
    assert vc.resolve_prefix(str(tmp_path)) == prefix
    # explicit prefix passes through
    assert vc.resolve_prefix(prefix) == prefix
    with pytest.raises(FileNotFoundError):
        vc.resolve_prefix(str(tmp_path / "missing"))


def test_verify_unet_lstm_checkpoint_ok(tmp_path, capsys):
    """The flagship UNet-LSTM contract through the CLI: TF-autonamed
    checkpoint (vendored contrib cell) → convert → prob parity."""
    import tensorflow.compat.v1 as tf1

    from tests.fixtures.contrib_convlstm import Conv2DLSTMCell
    from tests.test_tf_parity import (_build_reference_unet,
                                      _reference_biconv_lstm)
    from ukbb_cardiac_tpu.models import unet as unet_mod

    cfg = unet_mod.UNetConfig(n_class=3, n_level=3, n_filter=(2, 4, 4),
                              n_block=(1, 1, 1))
    N, T, X, Y = 1, 3, 32, 32
    graph = tf1.Graph()
    with graph.as_default():
        tf1.set_random_seed(31)
        images_ph = tf1.placeholder(tf1.float32, [N, T, X, Y, 1])
        flat = tf1.reshape(images_ph, [N * T, X, Y, 1])
        _, net = _build_reference_unet(tf1, flat, cfg)
        features = tf1.reshape(net["conv0_up"],
                               [N, T, X, Y, cfg.n_filter[0]])
        _reference_biconv_lstm(tf1, Conv2DLSTMCell, features,
                               [X, Y, cfg.n_filter[0]], 4, T, cfg.n_class)
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            prefix = str(tmp_path / "UNet-LSTM_vc.ckpt")
            saver.save(sess, prefix)

    rc = vc.main(["--model_path", prefix])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "UNet-LSTM prob max" in out


def test_verify_dice_on_subjects(tmp_path, capsys):
    """--data_dir: ED-frame Dice between the converted-bundle deploy and
    the TF-op forward on a phantom subject."""
    from phantom import write_subject

    prefix = _write_fcn_checkpoint(tmp_path)
    root = tmp_path / "data"
    write_subject(str(root / "100"), seqs=("sa",), X=64, Y=64, Z=4, T=3)
    rc = vc.main(["--model_path", prefix, "--data_dir", str(root)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "ED JAX-vs-TF Dice" in out


def test_fingerprint_dump_and_diff(tmp_path):
    """--fingerprint writes the per-tensor audit JSON; --fingerprint_diff
    flags exactly the tensors whose bytes changed (the offline
    conversion-audit path for the released checkpoints, ckpt/fingerprint.py)."""
    import json

    import jax
    import numpy as np

    from ukbb_cardiac_tpu.ckpt.store import save_model
    from ukbb_cardiac_tpu.cli import verify_checkpoint
    from ukbb_cardiac_tpu.models import fcn as fcn_mod

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(2, 4, 4),
                            n_block=(1, 1, 1), same_dim=4, fc=4)
    p, s, n = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    bundle = str(tmp_path / "m.npz")
    save_model(bundle, "fcn", cfg, n, p, s)

    fp_a = str(tmp_path / "a.json")
    rc = verify_checkpoint.main(["--model_path", bundle,
                                 "--fingerprint", fp_a])
    assert rc in (None, 0)
    a = json.load(open(fp_a))
    assert a["n_tensors"] > 5
    first = next(iter(a["tensors"].values()))
    assert {"shape", "dtype", "sha256_16", "mean"} <= set(first)

    # identical dump diffs clean (exit 0)
    assert verify_checkpoint.main(
        ["--fingerprint_diff", fp_a, fp_a]) == 0

    # perturb ONE tensor: the diff names exactly it (exit 1)
    key = sorted(k for k in p)[0]
    leaf = p[key]
    while isinstance(leaf, dict):
        leaf = leaf[sorted(leaf)[0]]
    p2 = jax.tree_util.tree_map(lambda x: x, p)
    node, path = p2, [key]
    while isinstance(node[path[-1]], dict):
        node = node[path[-1]]
        path.append(sorted(node)[0])
    node[path[-1]] = node[path[-1]] + 1.0
    bundle2 = str(tmp_path / "m2.npz")
    save_model(bundle2, "fcn", cfg, n, p2, s)
    fp_b = str(tmp_path / "b.json")
    verify_checkpoint.main(["--model_path", bundle2, "--fingerprint", fp_b])
    assert verify_checkpoint.main(
        ["--fingerprint_diff", fp_a, fp_b]) == 1
    d = json.load(open(fp_b))
    assert d["n_tensors"] == a["n_tensors"]


def test_committed_bundle_fingerprints_match_goldens():
    """The repo ships fingerprint goldens for the phantom-trained bench
    bundles (tests/fixtures/bench_weights/fingerprints/): the diff
    machinery has an in-repo golden pair, so the released-checkpoint
    audit (``ukbb-verify-checkpoint --fingerprint``) is exercised
    end-to-end on real committed artifacts, not only on tmp files."""
    import glob
    import json
    import os

    from ukbb_cardiac_tpu.ckpt.fingerprint import (diff_fingerprints,
                                                   fingerprint_bundle)

    fp_dir = os.path.join(os.path.dirname(__file__), "fixtures",
                          "bench_weights", "fingerprints")
    goldens = sorted(glob.glob(os.path.join(fp_dir, "*.json")))
    assert len(goldens) == 5, "five released-architecture bundles expected"
    for golden_path in goldens:
        with open(golden_path) as f:
            golden = json.load(f)
        bundle = os.path.join(os.path.dirname(fp_dir),
                              os.path.basename(golden_path)
                              .replace(".json", ".npz"))
        live = fingerprint_bundle(bundle)
        d = diff_fingerprints(golden, live)
        assert not d["missing"] and not d["extra"] and not d["changed"], \
            (golden_path, d)
