"""Golden parity tests against TensorFlow kernels and TF checkpoints.

These validate the two halves of the checkpoint-parity contract
(SURVEY.md §5 "checkpoint/resume"):
1. numerics: our conv/BN/fixed-bilinear-upsample match TF's kernels
   (tf.nn.conv2d / batch_normalization / conv2d_transpose semantics that
   ``tf.layers`` wrapped in the reference graphs);
2. plumbing: a TF-1.x checkpoint written with ``tf.layers`` variable
   names converts name-for-name into a bundle whose forward pass equals
   the TF-op forward pass.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from ukbb_cardiac_tpu.ckpt import store
from ukbb_cardiac_tpu.ckpt.tf_reader import convert_tf_checkpoint
from ukbb_cardiac_tpu.models import fcn as fcn_mod
from ukbb_cardiac_tpu.models import layers as L

BN_EPS = 1e-3

CFG = fcn_mod.FCNConfig(n_class=2, n_level=3, n_filter=(2, 3, 4),
                        n_block=(1, 1, 2), same_dim=2, fc=3)


def _np_params(cfg, seed=0):
    """Random numpy parameters in tf.layers naming order."""
    rng = np.random.RandomState(seed)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)

    def rnd(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rnd(v)
            else:
                arr = rng.randn(*np.shape(v)).astype(np.float32) * 0.3
                if k == "moving_variance":
                    arr = np.abs(arr) + 0.5
                out[k] = arr
        return out

    return rnd(params), rnd(state), names


def _tf_forward(params, state, names, cfg, image):
    """Reference-semantics FCN forward with raw tf.nn ops
    (``network.py:170-230``)."""

    def conv_bn_relu(x, nm, strides=1):
        cname, bname = nm
        x = tf.nn.conv2d(x, params[cname]["kernel"], strides=strides,
                         padding="SAME")
        s = state[bname]
        p = params[bname]
        x = tf.nn.batch_normalization(x, s["moving_mean"], s["moving_variance"],
                                      p["beta"], p["gamma"], BN_EPS)
        return tf.nn.relu(x)

    x = tf.constant(image)
    feats = []
    for l in range(cfg.n_level):
        for i, nm in enumerate(names["levels"][l]):
            x = conv_bn_relu(x, nm, 2 if (l > 0 and i == 0) else 1)
        feats.append(x)

    ups = []
    for l in range(cfg.n_level):
        f = conv_bn_relu(feats[l], names["same_dim"][l])
        if l > 0:
            factor = 2 ** l
            sz = factor * 2 - 1
            W = L.linear_2d(sz)
            n = f.shape[-1]
            kernel = np.zeros((sz, sz, n, n), np.float32)
            for c in range(n):
                kernel[:, :, c, c] = W  # diagonal kernel (network.py:146-149)
            N, H, Wd, C = f.shape
            f = tf.nn.conv2d_transpose(
                f, kernel, output_shape=[N, H * factor, Wd * factor, C],
                strides=factor, padding="SAME")
        ups.append(f)

    x = tf.concat(ups, axis=-1)
    for nm in names["fc"]:
        x = conv_bn_relu(x, nm)
    out = params[names["out"]]
    x = tf.nn.conv2d(x, out["kernel"], strides=1, padding="SAME") + out["bias"]
    return x.numpy()


def _to_jax(tree):
    return {k: _to_jax(v) if isinstance(v, dict) else jnp.asarray(v)
            for k, v in tree.items()}


def test_fcn_forward_matches_tf_ops():
    params, state, names = _np_params(CFG)
    rng = np.random.RandomState(1)
    image = rng.rand(2, 32, 32, 1).astype(np.float32)

    ref = _tf_forward(params, state, names, CFG, image)
    ours, _ = fcn_mod.apply_fcn(_to_jax(params), _to_jax(state), names, CFG,
                                jnp.asarray(image), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-4)


def test_checkpoint_roundtrip_conversion(tmp_path):
    """Write a TF checkpoint with tf.layers names → convert → same output."""
    import tensorflow.compat.v1 as tf1

    params, state, names = _np_params(CFG, seed=3)

    # flatten into tf.layers-style names
    flat = {}
    for cname_b in list(params.keys()):
        for leaf, val in params[cname_b].items():
            flat[f"{cname_b}/{leaf}"] = val
    for bname in state:
        for leaf, val in state[bname].items():
            flat[f"{bname}/{leaf}"] = val

    graph = tf1.Graph()
    with graph.as_default():
        tfvars = [tf1.get_variable(name, initializer=val)
                  for name, val in flat.items()]
        saver = tf1.train.Saver(var_list={v.op.name: v for v in tfvars})
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            prefix = str(tmp_path / "FCN_test.ckpt")
            saver.save(sess, prefix)

    bundle = convert_tf_checkpoint(prefix)
    kind, cfg2, names2, params2, state2, extra = store.load_model(bundle)
    assert kind == "fcn"
    assert cfg2 == CFG

    rng = np.random.RandomState(5)
    image = rng.rand(1, 32, 32, 1).astype(np.float32)
    ref = _tf_forward(params, state, names, CFG, image)
    ours, _ = fcn_mod.apply_fcn(params2, state2, names2, cfg2,
                                jnp.asarray(image), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-4)


def test_unet_lstm_checkpoint_conversion(tmp_path):
    """A TF checkpoint with UNet/-scope + contrib-ConvLSTM variable names
    converts into a deployable unet_lstm bundle (shape/name mapping; the
    gate-order numerics are covered by models/convlstm docs + unit tests)."""
    import tensorflow.compat.v1 as tf1

    from ukbb_cardiac_tpu.models import convlstm, unet as unet_mod

    ucfg = unet_mod.UNetConfig(n_class=3, n_level=3, n_filter=(2, 4, 4),
                               n_block=(1, 1, 1))
    params, state, names = unet_mod.init_unet(jax.random.PRNGKey(0), ucfg)
    params.update(convlstm.init_biconv_lstm(jax.random.PRNGKey(1),
                                            ucfg.n_filter[0], 4, ucfg.n_class))

    rng = np.random.RandomState(0)

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flatten(v, f"{prefix}{k}/"))
            else:
                out[f"{prefix}{k}"] = rng.randn(*np.shape(v)).astype(np.float32)
        return out

    flat = flatten(params)
    flat.update(flatten(state))
    # TF stores conv2d_transpose kernels as (H, W, out, in); ours are
    # flipped HWIO — write TF-layout values for transpose kernels
    for name in list(flat):
        parts = name.split("/")
        if len(parts) >= 2 and parts[-2].startswith("conv2d_transpose") and \
                parts[-1] == "kernel":
            flat[name] = np.ascontiguousarray(
                flat[name].transpose(0, 1, 3, 2))

    graph = tf1.Graph()
    with graph.as_default():
        tfvars = [tf1.get_variable(n, initializer=v) for n, v in flat.items()]
        saver = tf1.train.Saver({v.op.name: v for v in tfvars})
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            prefix = str(tmp_path / "UNet-LSTM_test.ckpt")
            saver.save(sess, prefix)

    from ukbb_cardiac_tpu.ckpt.tf_reader import convert_tf_checkpoint
    bundle = convert_tf_checkpoint(prefix)
    from ukbb_cardiac_tpu.ckpt import store
    kind, cfg2, names2, p2, s2, extra = store.load_model(bundle)
    assert kind == "unet_lstm"
    assert extra["bidirectional"] is True
    assert cfg2.n_class == 3 and tuple(cfg2.n_filter) == (2, 4, 4)
    # LSTM cell weights round-tripped
    np.testing.assert_allclose(
        np.asarray(p2["LSTM"]["forward"]["conv_2d_lstm_cell"]["kernel"]),
        flat["LSTM/forward/conv_2d_lstm_cell/kernel"])
    # the bundle deploys through the aortic engine (full-scan path)
    from ukbb_cardiac_tpu.infer.deploy_ao import AorticEngine
    eng = AorticEngine(kind, cfg2, names2, p2, s2, bidirectional=True)
    img = np.random.RandomState(1).rand(32, 32, 1, 4).astype(np.float32)
    prob = eng.prob_sequence(img, window="full")
    assert prob.shape == (32, 32, 1, 4, 3)


# ---------------------------------------------------------------------------
# Genuine TF auto-naming parity (VERDICT r1 #1).
#
# The earlier round-trip test wrote checkpoint names generated by OUR
# Namer, which validated round-tripping but not the assumption that the
# Namer matches real ``tf.layers`` auto-naming.  ``tf.compat.v1.layers``
# itself is gone in TF>=2.16 (Keras 3), so these tests rebuild the
# reference graphs (``network.py:170-230``, ``network_ao.py:18-64``) with
# ``tf1.variable_scope(None, default_name=...)`` — TensorFlow's OWN name
# uniquifier, the exact machinery tf.layers used to produce ``conv2d``,
# ``conv2d_1``, ``batch_normalization_k`` names (per enclosing variable
# scope, in creation order).  TF generates every variable name; nothing
# is taken from models/*'s Namer.  The checkpoint then converts and the
# JAX forward must equal the in-graph TF forward.
# ---------------------------------------------------------------------------


def _auto_conv(tf1, x, filters, ksize, strides=1, use_bias=False,
               transpose=False):
    """A conv layer whose scope name is generated by TF's uniquifier."""
    in_ch = int(x.shape[-1])
    base = "conv2d_transpose" if transpose else "conv2d"
    init = tf1.random_normal_initializer(stddev=0.3)
    with tf1.variable_scope(None, default_name=base):
        if transpose:
            kernel = tf1.get_variable("kernel",
                                      [ksize, ksize, filters, in_ch],
                                      initializer=init)
            n = tf1.shape(x)
            out_shape = tf1.stack([n[0], n[1] * strides, n[2] * strides,
                                   filters])
            y = tf1.nn.conv2d_transpose(x, kernel, out_shape,
                                        strides=[1, strides, strides, 1],
                                        padding="SAME")
            y = tf1.reshape(y, [x.shape[0], int(x.shape[1]) * strides,
                                int(x.shape[2]) * strides, filters])
        else:
            kernel = tf1.get_variable("kernel", [ksize, ksize, in_ch, filters],
                                      initializer=init)
            y = tf1.nn.conv2d(x, kernel, strides=[1, strides, strides, 1],
                              padding="SAME")
        if use_bias:
            bias = tf1.get_variable("bias", [filters], initializer=init)
            y = tf1.nn.bias_add(y, bias)
    return y


def _auto_bn(tf1, x):
    ch = int(x.shape[-1])
    init = tf1.random_normal_initializer(stddev=0.3)
    with tf1.variable_scope(None, default_name="batch_normalization"):
        gamma = tf1.get_variable("gamma", [ch], initializer=init)
        beta = tf1.get_variable("beta", [ch], initializer=init)
        mean = tf1.get_variable("moving_mean", [ch], initializer=init,
                                trainable=False)
        var = tf1.get_variable(
            "moving_variance", [ch], trainable=False,
            initializer=tf1.random_uniform_initializer(0.5, 1.5))
        return tf1.nn.batch_normalization(x, mean, var, beta, gamma, BN_EPS)


def _auto_conv_bn_relu(tf1, x, filters, ksize, strides=1, transpose=False):
    return tf1.nn.relu(_auto_bn(tf1, _auto_conv(tf1, x, filters, ksize,
                                                strides, transpose=transpose)))


def test_fcn_checkpoint_with_genuine_tf_autonaming(tmp_path):
    """build_FCN rebuilt in the reference's exact creation order with
    TF-generated variable names; converted bundle forward == TF forward."""
    import tensorflow.compat.v1 as tf1

    cfg = CFG
    graph = tf1.Graph()
    with graph.as_default():
        tf1.set_random_seed(7)
        image_ph = tf1.placeholder(tf1.float32, [1, 32, 32, 1], name="image")
        # encoder levels (network.py:178-190)
        x = image_ph
        feats = []
        for l in range(cfg.n_level):
            for i in range(cfg.n_block[l]):
                s = 2 if (l > 0 and i == 0) else 1
                x = _auto_conv_bn_relu(tf1, x, cfg.n_filter[l], 3, s)
            feats.append(x)
        # same-dim 1x1 projections (:201-204)
        ups = []
        for l in range(cfg.n_level):
            f = _auto_conv_bn_relu(tf1, feats[l], cfg.same_dim, 1)
            if l > 0:  # fixed-bilinear constant upsampling (:207-211)
                factor = 2 ** l
                sz = factor * 2 - 1
                W = L.linear_2d(sz)
                kval = np.zeros((sz, sz, cfg.same_dim, cfg.same_dim),
                                np.float32)
                for c in range(cfg.same_dim):
                    kval[:, :, c, c] = W
                n = tf1.shape(f)
                out_shape = tf1.stack([n[0], n[1] * factor, n[2] * factor,
                                       cfg.same_dim])
                f = tf1.nn.conv2d_transpose(f, tf1.constant(kval), out_shape,
                                            strides=[1, factor, factor, 1],
                                            padding="SAME")
            ups.append(f)
        x = tf1.concat(ups, axis=-1)            # (:213-218)
        for _ in range(2):                      # fc head (:221-227)
            x = _auto_conv_bn_relu(tf1, x, cfg.fc, 1)
        logits = _auto_conv(tf1, x, cfg.n_class, 1, use_bias=True)  # (:229)

        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            img = np.random.RandomState(11).rand(1, 32, 32, 1).astype(
                np.float32)
            ref = sess.run(logits, {image_ph: img})
            prefix = str(tmp_path / "FCN_genuine.ckpt")
            saver.save(sess, prefix)
        # sanity: names really are TF-made tf.layers-style auto names
        var_names = sorted(v.op.name for v in tf1.global_variables())
        assert "conv2d/kernel" in var_names
        assert "conv2d_1/kernel" in var_names
        assert "batch_normalization_1/moving_mean" in var_names

    bundle = convert_tf_checkpoint(prefix)
    kind, cfg2, names2, p2, s2, _ = store.load_model(bundle)
    assert kind == "fcn" and cfg2 == cfg
    ours, _ = fcn_mod.apply_fcn(p2, s2, names2, cfg2, jnp.asarray(img),
                                train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-4)


def _build_reference_unet(tf1, image, cfg):
    """The reference UNet graph (network_ao.py:18-64) in its exact scope
    structure and creation order; every variable name TF-generated.
    Returns (logits, net) like the reference's ``UNet``."""
    with tf1.variable_scope("UNet"):
        net = {}
        x = image
        for l in range(cfg.n_level):       # down path (:30-40)
            with tf1.variable_scope(f"conv{l}"):
                s = 1 if l == 0 else 2
                x = _auto_conv_bn_relu(tf1, x, cfg.n_filter[l], 3, s)
                for _ in range(1, cfg.n_block[l]):
                    x = _auto_conv_bn_relu(tf1, x, cfg.n_filter[l], 3)
                net[f"conv{l}"] = x
        l = cfg.n_level - 1                # up path (:43-54)
        with tf1.variable_scope(f"conv{l}_up"):
            net[f"conv{l}_up"] = net[f"conv{l}"]
        for l in range(cfg.n_level - 2, -1, -1):
            with tf1.variable_scope(f"conv{l}_up"):
                x = _auto_conv_bn_relu(tf1, net[f"conv{l + 1}_up"],
                                       cfg.n_filter[l], 3, 2,
                                       transpose=True)
                x = tf1.concat([net[f"conv{l}"], x], axis=-1)
                for _ in range(cfg.n_block[l]):
                    x = _auto_conv_bn_relu(tf1, x, cfg.n_filter[l], 3)
                net[f"conv{l}_up"] = x
        with tf1.variable_scope("conv_out"):   # (:57-63)
            logits = _auto_conv(tf1, net["conv0_up"], cfg.n_class, 1,
                                use_bias=True)
    return logits, net


def test_unet_checkpoint_with_genuine_tf_autonaming(tmp_path):
    """Reference UNet (network_ao.py:18-64) with its explicit variable
    scopes and TF-uniquified layer names; converted bundle forward == TF."""
    import tensorflow.compat.v1 as tf1

    from ukbb_cardiac_tpu.models import unet as unet_mod

    cfg = unet_mod.UNetConfig(n_class=3, n_level=3, n_filter=(2, 4, 4),
                              n_block=(1, 2, 1))
    graph = tf1.Graph()
    with graph.as_default():
        tf1.set_random_seed(9)
        image_ph = tf1.placeholder(tf1.float32, [1, 32, 32, 1], name="image")
        logits, _ = _build_reference_unet(tf1, image_ph, cfg)

        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            img = np.random.RandomState(13).rand(1, 32, 32, 1).astype(
                np.float32)
            ref = sess.run(logits, {image_ph: img})
            prefix = str(tmp_path / "UNet_genuine.ckpt")
            saver.save(sess, prefix)
        var_names = sorted(v.op.name for v in tf1.global_variables())
        # per-scope counter reset, as tf.layers does inside variable scopes
        assert "UNet/conv0/conv2d/kernel" in var_names
        assert "UNet/conv1/conv2d/kernel" in var_names
        assert "UNet/conv1/conv2d_1/kernel" in var_names
        assert "UNet/conv0_up/conv2d_transpose/kernel" in var_names
        assert "UNet/conv0_up/batch_normalization_1/gamma" in var_names

    bundle = convert_tf_checkpoint(prefix)
    kind, cfg2, names2, p2, s2, _ = store.load_model(bundle)
    assert kind == "unet" and cfg2 == cfg
    from ukbb_cardiac_tpu.models.unet import apply_unet
    ours, _, _ = apply_unet(p2, s2, names2, cfg2, jnp.asarray(img),
                            train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-4)


def _reference_biconv_lstm(tf1, cell_cls, features, lstm_input_shape,
                           n_hidden, n_step, n_class):
    """BiConv_LSTM (network_ao.py:255-319) in the reference's exact scope
    structure and creation order, with the vendored contrib cell fixture;
    every variable name is TF-generated."""
    init = tf1.random_normal_initializer(stddev=0.3)
    with tf1.variable_scope("LSTM"):
        with tf1.variable_scope("forward"):
            cell_fw = cell_cls(lstm_input_shape, n_hidden, [3, 3])
            state_fw = cell_fw.zero_state(tf1.shape(features)[0], tf1.float32)
            outs_fw = []
            for t in range(n_step):
                if t > 0:
                    tf1.get_variable_scope().reuse_variables()
                h, state_fw = cell_fw(features[:, t], state_fw)
                outs_fw.append(h)
        with tf1.variable_scope("backward"):
            cell_bw = cell_cls(lstm_input_shape, n_hidden, [3, 3])
            state_bw = cell_bw.zero_state(tf1.shape(features)[0], tf1.float32)
            outs_bw = []
            for t in range(n_step - 1, -1, -1):
                if t < n_step - 1:
                    tf1.get_variable_scope().reuse_variables()
                h, state_bw = cell_bw(features[:, t], state_bw)
                outs_bw.append(h)
        with tf1.variable_scope("output"):
            outs = []
            for t in range(n_step):
                if t > 0:
                    tf1.get_variable_scope().reuse_variables()
                cat = tf1.concat([outs_fw[t], outs_bw[n_step - 1 - t]],
                                 axis=-1)
                # tf.layers.conv2d(..., name='conv2d') — explicit name,
                # reuse via the outer scope (network_ao.py:310-315)
                with tf1.variable_scope("conv2d"):
                    k = tf1.get_variable("kernel",
                                         [1, 1, 2 * n_hidden, n_class],
                                         initializer=init)
                    b = tf1.get_variable("bias", [n_class],
                                         initializer=tf1.zeros_initializer())
                    outs.append(tf1.nn.bias_add(
                        tf1.nn.conv2d(cat, k, strides=[1, 1, 1, 1],
                                      padding="SAME"), b))
            outputs = tf1.stack(outs, axis=1)
    return outputs


def test_unet_lstm_checkpoint_with_genuine_tf_autonaming(tmp_path):
    """The flagship UNet-LSTM naming contract, closed without hand-pinning
    (VERDICT r2 #1): the full UNet_LSTM_Model graph (network_ao.py:322-399)
    rebuilt in the reference's creation order with the vendored contrib
    Conv2DLSTMCell fixture (tests/fixtures/contrib_convlstm.py).  TF's own
    variable-scope machinery emits conv_2d_lstm_cell/{kernel,biases} and
    every per-scope counter; the checkpoint round-trips through
    ckpt/tf_reader.py and the full-scan deploy forward equals the TF
    unrolled forward (T == n_step, zero initial state on both sides)."""
    import tensorflow.compat.v1 as tf1

    from tests.fixtures.contrib_convlstm import Conv2DLSTMCell
    from ukbb_cardiac_tpu.models import unet as unet_mod

    cfg = unet_mod.UNetConfig(n_class=3, n_level=3, n_filter=(2, 4, 4),
                              n_block=(1, 2, 1))
    N, T, X, Y, n_hidden = 1, 4, 32, 32, 4
    graph = tf1.Graph()
    with graph.as_default():
        tf1.set_random_seed(21)
        images_ph = tf1.placeholder(tf1.float32, [N, T, X, Y, 1],
                                    name="image")
        # merge T into batch, UNet features, back to NTXYC (:333-347)
        flat = tf1.reshape(images_ph, [N * T, X, Y, 1])
        _, net = _build_reference_unet(tf1, flat, cfg)
        features = tf1.reshape(net["conv0_up"], [N, T, X, Y, cfg.n_filter[0]])
        outputs = _reference_biconv_lstm(tf1, Conv2DLSTMCell, features,
                                         [X, Y, cfg.n_filter[0]], n_hidden,
                                         T, cfg.n_class)
        prob = tf1.nn.softmax(outputs, name="prob")   # (:395)

        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            img = np.random.RandomState(17).rand(N, T, X, Y, 1).astype(
                np.float32)
            ref_prob = sess.run(prob, {images_ph: img})
            prefix = str(tmp_path / "UNet-LSTM_genuine.ckpt")
            saver.save(sess, prefix)
        # the names below are ASSERTED, not used for construction: TF's
        # uniquifier generated them; the converter must find them
        var_names = sorted(v.op.name for v in tf1.global_variables())
        for expect in ["LSTM/forward/conv_2d_lstm_cell/kernel",
                       "LSTM/forward/conv_2d_lstm_cell/biases",
                       "LSTM/backward/conv_2d_lstm_cell/kernel",
                       "LSTM/backward/conv_2d_lstm_cell/biases",
                       "LSTM/output/conv2d/kernel",
                       "LSTM/output/conv2d/bias",
                       "UNet/conv0/conv2d/kernel",
                       "UNet/conv_out/conv2d/kernel"]:
            assert expect in var_names, (expect, var_names)
        # contrib kernel shape: (3, 3, in_ch + n_hidden, 4 * n_hidden)
        kshape = [v for v in tf1.global_variables()
                  if v.op.name == "LSTM/forward/conv_2d_lstm_cell/kernel"
                  ][0].shape.as_list()
        assert kshape == [3, 3, cfg.n_filter[0] + n_hidden, 4 * n_hidden]

    bundle = convert_tf_checkpoint(prefix)
    kind, cfg2, names2, p2, s2, extra = store.load_model(bundle)
    assert kind == "unet_lstm" and extra["bidirectional"] is True
    assert cfg2 == cfg

    from ukbb_cardiac_tpu.infer.deploy_ao import AorticEngine
    eng = AorticEngine(kind, cfg2, names2, p2, s2, bidirectional=True)
    # engine input is (X, Y, Z, T); Z plays the TF batch role
    seq = np.transpose(img[0, :, :, :, 0], (1, 2, 0))[:, :, None, :]
    ours = eng.prob_sequence(seq, window="full")     # (X, Y, 1, T, C)
    ours_ntxyc = np.transpose(ours[:, :, 0], (2, 0, 1, 3))[None]
    np.testing.assert_allclose(ours_ntxyc, ref_prob, atol=2e-4, rtol=1e-3)


def test_conv_lstm_unidirectional_genuine_tf_autonaming(tmp_path):
    """Conv_LSTM (network_ao.py:214-252): the unidirectional head's
    TF-generated names (LSTM/conv_2d_lstm_cell, LSTM/conv2d) and scan
    numerics vs the TF unrolled loop."""
    import tensorflow.compat.v1 as tf1

    from tests.fixtures.contrib_convlstm import Conv2DLSTMCell
    from ukbb_cardiac_tpu.models import convlstm

    N, T, X, Y, C, n_hidden, n_class = 1, 3, 16, 16, 2, 3, 3
    init = tf1.random_normal_initializer(stddev=0.3)
    graph = tf1.Graph()
    with graph.as_default():
        tf1.set_random_seed(23)
        feat_ph = tf1.placeholder(tf1.float32, [N, T, X, Y, C])
        with tf1.variable_scope("LSTM"):                    # (:224)
            cell = Conv2DLSTMCell([X, Y, C], n_hidden, [3, 3])
            state = cell.zero_state(tf1.shape(feat_ph)[0], tf1.float32)
            outs = []
            for t in range(T):                              # (:240-250)
                if t > 0:
                    tf1.get_variable_scope().reuse_variables()
                h, state = cell(feat_ph[:, t], state)
                with tf1.variable_scope("conv2d"):
                    k = tf1.get_variable("kernel", [1, 1, n_hidden, n_class],
                                         initializer=init)
                    b = tf1.get_variable("bias", [n_class],
                                         initializer=tf1.zeros_initializer())
                    outs.append(tf1.nn.bias_add(
                        tf1.nn.conv2d(h, k, strides=[1, 1, 1, 1],
                                      padding="SAME"), b))
            outputs = tf1.stack(outs, axis=1)
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            feats = np.random.RandomState(29).randn(N, T, X, Y, C).astype(
                np.float32)
            ref = sess.run(outputs, {feat_ph: feats})
            tfv = {v.op.name: sess.run(v) for v in tf1.global_variables()}
    assert set(tfv) == {"LSTM/conv_2d_lstm_cell/kernel",
                        "LSTM/conv_2d_lstm_cell/biases",
                        "LSTM/conv2d/kernel", "LSTM/conv2d/bias"}

    params = {"LSTM": {
        "conv_2d_lstm_cell": {
            "kernel": jnp.asarray(tfv["LSTM/conv_2d_lstm_cell/kernel"]),
            "biases": jnp.asarray(tfv["LSTM/conv_2d_lstm_cell/biases"])},
        "conv2d": {"kernel": jnp.asarray(tfv["LSTM/conv2d/kernel"]),
                   "bias": jnp.asarray(tfv["LSTM/conv2d/bias"])}}}
    ours = convlstm.apply_conv_lstm(params, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)
