"""Model zoo tests: shapes, TF-semantics oracles, scan-vs-unroll parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ukbb_cardiac_tpu.models import (
    FCNConfig,
    UNetConfig,
    apply_biconv_lstm,
    apply_conv_lstm,
    apply_fcn,
    apply_resnet,
    apply_temporal_unet,
    apply_unet,
    init_biconv_lstm,
    init_conv_lstm,
    init_fcn,
    init_resnet,
    init_unet,
    losses,
    wrappers,
)
from ukbb_cardiac_tpu.models import ResNetConfig
from ukbb_cardiac_tpu.models import layers as L
from ukbb_cardiac_tpu.models.convlstm import convlstm_cell, init_convlstm_cell


def tf_conv2d_transpose_same_ref(x, kernel, stride):
    """Numpy oracle for tf.nn.conv2d_transpose(padding='SAME').

    x: (H, W, Cin); kernel: (k, k, Cout, Cin) in TF layout.
    Implements the exact adjoint of the SAME strided forward conv
    (scatter-add formulation).  Output: (H*s, W*s, Cout).
    """
    H, W, Cin = x.shape
    k = kernel.shape[0]
    Cout = kernel.shape[2]
    Ho, Wo = H * stride, W * stride
    # forward conv SAME pads for input size (Ho, Wo), stride s, kernel k:
    pad_total = max(k - stride, 0)
    pb = pad_total // 2
    out = np.zeros((Ho, Wo, Cout), dtype=np.float64)
    for i in range(H):
        for j in range(W):
            for di in range(k):
                for dj in range(k):
                    oi = i * stride + di - pb
                    oj = j * stride + dj - pb
                    if 0 <= oi < Ho and 0 <= oj < Wo:
                        out[oi, oj, :] += kernel[di, dj, :, :] @ x[i, j, :]
    return out


class TestTransposeConv:
    @pytest.mark.parametrize("stride,k", [(2, 3), (4, 7), (2, 4), (3, 3)])
    def test_matches_tf_adjoint_oracle(self, rng, stride, k):
        H = W = 5
        Cin, Cout = 3, 2
        x = rng.rand(H, W, Cin).astype(np.float32)
        tf_kernel = rng.rand(k, k, Cout, Cin).astype(np.float32)
        ref = tf_conv2d_transpose_same_ref(x, tf_kernel, stride)

        # our layer takes a correlation-oriented HWIO kernel: flip spatially
        # and swap channel axes (this is what the checkpoint converter does)
        ours_kernel = np.flip(tf_kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
        out = np.asarray(
            L.conv2d_transpose(x[None], jnp.asarray(ours_kernel), stride=stride)
        )[0]
        np.testing.assert_allclose(out, ref, atol=1e-4)

    @pytest.mark.parametrize("factor", [2, 4, 8])
    def test_bilinear_upsample_matches_tf(self, rng, factor):
        """transpose_upsample2d == TF conv2d_transpose with the diagonal
        bilinear kernel of network.py:138-167."""
        n = 3
        x = rng.rand(4, 4, n).astype(np.float32)
        sz = factor * 2 - 1
        W2 = L.linear_2d(sz)
        tf_kernel = np.zeros((sz, sz, n, n), dtype=np.float32)
        for i in range(n):
            tf_kernel[:, :, i, i] = W2
        ref = tf_conv2d_transpose_same_ref(x, tf_kernel, factor)
        out = np.asarray(L.transpose_upsample2d(jnp.asarray(x[None]), factor))[0]
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_bilinear_upsample_interpolates(self):
        # A constant image must upsample to (nearly) the same constant in
        # the interior — the triangular kernel has unit partition of unity.
        x = jnp.ones((1, 6, 6, 1), jnp.float32) * 5.0
        out = np.asarray(L.transpose_upsample2d(x, 2))[0, :, :, 0]
        np.testing.assert_allclose(out[2:-2, 2:-2], 5.0, atol=1e-5)


class TestBatchNorm:
    def test_eval_uses_moving_stats(self):
        p = {"gamma": jnp.asarray([2.0]), "beta": jnp.asarray([1.0])}
        s = {"moving_mean": jnp.asarray([3.0]), "moving_variance": jnp.asarray([4.0])}
        x = jnp.full((2, 4, 4, 1), 5.0)
        y, s2 = L.batch_norm(x, p, s, train=False)
        expected = (5.0 - 3.0) / np.sqrt(4.0 + L.BN_EPSILON) * 2.0 + 1.0
        np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5)
        assert s2 is s

    def test_train_normalises_batch(self, rng):
        p = {"gamma": jnp.ones(3), "beta": jnp.zeros(3)}
        s = {"moving_mean": jnp.zeros(3), "moving_variance": jnp.ones(3)}
        x = jnp.asarray(rng.rand(8, 5, 5, 3).astype(np.float32) * 10)
        y, s2 = L.batch_norm(x, p, s, train=True)
        y = np.asarray(y)
        np.testing.assert_allclose(y.mean(axis=(0, 1, 2)), 0.0, atol=1e-4)
        np.testing.assert_allclose(y.std(axis=(0, 1, 2)), 1.0, atol=1e-2)
        # moving stats moved toward batch stats with momentum 0.99
        np.testing.assert_allclose(
            np.asarray(s2["moving_mean"]),
            0.01 * np.asarray(x).mean(axis=(0, 1, 2)),
            rtol=1e-4,
        )


class TestFCN:
    def test_shapes_and_determinism(self, rng):
        cfg = FCNConfig(n_class=4, n_filter=(4, 8, 8, 8, 8), n_block=(1, 1, 1, 1, 1))
        params, state, names = init_fcn(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.rand(2, 32, 48, 1).astype(np.float32))
        logits, _ = apply_fcn(params, state, names, cfg, x)
        assert logits.shape == (2, 32, 48, 4)
        logits2, _ = apply_fcn(params, state, names, cfg, x)
        np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))

    def test_tf_layer_naming(self):
        cfg = FCNConfig(n_filter=(2, 2, 2, 2, 2), n_block=(2, 2, 3, 3, 3))
        params, state, names = init_fcn(jax.random.PRNGKey(0), cfg)
        n_convs_bn = sum(cfg.n_block) + cfg.n_level + 2  # blocks + same_dim + fc
        # conv names: conv2d .. conv2d_{n_convs_bn}; last (out) has bias
        assert "conv2d" in params and f"conv2d_{n_convs_bn}" in params
        assert "bias" in params[f"conv2d_{n_convs_bn}"]
        assert "batch_normalization" in params
        assert f"batch_normalization_{n_convs_bn - 1}" in params
        assert f"batch_normalization_{n_convs_bn}" not in params

    def test_train_mode_updates_state(self, rng):
        cfg = FCNConfig(n_class=2, n_filter=(2, 2), n_block=(1, 1), n_level=2)
        params, state, names = init_fcn(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
        _, new_state = apply_fcn(params, state, names, cfg, x, train=True)
        assert set(new_state) == set(state)
        moved = any(
            not np.allclose(
                np.asarray(new_state[k]["moving_mean"]), np.asarray(state[k]["moving_mean"])
            )
            for k in state
        )
        assert moved

    def test_bf16_compute_close_to_f32(self, rng):
        cfg = FCNConfig(n_class=3, n_filter=(4, 4), n_block=(1, 1), n_level=2)
        params, state, names = init_fcn(jax.random.PRNGKey(1), cfg)
        x = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32))
        lf, _ = apply_fcn(params, state, names, cfg, x, compute_dtype=jnp.float32)
        lb, _ = apply_fcn(params, state, names, cfg, x, compute_dtype=jnp.bfloat16)
        assert lb.dtype == jnp.float32
        # predictions agree on most pixels
        agree = np.mean(np.argmax(np.asarray(lf), -1) == np.argmax(np.asarray(lb), -1))
        assert agree > 0.95


class TestResNet:
    def test_shapes(self, rng):
        cfg = ResNetConfig(n_class=4, n_filter=(4, 4, 8, 8, 8), n_block=(1, 1, 2, 2, 2))
        params, state, names = init_resnet(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32))
        logits, _ = apply_resnet(params, state, names, cfg, x)
        assert logits.shape == (1, 32, 32, 4)

    def test_bottleneck(self, rng):
        cfg = ResNetConfig(
            n_class=2, n_filter=(4, 4, 8, 8), n_block=(1, 1, 2, 2), n_level=4,
            use_bottleneck=True,
        )
        params, state, names = init_resnet(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32))
        logits, _ = apply_resnet(params, state, names, cfg, x)
        assert logits.shape == (1, 16, 16, 2)


class TestUNet:
    def test_shapes_and_scoping(self, rng):
        cfg = UNetConfig(n_class=3, n_filter=(4, 8, 8), n_block=(1, 1, 1), n_level=3)
        params, state, names = init_unet(jax.random.PRNGKey(0), cfg)
        assert "UNet" in params and "conv0" in params["UNet"]
        assert "conv_out" in params["UNet"]
        x = jnp.asarray(rng.rand(2, 32, 32, 1).astype(np.float32))
        logits, feats, _ = apply_unet(params, state, names, cfg, x)
        assert logits.shape == (2, 32, 32, 3)
        assert feats.shape == (2, 32, 32, 4)

    def test_temporal_unet(self, rng):
        cfg = UNetConfig(n_class=3, n_filter=(2, 4), n_block=(1, 1), n_level=2)
        params, state, names = init_unet(
            jax.random.PRNGKey(0), cfg, conv3d_=True, scope="Temporal_UNet"
        )
        x = jnp.asarray(rng.rand(1, 5, 16, 16, 1).astype(np.float32))
        logits, feats, _ = apply_temporal_unet(params, state, names, cfg, x)
        assert logits.shape == (1, 5, 16, 16, 3)  # time keeps full resolution


class TestConvLSTM:
    def test_scan_matches_python_unroll(self, rng):
        key = jax.random.PRNGKey(0)
        cell = init_convlstm_cell(key, in_ch=2, n_hidden=4)
        feats = jnp.asarray(rng.rand(1, 6, 8, 8, 2).astype(np.float32))
        params = {"LSTM": {"conv_2d_lstm_cell": cell,
                           "conv2d": {"kernel": jnp.eye(4)[None, None, :, :4],
                                      "bias": jnp.zeros(4)}}}
        out_scan = np.asarray(apply_conv_lstm(params, feats))

        # naive python unroll
        c = jnp.zeros((1, 8, 8, 4))
        h = jnp.zeros((1, 8, 8, 4))
        outs = []
        for t in range(6):
            c, h = convlstm_cell(cell, feats[:, t], c, h)
            outs.append(np.asarray(L.conv2d(h, params["LSTM"]["conv2d"]["kernel"],
                                            bias=params["LSTM"]["conv2d"]["bias"])))
        ref = np.stack(outs, axis=1)
        np.testing.assert_allclose(out_scan, ref, atol=1e-5)

    def test_bidirectional_shapes_and_symmetry(self, rng):
        params = init_biconv_lstm(jax.random.PRNGKey(1), in_ch=2, n_hidden=3, n_class=3)
        feats = jnp.asarray(rng.rand(2, 5, 8, 8, 2).astype(np.float32))
        out = apply_biconv_lstm(params, feats)
        assert out.shape == (2, 5, 8, 8, 3)
        # reversing input must reverse output when fw/bw cells are swapped
        swapped = {
            "LSTM": {
                "forward": params["LSTM"]["backward"],
                "backward": params["LSTM"]["forward"],
                "output": params["LSTM"]["output"],
            }
        }
        out_rev = apply_biconv_lstm(swapped, feats[:, ::-1])
        hs_concat_swap = np.asarray(out_rev)[:, ::-1]
        # forward(x reversed) == backward(x) reversed; output conv mixes
        # [fw, bw] vs [bw, fw] so equality holds only if the 1x1 conv were
        # symmetric — here we just check shape consistency and finiteness.
        assert np.isfinite(hs_concat_swap).all()


class TestLosses:
    def test_softmax_ce_matches_manual(self, rng):
        logits = jnp.asarray(rng.rand(2, 4, 4, 3).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 3, (2, 4, 4)))
        loss = float(losses.softmax_cross_entropy(logits, labels, 3))
        p = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        ref = -np.mean([p[n, i, j, labels[n, i, j]]
                        for n in range(2) for i in range(4) for j in range(4)])
        np.testing.assert_allclose(loss, ref, rtol=1e-5)

    def test_focal_alpha_weighting(self, rng):
        logits = jnp.asarray(rng.rand(1, 4, 4, 2).astype(np.float32))
        labels = jnp.zeros((1, 4, 4), jnp.int32)  # all background
        l_low = float(losses.focal_loss(labels, logits, 2, alpha=0.9))
        l_high = float(losses.focal_loss(labels, logits, 2, alpha=0.1))
        assert l_high > l_low  # background weight is (1 - alpha)

    def test_temporal_weights(self):
        w = np.asarray(losses.temporal_window_weights(9, weight_R=5, weight_r=1))
        assert w[4] == 1.0  # centre
        np.testing.assert_allclose(w[0], 1 - 4 / 5)
        assert np.all(w >= 0) and np.argmax(w) == 4
        # weight_r=0 → all ones within the window
        w0 = np.asarray(losses.temporal_window_weights(9, weight_R=5, weight_r=0))
        np.testing.assert_allclose(w0, 1.0)

    def test_weighted_temporal_ce_reduces_to_mean(self, rng):
        logits = jnp.asarray(rng.rand(1, 5, 4, 4, 2).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 2, (1, 5, 4, 4)))
        # flat weights == simple mean over frames
        flat = float(losses.weighted_temporal_cross_entropy(logits, labels, 2, 5, 0.0))
        per = np.mean([float(losses.softmax_cross_entropy(logits[:, t], labels[:, t], 2))
                       for t in range(5)])
        np.testing.assert_allclose(flat, per, rtol=1e-5)


class TestWrappers:
    def test_unet_model(self, rng):
        cfg = UNetConfig(n_class=3, n_filter=(2, 4), n_block=(1, 1), n_level=2)
        params, state, names = init_unet(jax.random.PRNGKey(0), cfg)
        imgs = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
        labs = jnp.asarray(rng.randint(0, 3, (2, 16, 16)))
        loss, prob, pred, _ = wrappers.unet_model(params, state, names, cfg, imgs, labs)
        assert np.isfinite(float(loss))
        assert prob.shape == (2, 16, 16, 3) and pred.shape == (2, 16, 16)
        np.testing.assert_allclose(np.asarray(prob).sum(-1), 1.0, atol=1e-5)

    def test_unet_lstm_model(self, rng):
        cfg = UNetConfig(n_class=3, n_filter=(2, 4), n_block=(1, 1), n_level=2)
        params, state, names = init_unet(jax.random.PRNGKey(0), cfg)
        params.update(init_biconv_lstm(jax.random.PRNGKey(1), in_ch=2, n_hidden=4, n_class=3))
        imgs = jnp.asarray(rng.rand(1, 5, 16, 16, 1).astype(np.float32))
        labs = jnp.asarray(rng.randint(0, 3, (1, 5, 16, 16)))
        loss, prob, pred, _ = wrappers.unet_lstm_model(
            params, state, names, cfg, imgs, labs, bidirectional=True, seq2seq=True,
            weight_R=2, weight_r=1,
        )
        assert np.isfinite(float(loss))
        assert pred.shape == (1, 5, 16, 16)


def test_bf16_compute_dtype_carries_through_fcn():
    """bf16 compute must survive past the first conv unit (the composite
    units cast back to their input dtype) and agree closely with f32."""
    import jax
    import jax.numpy as jnp
    from ukbb_cardiac_tpu.models import fcn as fcn_mod
    from ukbb_cardiac_tpu.models import layers as L

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(4, 8, 16),
                            n_block=(1, 1, 1), same_dim=4, fc=8)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))

    # unit-level: output dtype equals input dtype
    y, _ = L.conv2d_bn_relu(x.astype(jnp.bfloat16), params, state,
                            names["levels"][0][0], train=False)
    assert y.dtype == jnp.bfloat16

    logits32, _ = fcn_mod.apply_fcn(params, state, names, cfg, x,
                                    train=False)
    logits16, _ = fcn_mod.apply_fcn(params, state, names, cfg, x,
                                    train=False,
                                    compute_dtype=jnp.bfloat16)
    assert logits16.dtype == jnp.float32  # logits always come back f32
    agree = float(np.mean(np.argmax(np.asarray(logits32), -1)
                          == np.argmax(np.asarray(logits16), -1)))
    assert agree > 0.98, agree


def test_bf16_training_loss_finite_and_learns():
    """bf16 mixed-precision train step: finite loss, params move."""
    import jax
    import jax.numpy as jnp
    import optax
    from ukbb_cardiac_tpu.models import fcn as fcn_mod
    from ukbb_cardiac_tpu.train.sa import make_fcn_loss
    from ukbb_cardiac_tpu.train import steps as steps_lib

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(2, 4, 4),
                            n_block=(1, 1, 1), same_dim=2, fc=4)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    loss_fn = make_fcn_loss(names, cfg, compute_dtype=jnp.bfloat16)
    opt = optax.adam(1e-3)
    step = steps_lib.make_train_step(loss_fn, opt)
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.rand(2, 32, 32, 1),
                                  dtype=jnp.float32),
             "label": jnp.asarray(rng.randint(0, 4, (2, 32, 32)),
                                  dtype=jnp.int32)}
    p2, _, _, loss, _ = step(params, state, opt.init(params), batch,
                             jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    k0 = names["levels"][0][0][0]
    assert p2[k0]["kernel"].dtype == jnp.float32  # params stay f32
    assert not np.allclose(np.asarray(p2[k0]["kernel"]),
                           np.asarray(params[k0]["kernel"]))


def test_fused_head_matches_concat_head():
    """The sum-of-levels head is the same function as the literal concat
    head (models/fcn.py::_multiscale_head): the fixed bilinear upsample is
    spatial-only linear, the fc1 1x1 conv channel-only linear, so they
    commute and fc1(concat) decomposes into a sum over levels."""
    from ukbb_cardiac_tpu.models import fcn as fcn_mod

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=5,
                            n_filter=(16, 32, 64, 128, 256),
                            n_block=(2, 2, 3, 3, 3), same_dim=32, fc=64)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    x = np.random.RandomState(0).rand(2, 96, 112, 1).astype(np.float32)
    for train in (False, True):
        lo_f, st_f = fcn_mod.apply_fcn(params, state, names, cfg, x,
                                       train=train, fused_head=True)
        lo_u, st_u = fcn_mod.apply_fcn(params, state, names, cfg, x,
                                       train=train, fused_head=False)
        np.testing.assert_allclose(np.asarray(lo_f), np.asarray(lo_u),
                                   atol=1e-4)
        for k in st_f:
            for leaf in st_f[k]:
                np.testing.assert_allclose(np.asarray(st_f[k][leaf]),
                                           np.asarray(st_u[k][leaf]),
                                           atol=1e-5)
