"""Device-window aortic training: the HBM-resident cine pool.

The pool path must feed the step EXACTLY the batches the host
window-pool sampler would have shipped under ``compact_transfer``
(f16 image / uint8 label) — same subject-draw rng stream, same circular
windows, same FIFO pooling — with the pixels gathered from HBM by index
(``train/device_pool.py``, replacing the per-window H2D of
``train_network_ao.py:163-187``).
"""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.train import ao as ao_lib
from ukbb_cardiac_tpu.train.device_pool import (DeviceCinePool,
                                                make_pool_window_multi_step)


@pytest.fixture(scope="module")
def ao_dataset(tmp_path_factory):
    """6 subjects, 64x64, mixed T (10/12), ED/ES annotations (frame 0
    forces circular wrap), half with densely propagated labels."""
    root = tmp_path_factory.mktemp("ao_dw")
    rng = np.random.RandomState(0)
    aff = np.diag([1.8, 1.8, 10.0, 1.0])
    for i in range(6):
        d = root / "train" / f"s{i}"
        d.mkdir(parents=True)
        T = 10 if i % 2 else 12
        img = (rng.rand(64, 64, 1, T) * 3000).astype(np.int16)
        lab = np.zeros((64, 64, 1, T), np.int16)
        for t in (0, T // 2):  # annotated frames
            lab[20:30, 20:30, 0, t] = 1
            lab[40:50, 40:50, 0, t] = 2
        nifti.save(nifti.Nifti1Image(img, aff), str(d / "ao.nii.gz"))
        nifti.save(nifti.Nifti1Image(lab, aff), str(d / "label_ao.nii.gz"))
        if i % 3 == 0:
            prop = np.zeros_like(lab)
            prop[20:30, 20:30] = 1
            prop[40:50, 40:50] = 2
            nifti.save(nifti.Nifti1Image(prop, aff),
                       str(d / "label_ao_prop.nii.gz"))
    return str(root)


class _ScriptedRng:
    """Deterministic subject-draw order (cycling) for both samplers."""

    def __init__(self, seq):
        self.seq = list(seq)
        self.i = 0

    def randrange(self, n):
        v = self.seq[self.i % len(self.seq)] % n
        self.i += 1
        return v


def _host_batches(train_list, n_batches, B, tw, seed):
    rng = (_ScriptedRng(seed) if isinstance(seed, (list, tuple))
           else random.Random(seed))
    sample = ao_lib.make_window_pool_sampler(
        train_list, B, image_size=64, time_window=tw, z_score=True,
        flatten=False, data_augmentation=False, rng=rng)
    out = []
    for _ in range(n_batches):
        b = sample()
        out.append({"image": b["image"].astype(np.float16),
                    "label": b["label"].astype(np.uint8)})
    return out


def _device_batches(train_list, n_batches, B, tw, seed, n_slots):
    rng = (_ScriptedRng(seed) if isinstance(seed, (list, tuple))
           else random.Random(seed))
    t_max = max(nifti.read_shape(e[0])[3] for e in train_list)
    pool = DeviceCinePool(n_slots, t_max, 64, 64)
    sample = ao_lib.make_device_window_sampler(
        train_list, B, pool, image_size=64, time_window=tw, z_score=True,
        rng=rng)
    out = []
    for _ in range(n_batches):
        b = sample()
        img, lab = pool.snapshot()  # snapshot AFTER the batch's ensures
        for s in b["slot"]:
            pool.unpin(int(s))
        # reconstruct the pixel batch by the same flat gather the step does
        flat_i = np.asarray(img).reshape(-1, 64, 64)
        flat_l = np.asarray(lab).reshape(-1, 64, 64)
        fi = b["slot"][:, None] * t_max + b["tidx"]
        li = b["slot"][:, None] * t_max + b["lidx"]
        out.append({"image": flat_i[fi][..., None],
                    "label": flat_l[li]})
    return out, pool


def test_device_batches_match_host_sampler(ao_dataset):
    """Pool gather == host window-pool sampler, window for window."""
    train_list = ao_lib.scan_dataset_ao(ao_dataset)["train"]
    host = _host_batches(train_list, 4, 3, 9, seed=7)
    dev, pool = _device_batches(train_list, 4, 3, 9, seed=7, n_slots=6)
    for hb, db in zip(host, dev):
        np.testing.assert_array_equal(hb["label"], db["label"])
        np.testing.assert_array_equal(hb["image"], db["image"])
    assert pool.uploads <= 6  # each cine shipped at most once


def test_device_batches_survive_eviction(ao_dataset):
    """A 3-slot pool over 6 subjects forces LRU eviction; batches must
    still be exact (snapshots keep queued indices valid)."""
    train_list = ao_lib.scan_dataset_ao(ao_dataset)["train"]
    # cycle all 6 subjects through a 3-slot pool: every revisit re-uploads
    order = [0, 1, 2, 3, 4, 5]
    host = _host_batches(train_list, 12, 2, 9, seed=order)
    dev, pool = _device_batches(train_list, 12, 2, 9, seed=order, n_slots=3)
    for hb, db in zip(host, dev):
        np.testing.assert_array_equal(hb["label"], db["label"])
        np.testing.assert_array_equal(hb["image"], db["image"])
    assert pool.uploads > 6  # evictions forced re-uploads


def test_pool_all_pinned_raises():
    pool = DeviceCinePool(1, 4, 8, 8)
    mk = lambda: (np.zeros((4, 8, 8), np.float16),
                  np.zeros((4, 8, 8), np.uint8))
    s = pool.ensure("a", mk)
    pool.pin(s)
    with pytest.raises(RuntimeError, match="pinned"):
        pool.ensure("b", mk)
    pool.unpin(s)
    assert pool.ensure("b", mk) == s  # now evictable


def test_pool_step_matches_host_step(ao_dataset):
    """One K=2 dispatch through make_pool_window_multi_step equals the
    host multi-step fed the equivalent pixel batches (same keys)."""
    from ukbb_cardiac_tpu.train import steps as steps_lib
    import optax

    train_list = ao_lib.scan_dataset_ao(ao_dataset)["train"]
    cfg = ao_lib.AoTrainConfig(model="UNet-LSTM", from_scratch=True,
                               image_size=64, num_filter=4, num_level=3,
                               num_hidden=4, weight_R=5,
                               batch_windows=2, device_augment=True,
                               device_windows=True)
    ucfg, params, state, names = ao_lib.init_ao_model(
        cfg, jax.random.PRNGKey(0))
    loss_fn = ao_lib.make_ao_loss(cfg, ucfg, names, device_augment=True,
                                  shift=0, rotate=10, scale=0.2)
    optimizer = ao_lib.make_ao_optimizer(cfg, params)
    opt_state = optimizer.init(params)

    host = _host_batches(train_list, 2, 2, 9, seed=3)
    dev, pool = _device_batches(train_list, 2, 2, 9, seed=3, n_slots=6)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(1, 3))

    h_batches = {k: jnp.asarray(np.stack([b[k] for b in host]))
                 for k in ("image", "label")}
    h_step = steps_lib.make_multi_train_step(loss_fn, optimizer)
    _, _, _, h_losses, _ = h_step(params, state, opt_state, h_batches, keys)

    # drive the REAL pool step with the index batches
    rng = random.Random(3)
    t_max = max(nifti.read_shape(e[0])[3] for e in train_list)
    pool2 = DeviceCinePool(6, t_max, 64, 64)
    sample = ao_lib.make_device_window_sampler(
        train_list, 2, pool2, image_size=64, time_window=9, z_score=True,
        rng=rng)
    idx_batches = [sample() for _ in range(2)]
    img, lab = pool2.snapshot()
    stacked = {k: jnp.asarray(np.stack([b[k] for b in idx_batches]))
               for k in ("slot", "tidx", "lidx")}
    p_step = make_pool_window_multi_step(loss_fn, optimizer)
    _, _, _, p_losses, _ = p_step(params, state, opt_state, img, lab,
                                  stacked, keys)
    np.testing.assert_allclose(np.asarray(h_losses), np.asarray(p_losses),
                               rtol=1e-5, atol=1e-6)


def test_train_device_windows_smoke(ao_dataset, tmp_path):
    """train() end to end with device_windows: runs, logs, checkpoints."""
    cfg = ao_lib.AoTrainConfig(
        model="UNet", image_size=64, num_filter=4, num_level=3,
        dataset_dir=ao_dataset, checkpoint_dir=str(tmp_path / "ck"),
        batch_windows=2, steps_per_dispatch=2, device_augment=True,
        device_windows=True, pool_gb=0.5, validation_every=4,
        checkpoint_every=4, seed=0)
    params, state, names_, ucfg = ao_lib.train(cfg, max_iterations=4,
                                               progress_every=4)
    loss_leaves = jax.tree.leaves(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in loss_leaves)
    model_dir = os.path.join(cfg.checkpoint_dir, cfg.model_name)
    assert os.path.exists(os.path.join(model_dir, "model-4.npz"))


def test_device_windows_config_validation(ao_dataset, tmp_path):
    cfg = ao_lib.AoTrainConfig(
        model="UNet", image_size=64, dataset_dir=ao_dataset,
        checkpoint_dir=str(tmp_path / "ck"), device_windows=True,
        batch_windows=2, device_augment=False)
    with pytest.raises(ValueError, match="device_augment"):
        ao_lib.train(cfg, max_iterations=1)
    cfg2 = ao_lib.AoTrainConfig(
        model="UNet", image_size=64, dataset_dir=ao_dataset,
        checkpoint_dir=str(tmp_path / "ck"), device_windows=True,
        batch_windows=0, device_augment=True)
    with pytest.raises(ValueError, match="batch_windows"):
        ao_lib.train(cfg2, max_iterations=1)


def test_pool_window_dp_step_matches_single_device(ao_dataset,
                                                   eight_devices):
    """The mesh-DP window-pool step (pool replicated, index batches
    sharded on B) equals the single-device pool step."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ukbb_cardiac_tpu.parallel import make_mesh
    from ukbb_cardiac_tpu.train.device_pool import (
        make_pool_window_multi_dp_step)

    train_list = ao_lib.scan_dataset_ao(ao_dataset)["train"]
    cfg = ao_lib.AoTrainConfig(model="UNet-LSTM", from_scratch=True,
                               image_size=64, num_filter=4, num_level=3,
                               num_hidden=4, weight_R=5, batch_windows=8,
                               device_augment=True, device_windows=True)
    ucfg, params, state, names = ao_lib.init_ao_model(
        cfg, jax.random.PRNGKey(0))
    loss_fn = ao_lib.make_ao_loss(cfg, ucfg, names, device_augment=True,
                                  shift=0, rotate=10, scale=0.2)
    optimizer = ao_lib.make_ao_optimizer(cfg, params)
    opt_state = optimizer.init(params)

    B, K, TW = 8, 2, 9
    t_max = max(nifti.read_shape(e[0])[3] for e in train_list)

    def batches_with(pool):
        rng = random.Random(3)
        sample = ao_lib.make_device_window_sampler(
            train_list, B, pool, image_size=64, time_window=TW,
            z_score=True, rng=rng)
        idx = [sample() for _ in range(K)]
        for b in idx:
            for s in b["slot"]:
                pool.unpin(int(s))
        return {k: np.stack([b[k] for b in idx])
                for k in ("slot", "tidx", "lidx")}

    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(1, 1 + K))

    pool1 = DeviceCinePool(6, t_max, 64, 64)
    st1 = batches_with(pool1)
    img1, lab1 = pool1.snapshot()
    p_step = make_pool_window_multi_step(loss_fn, optimizer)
    p1, _, _, l1, _ = p_step(params, state, opt_state, img1, lab1,
                             {k: jnp.asarray(v) for k, v in st1.items()},
                             keys)

    mesh = make_mesh(8)
    pool8 = DeviceCinePool(6, t_max, 64, 64,
                           sharding=NamedSharding(mesh, P()))
    st8 = batches_with(pool8)
    img8, lab8 = pool8.snapshot()
    dp_step = make_pool_window_multi_dp_step(loss_fn, optimizer, mesh)
    p8, _, _, l8, _ = dp_step(params, state, opt_state, img8, lab8, st8,
                              keys)

    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                               rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_train_device_windows_mesh_smoke(ao_dataset, tmp_path,
                                         eight_devices):
    """train() with device_windows + mesh_devices=8 on the virtual CPU
    mesh: runs, checkpoints, finite params."""
    cfg = ao_lib.AoTrainConfig(
        model="UNet", image_size=64, num_filter=4, num_level=3,
        dataset_dir=ao_dataset, checkpoint_dir=str(tmp_path / "ck"),
        batch_windows=8, steps_per_dispatch=2, device_augment=True,
        device_windows=True, pool_gb=0.5, mesh_devices=8,
        validation_every=4, checkpoint_every=4, seed=0)
    params, _, _, _ = ao_lib.train(cfg, max_iterations=4, progress_every=4)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves(params))
