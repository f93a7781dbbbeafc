"""Device-slice SA training: the HBM-resident slice pool.

The pool path must feed the step EXACTLY the batches the host
slice-pool sampler would have shipped under ``compact_transfer``
(f16 image / uint8 label) — same subject-draw rng stream, same FIFO
slice pooling in z order — with the pixels gathered from HBM by index
(``train/device_pool.py::make_pool_slice_multi_step``; the aortic
window pool's inversion applied to the SA slice stream of
``train_network.py:57-118``).
"""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.train import sa as sa_lib
from ukbb_cardiac_tpu.train.device_pool import (DeviceCinePool,
                                                make_pool_slice_multi_step)


@pytest.fixture(scope="module")
def sa_dataset(tmp_path_factory):
    """6 subject-frames (3 subjects x ED/ES), 48x48, mixed Z (4/6)."""
    root = tmp_path_factory.mktemp("sa_ds")
    rng = np.random.RandomState(0)
    aff = np.diag([1.8, 1.8, 10.0, 1.0])
    for i in range(3):
        d = root / "train" / f"s{i}"
        d.mkdir(parents=True)
        Z = 4 if i % 2 else 6
        for fr in ("ED", "ES"):
            img = (rng.rand(48, 48, Z) * 3000).astype(np.int16)
            lab = rng.randint(0, 4, (48, 48, Z)).astype(np.int16)
            nifti.save(nifti.Nifti1Image(img, aff),
                       str(d / f"sa_{fr}.nii.gz"))
            nifti.save(nifti.Nifti1Image(lab, aff),
                       str(d / f"label_sa_{fr}.nii.gz"))
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


def _host_batches(train_list, n_batches, B, seed):
    rng = (_ScriptedRng(seed) if isinstance(seed, (list, tuple))
           else random.Random(seed))
    sample = sa_lib.make_slice_pool_sampler(
        train_list, B, image_size=48, data_augmentation=False, rng=rng)
    out = []
    for _ in range(n_batches):
        b = sample()
        out.append({"image": b["image"].astype(np.float16),
                    "label": b["label"].astype(np.uint8)})
    return out


def _device_batches(train_list, n_batches, B, seed, n_slots):
    rng = (_ScriptedRng(seed) if isinstance(seed, (list, tuple))
           else random.Random(seed))
    z_max = max(nifti.read_shape(e[0])[2] for e in train_list)
    pool = DeviceCinePool(n_slots, z_max, 48, 48)
    sample = sa_lib.make_device_slice_sampler(
        train_list, B, pool, image_size=48, rng=rng)
    out = []
    for _ in range(n_batches):
        b = sample()
        img, lab = pool.snapshot()  # snapshot AFTER the batch's ensures
        for s in b["slot"]:
            pool.unpin(int(s))
        flat_i = np.asarray(img).reshape(-1, 48, 48)
        flat_l = np.asarray(lab).reshape(-1, 48, 48)
        fi = b["slot"] * z_max + b["zidx"]
        out.append({"image": flat_i[fi][..., None], "label": flat_l[fi]})
    return out, pool


def test_device_slices_match_host_sampler(sa_dataset):
    """Pool gather == host slice-pool sampler, slice for slice."""
    train_list = sa_lib.scan_dataset(sa_dataset, "sa")["train"]
    host = _host_batches(train_list, 5, 7, seed=7)
    dev, pool = _device_batches(train_list, 5, 7, seed=7, n_slots=6)
    for hb, db in zip(host, dev):
        np.testing.assert_array_equal(hb["label"], db["label"])
        np.testing.assert_array_equal(hb["image"], db["image"])
    assert pool.uploads <= 6  # each subject-frame shipped at most once


def test_device_slices_survive_eviction(sa_dataset):
    """A 2-slot pool over 6 subject-frames forces LRU eviction; batches
    must still be exact (snapshots keep queued indices valid)."""
    train_list = sa_lib.scan_dataset(sa_dataset, "sa")["train"]
    order = [0, 1, 2, 3, 4, 5]  # cycle all 6 through a 2-slot pool
    host = _host_batches(train_list, 10, 5, seed=order)
    dev, pool = _device_batches(train_list, 10, 5, seed=order, n_slots=2)
    for hb, db in zip(host, dev):
        np.testing.assert_array_equal(hb["label"], db["label"])
        np.testing.assert_array_equal(hb["image"], db["image"])
    assert pool.uploads > 6  # evictions forced re-uploads


def test_pool_slice_step_matches_host_step(sa_dataset):
    """One K=2 dispatch through make_pool_slice_multi_step equals the
    host multi-step fed the equivalent pixel batches (same keys)."""
    import optax

    from ukbb_cardiac_tpu.models import fcn as fcn_mod
    from ukbb_cardiac_tpu.train import steps as steps_lib

    train_list = sa_lib.scan_dataset(sa_dataset, "sa")["train"]
    mcfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(4, 8, 8),
                             n_block=(1, 1, 1), same_dim=4, fc=8)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), mcfg)
    loss_fn = sa_lib.make_fcn_loss(names, mcfg, device_augment=True,
                                   shift=0, rotate=10, scale=0.2)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    B = 4
    host = _host_batches(train_list, 2, B, seed=3)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(1, 3))
    h_batches = {k: jnp.asarray(np.stack([b[k] for b in host]))
                 for k in ("image", "label")}
    h_step = steps_lib.make_multi_train_step(loss_fn, optimizer)
    _, _, _, h_losses, _ = h_step(params, state, opt_state, h_batches, keys)

    # drive the REAL pool step with the index batches
    rng = random.Random(3)
    z_max = max(nifti.read_shape(e[0])[2] for e in train_list)
    pool = DeviceCinePool(6, z_max, 48, 48)
    sample = sa_lib.make_device_slice_sampler(
        train_list, B, pool, image_size=48, rng=rng)
    idx_batches = [sample() for _ in range(2)]
    img, lab = pool.snapshot()
    for b in idx_batches:
        for s in b["slot"]:
            pool.unpin(int(s))
    stacked = {k: jnp.asarray(np.stack([b[k] for b in idx_batches]))
               for k in ("slot", "zidx")}
    p_step = make_pool_slice_multi_step(loss_fn, optimizer)
    _, _, _, p_losses, _ = p_step(params, state, opt_state, img, lab,
                                  stacked, keys)
    np.testing.assert_allclose(np.asarray(h_losses), np.asarray(p_losses),
                               rtol=1e-5, atol=1e-6)


def test_train_device_slices_smoke(sa_dataset, tmp_path):
    """train() end to end with device_slices: runs, logs, checkpoints."""
    cfg = sa_lib.SATrainConfig(
        seq_name="sa", image_size=48, num_filter=4, num_level=3,
        dataset_dir=sa_dataset, checkpoint_dir=str(tmp_path / "ck"),
        batch_slices=4, steps_per_dispatch=2, device_augment=True,
        device_slices=True, pool_gb=0.5, validation_every=4,
        checkpoint_every=4, seed=0)
    params, state, names_, mcfg = sa_lib.train(cfg, max_iterations=4,
                                               progress_every=4)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves(params))
    model_dir = os.path.join(cfg.checkpoint_dir, cfg.model_name)
    assert os.path.exists(os.path.join(model_dir, "model-4.npz"))


def test_train_device_slices_matches_host_path(sa_dataset, tmp_path):
    """Full train() losses: device_slices == compact_transfer host path
    (same seed, same iteration count) — the pool changes WHERE pixels
    live, not what the optimiser sees."""
    common = dict(
        seq_name="sa", image_size=48, num_filter=4, num_level=3,
        dataset_dir=sa_dataset, batch_slices=4, steps_per_dispatch=2,
        device_augment=True, validation_every=10 ** 9,
        checkpoint_every=10 ** 9, seed=5)
    cfg_host = sa_lib.SATrainConfig(
        checkpoint_dir=str(tmp_path / "h"), compact_transfer=True, **common)
    p_h, s_h, _, _ = sa_lib.train(cfg_host, max_iterations=4,
                                  progress_every=10 ** 9)
    cfg_dev = sa_lib.SATrainConfig(
        checkpoint_dir=str(tmp_path / "d"), device_slices=True,
        pool_gb=0.5, **common)
    p_d, s_d, _, _ = sa_lib.train(cfg_dev, max_iterations=4,
                                  progress_every=10 ** 9)
    for a, b in zip(jax.tree.leaves(p_h), jax.tree.leaves(p_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_device_slices_config_validation(sa_dataset, tmp_path):
    cfg = sa_lib.SATrainConfig(
        seq_name="sa", image_size=48, dataset_dir=sa_dataset,
        checkpoint_dir=str(tmp_path / "ck"), device_slices=True,
        batch_slices=4, device_augment=False)
    with pytest.raises(ValueError, match="device_augment"):
        sa_lib.train(cfg, max_iterations=1)
    cfg2 = sa_lib.SATrainConfig(
        seq_name="sa", image_size=48, dataset_dir=sa_dataset,
        checkpoint_dir=str(tmp_path / "ck"), device_slices=True,
        batch_slices=0, device_augment=True)
    with pytest.raises(ValueError, match="batch_slices"):
        sa_lib.train(cfg2, max_iterations=1)


def test_pool_dp_step_matches_single_device(sa_dataset, eight_devices):
    """The mesh-DP pool step (pool replicated, index batches sharded on
    B) produces the same losses/params as the single-device pool step —
    the gradient all-reduce GSPMD derives from the shardings changes
    nothing numerically."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ukbb_cardiac_tpu.models import fcn as fcn_mod
    from ukbb_cardiac_tpu.parallel import make_mesh
    from ukbb_cardiac_tpu.train.device_pool import (
        make_pool_slice_multi_dp_step)

    train_list = sa_lib.scan_dataset(sa_dataset, "sa")["train"]
    mcfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(4, 8, 8),
                             n_block=(1, 1, 1), same_dim=4, fc=8)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), mcfg)
    loss_fn = sa_lib.make_fcn_loss(names, mcfg, device_augment=True,
                                   shift=0, rotate=10, scale=0.2)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    B, K = 8, 2
    z_max = max(nifti.read_shape(e[0])[2] for e in train_list)

    def batches_with(pool):
        rng = random.Random(3)
        sample = sa_lib.make_device_slice_sampler(
            train_list, B, pool, image_size=48, rng=rng)
        idx = [sample() for _ in range(K)]
        for b in idx:
            for s in b["slot"]:
                pool.unpin(int(s))
        return {k: np.stack([b[k] for b in idx]) for k in ("slot", "zidx")}

    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(1, 1 + K))

    pool1 = DeviceCinePool(6, z_max, 48, 48)
    st1 = batches_with(pool1)
    img1, lab1 = pool1.snapshot()
    p_step = make_pool_slice_multi_step(loss_fn, optimizer)
    p1, _, _, l1, _ = p_step(params, state, opt_state, img1, lab1,
                             {k: jnp.asarray(v) for k, v in st1.items()},
                             keys)

    mesh = make_mesh(8)
    pool8 = DeviceCinePool(6, z_max, 48, 48,
                           sharding=NamedSharding(mesh, P()))
    st8 = batches_with(pool8)
    img8, lab8 = pool8.snapshot()
    dp_step = make_pool_slice_multi_dp_step(loss_fn, optimizer, mesh)
    p8, _, _, l8, _ = dp_step(params, state, opt_state, img8, lab8, st8,
                              keys)

    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                               rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_train_device_slices_mesh_smoke(sa_dataset, tmp_path,
                                        eight_devices):
    """train() with device_slices + mesh_devices=8 on the virtual CPU
    mesh: runs, checkpoints, finite params."""
    cfg = sa_lib.SATrainConfig(
        seq_name="sa", image_size=48, num_filter=4, num_level=3,
        dataset_dir=sa_dataset, checkpoint_dir=str(tmp_path / "ck"),
        batch_slices=8, steps_per_dispatch=2, device_augment=True,
        device_slices=True, pool_gb=0.5, mesh_devices=8,
        validation_every=4, checkpoint_every=4, seed=0)
    params, _, _, _ = sa_lib.train(cfg, max_iterations=4, progress_every=4)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves(params))
