"""Aortic trainer — twin of ``common/train_network_ao.py``.

Reference semantics preserved (file:line):
- flags and defaults: image_size 256 (boundary-learning rationale,
  :29-30), batch 5, 20k iterations, n_class=3 BG/AAo/DAo (:265-268),
  n_block=[2,2,2,2,2] (:284), z-score default (:65-66)
- ``get_random_batch``: subjects with temporally *sparse* annotations;
  a circular time window around every annotated frame (:159-187);
  densely-propagated ``label_ao_prop`` used when present, else the
  central frame's annotation is repeated across the window (:181-187);
  subject-consistent augmentation (:193-196)
- model switch UNet / UNet-LSTM / Temporal-UNet (:285-317); UNet-LSTM's
  unrolled window = 2*weight_R-1 (:294)
- two-phase training: restore a pre-trained UNet scope (incl. BN moving
  stats, :407-414) and train only the LSTM head unless ``joint_train``
  (:350-362) — here a masked optax transform zeroes UNet updates
- piecewise-constant lr decay via ``reduce_lr_after`` (:329-339)
- model-name hyperparameter encoding (:365-381)

TPU-native: the jitted step trains the LSTM over the window with
``lax.scan``; the deploy engine can then run the SAME cell over the full
cine (``infer/deploy_ao.py``).
"""

from __future__ import annotations

import json
import os
import random
import time
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ukbb_cardiac_tpu.ckpt import store
from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.models import convlstm, unet as unet_mod, wrappers
from ukbb_cardiac_tpu.ops import (aortic_data_augmenter, crop_image,
                                  normalise_intensity, rescale_intensity)
from ukbb_cardiac_tpu.train import steps as steps_lib


@dataclass
class AoTrainConfig:
    seq_name: str = "ao"
    model: str = "UNet"        # 'UNet' | 'UNet-LSTM' | 'Temporal-UNet'
    image_size: int = 256
    train_batch_size: int = 5
    validation_batch_size: int = 5
    num_filter: int = 16
    num_level: int = 5
    num_hidden: int = 16
    train_iteration: int = 20000
    learning_rate: float = 1e-3
    reduce_lr_after: Sequence[int] = ()
    dataset_dir: str = ""
    checkpoint_dir: str = "model"
    log_dir: str = "log"
    model_path: str = ""       # pre-trained UNet bundle for UNet-LSTM
    z_score: bool = True
    bidirectional: bool = True
    seq2seq: bool = True
    weight_R: int = 5
    weight_r: float = 0.0
    joint_train: bool = False
    from_scratch: bool = False
    validation_every: int = 10
    checkpoint_every: int = 1000
    seed: int = 0
    # LRU cache of decoded cines, GiB (see train.sa.SubjectCache; a full
    # aortic cine is ~26 MB decoded, so budget accordingly).  0 = off.
    cache_gb: float = 0.0
    # ship batches as f16 images + uint8 labels (2.7x fewer host->device
    # bytes; labels exact, image rounding ~5e-4 — see train.sa)
    compact_transfer: bool = False
    # >0: each batch is exactly this many time windows drawn from a pool
    # filled by per-subject sampling — a STATIC batch shape, so the step
    # compiles once (the reference's subject batches vary in window count
    # with each subject's annotated-frame count, recompiling per distinct
    # count).  0 keeps the reference's variable per-subject batches.
    batch_windows: int = 0
    # K optimizer steps per device dispatch (lax.scan inside one jit;
    # see train.sa.SATrainConfig.steps_per_dispatch).  Requires
    # ``batch_windows``.
    steps_per_dispatch: int = 1
    # apply the window-consistent affine augmentation inside the jitted
    # step (``ops.aortic_batch_augmenter_jax``) instead of host cv2/scipy
    device_augment: bool = False
    # bf16 mixed-precision training: activations bf16 (LSTM recurrence
    # state and gate accumulation stay f32 — see models/convlstm.py),
    # params/BN/logits/loss f32
    bf16: bool = False
    # >1: data-parallel mesh — windows shard over the "data" axis, params
    # replicate, GSPMD inserts the ICI gradient psum (train/steps.py).
    # Requires ``batch_windows`` divisible by the device count.
    mesh_devices: int = 0
    # keep normalised cines resident in HBM and gather each step's time
    # windows ON DEVICE (train/device_pool.py): each cine crosses
    # host->device once on first touch instead of every window it feeds,
    # so the trainer runs at device-step rate through a slow host link.
    # Requires batch_windows and device_augment.  With mesh_devices > 1
    # the pool replicates over the mesh and index batches shard on B
    # (make_pool_window_multi_dp_step).
    device_windows: bool = False
    # HBM budget for the device window pool, GiB
    pool_gb: float = 2.0

    @property
    def n_class(self) -> int:
        return 3

    @property
    def time_window(self) -> int:
        return 1 if self.model == "UNet" else self.weight_R * 2 - 1

    @property
    def model_name(self) -> str:
        n_filter0 = self.num_filter
        name = (f"{self.model}_{self.seq_name}_level{self.num_level}_"
                f"filter{n_filter0}_22222_batch{self.train_batch_size}_"
                f"iter{self.train_iteration}_lr{self.learning_rate}")
        if self.z_score:
            name += "_zscore"
        if self.model == "UNet-LSTM":
            name += f"_tw{self.time_window}_h{self.num_hidden}"
            if self.bidirectional:
                name += "_bidir"
            if self.seq2seq:
                name += f"_seq2seq_wR{self.weight_R}_wr{self.weight_r}"
            if self.joint_train:
                name += "_joint"
            if self.from_scratch:
                name += "_scratch"
        if self.model == "Temporal-UNet":
            name += f"_tw{self.time_window}_wR{self.weight_R}_wr{self.weight_r}"
        return name


def scan_dataset_ao(dataset_dir: str, seq_name: str = "ao"):
    """(image, label[, label_prop]) triples per subset
    (``train_network_ao.py:223-238``)."""
    data_list = {}
    for k in ("train", "validation"):
        subset_dir = os.path.join(dataset_dir, k)
        data_list[k] = []
        if not os.path.isdir(subset_dir):
            continue
        for data in sorted(os.listdir(subset_dir)):
            data_dir = os.path.join(subset_dir, data)
            image_name = os.path.join(data_dir, f"{seq_name}.nii.gz")
            label_name = os.path.join(data_dir, f"label_{seq_name}.nii.gz")
            prop_name = os.path.join(data_dir, f"label_{seq_name}_prop.nii.gz")
            if os.path.exists(image_name) and os.path.exists(label_name):
                if os.path.exists(prop_name):
                    data_list[k].append((image_name, label_name, prop_name))
                else:
                    data_list[k].append((image_name, label_name))
    return data_list


def _load_subject_ao(entry, image_size=256, z_score=True, cache=None,
                     verbose=False):
    """Decode, crop and normalise one subject's (image, label[, prop])
    triple — the per-subject half of ``train_network_ao.py:98-155``,
    shared by the host window samplers and the device-pool sampler.

    Returns (image f32 (X,Y,1,T) normalised, label int32, label_prop
    int32 or None) or None when the reference's validation gates reject
    the subject (mismatched shapes / blank image — same error prints).
    ``cache`` is a ``train.sa.SubjectCache``."""
    image_name, label_name = entry[0], entry[1]
    label_prop_name = entry[2] if len(entry) == 3 else None
    if not (os.path.exists(image_name) and os.path.exists(label_name)):
        return None
    if verbose:
        print(f"  Select {image_name} {label_name}")
    ckey = cached = None
    if cache is not None:
        ckey = (image_name, label_name, label_prop_name, image_size,
                z_score, os.path.getmtime(image_name),
                os.path.getmtime(label_name),
                os.path.getmtime(label_prop_name)
                if label_prop_name else None)
        cached = cache.get(ckey)
    if cached is not None:
        image, label, label_prop = cached
    else:
        image = np.asanyarray(nifti.load(image_name).dataobj).astype(np.float32)
        label = np.asanyarray(nifti.load(label_name).dataobj)
        label_prop = (np.asanyarray(nifti.load(label_prop_name).dataobj)
                      if label_prop_name else None)

        if image.shape != label.shape:
            print(f"Error: mismatched size, image.shape = {image.shape}, "
                  f"label.shape = {label.shape}")
            return None
        if label_prop is not None and image.shape != label_prop.shape:
            print(f"Error: mismatched size, image.shape = {image.shape}, "
                  f"label_prop.shape = {label_prop.shape}")
            return None
        if image.max() < 1e-6:
            print(f"Error: blank image, image.max = {image.max()}")
            return None

        X, Y = image.shape[:2]
        cx, cy = X // 2, Y // 2
        image = crop_image(image, cx, cy, image_size)
        label = crop_image(label, cx, cy, image_size)
        if label_prop is not None:
            label_prop = crop_image(label_prop, cx, cy, image_size)

        if z_score:
            image = normalise_intensity(image, 10.0)
        else:
            image = rescale_intensity(image, (1.0, 99.0))
        # int32 now = the exact cast applied at window stacking below
        label = np.asarray(label, dtype=np.int32)
        if label_prop is not None:
            label_prop = np.asarray(label_prop, dtype=np.int32)
        if cache is not None:
            cache.put(ckey, (image, label,
                             label_prop if label_prop is not None
                             else np.empty(0, np.int32)))
    if isinstance(label_prop, np.ndarray) and label_prop.size == 0:
        label_prop = None
    return image, label, label_prop


def get_random_batch_ao(filename_list, batch_size, image_size=256,
                        time_window=1, z_score=True, flatten=False,
                        data_augmentation=False, shift=0.0, rotate=0.0,
                        scale=0.0, intensity=0.0, flip=False, rng=None,
                        verbose=False, cache=None):
    """Sparse-annotation window sampler (``train_network_ao.py:98-216``).

    Returns images (N, T, X, Y, 1) and labels (N, T, X, Y); when
    ``flatten`` (UNet mode) both collapse the window axis into the batch.
    ``cache`` (a ``train.sa.SubjectCache``) skips the gzip re-decode of
    previously drawn cines (crop/normalise are deterministic per file;
    outputs identical)."""
    rng = rng or random
    n_file = len(filename_list)
    images, labels = [], []
    n_selected = 0
    while n_selected < batch_size:
        entry = filename_list[rng.randrange(n_file)]
        loaded = _load_subject_ao(entry, image_size=image_size,
                                  z_score=z_score, cache=cache,
                                  verbose=verbose)
        if loaded is None:
            continue
        image, label, label_prop = loaded
        label_name = entry[1]
        T = image.shape[3]

        t_anno = np.nonzero(np.sum(label > 0, axis=(0, 1, 2)))[0]
        if len(t_anno) == 0:
            # an all-background label contributes no windows; counting it
            # toward batch_size could yield an empty batch and a cryptic
            # rank error inside the jitted step
            print(f"Error: no annotated frame in {label_name}, skip.")
            continue
        rad = (time_window - 1) // 2
        for t in t_anno:
            idx = [(i + T) % T for i in range(t - rad, t + rad + 1)]
            image_idx = np.transpose(image[:, :, 0, idx], (2, 0, 1))[..., None]
            if label_prop is not None:
                label_idx = np.transpose(label_prop[:, :, 0, idx], (2, 0, 1))
            else:
                label_idx = np.repeat(label[:, :, 0, t][None], time_window,
                                      axis=0)
            if data_augmentation:
                np_rng = (np.random.RandomState(rng.randrange(2 ** 31))
                          if rng is not random else None)
                image_idx, label_idx = aortic_data_augmenter(
                    image_idx, label_idx, shift=shift, rotate=rotate,
                    scale=scale, intensity=intensity, flip=flip, rng=np_rng)
            images.append(image_idx)
            labels.append(label_idx)
        n_selected += 1

    images = np.asarray(images, dtype=np.float32)
    labels = np.asarray(labels, dtype=np.int32)
    if flatten:
        images = images.reshape((-1,) + images.shape[2:])
        labels = labels.reshape((-1,) + labels.shape[2:])
    return images, labels


def make_window_pool_sampler(filename_list, batch_windows: int,
                             image_size=256, time_window=1, z_score=True,
                             flatten=False, data_augmentation=False,
                             shift=0.0, rotate=0.0, scale=0.0, intensity=0.0,
                             flip=False, rng=None, cache=None):
    """Fixed-shape batch sampler: subjects are drawn exactly as
    :func:`get_random_batch_ao` draws them (one at a time), their time
    windows pooled in FIFO order, and batches of exactly
    ``batch_windows`` windows popped off.  Per-window semantics (crop,
    normalise, window-consistent augmentation) are identical to the
    reference sampler — only the batch boundary moves, giving the static
    shape XLA needs to compile the step once and to stack K batches for
    a multi-step scan (the aortic twin of
    ``train.sa.make_slice_pool_sampler``)."""
    buf_img: list = []
    buf_lab: list = []

    def next_batch():
        while len(buf_img) < batch_windows:
            images, labels = get_random_batch_ao(
                filename_list, 1, image_size=image_size,
                time_window=time_window, z_score=z_score, flatten=False,
                data_augmentation=data_augmentation, shift=shift,
                rotate=rotate, scale=scale, intensity=intensity, flip=flip,
                rng=rng, cache=cache)
            buf_img.extend(images)
            buf_lab.extend(labels)
        images = np.asarray(buf_img[:batch_windows], dtype=np.float32)
        labels = np.asarray(buf_lab[:batch_windows], dtype=np.int32)
        del buf_img[:batch_windows], buf_lab[:batch_windows]
        if flatten:
            images = images.reshape((-1,) + images.shape[2:])
            labels = labels.reshape((-1,) + labels.shape[2:])
        return {"image": images, "label": labels}

    return next_batch


def make_device_window_sampler(filename_list, batch_windows: int, pool,
                               image_size=256, time_window=1, z_score=True,
                               rng=None, cache=None, verbose=False):
    """Index-batch sampler over a :class:`train.device_pool.DeviceCinePool`.

    Draws subjects with EXACTLY the host samplers' semantics — the same
    one-``randrange``-per-subject stream, the same validation gates, the
    same circular windows around every annotated frame with FIFO window
    pooling (``make_window_pool_sampler``) — but instead of slicing
    pixels it ensures the subject's cine is device-resident and emits
    {"slot": (B,), "tidx": (B, TW), "lidx": (B, TW)} int32 index batches
    for :func:`train.device_pool.make_pool_window_multi_step` to gather
    in HBM.  ``lidx`` is the window itself when a densely propagated
    label exists, else the annotated centre frame repeated
    (``train_network_ao.py:181-187``).

    Steady state does no host decode at all: per-subject window metadata
    (t_anno, T, has-prop) is memoised by file key, so a pool hit costs a
    dict lookup.  Every emitted window PINS its slot; the consumer must
    ``pool.unpin`` each batch's slots once it has taken the pool
    snapshot the batch will gather from.
    """
    rng = rng or random
    n_file = len(filename_list)
    rad = (time_window - 1) // 2
    meta = {}  # key -> (t_anno tuple, T, has_prop)
    buf: list = []

    def subject_key(entry):
        image_name, label_name = entry[0], entry[1]
        prop_name = entry[2] if len(entry) == 3 else None
        return (image_name, label_name, prop_name, image_size, z_score,
                os.path.getmtime(image_name), os.path.getmtime(label_name),
                os.path.getmtime(prop_name) if prop_name else None)

    def draw():
        entry = filename_list[rng.randrange(n_file)]
        if not (os.path.exists(entry[0]) and os.path.exists(entry[1])):
            return
        key = subject_key(entry)
        m = meta.get(key)
        loaded = None
        if m is None:
            loaded = _load_subject_ao(entry, image_size=image_size,
                                      z_score=z_score, cache=cache,
                                      verbose=verbose)
            if loaded is None:
                return
            image, label, label_prop = loaded
            t_anno = np.nonzero(np.sum(label > 0, axis=(0, 1, 2)))[0]
            if len(t_anno) == 0:
                print(f"Error: no annotated frame in {entry[1]}, skip.")
                meta[key] = ((), image.shape[3], False)
                return
            m = (tuple(int(t) for t in t_anno), image.shape[3],
                 label_prop is not None)
            meta[key] = m
        t_anno, T, has_prop = m
        if not t_anno:
            return

        def make_host(entry=entry):
            got = _load_subject_ao(entry, image_size=image_size,
                                   z_score=z_score, cache=cache)
            if got is None:
                raise RuntimeError(f"subject {entry[0]} failed to re-load "
                                   "for pool upload")
            image, label, label_prop = got
            src = label_prop if label_prop is not None else label
            # (X, Y, 1, T) -> (T, X, Y); pool stores f16 img / uint8 lab
            img_txy = np.transpose(image[:, :, 0, :], (2, 0, 1))
            lab_txy = np.transpose(src[:, :, 0, :], (2, 0, 1))
            return img_txy, lab_txy

        slot = pool.ensure(key, make_host)
        for t in t_anno:
            idx = [(i + T) % T for i in range(t - rad, t + rad + 1)]
            lidx = idx if has_prop else [t] * time_window
            pool.pin(slot)
            buf.append((slot, idx, lidx))

    def next_batch():
        while len(buf) < batch_windows:
            draw()
        take = buf[:batch_windows]
        del buf[:batch_windows]
        return {"slot": np.asarray([s for s, _, _ in take], np.int32),
                "tidx": np.asarray([t for _, t, _ in take], np.int32),
                "lidx": np.asarray([li for _, _, li in take], np.int32)}

    return next_batch


def init_ao_model(cfg: AoTrainConfig, key):
    """Create (params, state, names) for the selected aortic model."""
    n_filter = tuple(cfg.num_filter * (2 ** i) for i in range(cfg.num_level))
    ucfg = unet_mod.UNetConfig(n_class=cfg.n_class, n_level=cfg.num_level,
                               n_filter=n_filter, n_block=(2, 2, 2, 2, 2))
    k1, k2 = jax.random.split(key)
    conv3d = cfg.model == "Temporal-UNet"
    params, state, names = unet_mod.init_unet(k1, ucfg, conv3d_=conv3d)
    if cfg.model == "UNet-LSTM":
        init = (convlstm.init_biconv_lstm if cfg.bidirectional
                else convlstm.init_conv_lstm)
        params.update(init(k2, n_filter[0], cfg.num_hidden, cfg.n_class))
    return ucfg, params, state, names


def make_ao_loss(cfg: AoTrainConfig, ucfg, names, train: bool = True,
                 device_augment: bool = False, shift=0.0, rotate=10.0,
                 scale=0.2, intensity=0.0, flip=False, compute_dtype=None):
    """Loss closure per model kind (``train_network_ao.py:285-317``).
    ``train=False`` builds the eval-mode twin (BN moving stats — the
    reference's ``training: False`` validation feed, :449)."""

    dtype = compute_dtype or jnp.float32

    def loss_fn(params, state, batch, key):
        # accept compact transfer dtypes (f16 image / uint8 label); the
        # cast is free when the batch already arrives f32/int32
        images = batch["image"].astype(jnp.float32)
        labels_arr = batch["label"].astype(jnp.int32)
        if device_augment:
            # window-consistent affine inside the jitted step — the
            # TPU-native twin of the host sampler's per-window
            # aortic_data_augmenter (train_network_ao.py:190-196).
            # UNet batches arrive UNFLATTENED (N, T, X, Y, 1) so each
            # window still shares one transform; flattened below.
            from ukbb_cardiac_tpu.ops import aortic_batch_augmenter_jax
            images, labels_arr = aortic_batch_augmenter_jax(
                key, images, labels_arr, shift, rotate, scale, intensity,
                flip, sample_dtype=dtype)
        if cfg.model == "UNet":
            if images.ndim == 5:  # window-grouped input; fold into batch
                images = images.reshape((-1,) + images.shape[2:])
                labels_arr = labels_arr.reshape((-1,) + labels_arr.shape[2:])
            loss, prob, pred, new_state = wrappers.unet_model(
                params, state, names, ucfg, images, labels_arr, train=train,
                compute_dtype=dtype)
            pred_fr, label_fr = pred, labels_arr
        elif cfg.model == "Temporal-UNet":
            loss, prob, pred, new_state = wrappers.temporal_unet_model(
                params, state, names, ucfg, images, labels_arr, train=train,
                weight_R=cfg.weight_R, weight_r=cfg.weight_r,
                compute_dtype=dtype)
            s = (cfg.time_window - 1) // 2
            pred_fr, label_fr = pred[:, s], labels_arr[:, s]
        else:  # UNet-LSTM
            loss, prob, pred, new_state = wrappers.unet_lstm_model(
                params, state, names, ucfg, images, labels_arr, train=train,
                train_unet=cfg.joint_train, bidirectional=cfg.bidirectional,
                seq2seq=cfg.seq2seq, weight_R=cfg.weight_R,
                weight_r=cfg.weight_r, compute_dtype=dtype)
            s = (cfg.time_window - 1) // 2
            pred_fr, label_fr = pred[:, s], labels_arr[:, s]

        aux = {"accuracy": jnp.mean((pred_fr == label_fr).astype(jnp.float32))}
        for name, k in (("dice_aa", 1), ("dice_da", 2)):
            a, b = pred_fr == k, label_fr == k
            aux[name] = (2 * jnp.sum(a & b) /
                         jnp.maximum(jnp.sum(a) + jnp.sum(b), 1e-7))
        return loss, (aux, new_state)

    return loss_fn


def make_ao_optimizer(cfg: AoTrainConfig, params):
    """Adam with optional lr decay; LSTM-only updates unless joint_train
    (``train_network_ao.py:341-362``)."""
    opt = steps_lib.adam_with_schedule(cfg.learning_rate,
                                       reduce_after=cfg.reduce_lr_after)
    if cfg.model == "UNet-LSTM" and not cfg.joint_train:
        def label_fn(tree):
            return {k: ("train" if k == "LSTM" else "freeze") for k in tree}
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, label_fn)
    return opt


def restore_pretrained_unet(params, state, model_path: str):
    """Load the ``UNet/`` scope (incl. BN moving stats) from a bundle —
    the two-phase restore (``train_network_ao.py:407-414``).  A TF
    checkpoint prefix is converted on the fly."""
    if not model_path.endswith(".npz"):
        from ukbb_cardiac_tpu.ckpt.tf_reader import convert_tf_checkpoint
        model_path = convert_tf_checkpoint(model_path)
    _, _, _, p2, s2, _ = store.load_model(model_path)
    params = dict(params)
    state = dict(state)
    params["UNet"] = p2["UNet"]
    state["UNet"] = s2["UNet"]
    return params, state


def _make_device_window_pipeline(cfg: AoTrainConfig, train_list, K, rng,
                                 cache, sharding=None):
    """Size and build the HBM cine pool and its index sampler.

    ``t_max`` comes from a header-only scan of the training cines
    (``io.nifti.read_shape`` — no voxel payload is decompressed); the
    slot count fits ``pool_gb`` and is floored at one dispatch chunk's
    worst-case working set (every window of a K-step chunk from a
    distinct subject, plus sampler spill-over) so eviction can always
    make progress."""
    from ukbb_cardiac_tpu.train.device_pool import DeviceCinePool

    t_max = 0
    for entry in train_list:
        try:
            shape = nifti.read_shape(entry[0])
        except Exception:
            continue
        if len(shape) >= 4:
            t_max = max(t_max, int(shape[3]))
    if t_max <= 0:
        raise ValueError("device_windows: no readable 4D training cine")
    s = cfg.image_size
    bytes_per_slot = t_max * s * s * 3  # f16 image + uint8 label
    budget_slots = int(cfg.pool_gb * (1 << 30) / bytes_per_slot)
    # worst case pinned at once: the prefetch queue (depth K+1), the
    # batch in flight, and the chunk under construction — every window
    # from a distinct subject
    min_slots = min(len(train_list), (2 * K + 2) * cfg.batch_windows + 4)
    n_slots = min(len(train_list), max(budget_slots, 1))
    if n_slots < min_slots:
        raise ValueError(
            f"device_windows: pool_gb={cfg.pool_gb} holds {n_slots} cines "
            f"({bytes_per_slot / 2 ** 20:.0f} MiB each) but one dispatch "
            f"chunk may pin {min_slots}; raise pool_gb or lower "
            "batch_windows/steps_per_dispatch")
    pool = DeviceCinePool(n_slots, t_max, s, s, sharding=sharding)
    print(f"Device window pool: {n_slots} slots x T{t_max} @ {s}x{s} "
          f"({pool.nbytes / 2 ** 30:.2f} GiB HBM)")
    sample = make_device_window_sampler(
        train_list, cfg.batch_windows, pool, image_size=cfg.image_size,
        time_window=cfg.time_window, z_score=cfg.z_score, rng=rng,
        cache=cache)
    return pool, sample


def train(cfg: AoTrainConfig, max_iterations: Optional[int] = None,
          progress_every: int = 100):
    data_list = scan_dataset_ao(cfg.dataset_dir, cfg.seq_name)
    if not data_list["train"]:
        raise FileNotFoundError(f"no training data under {cfg.dataset_dir}/train")

    key = jax.random.PRNGKey(cfg.seed)
    ucfg, params, state, names = init_ao_model(cfg, key)
    if cfg.model == "UNet-LSTM" and not cfg.from_scratch:
        if not cfg.model_path:
            raise ValueError("UNet-LSTM needs --model_path (pre-trained UNet) "
                             "unless --from_scratch")
        print("Restore pre-trained UNet weights...")
        params, state = restore_pretrained_unet(params, state, cfg.model_path)

    optimizer = make_ao_optimizer(cfg, params)
    opt_state = optimizer.init(params)
    loss_fn = make_ao_loss(cfg, ucfg, names,
                           device_augment=cfg.device_augment,
                           shift=0, rotate=10, scale=0.2, intensity=0,
                           flip=False,
                           compute_dtype=jnp.bfloat16 if cfg.bf16 else None)
    K = max(1, int(cfg.steps_per_dispatch))
    if K > 1 and cfg.batch_windows <= 0:
        raise ValueError("steps_per_dispatch > 1 requires batch_windows "
                         "(a static batch shape to stack K batches)")
    if cfg.device_windows:
        if cfg.batch_windows <= 0:
            raise ValueError("device_windows requires batch_windows "
                             "(a static window batch to index-gather)")
        if not cfg.device_augment:
            raise ValueError("device_windows requires device_augment: the "
                             "windows never exist on the host, so the "
                             "affine augmentation must run in the step")
    pool_sharding = None
    if cfg.mesh_devices > 1:
        if cfg.batch_windows <= 0:
            raise ValueError("mesh_devices > 1 requires batch_windows "
                             "(a static batch to shard evenly)")
        if cfg.batch_windows % cfg.mesh_devices:
            raise ValueError("batch_windows must divide evenly over "
                             f"mesh_devices ({cfg.batch_windows} % "
                             f"{cfg.mesh_devices} != 0)")
        from ukbb_cardiac_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(cfg.mesh_devices)
        if cfg.device_windows:
            # pool replicated over the mesh, index batches sharded on B
            # (device_pool.py::make_pool_window_multi_dp_step)
            from jax.sharding import NamedSharding, PartitionSpec
            from ukbb_cardiac_tpu.train.device_pool import \
                make_pool_window_multi_dp_step
            pool_sharding = NamedSharding(mesh, PartitionSpec())
            step = None
            multi_step = make_pool_window_multi_dp_step(loss_fn, optimizer,
                                                        mesh)
        else:
            step = steps_lib.make_dp_train_step(loss_fn, optimizer, mesh)
            multi_step = (steps_lib.make_multi_dp_train_step(
                loss_fn, optimizer, mesh) if K > 1 else None)
    elif cfg.device_windows:
        from ukbb_cardiac_tpu.train.device_pool import \
            make_pool_window_multi_step
        step = None  # every dispatch (k_now >= 1) goes through the scan
        multi_step = make_pool_window_multi_step(loss_fn, optimizer)
    else:
        step = steps_lib.make_train_step(loss_fn, optimizer)
        multi_step = (steps_lib.make_multi_train_step(loss_fn, optimizer)
                      if K > 1 else None)

    model_dir = os.path.join(cfg.checkpoint_dir, cfg.model_name)
    os.makedirs(model_dir, exist_ok=True)
    log_f = open(os.path.join(model_dir, "train_log.jsonl"), "a")

    rng = random.Random(cfg.seed)
    # validation gets its own stream: the training rng is consumed on the
    # prefetch worker thread, so sharing would make seeds timing-dependent
    val_rng = random.Random(cfg.seed + 7_777_777)

    eval_loss = make_ao_loss(cfg, ucfg, names, train=False)

    @jax.jit
    def loss_fn_eval(params, state, batch):
        loss, (aux, _) = eval_loss(params, state, batch,
                                   jax.random.PRNGKey(0))
        return loss, aux

    flatten = cfg.model == "UNet"
    total = max_iterations or cfg.train_iteration
    print("Start training...")
    start_time = time.time()

    from ukbb_cardiac_tpu.train.prefetch import BatchPrefetcher

    from ukbb_cardiac_tpu.train.sa import SubjectCache

    cache = (SubjectCache(int(cfg.cache_gb * (1 << 30)))
             if cfg.cache_gb > 0 else None)

    # with device_augment, UNet batches stay window-grouped (N, T, ...)
    # through the host path so each window shares one transform in the
    # jitted augmenter; the loss folds T into the batch afterwards
    host_flatten = flatten and not cfg.device_augment
    if cfg.device_windows:
        pool, sample = _make_device_window_pipeline(cfg, data_list["train"],
                                                    K, rng, cache,
                                                    sharding=pool_sharding)
    elif cfg.batch_windows > 0:
        sample = make_window_pool_sampler(
            data_list["train"], cfg.batch_windows, image_size=cfg.image_size,
            time_window=cfg.time_window, z_score=cfg.z_score,
            flatten=host_flatten, data_augmentation=not cfg.device_augment,
            shift=0, rotate=10, scale=0.2, intensity=0, flip=False, rng=rng,
            cache=cache)
    else:
        def sample():
            images, labels_arr = get_random_batch_ao(
                data_list["train"], cfg.train_batch_size,
                image_size=cfg.image_size, time_window=cfg.time_window,
                z_score=cfg.z_score, flatten=host_flatten,
                data_augmentation=not cfg.device_augment,
                shift=0, rotate=10, scale=0.2, intensity=0, flip=False,
                rng=rng, cache=cache)
            return {"image": images, "label": labels_arr}

    if cfg.compact_transfer and not cfg.device_windows:
        def make_batch():  # cast on the prefetch thread
            b = sample()
            return {"image": b["image"].astype(np.float16),
                    "label": b["label"].astype(np.uint8)}
    else:
        make_batch = sample

    prefetcher = BatchPrefetcher(make_batch, depth=2 if K == 1 else K + 1)
    from ukbb_cardiac_tpu.train.prefetch import (make_chunk_builder,
                                                 make_pool_chunk_builder)
    if cfg.device_windows:
        # index chunks are a few hundred bytes; snapshot/unpin ordering
        # lives in the shared builder (train/prefetch.py)
        build_input = make_pool_chunk_builder(
            prefetcher, pool, K, total,
            (cfg.validation_every, cfg.checkpoint_every, progress_every),
            stage_local=cfg.mesh_devices <= 1)
    else:
        # the next chunk is device_put one dispatch ahead: its H2D
        # transfer rides under the running step (transfers overlap
        # compute — train.sa)
        build_input = make_chunk_builder(
            prefetcher, K, total,
            (cfg.validation_every, cfg.checkpoint_every, progress_every),
            stage=jax.device_put if cfg.mesh_devices <= 1 else None)

    iteration = 0
    pending = build_input(iteration) if total > 0 else None
    while iteration < total:
        t0 = time.time()
        k_now, batches, keys = pending
        if cfg.device_windows:
            pool_img, pool_lab, idx = batches
            params, state, opt_state, losses_k, aux = multi_step(
                params, state, opt_state, pool_img, pool_lab, idx, keys)
            loss = losses_k[-1]
        elif k_now > 1:
            params, state, opt_state, losses_k, aux = multi_step(
                params, state, opt_state, batches, keys)
            loss = losses_k[-1]
        else:
            params, state, opt_state, loss, aux = step(
                params, state, opt_state, batches, keys)
        iteration += k_now
        if iteration < total:
            pending = build_input(iteration)

        if iteration % cfg.validation_every == 0:
            rec = {"iteration": iteration, "loss": float(loss),
                   "accuracy": float(aux["accuracy"]),
                   "dice_aa": float(aux["dice_aa"]),
                   "dice_da": float(aux["dice_da"]),
                   # per-iteration, whatever K the dispatch ran
                   "seconds": (time.time() - t0) / k_now}
            if data_list["validation"]:
                # held-out Dice AA/DA every validation_every iterations —
                # the reference validates every 10 (train_network_ao.py:
                # 441-457); round 2 previously logged training metrics only
                v_images, v_labels = get_random_batch_ao(
                    data_list["validation"], cfg.validation_batch_size,
                    image_size=cfg.image_size, time_window=cfg.time_window,
                    z_score=cfg.z_score, flatten=flatten,
                    data_augmentation=False, rng=val_rng, cache=cache)
                v_loss, v_aux = loss_fn_eval(
                    params, state, {"image": v_images, "label": v_labels})
                rec["val_loss"] = float(v_loss)
                rec["val_accuracy"] = float(v_aux["accuracy"])
                rec["val_dice_aa"] = float(v_aux["dice_aa"])
                rec["val_dice_da"] = float(v_aux["dice_da"])
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()

        if iteration % progress_every == 0:
            print(f"Iteration {iteration}/{total}: loss = {float(loss):.4f}")

        if iteration % cfg.checkpoint_every == 0 or iteration == total:
            kind = {"UNet": "unet", "UNet-LSTM": "unet_lstm",
                    "Temporal-UNet": "temporal_unet"}[cfg.model]
            store.save_model(
                os.path.join(model_dir, f"model-{iteration}.npz"), kind, ucfg,
                names, jax.device_get(params), jax.device_get(state),
                extra_meta={"iteration": iteration,
                            "bidirectional": cfg.bidirectional})

    prefetcher.close()
    log_f.close()
    print(f"Training took {time.time() - start_time:.3f}s.")
    return params, state, names, ucfg
