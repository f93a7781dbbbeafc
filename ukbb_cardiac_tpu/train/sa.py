"""SA/LA FCN trainer — twin of ``common/train_network.py`` on a JAX/optax
core with optional mesh data-parallelism.

Reference semantics preserved (file:line):
- dataset scan of ``{train,validation,test}/<eid>/<seq>_{ED,ES}.nii.gz``
  + ``label_<seq>_{ED,ES}.nii.gz`` pairs (:125-138)
- n_class by sequence: sa=4, la_2ch=2, la_4ch=3 (:157-167)
- ``get_random_batch``: random subject pairs, centre crop to
  ``image_size``, rescale (1,99), per-slice 2D stacking, optional
  augmentation (:57-118); training uses rotate=10, scale=0.2 (:263)
- FCN with n_filter=[16*2^i], n_block=[2,2,3,3,3], same_dim=32, fc=64
  (:179-195); softmax CE loss (:204-206); Adam (:225)
- validation every 10 iterations with per-class Dice (:276-308);
  checkpoint every 1000 (:337-339); model-name encoding (:228-230)

TPU-native changes:
- the device step is one jitted function (forward+backward+Adam+BN);
  mesh data-parallelism shards the batch over chips (``steps.py``)
- metrics go to a JSONL log (`train_log.jsonl`) instead of TF summaries
- checkpoints are native model bundles (``ckpt/store.py``)
"""

from __future__ import annotations

import json
import os
import random
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ukbb_cardiac_tpu.ckpt import store
from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.models import fcn as fcn_mod
from ukbb_cardiac_tpu.models import losses
from ukbb_cardiac_tpu.ops import crop_image, data_augmenter, rescale_intensity
from ukbb_cardiac_tpu.train import steps as steps_lib

N_CLASS = {"sa": 4, "la_2ch": 2, "la_4ch": 3, "la_4ch_seg4": 6}


# The TPU production operating point (measured; DESIGN.md "MXU lane
# ceiling"): the released FCN's 16-32 channel levels under-fill the MXU
# at the reference batch (2 subjects ~ 20 slices -> MFU 0.033 on v5e),
# and batch is the lever — 128 slices is the measured saturating batch
# (MFU 0.077+, ~2.3x step throughput).  The production CLI profile
# defaults to this batch.  NOTE the optimisation trajectory differs
# from the reference's batch-2 run: with the linear-scaling rule the
# matching learning rate is ``1e-3 * batch_slices / 20`` (the CLI
# applies this when --learning_rate is not given explicitly); for
# checkpoint-parity training use ``--profile reference``.
PRODUCTION_BATCH_SLICES = 128


@dataclass
class SATrainConfig:
    seq_name: str = "sa"
    image_size: int = 192
    train_batch_size: int = 2
    validation_batch_size: int = 2
    train_iteration: int = 50000
    num_filter: int = 16
    num_level: int = 5
    learning_rate: float = 1e-3
    dataset_dir: str = ""
    checkpoint_dir: str = ""
    log_dir: str = ""
    validation_every: int = 10
    checkpoint_every: int = 1000
    seed: int = 0
    mesh_devices: int = 0  # 0 = single device; >0 = data-parallel mesh
    device_augment: bool = False  # augment inside the jitted step (TPU path)
    # K optimizer steps per device dispatch (lax.scan inside one jit,
    # ``steps.make_multi_train_step``) — semantically identical to K
    # single steps; amortizes per-dispatch host overhead K×.  Requires
    # ``batch_slices`` (static shapes to stack).  Pick a divisor of
    # ``validation_every`` so every dispatch compiles to the same K.
    steps_per_dispatch: int = 1
    # >0: each batch is exactly this many 2D slices drawn from a pool
    # filled by per-subject sampling — a STATIC batch shape, so the step
    # compiles once (the reference's subject batches vary in slice count
    # with Z, recompiling per distinct count and preventing multi-step
    # stacking).  0 keeps the reference's variable per-subject batches.
    batch_slices: int = 0
    # bf16 mixed-precision training: activations bf16, params/BN/logits/
    # loss f32 (the TPU production configuration; bench_train measures it)
    bf16: bool = False
    # ship batches host->device as f16 images + uint8 labels (2.7x fewer
    # bytes than f32+int32).  Labels are exact (n_class <= 6); images are
    # rounded to f16 (~5e-4 of the [0,1] range) before the f32 cast on
    # device — invisible under bf16 compute (8-bit mantissa), and far
    # below augmentation noise.  Matters wherever host->device bandwidth
    # is the bound (this machine's TPU tunnel: 59 -> 22 MB per 10-step
    # dispatch).
    compact_transfer: bool = False
    # train on DEVICE-RESIDENT slices: each subject-frame volume ships
    # to an HBM pool once (f16 image + uint8 label) and the jitted step
    # gathers (slot, z) indices — steady-state H2D is ~8 bytes/slice
    # instead of ~110 KB (train/device_pool.py; the aortic trainer's
    # window-pool inversion applied to the SA slice stream).  Requires
    # batch_slices > 0 and device_augment (augmentation must happen
    # in-step — the pool holds un-augmented slices).  Batch values are
    # identical to compact_transfer's (f16/uint8).  With
    # mesh_devices > 1 the pool replicates over the mesh and index
    # batches shard on B (make_pool_slice_multi_dp_step).
    device_slices: bool = False
    # HBM budget for the device slice pool, GiB
    pool_gb: float = 2.0
    # >0: LRU cache of decoded subjects, in GiB.  The reference re-reads
    # and gzip-inflates both NIfTI files of every drawn subject on EVERY
    # iteration (``train_network.py:57-118``); with the device step at
    # ~28 ms that decode (~90 ms/subject-pair measured) host-binds the
    # trainer.  Crop and intensity rescale are deterministic per file, so
    # the cropped+rescaled volume is cached after first decode — outputs
    # are bit-identical to the uncached path.  ~1.9 MiB/subject-frame at
    # 192²x10; 4 GiB holds a full 1000-subject ED+ES training set.
    cache_gb: float = 0.0

    @property
    def n_class(self) -> int:
        return N_CLASS[self.seq_name]

    @property
    def model_name(self) -> str:
        n_block = "22333"
        return (f"FCN_{self.seq_name}_level{self.num_level}_filter{self.num_filter}_"
                f"{n_block}_batch{self.train_batch_size}_"
                f"iter{self.train_iteration}_lr{self.learning_rate}")


def scan_dataset(dataset_dir: str, seq_name: str):
    """List (image, label) ED/ES file pairs per subset
    (``train_network.py:125-138``)."""
    data_list = {}
    for k in ("train", "validation", "test"):
        subset_dir = os.path.join(dataset_dir, k)
        data_list[k] = []
        if not os.path.isdir(subset_dir):
            continue
        for data in sorted(os.listdir(subset_dir)):
            data_dir = os.path.join(subset_dir, data)
            for fr in ("ED", "ES"):
                image_name = os.path.join(data_dir, f"{seq_name}_{fr}.nii.gz")
                label_name = os.path.join(data_dir, f"label_{seq_name}_{fr}.nii.gz")
                if os.path.exists(image_name) and os.path.exists(label_name):
                    data_list[k].append((image_name, label_name))
    return data_list


class SubjectCache:
    """Byte-budgeted LRU cache of decoded, cropped, rescaled subjects.

    Keyed by (image path, label path, crop size, both files' mtimes) so a
    rewritten file re-decodes.  Thread-safe: the trainer's prefetch worker
    and validation draws may touch it concurrently."""

    def __init__(self, max_bytes: int):
        import collections
        import threading

        self.max_bytes = int(max_bytes)
        self._lock = threading.Lock()
        self._data = collections.OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def get(self, key):
        with self._lock:
            value = self._data.get(key)
            if value is not None:
                self._data.move_to_end(key)
                self.hits += 1
            else:
                self.misses += 1
            return value

    def put(self, key, value):
        nbytes = sum(a.nbytes for a in value)
        if nbytes > self.max_bytes:
            return
        with self._lock:
            if key in self._data:
                return
            self._data[key] = value
            self._bytes += nbytes
            while self._bytes > self.max_bytes:
                _, old = self._data.popitem(last=False)
                self._bytes -= sum(a.nbytes for a in old)


def get_random_batch(filename_list, batch_size, image_size=192,
                     data_augmentation=False, shift=0.0, rotate=0.0,
                     scale=0.0, intensity=0.0, flip=False, rng=None,
                     verbose=False, cache: Optional[SubjectCache] = None):
    """Host-side batch sampler (``train_network.py:57-118``): random
    subject volumes, centre crop, rescale, per-slice 2D stacking,
    optional affine augmentation.  ``cache`` (a :class:`SubjectCache`)
    skips the gzip re-decode of previously drawn subjects; outputs are
    identical either way (crop/rescale are deterministic per file)."""
    rng = rng or random
    n_file = len(filename_list)
    images, labels = [], []
    n_selected = 0
    while n_selected < batch_size:
        image_name, label_name = filename_list[rng.randrange(n_file)]
        if not (os.path.exists(image_name) and os.path.exists(label_name)):
            continue
        if verbose:
            print(f"  Select {image_name} {label_name}")
        key = cached = None
        if cache is not None:
            key = (image_name, label_name, image_size,
                   os.path.getmtime(image_name), os.path.getmtime(label_name))
            cached = cache.get(key)
        if cached is not None:
            image, label = cached
        else:
            image = np.asarray(nifti.load(image_name).dataobj,
                               dtype=np.float32)
            label = np.asarray(nifti.load(label_name).dataobj)
            if image.shape != label.shape:
                print(f"Error: mismatched size, image.shape = {image.shape}, "
                      f"label.shape = {label.shape}")
                print(f"Skip {image_name}, {label_name}")
                continue
            if image.max() < 1e-6:
                print(f"Error: blank image, image.max = {image.max()}")
                print(f"Skip {image_name} {label_name}")
                continue
            X, Y = image.shape[:2]
            cx, cy = X // 2, Y // 2
            image = crop_image(image, cx, cy, image_size)
            label = crop_image(label, cx, cy, image_size)
            image = rescale_intensity(image, (1.0, 99.0))
            # int32 now = the exact cast applied at stacking below
            label = np.asarray(label, dtype=np.int32)
            if cache is not None:
                cache.put(key, (image, label))
        Z = image.shape[2]
        for z in range(Z):
            images.append(image[:, :, z])
            labels.append(label[:, :, z])
        n_selected += 1

    images = np.asarray(images, dtype=np.float32)[..., None]
    labels = np.asarray(labels, dtype=np.int32)
    if data_augmentation:
        # derive the augmentation RNG from the sampler's rng so a fixed
        # seed reproduces the whole batch stream (augmenters draw from
        # a numpy-style RNG; `random.Random` has no .normal)
        np_rng = (np.random.RandomState(rng.randrange(2 ** 31))
                  if rng is not random else None)
        images, labels = data_augmenter(images, labels, shift=shift,
                                        rotate=rotate, scale=scale,
                                        intensity=intensity, flip=flip,
                                        rng=np_rng)
    return images, labels


def make_slice_pool_sampler(filename_list, batch_slices: int,
                            image_size=192, data_augmentation=False,
                            shift=0.0, rotate=0.0, scale=0.0, intensity=0.0,
                            flip=False, rng=None,
                            cache: Optional[SubjectCache] = None):
    """Fixed-shape batch sampler: subjects are drawn exactly as
    :func:`get_random_batch` draws them (one at a time), their slices
    pooled in FIFO order, and batches of exactly ``batch_slices`` slices
    popped off.  Per-slice semantics (crop, rescale, independent per-slice
    augmentation) are identical to the reference sampler — only the batch
    boundary moves, giving the static shape XLA needs to compile the train
    step once and to stack K batches for a multi-step scan."""
    buf_img: list = []
    buf_lab: list = []

    def next_batch():
        while len(buf_img) < batch_slices:
            images, labels = get_random_batch(
                filename_list, 1, image_size=image_size,
                data_augmentation=data_augmentation, shift=shift,
                rotate=rotate, scale=scale, intensity=intensity, flip=flip,
                rng=rng, cache=cache)
            buf_img.extend(images)
            buf_lab.extend(labels)
        images = np.asarray(buf_img[:batch_slices], dtype=np.float32)
        labels = np.asarray(buf_lab[:batch_slices], dtype=np.int32)
        del buf_img[:batch_slices], buf_lab[:batch_slices]
        return {"image": images, "label": labels}

    return next_batch


def make_device_slice_sampler(filename_list, batch_slices: int, pool,
                              image_size=192, rng=None,
                              cache: Optional["SubjectCache"] = None):
    """Index-batch sampler over a :class:`train.device_pool.DeviceCinePool`
    whose slots hold subject-frame volumes as (Z, S, S) slice stacks.

    Draws subjects with EXACTLY :func:`make_slice_pool_sampler`'s
    semantics — one ``randrange`` per subject, the same existence/shape/
    blank-image gates, slices buffered FIFO in z order — but instead of
    shipping pixels it ensures the subject's volume is device-resident
    and emits {"slot": (B,), "zidx": (B,)} int32 batches for
    :func:`train.device_pool.make_pool_slice_multi_step`.  Steady state
    does no host decode: per-subject Z is memoised by file key.  Every
    emitted slice PINS its slot; the consumer must ``pool.unpin`` each
    batch's slots after taking the pool snapshot it gathers from.
    """
    rng = rng or random
    n_file = len(filename_list)
    meta = {}  # key -> Z (0 = invalid subject)
    buf: list = []

    def load_volume(image_name, label_name, key):
        cached = cache.get(key) if cache is not None else None
        if cached is not None:
            return cached
        image = np.asarray(nifti.load(image_name).dataobj, dtype=np.float32)
        label = np.asarray(nifti.load(label_name).dataobj)
        if image.shape != label.shape:
            print(f"Error: mismatched size, image.shape = {image.shape}, "
                  f"label.shape = {label.shape}")
            print(f"Skip {image_name}, {label_name}")
            return None
        if image.max() < 1e-6:
            print(f"Error: blank image, image.max = {image.max()}")
            print(f"Skip {image_name} {label_name}")
            return None
        X, Y = image.shape[:2]
        cx, cy = X // 2, Y // 2
        image = crop_image(image, cx, cy, image_size)
        label = crop_image(label, cx, cy, image_size)
        image = rescale_intensity(image, (1.0, 99.0))
        label = np.asarray(label, dtype=np.int32)
        if cache is not None:
            cache.put(key, (image, label))
        return image, label

    def draw():
        image_name, label_name = filename_list[rng.randrange(n_file)]
        if not (os.path.exists(image_name) and os.path.exists(label_name)):
            return
        key = (image_name, label_name, image_size,
               os.path.getmtime(image_name), os.path.getmtime(label_name))
        z = meta.get(key)
        first = None
        if z is None:
            # keep the decoded volume for make_host below: without a
            # SubjectCache a meta miss would otherwise decode twice
            # (once for Z, once for the pool upload)
            first = load_volume(image_name, label_name, key)
            meta[key] = z = 0 if first is None else first[0].shape[2]
        if z == 0:
            return

        def make_host(first=first):
            got = first if first is not None else load_volume(
                image_name, label_name, key)
            if got is None:
                raise RuntimeError(f"subject {image_name} failed to "
                                   "re-load for pool upload")
            image, label = got
            # (S, S, Z) -> (Z, S, S); pool stores f16 img / uint8 lab
            return (np.transpose(image, (2, 0, 1)),
                    np.transpose(label, (2, 0, 1)))

        slot = pool.ensure(key, make_host)
        for zi in range(z):
            pool.pin(slot)
            buf.append((slot, zi))

    def next_batch():
        while len(buf) < batch_slices:
            draw()
        take = buf[:batch_slices]
        del buf[:batch_slices]
        return {"slot": np.asarray([s for s, _ in take], np.int32),
                "zidx": np.asarray([zi for _, zi in take], np.int32)}

    return next_batch


def make_fcn_loss(names, cfg: fcn_mod.FCNConfig, device_augment: bool = False,
                  shift=0.0, rotate=10.0, scale=0.2, intensity=0.0,
                  flip=False, compute_dtype=None):
    """Loss closure for the train step: softmax CE + accuracy/Dice aux
    (``train_network.py:204-214``).

    ``device_augment``: apply the random affine augmentation *inside* the
    jitted step (``ops.data_augmenter_jax``) — the TPU-native data path;
    the reference does cv2/scipy warps on the host per iteration
    (``train_network.py:259-264``).

    ``compute_dtype``: activation dtype for the forward/backward pass
    (default f32). ``jnp.bfloat16`` is the TPU mixed-precision mode:
    params, BN statistics, logits and the loss stay f32; convs accumulate
    f32 (``models/layers.py``)."""
    dtype = compute_dtype or jnp.float32

    def loss_fn(params, state, batch, key):
        # accept compact transfer dtypes (f16 image / uint8 label — see
        # SATrainConfig.compact_transfer); the cast is free when the
        # batch already arrives f32/int32
        image = batch["image"].astype(jnp.float32)
        label = batch["label"].astype(jnp.int32)
        if device_augment:
            from ukbb_cardiac_tpu.ops import data_augmenter_jax
            # sample in the compute dtype: bf16 halves the warp's tent-
            # matrix HBM traffic (label path exact; see augment.py)
            image, label = data_augmenter_jax(key, image, label, shift,
                                              rotate, scale, intensity, flip,
                                              sample_dtype=dtype)
        logits, new_state = fcn_mod.apply_fcn(params, state, names, cfg,
                                              image, train=True,
                                              compute_dtype=dtype)
        loss = losses.softmax_cross_entropy(logits, label, cfg.n_class)
        pred = jnp.argmax(logits, axis=-1)
        acc = jnp.mean((pred == label).astype(jnp.float32))
        aux = {"accuracy": acc}
        for k in range(1, cfg.n_class):
            a = pred == k
            b = label == k
            aux[f"dice_{k}"] = (2 * jnp.sum(a & b) /
                                jnp.maximum(jnp.sum(a) + jnp.sum(b), 1e-7))
        return loss, (aux, new_state)

    return loss_fn


def train(cfg: SATrainConfig, max_iterations: Optional[int] = None,
          progress_every: int = 100, resume_from: Optional[str] = None):
    """Run the training loop. Returns (params, state, names, model_cfg).

    ``resume_from``: path to a bundle written by this trainer — restores
    params, BN state, optimizer state and the iteration counter
    (checkpoint/resume, SURVEY.md §5; the reference restarts from TF
    Saver checkpoints)."""
    data_list = scan_dataset(cfg.dataset_dir, cfg.seq_name)
    if not data_list["train"]:
        raise FileNotFoundError(f"no training pairs under {cfg.dataset_dir}/train")

    n_filter = tuple(cfg.num_filter * (2 ** i) for i in range(cfg.num_level))
    model_cfg = fcn_mod.FCNConfig(n_class=cfg.n_class, n_level=cfg.num_level,
                                  n_filter=n_filter, n_block=(2, 2, 3, 3, 3),
                                  same_dim=32, fc=64)
    key = jax.random.PRNGKey(cfg.seed)
    params, state, names = fcn_mod.init_fcn(key, model_cfg)
    optimizer = optax.adam(cfg.learning_rate)

    start_iteration = 0
    if resume_from:
        # the checkpoint is self-describing: adopt ITS config — flags
        # that disagree with the stored architecture would otherwise
        # load mismatched params under a wrong cfg
        _, model_cfg, names, params, state, extra = store.load_model(
            resume_from)
        start_iteration = int(extra.get("iteration", 0))
        print(f"Resumed from {resume_from} at iteration {start_iteration}.")
    opt_state = optimizer.init(params)
    if resume_from:
        restored = store.load_opt_state(resume_from, opt_state)
        if restored is not None:
            opt_state = restored

    loss_fn = make_fcn_loss(names, model_cfg,
                            device_augment=cfg.device_augment,
                            compute_dtype=jnp.bfloat16 if cfg.bf16 else None)
    K = max(1, int(cfg.steps_per_dispatch))
    if K > 1 and cfg.batch_slices <= 0:
        raise ValueError("steps_per_dispatch > 1 requires batch_slices "
                         "(a static batch shape to stack K batches)")
    if cfg.device_slices:
        if cfg.batch_slices <= 0:
            raise ValueError("device_slices requires batch_slices (the "
                             "pool gather needs a static batch shape)")
        if not cfg.device_augment:
            raise ValueError("device_slices requires device_augment: the "
                             "pool holds un-augmented slices, so the "
                             "affine augmentation must run in-step")
    if cfg.mesh_devices > 1 and cfg.batch_slices > 0 \
            and cfg.batch_slices % cfg.mesh_devices:
        # validated regardless of K: a K=1 mesh run would otherwise fail
        # later with an opaque GSPMD partitioning error.  batch_slices=0
        # (variable per-subject batches) is allowed but each batch's
        # slice count must then divide the mesh at runtime.
        raise ValueError("batch_slices must divide evenly over "
                         f"mesh_devices ({cfg.batch_slices} % "
                         f"{cfg.mesh_devices} != 0)")
    multi_step = step = None
    pool_sharding = None
    if cfg.device_slices:
        if cfg.mesh_devices > 1:
            # mesh DP: pool replicated over the chips, index batches
            # sharded on B — per-shard gathers are local, the gradient
            # all-reduce rides ICI (device_pool.py)
            from jax.sharding import NamedSharding, PartitionSpec
            from ukbb_cardiac_tpu.parallel.mesh import make_mesh
            from ukbb_cardiac_tpu.train.device_pool import \
                make_pool_slice_multi_dp_step
            mesh = make_mesh(cfg.mesh_devices)
            pool_sharding = NamedSharding(mesh, PartitionSpec())
            multi_step = make_pool_slice_multi_dp_step(loss_fn, optimizer,
                                                       mesh)
        else:
            from ukbb_cardiac_tpu.train.device_pool import \
                make_pool_slice_multi_step
            multi_step = make_pool_slice_multi_step(loss_fn, optimizer)
    elif cfg.mesh_devices > 1:
        from ukbb_cardiac_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(cfg.mesh_devices)
        step = steps_lib.make_dp_train_step(loss_fn, optimizer, mesh)
        if K > 1:
            multi_step = steps_lib.make_multi_dp_train_step(
                loss_fn, optimizer, mesh)
    else:
        step = steps_lib.make_train_step(loss_fn, optimizer)
        if K > 1:
            multi_step = steps_lib.make_multi_train_step(loss_fn, optimizer)

    model_dir = os.path.join(cfg.checkpoint_dir or ".", cfg.model_name)
    os.makedirs(model_dir, exist_ok=True)
    log_path = os.path.join(model_dir, "train_log.jsonl")
    log_f = open(log_path, "a")

    # jitted validation forward: the eager apply_fcn costs one host
    # round-trip PER OP, which on a tunneled TPU is ~30 s per validation
    # (measured) — jit makes it one dispatch (re-traced per distinct
    # validation batch shape; subjects share Z in practice)
    @jax.jit
    def eval_forward(params, state, images):
        logits, _ = fcn_mod.apply_fcn(params, state, names, model_cfg,
                                      images, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    rng = random.Random(cfg.seed + start_iteration)
    # the training rng is consumed on the prefetch worker thread; give
    # validation its own stream so queue timing cannot change what a
    # fixed seed samples
    val_rng = random.Random(cfg.seed + 7_777_777 + start_iteration)
    total = max_iterations or cfg.train_iteration
    print("Start training...")
    start_time = time.time()

    from ukbb_cardiac_tpu.train.prefetch import BatchPrefetcher

    cache = (SubjectCache(int(cfg.cache_gb * (1 << 30)))
             if cfg.cache_gb > 0 else None)
    pool = None
    if cfg.device_slices:
        from ukbb_cardiac_tpu.train.device_pool import DeviceCinePool
        z_max = z_min = 0
        for image_name, _label in data_list["train"]:
            try:
                shape = nifti.read_shape(image_name)
            except Exception:
                continue
            if len(shape) >= 3 and shape[2] > 0:
                z_max = max(z_max, int(shape[2]))
                z_min = (int(shape[2]) if z_min == 0
                         else min(z_min, int(shape[2])))
        if z_max <= 0:
            raise ValueError("device_slices: no readable 3D training volume")
        s = cfg.image_size
        bytes_per_slot = z_max * s * s * 3  # f16 image + uint8 label
        budget_slots = int(cfg.pool_gb * (1 << 30) / bytes_per_slot)
        # worst-case pinned at once: the prefetch queue (depth K+1), the
        # batch in flight and the chunk under construction, each batch
        # spanning ceil(B/z_min)+1 distinct subjects (slices of a drawn
        # subject are consecutive)
        per_batch = -(-cfg.batch_slices // max(z_min, 1)) + 1
        min_slots = min(len(data_list["train"]), (2 * K + 2) * per_batch + 4)
        n_slots = min(len(data_list["train"]), max(budget_slots, 1))
        if n_slots < min_slots:
            raise ValueError(
                f"device_slices: pool_gb={cfg.pool_gb} holds {n_slots} "
                f"volumes ({bytes_per_slot / 2 ** 20:.1f} MiB each) but "
                f"one dispatch chunk may pin {min_slots}; raise pool_gb "
                "or lower batch_slices/steps_per_dispatch")
        pool = DeviceCinePool(n_slots, z_max, s, s,
                              sharding=pool_sharding)
        print(f"Device slice pool: {n_slots} slots x Z{z_max} @ {s}x{s} "
              f"({pool.nbytes / 2 ** 30:.2f} GiB HBM)")
        sample = make_device_slice_sampler(
            data_list["train"], cfg.batch_slices, pool,
            image_size=cfg.image_size, rng=rng, cache=cache)
    elif cfg.batch_slices > 0:
        sample = make_slice_pool_sampler(
            data_list["train"], cfg.batch_slices, image_size=cfg.image_size,
            data_augmentation=not cfg.device_augment, shift=0, rotate=10,
            scale=0.2, intensity=0, flip=False, rng=rng, cache=cache)
    else:
        def sample():
            images, labels = get_random_batch(
                data_list["train"], cfg.train_batch_size,
                image_size=cfg.image_size,
                data_augmentation=not cfg.device_augment, shift=0, rotate=10,
                scale=0.2, intensity=0, flip=False, rng=rng, cache=cache)
            return {"image": images, "label": labels}

    if cfg.compact_transfer and not cfg.device_slices:
        # cast on the prefetch thread, not the step loop (index batches
        # are already tiny — nothing to compact)
        def make_batch():
            b = sample()
            return {"image": b["image"].astype(np.float16),
                    "label": b["label"].astype(np.uint8)}
    else:
        make_batch = sample

    prefetcher = BatchPrefetcher(make_batch, depth=2 if K == 1 else K + 1)

    from ukbb_cardiac_tpu.train.prefetch import (make_chunk_builder,
                                                 make_pool_chunk_builder)
    if cfg.device_slices:
        # index chunks are a few hundred bytes; snapshot/unpin ordering
        # lives in the shared builder (train/prefetch.py)
        build_input = make_pool_chunk_builder(
            prefetcher, pool, K, total,
            (cfg.validation_every, cfg.checkpoint_every, progress_every),
            stage_local=cfg.mesh_devices <= 1)
    else:
        # single-device batches are device_put one dispatch AHEAD, so the
        # host->device transfer of chunk N+1 rides under the device
        # compute of chunk N (transfers overlap compute; measured on this
        # host's tunnel: both = max, not sum).  Mesh batches stay
        # host-side — the sharded jit places them per its in_shardings.
        build_input = make_chunk_builder(
            prefetcher, K, total,
            (cfg.validation_every, cfg.checkpoint_every, progress_every),
            stage=jax.device_put if cfg.mesh_devices <= 1 else None)

    iteration = start_iteration
    # a resume at/past total must not sample/transfer a never-used batch
    pending = build_input(iteration) if iteration < total else None
    while iteration < total:
        t0 = time.time()
        k_now, batches, keys = pending
        if cfg.device_slices:
            pool_img, pool_lab, idx = batches
            params, state, opt_state, losses, aux = multi_step(
                params, state, opt_state, pool_img, pool_lab, idx, keys)
            loss = losses[-1]
        elif k_now > 1:
            params, state, opt_state, losses, aux = multi_step(
                params, state, opt_state, batches, keys)
            loss = losses[-1]
        else:
            params, state, opt_state, loss, aux = step(
                params, state, opt_state, batches, keys)
        iteration += k_now
        if iteration < total:
            # async H2D of the next chunk under the dispatch above
            pending = build_input(iteration)

        if iteration % cfg.validation_every == 0 and data_list["validation"]:
            v_images, v_labels = get_random_batch(
                data_list["validation"], cfg.validation_batch_size,
                image_size=cfg.image_size, rng=val_rng, cache=cache)
            v_pred = np.asarray(eval_forward(params, state,
                                             jnp.asarray(v_images)))
            rec = {"iteration": iteration, "loss": float(loss),
                   "accuracy": float(aux["accuracy"]),
                   "val_accuracy": float(np.mean(v_pred == v_labels)),
                   # per-iteration, whatever K the dispatch ran
                   "seconds": (time.time() - t0) / k_now}
            for k in range(1, cfg.n_class):
                a, b = v_pred == k, v_labels == k
                rec[f"val_dice_{k}"] = float(
                    2 * np.sum(a & b) / max(np.sum(a) + np.sum(b), 1e-7))
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()

        if iteration % progress_every == 0:
            print(f"Iteration {iteration}/{total}: loss = {float(loss):.4f}, "
                  f"{(time.time() - t0) / k_now:.3f}s/iter")

        if iteration % cfg.checkpoint_every == 0 or iteration == total:
            ckpt_path = os.path.join(model_dir, f"model-{iteration}.npz")
            store.save_model(ckpt_path, "fcn", model_cfg, names,
                             jax.device_get(params), jax.device_get(state),
                             extra_meta={"iteration": iteration,
                                         "seq_name": cfg.seq_name},
                             opt_state=jax.device_get(opt_state))

    prefetcher.close()
    log_f.close()
    print(f"Training took {time.time() - start_time:.3f}s.")
    return params, state, names, model_cfg
