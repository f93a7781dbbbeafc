"""Aortic cine segmentation deployment — twin of
``common/deploy_network_ao.py`` with a TPU-native full-sequence mode.

Reference behaviour (file:line):
- z-score normalisation by default, else percentile rescale (:92-96)
- pad to a fixed 256 x 256 grid (:104-108)
- 'UNet' mode: per-frame 2D segmentation (:111-128)
- 'UNet-LSTM' / 'Temporal-UNet' mode: sliding **circular** window of
  ``2*weight_R - 1`` frames, stride ``time_step``, accumulating
  triangular-weighted probabilities then normalising (:129-183)
- ``pred = argmax(prob)``, saved as ``seg_ao.nii.gz`` (:189-196)

TPU-native modes:
- ``window='full'`` (default): the ConvLSTM is a ``lax.scan`` so the whole
  T-frame cine runs as ONE device program — no window approximation, no
  T x window/stride recompute factor.  (The reference *must* window
  because its LSTM graph is unrolled at fixed length, see its comment at
  :166-169.)
- ``window='compat'``: reproduces the sliding-window blending exactly for
  parity testing against the released ``UNet-LSTM_ao`` checkpoint.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ukbb_cardiac_tpu.ckpt import store
from ukbb_cardiac_tpu.infer.engine import InferenceEngine, SegmentationModel
from ukbb_cardiac_tpu.io import nifti
from ukbb_cardiac_tpu.models import convlstm, unet as unet_mod
from ukbb_cardiac_tpu.ops import normalise_intensity, rescale_intensity

AO_SIZE = 256  # fixed aortic grid (deploy_network_ao.py:105)


def window_weights(weight_R: int, weight_r: float) -> np.ndarray:
    """Triangular window weights w_t = (1 - d/R)^r over a 2R-1 window
    (``deploy_network_ao.py:132-144``)."""
    time_window = weight_R * 2 - 1
    rad = (time_window - 1) // 2
    w = []
    for t in range(time_window):
        d = abs(t - rad)
        w.append(pow(1.0 - float(d) / weight_R, weight_r) if d <= weight_R else 0.0)
    return np.asarray(w, dtype=np.float32)


class AorticEngine:
    """Jit executor for aortic models (UNet / UNet-LSTM / Temporal-UNet)."""

    def __init__(self, kind: str, cfg, names, params, state,
                 bidirectional: bool = True, compute_dtype=jnp.float32):
        self.kind = kind
        self.cfg = cfg
        self.names = names
        self.bidirectional = bidirectional
        self.compute_dtype = compute_dtype
        self._params = jax.device_put(params)
        self._state = jax.device_put(state)
        self._compiled = {}
        from ukbb_cardiac_tpu.infer import transfer
        self._bw = transfer.BandwidthTracker()
        self._stats = transfer.TransferStats()

    # -- jitted programs ---------------------------------------------------
    def _lstm_full(self, shape):
        key = ("lstm_full", shape)
        if key not in self._compiled:
            cfg, names, dtype, bidir = self.cfg, self.names, self.compute_dtype, self.bidirectional

            @jax.jit
            def run(params, state, images):
                # images: (N, T, X, Y, 1) — N = Z slices, full cine scan.
                N, T, X, Y, C = images.shape
                flat = images.reshape(N * T, X, Y, C).astype(dtype)
                _, feats, _ = unet_mod.apply_unet(params, state, names, cfg, flat,
                                                  train=False, compute_dtype=dtype)
                feats = feats.reshape(N, T, X, Y, -1)
                if bidir:
                    logits = convlstm.apply_biconv_lstm(params, feats)
                else:
                    logits = convlstm.apply_conv_lstm(params, feats)
                return jax.nn.softmax(logits, axis=-1)

            self._compiled[key] = run
        return self._compiled[key]

    def _temporal_unet(self, shape):
        key = ("tunet", shape)
        if key not in self._compiled:
            cfg, names, dtype = self.cfg, self.names, self.compute_dtype

            @jax.jit
            def run(params, state, images):
                logits, _, _ = unet_mod.apply_temporal_unet(
                    params, state, names, cfg, images, train=False, compute_dtype=dtype)
                return jax.nn.softmax(logits, axis=-1)

            self._compiled[key] = run
        return self._compiled[key]

    # -- public ------------------------------------------------------------
    def _subject_fn(self, X: int, Y: int, z_score: bool, pad_to: int):
        """The per-subject device pipeline shared by the single-cine and
        fleet paths: raw (X, Y, Z, T) → uint8 pred (X, Y, Z, T).
        Device-side z-score/rescale (``deploy_network_ao.py:92-96``),
        centred pad to ``pad_to`` (:104-108), UNet+LSTM full scan,
        argmax, crop."""
        if self.kind == "unet":
            raise ValueError("the full-scan path is for the LSTM/temporal "
                             "models; use prob_sequence for the UNet model")
        from ukbb_cardiac_tpu.ops import (normalise_intensity_jax,
                                          rescale_intensity_jax)
        from ukbb_cardiac_tpu.ops.crop import pad_to_size

        if X > pad_to or Y > pad_to:
            raise ValueError(
                f"aortic cine {X}x{Y} exceeds the {pad_to}x{pad_to} grid "
                f"(deploy_network_ao.py:104-108 pads to a fixed size); "
                f"pass a larger pad_to")
        x_pre, x_post, y_pre, y_post = pad_to_size(X, Y, pad_to)
        full_prob = (self._temporal_unet(None)
                     if self.kind == "temporal_unet"
                     else self._lstm_full(None))

        def one_subject(params, state, raw):
            # raw dtype into the intensity ops (int16 → 16-round
            # percentile fast path); both return f32
            if z_score:
                x = normalise_intensity_jax(raw, 10.0)
            else:
                x = rescale_intensity_jax(raw, (1.0, 99.0))
            x = jnp.pad(x, ((x_pre, x_post), (y_pre, y_post),
                            (0, 0), (0, 0)))
            seq = jnp.transpose(x, (2, 3, 0, 1))[..., None]
            prob = full_prob(params, state, seq)
            pred = jnp.argmax(prob, axis=-1).astype(jnp.uint8)
            pred = jnp.transpose(pred, (2, 3, 0, 1))
            return pred[x_pre:x_pre + X, y_pre:y_pre + Y]

        return one_subject

    def segment_cine_dispatch(self, image: np.ndarray, z_score: bool = True,
                              pad_to: int = AO_SIZE):
        """Asynchronously dispatch a fused full-scan deploy for a RAW cine
        (X, Y, Z, T) — the :meth:`_subject_fn` pipeline plus bit-packed
        label readback.  Returns a
        :class:`~ukbb_cardiac_tpu.infer.engine.PendingSegmentation`; its
        ``result()`` blocks on the packed-label readback."""
        from ukbb_cardiac_tpu.infer import transfer

        X, Y, Z, T = image.shape
        n_cls = self.cfg.n_class
        bits = 2 if n_cls <= 4 else (4 if n_cls <= 16 else 8)
        raw = np.ascontiguousarray(image)
        # adaptive lossless up-leg packing (see infer/transfer.py):
        # bit-identical reconstruction on device, 25-50% fewer bytes
        # through a degraded tunnel
        plan = transfer.plan_pack(raw, self._bw)
        key = ("seg_cine", image.shape, image.dtype.str, z_score, pad_to,
               plan)
        if key not in self._compiled:
            one_subject = self._subject_fn(X, Y, z_score, pad_to)

            @jax.jit
            def run(params, state, *arrs):
                raw_dev = (transfer.unpack_jax(arrs[0], plan)
                           if plan is not None else arrs[0])
                pred = one_subject(params, state, raw_dev)
                # bit-pack labels for the slow d2h direction; width scales
                # with n_class (2 bits for the reference's 3-class aortic
                # model, wider for bigger label sets)
                flat = pred.reshape(-1)
                per_byte = 8 // bits
                pad_n = (-flat.shape[0]) % per_byte
                flat = jnp.pad(flat, (0, pad_n)).reshape(-1, per_byte)
                shifts = (jnp.arange(per_byte, dtype=jnp.uint32) * bits)
                return jnp.sum(flat.astype(jnp.uint32) << shifts,
                               axis=-1).astype(jnp.uint8)

            self._compiled[key] = run
        from ukbb_cardiac_tpu.infer.engine import PendingSegmentation

        pieces = transfer.pack_and_dispatch(raw, plan, self._bw,
                                            self._stats)
        packed = self._compiled[key](self._params, self._state, *pieces)
        return PendingSegmentation(packed, (X, Y, Z, T), bits=bits,
                                   stats=self._stats)

    def segment_subjects_sharded(self, images: np.ndarray, mesh,
                                 z_score: bool = True,
                                 pad_to: Optional[int] = None,
                                 axis: str = "data") -> np.ndarray:
        """Fleet aortic deploy: a stack of S same-shape raw cines
        (S, X, Y, Z, T) with SUBJECTS sharded over the mesh — each chip
        runs the full-sequence ConvLSTM scan for its shard (the aortic
        twin of ``InferenceEngine.segment_subjects_sharded``; the
        registration/training mesh paths are covered elsewhere).
        Returns (S, X, Y, Z, T) uint8 labels.  S need not divide the mesh
        axis (or even reach it) — the stack pads up by cycling subjects
        and the padding is sliced off the result."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ukbb_cardiac_tpu.infer.engine import pad_stack_to_multiple

        images, S_in = pad_stack_to_multiple(np.asarray(images),
                                             mesh.shape[axis])
        S, X, Y, Z, T = images.shape
        pad_to = pad_to or AO_SIZE
        key = ("fleet", images.shape, images.dtype.str, z_score, pad_to,
               mesh, axis)
        if key not in self._compiled:
            one_subject = self._subject_fn(X, Y, z_score, pad_to)
            repl = NamedSharding(mesh, P())
            shard = NamedSharding(mesh, P(axis))
            run = jax.jit(
                jax.vmap(one_subject, in_axes=(None, None, 0)),
                in_shardings=(repl, repl, shard),
                out_shardings=shard)
            self._compiled[key] = run
        out = np.asarray(self._compiled[key](self._params, self._state,
                                             jnp.asarray(images)))
        return out[:S_in]

    def segment_cine(self, image: np.ndarray, z_score: bool = True,
                     pad_to: int = AO_SIZE) -> np.ndarray:
        """Fused full-scan deploy for a RAW cine (X, Y, Z, T) — one
        native-dtype transfer in, uint8 labels out.  Blocking wrapper
        around :meth:`segment_cine_dispatch`."""
        return self.segment_cine_dispatch(image, z_score, pad_to).result()

    def pred_sequence(self, image: np.ndarray, weight_R: int = 5,
                      weight_r: float = 0.0, time_step: int = 1,
                      window: str = "full") -> np.ndarray:
        """Argmax labels for a padded cine (X, Y, Z, T) → (X, Y, Z, T) uint8.

        In full-scan mode the argmax happens ON DEVICE and only uint8
        labels come back — the probability volume of a 100-frame 256²
        cine is ~78 MB, a multi-second readback on this host's tunnel,
        while the labels are 6.5 MB.
        """
        if self.kind != "unet" and window == "full":
            key = ("full_pred", self.kind, image.shape)
            if key not in self._compiled:
                full_prob = (self._temporal_unet(None)
                             if self.kind == "temporal_unet"
                             else self._lstm_full(None))

                @jax.jit
                def run(params, state, seq):
                    prob = full_prob(params, state, seq)
                    return jnp.argmax(prob, axis=-1).astype(jnp.uint8)

                self._compiled[key] = run
            seq = np.transpose(image, (2, 3, 0, 1)).astype(np.float32)[..., None]
            pred = np.asarray(self._compiled[key](self._params, self._state,
                                                  jnp.asarray(seq)))
            return np.transpose(pred, (2, 3, 0, 1))
        prob = self.prob_sequence(image, window, weight_R, weight_r, time_step)
        return np.argmax(prob, axis=-1).astype(np.uint8)

    def prob_sequence(self, image: np.ndarray, window: str = "full",
                      weight_R: int = 5, weight_r: float = 0.0,
                      time_step: int = 1) -> np.ndarray:
        """Probability maps for a padded cine (X, Y, Z, T) → (X, Y, Z, T, C).

        ``window='full'``: one scan over all T frames (UNet-LSTM) or one 3D
        pass (Temporal-UNet).  ``window='compat'``: the reference's sliding
        circular window with triangular blending.
        """
        X, Y, Z, T = image.shape
        if self.kind == "unet":
            if not hasattr(self, "_unet_engine"):
                self._unet_engine = InferenceEngine(SegmentationModel.from_unet(
                    self._params, self._state, self.names, self.cfg,
                    self.compute_dtype))
            _, prob = self._unet_engine.segment_sequence(
                image.astype(np.float32), want_prob=True)
            return prob

        # (X, Y, Z, T) -> (Z, T, X, Y, 1)
        seq = np.transpose(image, (2, 3, 0, 1)).astype(np.float32)[..., None]
        if window == "full":
            if self.kind == "temporal_unet":
                prob = self._temporal_unet(None)(self._params, self._state,
                                                 jnp.asarray(seq))
            else:
                prob = self._lstm_full(None)(self._params, self._state,
                                              jnp.asarray(seq))
            prob = np.asarray(prob)  # (Z, T, X, Y, C)
            return np.transpose(prob, (2, 3, 0, 1, 4))

        # compat: sliding circular windows (deploy_network_ao.py:129-183)
        time_window = weight_R * 2 - 1
        rad = (time_window - 1) // 2
        w = window_weights(weight_R, weight_r).reshape(1, 1, 1, time_window, 1)
        n_class = self.cfg.n_class
        prob = np.zeros((X, Y, Z, T, n_class), dtype=np.float32)
        weight = np.zeros((1, 1, 1, T, 1), dtype=np.float32)
        for t in range(0, T, time_step):
            idx = [(i + T) % T for i in range(t - rad, t + rad + 1)]
            win = seq[:, idx]  # (Z, tw, X, Y, 1)
            if self.kind == "temporal_unet":
                p = self._temporal_unet(None)(self._params, self._state,
                                              jnp.asarray(win))
            else:
                p = self._lstm_full(None)(self._params, self._state,
                                          jnp.asarray(win))
            p = np.transpose(np.asarray(p), (2, 3, 0, 1, 4))  # (X, Y, Z, tw, C)
            # np.add.at: when T < time_window the circular idx contains
            # DUPLICATE frames, and buffered fancy-index += keeps only the
            # last duplicate's contribution
            np.add.at(prob, (slice(None), slice(None), slice(None), idx),
                      p * w)
            np.add.at(weight, (slice(None), slice(None), slice(None), idx),
                      np.broadcast_to(w, (1, 1, 1, len(idx), 1)))
        return prob / weight


def load_aortic_engine(model_path: str, compute_dtype=jnp.float32) -> AorticEngine:
    kind, cfg, names, params, state, extra = store.load_model(model_path)
    return AorticEngine(kind, cfg, names, params, state,
                        bidirectional=extra.get("bidirectional", True),
                        compute_dtype=compute_dtype)


def _start_subject_ao(engine: AorticEngine, data_dir: str, seq_name: str,
                      z_score: bool) -> Optional[dict]:
    """Read one subject's aortic cine and dispatch the fused full-scan
    segmentation; None if skipped (same rules as ``deploy_network_ao.py``)."""
    seg_name = os.path.join(data_dir, f"seg_{seq_name}.nii.gz")
    if os.path.exists(seg_name):
        return None
    image_name = os.path.join(data_dir, f"{seq_name}.nii.gz")
    if not os.path.exists(image_name):
        print(f"  Directory {data_dir} does not contain an image with "
              f"file name {os.path.basename(image_name)}. Skip.")
        return None
    print(f"  Reading {image_name} ...")
    nim = nifti.load(image_name)
    image = np.asarray(nim.dataobj)
    if image.ndim == 3:  # single-frame volume, like deploy.py:79-80
        image = image[..., None]
    print("  Segmenting full sequence ...")
    start = time.time()
    pending = engine.segment_cine_dispatch(image, z_score=z_score)
    return {"data_dir": data_dir, "nim": nim, "pending": pending,
            "start": start}


def _finish_subject_ao(ctx: dict, seq_name: str, save_seg: bool) -> float:
    """Block on an in-flight aortic subject and write its segmentation."""
    nim = ctx["nim"]
    pred = ctx["pending"].result().astype(np.int32)
    seg_time = time.time() - ctx["start"]
    if save_seg:
        print("  Saving segmentation ...")
        nim2 = nifti.Nifti1Image(pred.astype(np.float64), nim.affine)
        nim2.header["pixdim"] = nim.header["pixdim"]
        nifti.save(nim2, os.path.join(ctx["data_dir"],
                                      f"seg_{seq_name}.nii.gz"))
    print(f"  Segmentation time = {seg_time:.3f}s")
    return seg_time


def deploy_subject_ao(engine: AorticEngine, data_dir: str, seq_name: str = "ao",
                      z_score: bool = True, save_seg: bool = True,
                      window: str = "full", weight_R: int = 5,
                      weight_r: float = 0.0, time_step: int = 1) -> Optional[float]:
    """Segment one subject's aortic cine. Returns seconds or None if skipped."""
    if engine.kind != "unet" and window == "full":
        # fused device path: native-dtype transfer, then normalise / pad /
        # UNet / LSTM scan / argmax / crop all in one device program
        ctx = _start_subject_ao(engine, data_dir, seq_name, z_score)
        if ctx is None:
            return None
        return _finish_subject_ao(ctx, seq_name, save_seg)

    seg_name = os.path.join(data_dir, f"seg_{seq_name}.nii.gz")
    if os.path.exists(seg_name):
        return None
    image_name = os.path.join(data_dir, f"{seq_name}.nii.gz")
    if not os.path.exists(image_name):
        print(f"  Directory {data_dir} does not contain an image with "
              f"file name {os.path.basename(image_name)}. Skip.")
        return None

    print(f"  Reading {image_name} ...")
    nim = nifti.load(image_name)
    image = np.asarray(nim.dataobj)
    if image.ndim == 3:
        image = image[..., None]
    X, Y, Z, T = image.shape

    print("  Segmenting full sequence ...")
    start = time.time()
    image = image.astype(np.float32)
    if z_score:
        image = normalise_intensity(image, 10.0)
    else:
        image = rescale_intensity(image, (1.0, 99.0))
    from ukbb_cardiac_tpu.ops.crop import pad_to_size
    x_pre, x_post, y_pre, y_post = pad_to_size(X, Y, AO_SIZE)
    padded = np.pad(image, ((x_pre, x_post), (y_pre, y_post),
                            (0, 0), (0, 0)))
    pred = engine.pred_sequence(padded, weight_R, weight_r, time_step,
                                window)
    pred = pred[x_pre:x_pre + X, y_pre:y_pre + Y].astype(np.int32)
    seg_time = time.time() - start

    if save_seg:
        print("  Saving segmentation ...")
        nim2 = nifti.Nifti1Image(pred.astype(np.float64), nim.affine)
        nim2.header["pixdim"] = nim.header["pixdim"]
        nifti.save(nim2, seg_name)
    print(f"  Segmentation time = {seg_time:.3f}s")
    return seg_time


def deploy_subject_ed_es_ao(engine: AorticEngine, data_dir: str,
                            seq_name: str = "ao", z_score: bool = True,
                            save_seg: bool = True) -> bool:
    """ED/ES-only aortic segmentation (UNet mode,
    ``deploy_network_ao.py:206-268``); the LSTM needs full sequences and
    the reference refuses frame-wise mode for it (:202-205)."""
    if engine.kind != "unet":
        raise ValueError("UNet-LSTM does not support frame-wise segmentation. "
                         "Please use the full-sequence mode.")
    names = {fr: os.path.join(data_dir, f"{seq_name}_{fr}.nii.gz")
             for fr in ("ED", "ES")}
    if not all(os.path.exists(p) for p in names.values()):
        print(f"  Directory {data_dir} does not contain an image with file "
              f"name {os.path.basename(names['ED'])} or "
              f"{os.path.basename(names['ES'])}. Skip.")
        return False
    from ukbb_cardiac_tpu.infer.engine import InferenceEngine, SegmentationModel

    if not hasattr(engine, "_unet_engine"):
        engine._unet_engine = InferenceEngine(SegmentationModel.from_unet(
            engine._params, engine._state, engine.names, engine.cfg,
            engine.compute_dtype))
    for fr in ("ED", "ES"):
        nim = nifti.load(names[fr])
        image = np.asanyarray(nim.dataobj).astype(np.float32)
        if image.ndim == 2:
            image = image[..., None]
        print(f"  Segmenting {fr} frame ...")
        start = time.time()
        if z_score:
            image = normalise_intensity(image, 10.0)
        else:
            image = rescale_intensity(image, (1.0, 99.0))
        pred = engine._unet_engine.segment_volume(image).astype(np.float64)
        print(f"  Segmentation time = {time.time() - start:.3f}s")
        if save_seg:
            nim2 = nifti.Nifti1Image(pred, nim.affine)
            nim2.header["pixdim"] = nim.header["pixdim"]
            nifti.save(nim2,
                       os.path.join(data_dir, f"seg_{seq_name}_{fr}.nii.gz"))
    return True


def deploy_dataset_ao(model_path: str, data_dir: str, seq_name: str = "ao",
                      z_score: bool = True, save_seg: bool = True,
                      window: str = "full", weight_R: int = 5,
                      weight_r: float = 0.0, time_step: int = 1,
                      process_seq: bool = True,
                      compute_dtype=jnp.float32) -> None:
    """Walk subject dirs and segment each aortic cine
    (``deploy_network_ao.py`` main loop)."""
    engine = load_aortic_engine(model_path, compute_dtype)
    print("Start deployment on the data set ...")
    start_time = time.time()
    processed = []
    # the fused full-scan path pipelines one subject deep, like
    # infer/deploy.py: read + dispatch of subject N overlaps the
    # readback + save of subject N-1
    pipelined = process_seq and engine.kind != "unet" and window == "full"
    in_flight = None  # (data, ctx)
    for data in sorted(os.listdir(data_dir)):
        subject_dir = os.path.join(data_dir, data)
        if not os.path.isdir(subject_dir):
            continue
        print(data)
        if pipelined:
            ctx = _start_subject_ao(engine, subject_dir, seq_name, z_score)
            if in_flight is not None:
                _finish_subject_ao(in_flight[1], seq_name, save_seg)
                processed.append(in_flight[0])
            in_flight = (data, ctx) if ctx is not None else None
        elif process_seq:
            t = deploy_subject_ao(engine, subject_dir, seq_name, z_score,
                                  save_seg, window, weight_R, weight_r,
                                  time_step)
            if t is not None:
                processed.append(data)
        else:
            if deploy_subject_ed_es_ao(engine, subject_dir, seq_name, z_score,
                                       save_seg):
                processed.append(data)
    if in_flight is not None:
        _finish_subject_ao(in_flight[1], seq_name, save_seg)
        processed.append(in_flight[0])
    total = time.time() - start_time
    if processed:
        print("It took {0:.3f}s for processing {1:d} subjects "
              "({2:.3f}s per subjects).".format(total, len(processed),
                                                total / len(processed)))
