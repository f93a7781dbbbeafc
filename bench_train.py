"""Benchmark: SA FCN training throughput on one TPU chip.

The reference trains the FCN at batch 2 for 50k iterations on a single
GPU (``train_network.py:33-44``) with synchronous host-side batch prep;
it publishes no throughput figure, so ``vs_baseline`` is null here —
this bench exists to track OUR training speed across rounds.

Measures the steady-state jitted train step (forward + backward + Adam +
BN updates, with on-device affine augmentation) at the reference batch
size and at a TPU-saturating batch.  Prints ONE JSON line per the bench
contract.
"""

import json
import os
import time

import numpy as np

REPEATS = 3
# bf16 dense peak per chip and HBM bandwidth, by device kind (public
# figures; None -> report achieved TFLOP/s with mfu null)
PEAKS = {
    "TPU v4": (275e12, 1228e9),
    "TPU v5 lite": (197e12, 819e9),   # v5e
    "TPU v5e": (197e12, 819e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v6 lite": (918e12, 1640e9),  # v6e
    "TPU v6e": (918e12, 1640e9),
}


def fcn_train_flops_and_bytes(cfg, n, X, Y, compute_bytes=2):
    """Analytic per-step cost model for the FCN training step.

    FLOPs: 2*MACs for every conv in the forward graph
    (``network.py:170-230``); backward ≈ 2× forward (grad-input +
    grad-weight convs), so training ≈ 3× forward.  BN/ReLU/softmax are
    bandwidth, not FLOPs.  Bytes: activations written+read once each way
    in ``compute_bytes`` precision plus parameters read ~3× in f32 — a
    lower-bound HBM model assuming perfect fusion (no rematerialisation).
    """
    macs = 0
    act_elems = 0
    param_elems = 0

    def conv(cin, cout, k, x, y):
        nonlocal macs, act_elems, param_elems
        macs += n * x * y * k * k * cin * cout
        act_elems += n * x * y * cout
        param_elems += k * k * cin * cout

    x, y = X, Y
    cin = 1
    for l in range(cfg.n_level):
        if l > 0:
            x, y = x // 2, y // 2
        for _ in range(cfg.n_block[l]):
            conv(cin, cfg.n_filter[l], 3, x, y)
            cin = cfg.n_filter[l]
    # same-dim 1x1 projections + upsample to full res (as interpolation
    # matmuls, cost ~ 2 separable passes of factor-sized stencils)
    x, y = X, Y
    for l in range(cfg.n_level):
        xl, yl = X // (2 ** l), Y // (2 ** l)
        conv(cfg.n_filter[l], cfg.same_dim, 1, xl, yl)
        if l > 0:
            f = 2 ** l
            # separable tent interpolation: rows then cols
            macs += n * cfg.same_dim * (X * yl * (2 * f - 1)
                                        + X * Y * (2 * f - 1))
            act_elems += n * X * Y * cfg.same_dim
    conv(cfg.same_dim * cfg.n_level, cfg.fc, 1, X, Y)
    conv(cfg.fc, cfg.fc, 1, X, Y)
    conv(cfg.fc, cfg.n_class, 1, X, Y)

    fwd_flops = 2 * macs
    train_flops = 3 * fwd_flops
    bytes_moved = (3 * act_elems * compute_bytes    # fwd write, bwd read+write
                   + 3 * param_elems * 4)           # read fwd/bwd + optimizer
    return train_flops, bytes_moved


def bench_fcn_step_quick(K=10, B=20, S=192):
    """Condensed FCN train-step measurement for bench.py's JSON line:
    the production configuration (bf16, device augment, K-step scan),
    two-point timed.  Returns (images_per_s, mfu) — the one home for
    this methodology so bench.py and this file cannot drift."""
    import jax
    import jax.numpy as jnp
    import optax

    from ukbb_cardiac_tpu.models import fcn as fcn_mod
    from ukbb_cardiac_tpu.train import steps as steps_lib
    from ukbb_cardiac_tpu.train.sa import make_fcn_loss

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=5,
                            n_filter=(16, 32, 64, 128, 256),
                            n_block=(2, 2, 3, 3, 3), same_dim=32, fc=64)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    loss_fn = make_fcn_loss(names, cfg, device_augment=True,
                            compute_dtype=jnp.bfloat16)
    step = steps_lib.make_multi_train_step(loss_fn, optimizer)
    rng = np.random.RandomState(0)
    batches = {"image": jnp.asarray(rng.rand(K, B, S, S, 1)
                                    .astype(np.float32)),
               "label": jnp.asarray(rng.randint(0, 4, (K, B, S, S))
                                    .astype(np.int32))}
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(K))

    def run(n):
        nonlocal params, state, opt_state
        t0 = time.time()
        losses = None
        for _ in range(n // K):
            params, state, opt_state, losses, _ = step(
                params, state, opt_state, batches, keys)
        float(losses[-1])
        return time.time() - t0

    run(K)  # compile (persistent-cache warm in steady state)
    t_lo = min(run(K) for _ in range(3))
    t_hi = min(run(4 * K) for _ in range(3))
    sec_per_step = (t_hi - t_lo) / (3 * K)
    if sec_per_step <= 0:
        return None, None
    flops, _ = fcn_train_flops_and_bytes(cfg, B, S, S)
    peak, _ = PEAKS.get(jax.devices()[0].device_kind, (None, None))
    mfu = (flops / sec_per_step / peak) if peak else None
    return B / sec_per_step, mfu


def unet_lstm_train_flops_and_bytes(ucfg, n_hidden, n_frames, X, Y,
                                    bidirectional=True, compute_bytes=2):
    """Analytic per-step cost model for the UNet-LSTM training step
    (``network_ao.py:322-399`` architecture; batch = ``n_frames`` total
    frames = windows × time_window).

    Same conventions as :func:`fcn_train_flops_and_bytes`: FLOPs = 2×MACs
    forward, training ≈ 3× forward (grads flow through the frozen UNet
    too — masking only zeroes the *updates*); transpose convs count
    output-resolution taps (1/s² of the dense stencil).  Includes the
    in-step augmentation warp (two tent matmuls per frame).  Bytes is the
    perfect-fusion lower bound."""
    macs = 0
    act_elems = 0
    param_elems = 0
    n = n_frames

    def conv(cin, cout, k, x, y, frac=1.0):
        nonlocal macs, act_elems, param_elems
        macs += int(n * x * y * k * k * cin * cout * frac)
        act_elems += n * x * y * cout
        param_elems += k * k * cin * cout

    # encoder
    cin = ucfg.in_ch
    for l in range(ucfg.n_level):
        x, y = X // (2 ** l), Y // (2 ** l)
        for _ in range(ucfg.n_block[l]):
            conv(cin, ucfg.n_filter[l], 3, x, y)
            cin = ucfg.n_filter[l]
    # decoder: transpose conv (s=2: 1/4 of the dense taps at output res)
    # + n_block convs, first from the skip concat
    for l in range(ucfg.n_level - 2, -1, -1):
        x, y = X // (2 ** l), Y // (2 ** l)
        conv(ucfg.n_filter[l + 1], ucfg.n_filter[l], 3, x, y, frac=0.25)
        cin = ucfg.n_filter[l] * 2
        for _ in range(ucfg.n_block[l]):
            conv(cin, ucfg.n_filter[l], 3, x, y)
            cin = ucfg.n_filter[l]
    conv(ucfg.n_filter[0], ucfg.n_class, 1, X, Y)  # UNet logits head
    # ConvLSTM: per frame per direction one 3x3 conv over concat(x, h)
    ndir = 2 if bidirectional else 1
    for _ in range(ndir):
        conv(ucfg.n_filter[0] + n_hidden, 4 * n_hidden, 3, X, Y)
    conv(ndir * n_hidden, ucfg.n_class, 1, X, Y)   # shared logits conv
    # augmentation warp: two tent matmuls per frame (X,Y)x(Y,Y)+(X,X)x(X,Y)
    macs += n * (X * Y * Y + X * X * Y)
    act_elems += n * X * Y

    fwd_flops = 2 * macs
    train_flops = 3 * fwd_flops
    bytes_moved = (3 * act_elems * compute_bytes
                   + 3 * param_elems * 4)
    return train_flops, bytes_moved


# two-point measurement: time N steps and 4N steps, each ended by a
# forcing scalar fetch (block_until_ready does not reliably wait over
# this host's tunnel, and the fetch itself costs a tunnel round-trip in
# degraded mode) — the difference cancels the fetch cost exactly
STEPS_LO = 10
STEPS_HI = 40


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from ukbb_cardiac_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from ukbb_cardiac_tpu.models import fcn as fcn_mod
    from ukbb_cardiac_tpu.train import steps as steps_lib
    from ukbb_cardiac_tpu.train.sa import make_fcn_loss

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=5,
                            n_filter=(16, 32, 64, 128, 256),
                            n_block=(2, 2, 3, 3, 3), same_dim=32, fc=64)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    # bf16 activations (params/BN/logits f32) — the TPU mixed-precision
    # configuration; the f32 path is ~the same graph at twice the HBM traffic
    loss_fn = make_fcn_loss(names, cfg, device_augment=True,
                            compute_dtype=jnp.bfloat16)
    # K steps per dispatch: per-call arg-pytree shipping over this host's
    # tunnel costs ~0.1 s, dwarfing the step compute — the scan amortizes it
    K = 10
    step = steps_lib.make_multi_train_step(loss_fn, optimizer)

    # a reference training batch is 2 subjects x ~10 slices at 192x192
    batch_slices = 20
    rng = np.random.RandomState(0)
    batches = {
        "image": jnp.asarray(rng.rand(K, batch_slices, 192, 192, 1)
                             .astype(np.float32)),
        "label": jnp.asarray(rng.randint(0, 4, (K, batch_slices, 192, 192))
                             .astype(np.int32)),
    }
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(K))

    def run_steps(n, params, state, opt_state):
        assert n % K == 0
        t0 = time.time()
        for _ in range(n // K):
            params, state, opt_state, losses, _ = step(
                params, state, opt_state, batches, keys)
        float(losses[-1])  # forcing fetch: the only reliable sync here
        return time.time() - t0, params, state, opt_state

    # warm-up: compile + first-transfer penalty
    _, params, state, opt_state = run_steps(K, params, state, opt_state)

    times = []
    for _ in range(REPEATS):
        t_lo, params, state, opt_state = run_steps(STEPS_LO, params, state,
                                                   opt_state)
        t_hi, params, state, opt_state = run_steps(STEPS_HI, params, state,
                                                   opt_state)
        times.append((t_hi - t_lo) / (STEPS_HI - STEPS_LO))

    # min over repeats: tunnel noise is strictly additive (see bench.py)
    sec_per_step = float(np.min(times))

    # --- saturating batch: same step at B=128 slices ---------------------
    # the reference-scale batch (20 slices) leaves per-step fixed costs
    # (BN reductions over small tensors, scan bookkeeping) visible; a
    # full-HBM batch amortizes them and reports the chip's streaming
    # throughput ceiling for this model
    B_SAT = 128
    sat_img_s = sat_sec = None
    try:
        K_SAT = 4
        batches_s = {
            "image": jnp.asarray(rng.rand(K_SAT, B_SAT, 192, 192, 1)
                                 .astype(np.float32)),
            "label": jnp.asarray(rng.randint(0, 4, (K_SAT, B_SAT, 192, 192))
                                 .astype(np.int32)),
        }
        keys_s = jax.vmap(jax.random.PRNGKey)(jnp.arange(K_SAT))
        p2, s2 = params, state
        o2 = opt_state

        def run_sat(n):
            nonlocal p2, s2, o2
            t0 = time.time()
            losses = None
            for _ in range(n // K_SAT):
                p2, s2, o2, losses, _ = step(p2, s2, o2, batches_s, keys_s)
            float(losses[-1])
            return time.time() - t0

        run_sat(K_SAT)  # compile
        t_lo = min(run_sat(4) for _ in range(3))
        t_hi = min(run_sat(16) for _ in range(3))
        sat_sec = (t_hi - t_lo) / 12
        if sat_sec > 0:
            sat_img_s = B_SAT / sat_sec
    except Exception:
        pass

    # --- analytic MFU / roofline (VERDICT r2 #6) -------------------------
    flops, hbm_bytes = fcn_train_flops_and_bytes(cfg, batch_slices, 192, 192)
    achieved = flops / sec_per_step
    kind = jax.devices()[0].device_kind
    peak, bw = PEAKS.get(kind, (None, None))
    mfu = achieved / peak if peak else None
    verdict = None
    if peak:
        t_mxu = flops / peak
        t_hbm = hbm_bytes / bw
        bound = "MXU" if t_mxu >= t_hbm else "HBM"
        verdict = (f"{bound}-bound roofline: t_mxu={t_mxu*1e3:.2f} ms "
                   f"t_hbm={t_hbm*1e3:.2f} ms measured={sec_per_step*1e3:.2f} ms")
    # --- aortic UNet-LSTM train step (train_network_ao.py budget:
    # batch 5 x 9-frame windows at 256^2, 20k iterations) ----------------
    ao_windows_per_s = ao_mfu = ao_roofline = None
    try:
        ao_windows_per_s, ao_mfu, ao_roofline = _bench_ao_step()
    except Exception:
        pass

    # --- end-to-end trainer from disk (see bench_train_e2e) --------------
    e2e_img_s = None
    try:
        e2e_img_s = bench_train_e2e()
    except Exception:
        pass

    # --- aortic e2e (opt-in: several minutes; tunnel-H2D-bound here) -----
    ao_e2e_windows_s = None
    if os.environ.get("BENCH_AO_E2E") == "1":
        try:
            ao_e2e_windows_s = bench_train_ao_e2e()
        except Exception:
            pass

    print(json.dumps({
        "metric": "fcn_sa_train_step_images_per_s",
        "value": round(batch_slices / sec_per_step, 2),
        "unit": "images/s",
        "vs_baseline": None,
        "step_flops_G": round(flops / 1e9, 1),
        "achieved_tflops": round(achieved / 1e12, 2),
        "device_kind": kind,
        "mfu": round(mfu, 3) if mfu is not None else None,
        "roofline": verdict,
        # saturating batch (128 slices): streaming throughput ceiling
        "images_per_s_b128": (round(sat_img_s, 1) if sat_img_s else None),
        "mfu_b128": (round(fcn_train_flops_and_bytes(cfg, B_SAT, 192, 192)[0]
                           / sat_sec / peak, 3)
                     if (sat_img_s and peak) else None),
        # aortic UNet-LSTM: reference budget batch 5 x tw=9 @ 256^2
        # (production config: bf16 + K-step + in-step augmentation)
        "ao_unet_lstm_windows_per_s": (round(ao_windows_per_s, 2)
                                       if ao_windows_per_s else None),
        "ao_unet_lstm_mfu": round(ao_mfu, 3) if ao_mfu else None,
        "ao_unet_lstm_roofline": ao_roofline,
        # full trainer from a dataset on disk (cache + device augment +
        # bf16 + compact transfer + K-step dispatch + staged H2D)
        "images_per_s_end_to_end": (round(e2e_img_s, 1)
                                    if e2e_img_s else None),
        # aortic e2e from disk (BENCH_AO_E2E=1; see bench_train_ao_e2e)
        "ao_windows_per_s_end_to_end": (round(ao_e2e_windows_s, 1)
                                        if ao_e2e_windows_s else None),
    }))


def bench_train_e2e(n_subjects=30, warm_iters=20, lo=40, hi=340, repeats=2,
                    device_slices=True, estimator="mean", batch_slices=20):
    """END-TO-END trainer throughput from a dataset on disk — the number
    a user actually gets, not just the device step.

    Recommended TPU configuration: decoded-subject LRU cache (kills the
    per-draw gzip re-decode), on-device augmentation, bf16 compute,
    compact f16/uint8 transfer (2.7x fewer host->device bytes), K=10
    steps per dispatch, and next-chunk H2D staged under the running
    dispatch.  Measured from (hi-lo)-iteration pair differences
    (validation/progress disabled so the diff is pure steady-state
    training; the end-of-run checkpoint save appears in both points and
    cancels); the default ``estimator='mean'`` averages the pair diffs
    — see the estimator note below for why 'min' can overshoot.
    """
    import shutil
    import tempfile

    from ukbb_cardiac_tpu.io import nifti
    from ukbb_cardiac_tpu.train.sa import SATrainConfig, train

    root = tempfile.mkdtemp(prefix="bench_train_ds_")
    try:
        rng = np.random.RandomState(0)
        for i in range(n_subjects):
            d = os.path.join(root, "train", f"s{i}")
            os.makedirs(d, exist_ok=True)
            aff = np.diag([1.8, 1.8, 10.0, 1.0])
            for fr in ("ED", "ES"):
                img = (rng.rand(192, 208, 10) * 3000).astype(np.int16)
                lab = rng.randint(0, 4, (192, 208, 10)).astype(np.int16)
                nifti.save(nifti.Nifti1Image(img, aff),
                           os.path.join(d, f"sa_{fr}.nii.gz"))
                nifti.save(nifti.Nifti1Image(lab, aff),
                           os.path.join(d, f"label_sa_{fr}.nii.gz"))

        run_i = [0]

        def run(iters):
            run_i[0] += 1
            cfg = SATrainConfig(
                seq_name="sa", image_size=192, num_filter=16,
                dataset_dir=root,
                checkpoint_dir=os.path.join(root, f"ck{run_i[0]}"),
                validation_every=10 ** 9, checkpoint_every=10 ** 9,
                batch_slices=batch_slices, steps_per_dispatch=10,
                device_augment=True, cache_gb=2.0, seed=0,
                bf16=True, compact_transfer=True,
                # HBM slice pool (r5): each subject-frame ships once,
                # steps gather (slot, z) indices — removes the per-batch
                # H2D that bound the old path on slow links.  False
                # measures the host-batched path for comparison.
                device_slices=device_slices, pool_gb=2.0)
            t0 = time.time()
            train(cfg, max_iterations=iters, progress_every=10 ** 9)
            return time.time() - t0

        # warm run: XLA compiles persist (compilation cache); the
        # SubjectCache does NOT persist across train() calls, so each
        # measured run re-decodes subjects during its first iterations —
        # that cost appears in both two-point samples and cancels.
        # estimator: see bench_train_ao_e2e — 'min' can report above the
        # device-step rate when tunnel jitter exceeds the (hi-lo)
        # signal; the 300-iter spread + 'mean' default keeps the
        # artifact number physical.
        run(warm_iters)
        diffs = [(run(hi) - run(lo)) / (hi - lo) for _ in range(repeats)]
        sec = min(diffs) if estimator == "min" else float(np.mean(diffs))
        return (batch_slices / sec) if sec > 0 else None
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_train_ao_e2e(n_subjects=12, warm_iters=8, lo=24, hi=84, repeats=2,
                       device_windows=True, estimator="min"):
    """END-TO-END aortic UNet-LSTM trainer from a dataset on disk, in the
    production configuration: DEVICE-RESIDENT WINDOWS (each cine ships to
    HBM once and the step gathers its 9-frame circular windows by index
    — ``train/device_pool.py``), K=4 dispatch, in-step augmentation,
    bf16, subject cache.

    History on this host: the host-sliced window path measured
    21.6 windows/s against the 41.6 windows/s device step — bound by
    tunnel H2D (~35 MB per 4-step chunk even in f16/uint8; DESIGN.md).
    ``device_windows`` replaces those megabytes with ~360 bytes of int32
    indices per chunk, so e2e ≈ device rate even through the degraded
    link (VERDICT r3 #5).  ``device_windows=False`` measures the old
    path for comparison.  Run via BENCH_AO_E2E=1 python bench_train.py
    (too slow for the default bench budget)."""
    import shutil
    import tempfile

    from ukbb_cardiac_tpu.io import nifti
    from ukbb_cardiac_tpu.train.ao import AoTrainConfig, train

    root = tempfile.mkdtemp(prefix="bench_ao_e2e_")
    try:
        rng = np.random.RandomState(0)
        for i in range(n_subjects):
            d = os.path.join(root, "train", f"s{i}")
            os.makedirs(d, exist_ok=True)
            aff = np.diag([1.8, 1.8, 10.0, 1.0])
            img = (rng.rand(256, 256, 1, 40) * 3000).astype(np.int16)
            lab = np.zeros((256, 256, 1, 40), np.int16)
            lab[100:140, 100:140, 0, [0, 20]] = 1
            lab[150:180, 150:180, 0, [0, 20]] = 2
            prop = np.zeros_like(lab)
            prop[100:140, 100:140] = 1
            prop[150:180, 150:180] = 2
            nifti.save(nifti.Nifti1Image(img, aff),
                       os.path.join(d, "ao.nii.gz"))
            nifti.save(nifti.Nifti1Image(lab, aff),
                       os.path.join(d, "label_ao.nii.gz"))
            nifti.save(nifti.Nifti1Image(prop, aff),
                       os.path.join(d, "label_ao_prop.nii.gz"))

        run_i = [0]

        def run(iters):
            run_i[0] += 1
            cfg = AoTrainConfig(model="UNet-LSTM", from_scratch=True,
                                weight_R=5, image_size=256,
                                dataset_dir=root,
                                checkpoint_dir=os.path.join(root,
                                                            f"ck{run_i[0]}"),
                                validation_every=10 ** 9,
                                checkpoint_every=10 ** 9,
                                batch_windows=5, steps_per_dispatch=4,
                                device_augment=True, bf16=True,
                                cache_gb=2.0, compact_transfer=True,
                                device_windows=device_windows,
                                pool_gb=2.0, seed=0)
            t0 = time.time()
            train(cfg, max_iterations=iters, progress_every=10 ** 9)
            return time.time() - t0

        run(warm_iters)  # XLA compiles persist; see bench_train_e2e note
        # estimator: 'min' (timeit-style; assumes additive noise, but a
        # noise swing LARGER than the (hi-lo) signal can push a pair's
        # diff below the device floor and overstate the rate — measured
        # once at 127 w/s vs the 41.6 w/s step rate with a 40-iter
        # spread); 'mean' averages the pair diffs — callers wanting an
        # artifact-grade number should pair it with a spread whose
        # signal dwarfs the tunnel jitter (hi-lo >= 300 iters here).
        diffs = [(run(hi) - run(lo)) / (hi - lo) for _ in range(repeats)]
        sec = min(diffs) if estimator == "min" else float(np.mean(diffs))
        return (5 / sec) if sec > 0 else None
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _bench_ao_step() -> float:
    """Aortic UNet-LSTM train-step throughput at the reference operating
    point (``train_network_ao.py:28-48``): batch 5, time window 9,
    256x256, bidirectional seq2seq, LSTM-only updates (phase 2) — in the
    production configuration (bf16 compute, K=4 steps/dispatch, window-
    consistent augmentation inside the step).

    Measured on this chip (2026-08): f32 single-step 36.3 windows/s;
    bf16 44.1; bf16+K4 45.7; bf16+K4+device-augment 41.6 (the augment
    warps 45 256² frames/step, 10.9 ms with the bf16 tent intermediate —
    on-device it still beats the host cv2 path it replaces, which would
    serialize ~100 ms/batch on the host)."""
    import jax
    import jax.numpy as jnp

    from ukbb_cardiac_tpu.train import ao as ao_lib
    from ukbb_cardiac_tpu.train import steps as steps_lib

    cfg = ao_lib.AoTrainConfig(model="UNet-LSTM", train_batch_size=5,
                               bf16=True, device_augment=True)
    ucfg, params, state, names = ao_lib.init_ao_model(
        cfg, jax.random.PRNGKey(0))
    loss_fn = ao_lib.make_ao_loss(cfg, ucfg, names, device_augment=True,
                                  shift=0, rotate=10, scale=0.2,
                                  compute_dtype=jnp.bfloat16)
    optimizer = ao_lib.make_ao_optimizer(cfg, params)
    opt_state = optimizer.init(params)
    K = 4
    step = steps_lib.make_multi_train_step(loss_fn, optimizer)

    B, TW, S = cfg.train_batch_size, cfg.time_window, 256
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.rand(K, B, TW, S, S, 1)
                                  .astype(np.float32)),
             "label": jnp.asarray(rng.randint(0, 3, (K, B, TW, S, S))
                                  .astype(np.int32))}
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(K))

    def run(n):
        nonlocal params, state, opt_state
        t0 = time.time()
        loss = None
        for _ in range(n // K):
            params, state, opt_state, loss, _ = step(params, state,
                                                     opt_state, batch, keys)
        float(loss[-1])
        return time.time() - t0

    run(K)  # compile
    t_lo = min(run(2 * K) for _ in range(3))
    t_hi = min(run(6 * K) for _ in range(3))
    sec_per_step = (t_hi - t_lo) / (4 * K)
    if sec_per_step <= 0:  # tunnel noise inverted the two points
        return None, None, None
    flops, hbm = unet_lstm_train_flops_and_bytes(
        ucfg, cfg.num_hidden, B * TW, S, S, bidirectional=cfg.bidirectional)
    peak, bw = PEAKS.get(jax.devices()[0].device_kind, (None, None))
    mfu = verdict = None
    if peak:
        mfu = flops / sec_per_step / peak
        t_mxu, t_hbm = flops / peak, hbm / bw
        if sec_per_step > 3 * max(t_mxu, t_hbm):
            # far off both rooflines: the 2x(T=9) ConvLSTM scans
            # serialize small per-frame convs, and train-mode BN breaks
            # fusion — the bound is dispatch latency, not a roofline
            bound = "latency/serialization"
        else:
            bound = "MXU" if t_mxu >= t_hbm else "HBM"
        verdict = (f"{bound}-bound: t_mxu={t_mxu*1e3:.2f} ms "
                   f"t_hbm={t_hbm*1e3:.2f} ms "
                   f"measured={sec_per_step*1e3:.2f} ms")
    return cfg.train_batch_size / sec_per_step, mfu, verdict


if __name__ == "__main__":
    main()
