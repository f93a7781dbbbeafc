"""Benchmark: SA motion tracking (FFD registration) per subject.

The reference's strain pipeline shells out to ~300 sequential MIRTK CPU
registrations per subject — "several minutes" (README.md:51, SURVEY §3.4).
Here the whole (slice x frame-pair) population runs as one batched JAX
registration.  Workload mirrors the real driver: 3 slices, T=50 frames,
96x96 LV crop → 150 pairwise registrations (inverse-consistent: the
reverse transforms come from batched field inversion) + composition +
blending.

Not the driver bench (bench.py measures segmentation); prints one JSON
line for documentation.
"""

import json
import time

import numpy as np

T, X, Y = 50, 96, 96
N_SLICES = 3


def main():
    from ukbb_cardiac_tpu.reg import RegConfig
    from ukbb_cardiac_tpu.phenotype.strain import track_multi_slice_fields
    from ukbb_cardiac_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # synthetic contracting-ring cine per slice
    gx, gy = np.meshgrid(np.arange(X), np.arange(Y), indexing="ij")
    slices = []
    for z in range(N_SLICES):
        frames = np.zeros((T, X, Y), np.float32)
        for t in range(T):
            r = 18.0 * (1 - 0.25 * np.sin(np.pi * t / T) ** 2) - z
            d = np.sqrt((gx - X / 2) ** 2 + (gy - Y / 2) ** 2)
            frames[t] = np.exp(-0.5 * ((d - r) / 4.0) ** 2)
        slices.append(frames)

    cfg = RegConfig()  # 3 levels, spacing 10, SSD + 1e-1 BE — the
    #                    ffd_cine_2d_motion.cfg operating point
    from ukbb_cardiac_tpu.reg import make_register_batch
    register_batch = make_register_batch((X, Y), cfg)

    frames_zs = np.stack(slices)
    # warm-up: compile the batched registration + composition once
    track_multi_slice_fields(frames_zs, cfg, register_batch=register_batch)

    times = []
    for _ in range(3):
        t0 = time.time()
        fields = track_multi_slice_fields(frames_zs, cfg,
                                          register_batch=register_batch)
        times.append(time.time() - t0)
    value = float(min(times))  # tunnel noise is additive; see bench.py
    assert fields.shape == (N_SLICES, T, X, Y, 2)

    print(json.dumps({
        "metric": f"sa_strain_motion_tracking_{N_SLICES}slices_T{T}",
        "value": round(value, 3),
        "unit": "s",
        # no vs_baseline: the reference publishes only "several minutes"
        # for its MIRTK path (README.md:51) — no ratio is claimed against
        # an assumed denominator
    }))


if __name__ == "__main__":
    main()
