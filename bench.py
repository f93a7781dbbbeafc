"""Benchmark: short-axis full-sequence segmentation on one TPU chip.

The reference's headline number (README.md:49): ~10 s to segment a
192 x 208 x 10 x 50 SAX cine on an Nvidia K80 — a per-frame feed_dict loop
(``deploy_network.py:103-116``).  Here the same cine runs as batched jit
calls over all 500 slices.  Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}

Environment note: this machine reaches its TPU through a tunnel whose
transfers permanently degrade to ~2 s / 80 MB after the first
device→host fetch of the process (measured; see memory notes).  The
steady-state number below therefore carries a ~2 s transfer floor that a
directly-attached TPU would not have — the device compute itself is
~0.3 s per cine.
"""

import json
import sys
import time

import numpy as np

BASELINE_SECONDS = 10.0  # reference README.md:49, K80
X, Y, Z, T = 192, 208, 10, 50
REPEATS = 5


def main():
    import jax

    from ukbb_cardiac_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from ukbb_cardiac_tpu.infer.engine import InferenceEngine, SegmentationModel
    from ukbb_cardiac_tpu.models import fcn as fcn_mod
    from ukbb_cardiac_tpu.ops import rescale_intensity

    cfg = fcn_mod.FCNConfig(n_class=4, n_level=5,
                            n_filter=(16, 32, 64, 128, 256),
                            n_block=(2, 2, 3, 3, 3), same_dim=32, fc=64)
    params, state, names = fcn_mod.init_fcn(jax.random.PRNGKey(0), cfg)
    model = SegmentationModel.from_fcn(params, state, names, cfg)
    # 125 slices/chunk: 4 dispatches for the 500-slice cine; peak HBM for
    # the multiscale concat stays ~3 GB
    engine = InferenceEngine(model, chunk=125)

    rng = np.random.RandomState(0)
    # int16 like the real UKB NIfTIs (deploy transfers the native dtype)
    cine = (rng.rand(X, Y, Z, T) * 1000).astype(np.int16)

    # Warm-up: compile + first run (excluded, like the reference's session
    # startup is excluded from its per-sequence number).
    engine.segment_sequence_fused(cine)

    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        seg = engine.segment_sequence_fused(cine)  # includes rescale on device
        times.append(time.time() - t0)
    assert seg.shape == (X, Y, Z, T)

    value = float(np.median(times))
    print(json.dumps({
        "metric": "sa_cine_segmentation_192x208x10x50",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / value, 2),
    }))


if __name__ == "__main__":
    main()
