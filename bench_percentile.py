"""Micro-bench: the device percentile rescale, int16 vs f32 key path.

``ops/intensity.py::percentiles_bisect`` streams the whole key array
from HBM once per compare-and-count round; ≤16-bit integer inputs
bisect over their own range in 16 rounds (8 for uint8) instead of 32,
so the int16 path should measure ~2× the f32 path on this stage (the
engines ship UKB cines as int16 untouched).  Two-point timing cancels
the host↔device tunnel (see DESIGN.md).

Usage: python bench_percentile.py [--cpu]
Prints one JSON line: per-cine milliseconds for both paths + agreement.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the env sitecustomize "
                         "pins the TPU platform)")
    ap.add_argument("--repeats", type=int, default=7)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ukbb_cardiac_tpu.ops.intensity import rescale_intensity_jax
    from ukbb_cardiac_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.RandomState(0)
    cine16 = (rng.rand(192, 208, 10, 50) * 3000).astype(np.int16)
    dev = {"int16": jax.device_put(cine16),
           "f32": jax.device_put(cine16.astype(np.float32))}
    fn = {k: jax.jit(lambda x: rescale_intensity_jax(x, (1.0, 99.0)))
          for k in dev}

    a = np.asarray(fn["int16"](dev["int16"]))
    b = np.asarray(fn["f32"](dev["f32"]))
    agree = bool(np.allclose(a, b, atol=1e-6))

    out = {"metric": "percentile_rescale_ms_per_cine", "agree": agree}
    for name in ("int16", "f32"):
        def run_k(k):
            for _ in range(k):
                o = fn[name](dev[name])
            np.asarray(o[:1, :1, :1, :1])  # one tiny fetch regardless of k

        run_k(1)
        t1s, tKs = [], []
        for _ in range(args.repeats):
            t0 = time.time(); run_k(1); t1s.append(time.time() - t0)
            t0 = time.time(); run_k(6); tKs.append(time.time() - t0)
        out[name] = round((min(tKs) - min(t1s)) / 5 * 1000, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
