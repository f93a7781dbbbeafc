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
import time

import numpy as np

REPEATS = 3
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
    print(json.dumps({
        "metric": "fcn_sa_train_step_images_per_s",
        "value": round(batch_slices / sec_per_step, 2),
        "unit": "images/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
