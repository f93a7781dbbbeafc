"""Jitted train-step builders: single-chip and mesh data-parallel.

The reference trains with a TF-1.x session loop, single GPU, batch 2
(``train_network.py:222-268``).  Here the step is a pure function —
``value_and_grad`` over a loss closure, optax update, BatchNorm state
threading — and the multi-chip variant is the SAME function jitted with
sharding annotations: params/opt-state replicated, batch sharded over the
``"data"`` mesh axis.  XLA derives the gradient all-reduce (psum over ICI)
from the shardings alone; there is no hand-written collective.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import NamedSharding, PartitionSpec as P


def make_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation):
    """Single-device jitted step.

    loss_fn(params, state, batch, key) -> (loss, (aux, new_state)).
    Returns step(params, state, opt_state, batch, key)
            -> (params, state, opt_state, loss, aux).
    """

    @jax.jit
    def step(params, state, opt_state, batch, key):
        (loss, (aux, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss, aux

    return step


def make_dp_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                       mesh, axis: str = "data", donate: bool = True):
    """Data-parallel step over a Mesh: batch sharded on ``axis``, model
    replicated.  The loss is a global-batch mean, so gradients are the
    correct global average — GSPMD inserts the ICI psum.

    BatchNorm batch statistics are likewise global-batch statistics (an
    improvement over per-replica stats; the reference is single-device so
    there is no reference semantics to match).
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    def step(params, state, opt_state, batch, key):
        (loss, (aux, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss, aux

    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, shard, repl),
        out_shardings=(repl, repl, repl, repl, repl),
        donate_argnums=(0, 1, 2) if donate else (),
    )


def _make_scan_multi_step(loss_fn: Callable,
                          optimizer: optax.GradientTransformation):
    """The shared K-step scan: one body, used by the single-device and
    the mesh data-parallel multi-step builders (only the jit shardings
    differ between them)."""

    def multi_step(params, state, opt_state, batches, keys):
        def body(carry, xs):
            params, state, opt_state = carry
            batch, key = xs
            (loss, (aux, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, state, batch, key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_state, opt_state), (loss, aux)

        (params, state, opt_state), (losses, auxes) = jax.lax.scan(
            body, (params, state, opt_state), (batches, keys))
        last_aux = jax.tree.map(lambda a: a[-1], auxes)
        return params, state, opt_state, losses, last_aux

    return multi_step


def make_multi_train_step(loss_fn: Callable,
                          optimizer: optax.GradientTransformation):
    """K optimizer steps per device dispatch via ``lax.scan``.

    Each host→device dispatch of a train step ships the whole params /
    opt-state arg pytree (hundreds of leaves); on a host with expensive
    dispatch (this machine's TPU tunnel) that overhead rivals the step's
    compute.  Scanning K steps inside one jit amortizes it K× — params
    never leave HBM between steps.

    batches: a pytree whose leaves carry a leading axis K (one slot per
    step); keys: (K, 2) PRNG keys.  Returns
    ``step(params, state, opt_state, batches, keys)
      -> (params, state, opt_state, losses[K], last_aux)``.

    Semantically identical to K calls of :func:`make_train_step` with the
    same batches/keys (asserted in tests).
    """
    return jax.jit(_make_scan_multi_step(loss_fn, optimizer))


def make_multi_dp_train_step(loss_fn: Callable,
                             optimizer: optax.GradientTransformation,
                             mesh, axis: str = "data", donate: bool = True):
    """K optimizer steps per dispatch, data-parallel over a Mesh.

    Combines :func:`make_multi_train_step`'s dispatch amortization with
    :func:`make_dp_train_step`'s sharding-derived gradient psum: batches
    carry a leading scan axis K with the per-step batch axis (axis 1)
    sharded across ``axis``; params/opt-state stay replicated in HBM for
    all K steps, so between steps nothing crosses the host and the only
    collective is the per-step ICI gradient all-reduce GSPMD inserts.

    batches: pytree of (K, B, ...) leaves, B divisible by the mesh axis;
    keys: (K, 2).  Same signature/semantics as K sharded single steps.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(None, axis))

    return jax.jit(
        _make_scan_multi_step(loss_fn, optimizer),
        in_shardings=(repl, repl, repl, shard, repl),
        out_shardings=(repl, repl, repl, repl, repl),
        donate_argnums=(0, 1, 2) if donate else (),
    )


def make_eval_step(metric_fn: Callable):
    """Jitted eval step: metric_fn(params, state, batch) -> aux dict."""
    return jax.jit(metric_fn)


def adam_with_schedule(lr: float = 1e-3, reduce_after=(),
                       reduce_factor: float = 0.1):
    """Adam with the reference's piecewise-constant decay
    (``train_network_ao.py:329-339``): the learning rate multiplies by
    ``reduce_factor`` after EACH boundary in ``reduce_after`` (the
    reference's ``--reduce_lr_after`` may be given several times)."""
    if isinstance(reduce_after, int):
        reduce_after = [reduce_after] if reduce_after > 0 else []
    boundaries = sorted(int(b) for b in reduce_after if int(b) > 0)
    if boundaries:
        sched = optax.piecewise_constant_schedule(
            lr, {b: reduce_factor for b in boundaries})
        return optax.adam(sched)
    return optax.adam(lr)
