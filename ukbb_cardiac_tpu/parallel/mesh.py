"""Device-mesh utilities: the framework's scale-out story.

The reference has no distributed runtime at all (SURVEY.md §2.4): one
process, one GPU, scale-out by manually sharding subject indices across
processes (``eval_strain_sax.py:26-34``).  Here parallelism is
first-class and XLA-native:

- **Data parallelism** over a ``jax.sharding.Mesh`` axis ``"data"``: the
  batch axis of training and of fleet inference shards across chips; XLA
  inserts the gradient ``psum`` over ICI from sharding annotations alone.
- **Spatial parallelism** (axis ``"space"``) for very large images:
  convolutions on X-sharded activations make XLA exchange halo rows over
  ICI automatically.
- Works identically on a virtual CPU mesh
  (``--xla_force_host_platform_device_count``) for testing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a Mesh over the first ``n_devices`` devices.

    axes: mesh axis names, e.g. ("data",) or ("data", "space").
    shape: per-axis sizes; defaults to all devices on the first axis.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = [n_devices] + [1] * (len(axes) - 1)
    mesh_devs = np.asarray(devs).reshape(tuple(shape))
    return Mesh(mesh_devs, tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh axis."""
    return NamedSharding(mesh, P(axis))


def spatial_sharding(mesh: Mesh, batch_axis: str = "data",
                     space_axis: str = "space") -> NamedSharding:
    """Shard (N, X, Y, C) activations: batch over data, X over space.
    XLA exchanges conv halos over ICI automatically."""
    return NamedSharding(mesh, P(batch_axis, space_axis))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host array (or pytree of arrays) with the batch axis
    sharded across the mesh. Batch size must divide the axis size."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def pad_batch_to_devices(batch: np.ndarray, n: int):
    """Pad the leading axis up to a multiple of n (fleet-mode inference:
    ragged subject batches → static shapes). Returns (padded, valid)."""
    b = batch.shape[0]
    target = -(-b // n) * n
    if target == b:
        return batch, b
    pad = [(0, target - b)] + [(0, 0)] * (batch.ndim - 1)
    return np.pad(batch, pad), b
