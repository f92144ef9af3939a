"""Device-mesh parallelism: the single abstraction replacing the reference's
three disconnected mechanisms (SURVEY.md component #39) —
`nn.DataParallel` (train.py:136-138), DDP/NCCL (light_training/trainer.py:97,
launch.py:69-117), and MPI-rendezvous DDP (guided_diffusion/dist_util.py:21-93).

On TPU all of those collapse into one `jax.sharding.Mesh`:
- parameters replicated (NamedSharding(mesh, P())) — the analogue of
  DataParallel's replicate / DDP's broadcast param sync,
- batches sharded over the "data" axis — the analogue of scatter /
  DistributedSampler,
- gradient all-reduce, eval gather, and metric reductions become
  compiler-scheduled ICI collectives inside the jitted step; no user-level
  NCCL/MPI layer exists.

An optional "space" axis spatially shards the volume depth dimension; XLA's
GSPMD partitioner inserts the conv halo exchanges automatically, which is the
TPU-native realisation of "sequence parallelism" for volumetric data
(SURVEY.md §2.2).
"""
from __future__ import annotations

import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    space: int = 1,
) -> Mesh:
    """Create a ("data", "space") mesh over the given (default: all) devices.

    For multi-host topologies, call `jax.distributed.initialize()` first;
    `jax.devices()` then spans the full DCNxICI fabric and the mesh should be
    laid out with "data" over DCN and "space" over ICI (mesh_utils handles
    contiguity when device order is default).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % space != 0:
        # Degrade gracefully (e.g. 1 real chip with spatial_shards=2 in the
        # config): shrink "space" to the largest divisor of n rather than
        # crashing — the analogue of DataParallel silently running on fewer
        # GPUs than device_ids lists.
        fallback = max(s for s in range(1, space) if n % s == 0)
        warnings.warn(
            f"create_mesh: {n} device(s) not divisible by space={space}; "
            f"falling back to space={fallback}", stacklevel=2)
        space = fallback
    if data is None:
        data = n // space
    assert data * space == n, (data, space, n)
    dev_array = np.asarray(devices).reshape(data, space)
    return Mesh(dev_array, ("data", "space"))


def batch_spec(ndim: int, spatial_sharded: bool = False) -> P:
    """PartitionSpec for an (N, D, H, W, C) batch: N over "data", optionally
    D over "space"."""
    if ndim == 1:
        return P("data")
    axes = ["data"] + [None] * (ndim - 1)
    if spatial_sharded and ndim >= 2:
        axes[1] = "space"
    return P(*axes)


def shard_batch(batch, mesh: Mesh, spatial_sharded: bool = False):
    """Place a pytree of host arrays onto the mesh, batch-sharded."""
    def put(x):
        spec = batch_spec(np.ndim(x), spatial_sharded)
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
