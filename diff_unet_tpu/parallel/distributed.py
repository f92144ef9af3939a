"""Multi-host (DCN x ICI) initialization and data distribution.

TPU-native replacement for the reference's three process-group bootstrap
mechanisms (SURVEY.md component #39):
- `light_training/launch.py:69-117` — subprocess relaunch with RANK env
  vars + `init_process_group(backend='nccl')` (trainer.py:97-100),
- `guided_diffusion/dist_util.py:21-93` — MPI rendezvous, gloo/nccl,
  chunked rank-0 checkpoint broadcast,
- `light_training/sampler.py:5-48` — DistributedSampler / sequential eval
  sharding with `distributed_concat` all_gather.

On TPU pods all of this collapses to `jax.distributed.initialize()` (one
process per host, coordinator rendezvous over DCN) plus a hybrid mesh whose
"data" axis spans hosts (gradient psum rides DCN once per step) and whose
"space" axis stays inside a host's ICI domain. Parameter broadcast,
gradient all-reduce, and eval gathers are compiler-inserted collectives —
no user-level NCCL/MPI layer exists to rebuild.

Single-process (including the CPU test mesh) is the degenerate case: every
helper below works unchanged with num_processes=1.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np

from diff_unet_tpu.parallel.mesh import create_mesh


def auto_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize JAX's distributed runtime when running multi-process.

    Resolution order mirrors the reference's env-var conventions
    (launch.py:87-101 sets MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE for
    torch.distributed): explicit args > JAX_COORDINATOR_ADDRESS /
    NPROC / PROCESS_ID envs > MASTER_ADDR:MASTER_PORT + WORLD_SIZE/RANK
    envs > TPU pod metadata (args all None — jax.distributed autodetects
    on Cloud TPU). Returns True when initialize() was called.

    Call once, before any other JAX API touches the backend; afterwards
    `jax.devices()` spans the full pod and `jax.process_index()` replaces
    the reference's RANK checks (trainer.py:258-344 rank-0 gating).
    """
    # NOTE: must not touch jax.process_count()/jax.devices() here — they
    # initialise the XLA backend, after which initialize() refuses to run.
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:  # pre-0.4.34 JAX: fall back to the private state
        from jax._src import distributed as _dist
        already = _dist.global_state.client is not None
    if already:
        return False
    coord = (coordinator_address
             or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if coord is None and os.environ.get("MASTER_ADDR"):
        coord = (f"{os.environ['MASTER_ADDR']}:"
                 f"{os.environ.get('MASTER_PORT', '1234')}")
    n = num_processes
    if n is None:
        for var in ("JAX_NUM_PROCESSES", "NPROC", "WORLD_SIZE"):
            if os.environ.get(var):
                n = int(os.environ[var])
                break
    pid = process_id
    if pid is None:
        for var in ("JAX_PROCESS_ID", "PROCESS_ID", "RANK"):
            if os.environ.get(var):
                pid = int(os.environ[var])
                break
    if coord is None and n is None:
        # single-host run; Cloud TPU pods set the explicit envs above via
        # their launcher. (No TPU_WORKER_HOSTNAMES sniffing: tunneled
        # single-chip environments leave it populated with junk.)
        return False
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=n, process_id=pid)
    return True


def create_pod_mesh(space: int = 1):
    """("data", "space") mesh over the full (possibly multi-host) device set.

    The "data" axis is laid out so that consecutive mesh columns live on the
    same host: per-step gradient psum crosses DCN only along the host
    boundary of the "data" axis while "space" halo exchanges stay on ICI —
    the layout the scaling-book recipe prescribes for data x spatial
    sharding.
    """
    devices = sorted(jax.devices(),
                     key=lambda d: (d.process_index, d.id))
    return create_mesh(devices, space=space)


def local_batch_indices(global_batch: int,
                        process_id: Optional[int] = None,
                        num_processes: Optional[int] = None) -> range:
    """This process's contiguous slice of a global batch — the analogue of
    torch DistributedSampler rank sharding (light_training/sampler.py:5-27).

    Requires `global_batch % num_processes == 0` (same constraint the
    reference's sampler pads around; padding stays in the data loader)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    per = global_batch // n
    return range(pid * per, (pid + 1) * per)


def global_batch_from_local(mesh, local_batch, spatial_sharded: bool = False):
    """Assemble a global jax.Array from per-process host shards — the
    pjit-feeding analogue of DistributedSampler: each host loads only its
    local examples; the result behaves as the full global batch under the
    mesh's ("data",) sharding (reference equivalent: per-rank loader +
    implicit DDP batch union)."""
    from jax.sharding import NamedSharding

    from diff_unet_tpu.parallel.mesh import batch_spec

    def put(x):
        x = np.asarray(x)
        spec = batch_spec(x.ndim, spatial_sharded)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return jax.tree_util.tree_map(put, local_batch)


def replicate_across_processes(mesh, tree):
    """Replicate a pytree across a MULTI-PROCESS mesh.

    Every process must hold the same host values (same-seed init or a
    restored checkpoint — the analogue of DDP's initial param broadcast,
    guided_diffusion/dist_util.py:77-83). device_put cannot target
    non-addressable devices, so the global replicated arrays are assembled
    with make_array_from_process_local_data.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    sh = NamedSharding(mesh, PartitionSpec())

    def put(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


def sequential_eval_shard(num_items: int,
                          process_id: Optional[int] = None,
                          num_processes: Optional[int] = None) -> range:
    """Contiguous eval split with tail padding semantics matching
    `SequentialDistributedSampler` (light_training/sampler.py:29-48): every
    process gets ceil(num/n) indices, the last ones clamped to the final
    item; the caller truncates gathered results to `num_items` (the
    reference's `distributed_concat[:num_total_examples]`)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    per = -(-num_items // n)
    start = pid * per
    return range(start, min(start + per, num_items)) if start < num_items \
        else range(num_items, num_items)


def gather_eval_rows(rows, num_items: int,
                     num_processes: Optional[int] = None) -> np.ndarray:
    """All-gather per-process eval metric rows in rank order and truncate to
    `num_items` — `distributed_concat(...)[:num_total_examples]`
    (light_training/sampler.py:44-48, trainer.py:307).

    `rows` is this process's `sequential_eval_shard` results padded to
    exactly ceil(num_items/n) rows (collectives need equal shapes; the
    ceil-split puts all padding at the global tail, so truncation removes
    exactly the pads). Single-process is the identity (minus padding).
    """
    n = jax.process_count() if num_processes is None else num_processes
    rows = np.asarray(rows)
    per = -(-num_items // n)
    if rows.shape[0] != per:
        raise ValueError(f"expected {per} padded rows, got {rows.shape[0]}")
    if n == 1:
        return rows[:num_items]
    from jax.experimental import multihost_utils
    gathered = np.asarray(multihost_utils.process_allgather(rows))
    return gathered.reshape((-1,) + gathered.shape[2:])[:num_items]
