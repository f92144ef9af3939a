"""Multi-host helpers (parallel/distributed.py) on the virtual CPU mesh.

Single-process is the degenerate case of every helper; rank math is
exercised with explicit (process_id, num_processes) args against the
reference's sampler semantics (light_training/sampler.py:5-48)."""
import numpy as np

import jax

from diff_unet_tpu.parallel import (
    create_pod_mesh,
    global_batch_from_local,
    local_batch_indices,
    sequential_eval_shard,
)
from diff_unet_tpu.parallel.distributed import auto_initialize


def test_auto_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("MASTER_ADDR", raising=False)
    monkeypatch.delenv("WORLD_SIZE", raising=False)
    assert auto_initialize() is False  # nothing to rendezvous with


def test_pod_mesh_shapes():
    mesh = create_pod_mesh(space=2)
    assert mesh.axis_names == ("data", "space")
    assert mesh.devices.size == len(jax.devices())
    assert mesh.shape["space"] == 2


def test_local_batch_indices_rank_math():
    assert list(local_batch_indices(8, process_id=0, num_processes=4)) == [0, 1]
    assert list(local_batch_indices(8, process_id=3, num_processes=4)) == [6, 7]
    try:
        local_batch_indices(10, process_id=0, num_processes=4)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_sequential_eval_shard_covers_and_truncates():
    """ceil-split: union of shards covers [0, num); last shard short."""
    n_items, n_proc = 10, 4
    got = [list(sequential_eval_shard(n_items, process_id=p,
                                      num_processes=n_proc))
           for p in range(n_proc)]
    assert got == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9]]
    flat = [i for shard in got for i in shard]
    assert flat == list(range(n_items))


def test_global_batch_from_local_single_process():
    mesh = create_pod_mesh()
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    g = global_batch_from_local(mesh, {"x": x})["x"]
    assert g.shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(g), x)
