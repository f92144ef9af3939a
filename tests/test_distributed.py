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


def test_multiprocess_rendezvous_and_collective(tmp_path):
    """REAL multi-process jax.distributed: the launcher spawns two
    processes (2 virtual CPU devices each) that rendezvous through
    auto_initialize's env conventions, build the 4-device pod mesh, and
    run a cross-process global-sum collective — the capability of
    light_training/launch.py:69-117 + trainer.py:97-100 end to end."""
    import sys
    import textwrap
    from pathlib import Path

    from diff_unet_tpu.parallel.launch import launch

    repo = str(Path(__file__).resolve().parent.parent)
    worker = tmp_path / "worker.py"
    worker.write_text(textwrap.dedent(f"""
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=2")
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        import numpy as np
        import sys
        sys.path.insert(0, {repo!r})
        from diff_unet_tpu.parallel import (
            auto_initialize, create_pod_mesh, global_batch_from_local)

        assert auto_initialize() is True
        assert jax.process_count() == 2
        assert len(jax.devices()) == 4
        mesh = create_pod_mesh()
        assert mesh.devices.size == 4

        pid = jax.process_index()
        local = np.full((2, 4), float(pid + 1), np.float32)
        g = global_batch_from_local(mesh, local)
        from jax.sharding import NamedSharding, PartitionSpec as P
        total = jax.jit(
            lambda x: jnp.sum(x),
            out_shardings=NamedSharding(mesh, P()),
        )(g)
        # ranks contribute 2*4*1 and 2*4*2 -> 24
        np.testing.assert_allclose(np.asarray(total), 24.0)
        print("WORKER_OK", pid)
    """))

    results = launch([sys.executable, str(worker)], nprocs=2, timeout=240)
    for r in results:
        assert "WORKER_OK" in r.stdout, r.stdout


def test_multiprocess_train_step_matches_single_process(tmp_path):
    """REAL multi-host training: two processes build the pod mesh, feed the
    global batch via global_batch_from_local, replicate same-seed state, and
    run one jitted train step — grad psum over the process boundary. The
    post-step loss and a param digest must match a single-process run on
    the same global data (VERDICT r3 ask #5; reference
    light_training/trainer.py:242-345)."""
    import re
    import sys
    import textwrap
    from pathlib import Path

    import jax.numpy as jnp

    from diff_unet_tpu.api import DiffusionSegmenter
    from diff_unet_tpu.engine.train import create_train_state, \
        make_train_step
    from diff_unet_tpu.losses import CompositeLoss
    from diff_unet_tpu.models import DiffUNet
    from diff_unet_tpu.parallel.launch import launch

    FEATS = (4, 4, 8, 16, 32, 4)
    C = 2
    SHAPE = (4, 16, 16, 16, 1)

    def make_batch():
        r = np.random.RandomState(0)
        image = r.randn(*SHAPE).astype(np.float32)
        lab = r.randint(0, C, SHAPE[:4])
        label = np.eye(C, dtype=np.float32)[lab]
        return {"image": image, "label": label}

    # ---- single-process reference on the same global data ----
    seg = DiffusionSegmenter(
        module=DiffUNet(out_channels=C, features=FEATS), num_classes=C,
        timesteps=50, sample_steps=2,
    )
    state = create_train_state(seg, jax.random.key(0), SHAPE)
    step = make_train_step(seg, CompositeLoss("mse,dice", C), donate=False)
    state, metrics = step(state, make_batch(), jax.random.key(5))
    loss_ref = float(metrics["loss"])
    digest_ref = float(sum(
        jnp.sum(jnp.abs(l)).astype(jnp.float64)
        for l in jax.tree_util.tree_leaves(state.params)))

    repo = str(Path(__file__).resolve().parent.parent)
    worker = tmp_path / "train_worker.py"
    worker.write_text(textwrap.dedent(f"""
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=2")
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        import numpy as np
        import sys
        sys.path.insert(0, {repo!r})
        from diff_unet_tpu.api import DiffusionSegmenter
        from diff_unet_tpu.engine.train import (
            create_train_state, make_train_step)
        from diff_unet_tpu.losses import CompositeLoss
        from diff_unet_tpu.models import DiffUNet
        from diff_unet_tpu.parallel import (
            auto_initialize, create_pod_mesh, global_batch_from_local,
            local_batch_indices, replicate_across_processes)

        assert auto_initialize() is True
        assert jax.process_count() == 2
        mesh = create_pod_mesh()
        pid = jax.process_index()

        seg = DiffusionSegmenter(
            module=DiffUNet(out_channels={C}, features={FEATS!r}),
            num_classes={C}, timesteps=50, sample_steps=2)
        state = create_train_state(seg, jax.random.key(0), {SHAPE!r})
        state = replicate_across_processes(mesh, state)

        r = np.random.RandomState(0)
        image = r.randn(*{SHAPE!r}).astype(np.float32)
        lab = r.randint(0, {C}, {SHAPE!r}[:4])
        label = np.eye({C}, dtype=np.float32)[lab]
        idx = list(local_batch_indices({SHAPE[0]}, pid, 2))
        local = {{"image": image[idx], "label": label[idx]}}
        batch = global_batch_from_local(mesh, local)

        step = make_train_step(seg, CompositeLoss("mse,dice", {C}),
                               donate=False)
        with mesh:
            state, metrics = step(state, batch, jax.random.key(5))
        loss = float(metrics["loss"])
        digest = float(sum(
            jnp.sum(jnp.abs(l)).astype(jnp.float64)
            for l in jax.tree_util.tree_leaves(state.params)))
        print("WORKER_TRAIN", pid, loss, digest)
    """))

    results = launch([sys.executable, str(worker)], nprocs=2, timeout=540)
    for r in results:
        m = re.search(r"WORKER_TRAIN (\d) ([-\d.e]+) ([-\d.e]+)", r.stdout)
        assert m, r.stdout + r.stderr
        loss, digest = float(m.group(2)), float(m.group(3))
        np.testing.assert_allclose(loss, loss_ref, rtol=1e-4)
        np.testing.assert_allclose(digest, digest_ref, rtol=1e-4)


def test_gather_eval_rows_single_process_identity():
    """n=1: the padded local rows come back truncated to num_items."""
    from diff_unet_tpu.parallel import gather_eval_rows

    rows = np.arange(3 * 2, dtype=np.float64).reshape(3, 2)
    got = gather_eval_rows(rows, num_items=3, num_processes=1)
    np.testing.assert_array_equal(got, rows)
    try:
        gather_eval_rows(rows[:2], num_items=3, num_processes=1)
        assert False, "expected ValueError on wrong padding"
    except ValueError:
        pass


def test_multiprocess_gather_eval_rows(tmp_path):
    """REAL cross-process eval gather: two processes each hold their
    sequential shard's metric rows (padded to the even share) and
    gather_eval_rows returns the rank-ordered, truncated global rows on
    every process — `distributed_concat(...)[:num_total_examples]`
    (light_training/sampler.py:44-48, trainer.py:307)."""
    import re
    import sys
    import textwrap
    from pathlib import Path

    from diff_unet_tpu.parallel.launch import launch

    repo = str(Path(__file__).resolve().parent.parent)
    worker = tmp_path / "gather_worker.py"
    worker.write_text(textwrap.dedent(f"""
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=2")
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        import sys
        sys.path.insert(0, {repo!r})
        from diff_unet_tpu.parallel import (
            auto_initialize, gather_eval_rows, sequential_eval_shard)

        assert auto_initialize() is True
        pid = jax.process_index()
        # 3 items, 2 ranks: rank0 evaluates {{0,1}}, rank1 {{2}} + NaN pad
        num_items, per, c = 3, 2, 2
        shard = list(sequential_eval_shard(num_items))
        rows = np.full((per, c), np.nan)
        for j, item in enumerate(shard):
            rows[j] = [item * 10.0, item * 10.0 + 1.0]
        out = gather_eval_rows(rows, num_items)
        assert out.shape == (num_items, c), out.shape
        expect = np.asarray([[0.0, 1.0], [10.0, 11.0], [20.0, 21.0]])
        np.testing.assert_allclose(out, expect)
        print("GATHER_OK", pid)
    """))

    results = launch([sys.executable, str(worker)], nprocs=2, timeout=240)
    for r in results:
        assert "GATHER_OK" in r.stdout, r.stdout + r.stderr
