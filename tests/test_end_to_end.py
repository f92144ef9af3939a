"""End-to-end: synthetic dataset -> Trainer (train+val+ckpt) -> resume -> Tester."""
import json
import os

import numpy as np
import pytest

from diff_unet_tpu.data.nifti import write_nifti


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = root / "data"
    data.mkdir()
    rng = np.random.RandomState(0)
    items = {"training": [], "validation": []}
    affine = np.diag([1.5, 1.5, 2.0, 1.0])
    for i in range(2):
        img = rng.randint(-175, 250, (24, 24, 24)).astype(np.int16)
        lab = np.zeros((24, 24, 24), np.int16)
        lab[6:14, 6:14, 6:14] = 1
        lab[14:20, 14:20, 14:20] = 2
        write_nifti(data / f"img_{i}.nii.gz", img, affine)
        write_nifti(data / f"lab_{i}.nii.gz", lab, affine)
        entry = {"image": f"img_{i}.nii.gz", "label": f"lab_{i}.nii.gz"}
        items["training"].append(entry)
        items["validation"].append(entry)
    with open(data / "dataset.json", "w") as f:
        json.dump(items, f)
    classes = root / "classes.yaml"
    classes.write_text("0: background\n1: organ_a\n2: organ_b\n")
    return root, data, classes


COMMON = dict(
    image_size=16, spatial_size=16, batch_size=2, sw_batch_size=2,
    overlap=0.25, timesteps=100, sample_steps=2,
    features=(4, 4, 8, 16, 32, 4), num_workers=2, use_amp=False,
)


def test_trainer_end_to_end(workspace, tmp_path, monkeypatch):
    root, data, classes = workspace
    monkeypatch.chdir(tmp_path)
    from diff_unet_tpu.engine.engine import Trainer

    trainer = Trainer(
        model_name="diff_unet", data_path=str(data), classes=str(classes),
        max_epochs=2, val_freq=2, save_freq=1, lr=1e-3,
        scheduler="warmup_cosine", warmup_epochs=1,
        log_dir="e2e", **COMMON,
    )
    assert trainer.num_classes == 2
    trainer.train()
    assert np.isfinite(trainer.loss)
    # periodic checkpoints saved every epoch
    assert (tmp_path / "logs/e2e/weights/epoch_1").exists()
    assert (tmp_path / "logs/e2e/weights/epoch_2").exists()
    assert trainer.global_step == 2 * len(trainer.dataloader["train"])

    # resume restores epoch/global_step and keeps training
    resumed = Trainer(
        model_name="diff_unet", data_path=str(data), classes=str(classes),
        max_epochs=3, val_freq=10, save_freq=10, lr=1e-3,
        scheduler="warmup_cosine", warmup_epochs=1,
        model_path=str(tmp_path / "logs/e2e/weights/epoch_2"),
        log_dir="e2e-resume", **COMMON,
    )
    assert resumed.start_epoch == 2
    resumed.train()  # runs epoch 2 only
    assert resumed.global_step > trainer.global_step


def test_tester_end_to_end(workspace, tmp_path, monkeypatch):
    root, data, classes = workspace
    monkeypatch.chdir(tmp_path)
    from diff_unet_tpu.engine.engine import Trainer, Tester

    trainer = Trainer(
        model_name="diff_unet", data_path=str(data), classes=str(classes),
        max_epochs=1, val_freq=10, save_freq=1, lr=1e-3,
        log_dir="t", **COMMON,
    )
    trainer.train()

    tester = Tester(
        model_name="diff_unet", data_path=str(data), classes=str(classes),
        model_path=str(tmp_path / "logs/t/weights/epoch_1"),
        log_dir="t", **COMMON,
    )
    results = tester.test()
    assert len(results["dices"]) == 2
    assert len(results["hd95s"]) == 2
    assert (tmp_path / "logs/t/results.pkl").exists()
    d = np.asarray(results["dices"])
    assert d.shape == (2, 2)
    assert np.all((d >= 0) & (d <= 1))
    # results.pkl carries the full volume set like the reference
    # (test.py:177-186), compactly: fp16 images, bool one-hot masks
    assert len(results["images"]) == 2
    assert results["images"][0].dtype == np.float16
    assert results["outputs"][0].dtype == np.bool_
    assert results["labels"][0].dtype == np.bool_
    assert results["outputs"][0].shape == results["labels"][0].shape

    # save_volumes=False keeps only the metric arrays
    tester_lite = Tester(
        model_name="diff_unet", data_path=str(data), classes=str(classes),
        model_path=str(tmp_path / "logs/t/weights/epoch_1"),
        log_dir="t-lite", save_volumes=False, **COMMON,
    )
    lite = tester_lite.test()
    assert lite["images"] == [] and lite["outputs"] == []
    assert len(lite["dices"]) == 2


def test_config_cli_parsing(tmp_path):
    from diff_unet_tpu.utils.config import load_config, parse_args
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("lr: 5e-4\nmodel_name: diff_unet\nscheduler: true\n")
    cfg = load_config(cfg_file, overrides=["lr=1e-3", "max_epochs=10"])
    assert cfg.lr == 1e-3
    assert cfg.max_epochs == 10
    assert cfg.model_name == "diff_unet"

    parsed = parse_args(["--config", str(cfg_file), "lr=2e-3"], quiet=True)
    assert parsed.lr == 2e-3


def test_repo_cfgs_parse():
    from diff_unet_tpu.utils.config import load_config
    base = os.path.join(os.path.dirname(__file__), "..")
    for ds in ("amos", "btcv", "msd"):
        for kind in ("train", "test"):
            cfg = load_config(os.path.join(base, f"cfg/{ds}/{kind}.yaml"))
            assert "model_name" in cfg
            assert cfg.image_size == 96


def test_non_diffusion_swin_unetr_trains(workspace, tmp_path, monkeypatch):
    """swin_unetr baseline (non-diffusion) through the same Trainer."""
    root, data, classes = workspace
    monkeypatch.chdir(tmp_path)
    from diff_unet_tpu.engine.engine import Trainer

    cfg = dict(COMMON)
    cfg.pop("features")
    cfg.update(image_size=32, spatial_size=32)
    trainer = Trainer(
        model_name="swin_unetr", data_path=str(data), classes=str(classes),
        max_epochs=1, val_freq=10, save_freq=10, lr=1e-3,
        feature_size=12, log_dir="swin-e2e", **cfg,
    )
    trainer.train()
    assert np.isfinite(trainer.loss)


def test_boundary_loss_training(workspace, tmp_path, monkeypatch):
    """boundary in the loss list: dist maps precomputed per batch."""
    root, data, classes = workspace
    monkeypatch.chdir(tmp_path)
    from diff_unet_tpu.engine.engine import Trainer

    trainer = Trainer(
        model_name="diff_unet", data_path=str(data), classes=str(classes),
        max_epochs=1, val_freq=10, save_freq=10, lr=1e-3,
        losses="mse,bce,dice,boundary", log_dir="bnd", **COMMON,
    )
    trainer.train()
    assert np.isfinite(trainer.loss)


def test_multi_device_eval_uses_sharded_inferer(workspace, tmp_path,
                                                monkeypatch):
    """Validation inference on a >1-device mesh goes through the
    window-sharded path and produces sane dice values."""
    root, data, classes = workspace
    monkeypatch.chdir(tmp_path)
    from diff_unet_tpu.engine.engine import Trainer

    trainer = Trainer(
        model_name="diff_unet", data_path=str(data), classes=str(classes),
        max_epochs=1, val_freq=1, save_freq=10, lr=1e-3,
        num_devices=2, log_dir="mdev", **COMMON,
    )
    trainer.train()  # runs validation on the 2-device mesh
    assert np.isfinite(trainer.best_mean_dice)


def test_label_smoothing_training(workspace, tmp_path, monkeypatch):
    """label_smoothing=True: smoothed float labels, bg channel stripped."""
    root, data, classes = workspace
    monkeypatch.chdir(tmp_path)
    from diff_unet_tpu.engine.engine import Trainer

    trainer = Trainer(
        model_name="diff_unet", data_path=str(data), classes=str(classes),
        max_epochs=1, val_freq=10, save_freq=10, lr=1e-3,
        label_smoothing=True, smoothing_alpha=0.2, log_dir="ls",
        **COMMON,
    )
    trainer.train()
    assert np.isfinite(trainer.loss)


def test_ema_accum_loss_aware_training(workspace, tmp_path, monkeypatch):
    """ema_rate / accum_steps / t_sampler are YAML-reachable Trainer keys
    (vendored TrainLoop parity, guided_diffusion/train_util.py:22-255)."""
    root, data, classes = workspace
    monkeypatch.chdir(tmp_path)
    import jax
    import numpy as np
    from diff_unet_tpu.engine.engine import Trainer

    trainer = Trainer(
        model_name="diff_unet", data_path=str(data), classes=str(classes),
        max_epochs=2, val_freq=10, save_freq=2, lr=1e-2,
        ema_rate=0.5, accum_steps=2, t_sampler="loss_aware",
        log_dir="ema", **COMMON,
    )
    p0 = jax.tree_util.tree_leaves(trainer.state.params)[0].copy()
    trainer.train()
    assert np.isfinite(trainer.loss)

    # EMA tracked and distinct from both init and current params
    leaves_p = jax.tree_util.tree_leaves(trainer.state.params)
    leaves_e = jax.tree_util.tree_leaves(trainer.state.ema_params)
    moved = any(
        not np.allclose(np.asarray(p), np.asarray(e))
        for p, e in zip(leaves_p, leaves_e)
    )
    assert moved, "EMA should lag the raw params"

    # loss-aware sampler state recorded losses
    assert int(np.sum(np.asarray(trainer.state.sampler_state.counts))) > 0

    # gradient accumulation: params update only every accum_steps steps;
    # with 2 epochs x 1 batch = 2 steps and accum_steps=2 exactly one
    # optimizer update happened (optax.MultiSteps mini_step wraps around)
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0]),
        np.asarray(p0),
    )

    # the extended state round-trips through checkpointing
    resumed = Trainer(
        model_name="diff_unet", data_path=str(data), classes=str(classes),
        max_epochs=3, val_freq=10, save_freq=10, lr=1e-2,
        ema_rate=0.5, accum_steps=2, t_sampler="loss_aware",
        model_path=str(tmp_path / "logs/ema/weights/epoch_2"),
        log_dir="ema-resume", **COMMON,
    )
    assert resumed.start_epoch == 2
    assert resumed.state.ema_params is not None
    resumed.train()
    assert np.isfinite(resumed.loss)


def test_accum_steps_defers_updates(workspace, tmp_path, monkeypatch):
    """With accum_steps=k, parameters change only on every k-th step."""
    root, data, classes = workspace
    monkeypatch.chdir(tmp_path)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from diff_unet_tpu.engine.engine import Trainer
    from diff_unet_tpu.parallel import shard_batch

    trainer = Trainer(
        model_name="diff_unet", data_path=str(data), classes=str(classes),
        max_epochs=1, val_freq=10, save_freq=10, lr=1e-2,
        accum_steps=3, log_dir="accum", **COMMON,
    )
    batch = next(iter(trainer.dataloader["train"]))
    labels = np.asarray(
        trainer.convert_labels(jnp.asarray(batch["label"])))
    device_batch = shard_batch(
        {"image": batch["image"], "label": labels}, trainer.mesh)

    def leaf(state):
        return np.asarray(jax.tree_util.tree_leaves(state.params)[0])

    p0 = leaf(trainer.state)
    with trainer.mesh:
        state1, _ = trainer._train_step(
            trainer.state, device_batch, trainer._rng)
        p1 = leaf(state1)
        state2, _ = trainer._train_step(state1, device_batch, trainer._rng)
        p2 = leaf(state2)
        state3, _ = trainer._train_step(state2, device_batch, trainer._rng)
        p3 = leaf(state3)
    np.testing.assert_array_equal(p0, p1)   # mini-step 1: no update
    np.testing.assert_array_equal(p1, p2)   # mini-step 2: no update
    assert not np.allclose(p2, p3)          # step 3: apply accumulated


def test_include_background_training(workspace, tmp_path, monkeypatch):
    root, data, classes = workspace
    monkeypatch.chdir(tmp_path)
    from diff_unet_tpu.engine.engine import Trainer

    trainer = Trainer(
        model_name="diff_unet", data_path=str(data), classes=str(classes),
        max_epochs=1, val_freq=1, save_freq=10, lr=1e-3,
        include_background=True, log_dir="bg", **COMMON,
    )
    assert trainer.num_classes == 3  # background included
    trainer.train()
    assert np.isfinite(trainer.loss)


def test_predict_single_volume(workspace, tmp_path, monkeypatch):
    """predict.py surface: datalist-free Predictor engine + one NIfTI in,
    labelmap NIfTI out (serving-shaped entry; no reference analogue)."""
    root, data, classes = workspace
    monkeypatch.chdir(tmp_path)
    from predict import predict_volume
    from diff_unet_tpu.data.nifti import read_nifti
    from diff_unet_tpu.engine.engine import Predictor

    engine = Predictor(classes=str(classes), **COMMON)
    out_path = tmp_path / "seg.nii.gz"
    labels = predict_volume(engine, data / "img_0.nii.gz", out_path)
    assert labels.dtype == np.int16
    assert out_path.exists()
    img = read_nifti(out_path)
    assert img.data.shape == labels.shape
    assert set(np.unique(labels)) <= {0, 1, 2}


def test_int8_serving_dice_matches_bf16(workspace, tmp_path, monkeypatch):
    """Train -> eval dice delta between bf16 and full-depth W8A8 int8
    serving (quantize + calibrated act scales) on a multi-organ synthetic
    task — the end-to-end accuracy evidence behind the int8 speedups
    (reference inference contract: engine.py:167-182)."""
    root, data, classes = workspace
    monkeypatch.chdir(tmp_path)
    from diff_unet_tpu.engine.engine import Trainer, Tester

    trainer = Trainer(
        model_name="diff_unet", data_path=str(data), classes=str(classes),
        max_epochs=250, val_freq=1000, save_freq=250, lr=3e-3,
        log_dir="q", **COMMON,
    )
    trainer.train()

    def run(name, **kw):
        t = Tester(
            model_name="diff_unet", data_path=str(data),
            classes=str(classes),
            model_path=str(tmp_path / "logs/q/weights/epoch_250"),
            log_dir=name, save_volumes=False, **kw, **COMMON,
        )
        return np.asarray(t.test()["dices"])

    d_bf16 = run("q-bf16")
    d_int8 = run("q-int8", quantize=True, quant_calibrate=1)
    # the comparison is over real (trained) predictions, not noise
    assert d_bf16.mean() > 0.5, d_bf16
    delta = np.abs(d_int8 - d_bf16).max()
    assert delta < 0.02, (delta, d_bf16, d_int8)


def test_predict_many_continuous(workspace, tmp_path, monkeypatch):
    """Multi-input predict.py surface: several NIfTIs served through
    cross-volume continuous window batching; per-volume outputs equal the
    single-volume serving path (noise keyed on window starts)."""
    root, data, classes = workspace
    monkeypatch.chdir(tmp_path)
    from predict import predict_many, predict_volume
    from diff_unet_tpu.data.nifti import read_nifti
    from diff_unet_tpu.engine.engine import Predictor

    engine = Predictor(classes=str(classes), **COMMON)
    paths = [data / "img_0.nii.gz", data / "img_1.nii.gz"]
    outs = [str(tmp_path / "seg_0.nii.gz"), str(tmp_path / "seg_1.nii.gz")]
    many = predict_many(engine, paths, outs)
    for p, out_path, labels in zip(paths, outs, many):
        assert labels.dtype == np.int16
        img = read_nifti(out_path)
        assert img.data.shape == labels.shape
        single = predict_volume(engine, p)
        np.testing.assert_array_equal(labels, single)
