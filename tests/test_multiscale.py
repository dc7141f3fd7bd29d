"""Multi-scale training: loss/steps handle multiple input sizes (one cached
graph per size) — the reference's declared-but-unimplemented multi_scale_sizes."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_multiscale_training(tmp_path, tmp_path_factory):
    from tests.test_train_e2e import make_toy_dataset, _toy_config
    from yololite_tpu.train.loop import train_from_config
    from yololite_tpu.eval.plots import read_metrics_csv

    root = str(tmp_path_factory.mktemp("msds"))
    data_yaml = make_toy_dataset(root, n_train=8, n_val=4, img=96)
    run_dir = str(tmp_path / "run")
    cfg = _toy_config(data_yaml, run_dir, epochs=2, img_size=96)
    cfg["training"]["multi_scale_sizes"] = [64, 96]
    cfg["training"]["seed"] = 1  # seeds the per-epoch size pick
    train_from_config(cfg)
    data = read_metrics_csv(os.path.join(run_dir, "metrics.csv"))
    assert len(data["epoch"]) == 2
    assert np.isfinite(data["train_loss"]).all()


def test_dataset_set_img_size():
    import tempfile
    from tests.test_train_e2e import make_toy_dataset
    from yololite_tpu.data import YoloDataset
    with tempfile.TemporaryDirectory() as root:
        make_toy_dataset(root, n_train=2, n_val=2, img=80)
        ds = YoloDataset(os.path.join(root, "train", "images"),
                         os.path.join(root, "train", "labels"),
                         img_size=96, is_train=True, augment=True)
        s = ds.get(0, np.random.RandomState(0))
        assert s["image"].shape == (96, 96, 3)
        ds.set_img_size(64)
        s = ds.get(0, np.random.RandomState(0))
        assert s["image"].shape == (64, 64, 3)
        assert s["boxes"].max() <= 64
