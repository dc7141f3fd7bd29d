"""Backbone classification pretraining + pretrained_backbone init path."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.slow

import cv2  # noqa: E402

from tests.test_train_e2e import make_toy_dataset, _toy_config  # noqa: E402


def make_imagefolder(root, n_per_class=12, img=64, seed=0):
    rng = np.random.RandomState(seed)
    for split in ("train", "val"):
        for ci, cname in enumerate(("red", "green")):
            d = os.path.join(root, split, cname)
            os.makedirs(d, exist_ok=True)
            n = n_per_class if split == "train" else 4
            for i in range(n):
                canvas = (rng.rand(img, img, 3) * 40).astype(np.uint8)
                color = (220, 30, 30) if ci == 0 else (30, 220, 30)
                canvas[16:48, 16:48] = color
                cv2.imwrite(os.path.join(d, f"{i:03d}.jpg"),
                            cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
    return root


def test_pretrain_then_detector_init(tmp_path):
    from pretrain_backbone import pretrain
    from yololite_tpu.train.checkpoint import load_checkpoint
    from yololite_tpu.train.loop import train_from_config

    data = make_imagefolder(str(tmp_path / "clf"))
    out = str(tmp_path / "bb.ckpt")
    pretrain(data, "mobilenetv4_conv_small_050", out, epochs=2, batch_size=8,
             img_size=64, lr=1e-3, warmup_epochs=0, log_every=1)

    sd, meta = load_checkpoint(out)
    assert meta["backbone"] == "mobilenetv4_conv_small_050"
    assert "ConvBNAct_0" in sd["params"]

    # the detection train loop consumes it via model.pretrained_backbone
    det_data = make_toy_dataset(str(tmp_path / "det"))
    cfg = _toy_config(det_data, str(tmp_path / "run"), epochs=1)
    cfg["model"]["pretrained_backbone"] = out
    results = train_from_config(cfg)
    assert "coco" in results


def test_pretrained_backbone_name_mismatch_raises(tmp_path):
    from yololite_tpu.train.checkpoint import save_checkpoint
    from yololite_tpu.train.loop import train_from_config

    save_checkpoint(str(tmp_path / "bad.ckpt"), {"x": np.zeros(1)},
                    {"x": np.zeros(1)}, {"backbone": "resnet18"})
    det_data = make_toy_dataset(str(tmp_path / "det"))
    cfg = _toy_config(det_data, str(tmp_path / "run"), epochs=1)
    cfg["model"]["pretrained_backbone"] = str(tmp_path / "bad.ckpt")
    with pytest.raises(ValueError, match="pretrained_backbone"):
        train_from_config(cfg)
