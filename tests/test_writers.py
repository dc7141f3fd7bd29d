"""MetricWriters: tensorboard backend (no-op degradation covered too)."""

import glob
import os


def test_tensorboard_writer_writes_events(tmp_path):
    from yololite_tpu.train.writers import MetricWriters
    w = MetricWriters(str(tmp_path), {"tensorboard": True})
    w.write(1, {"train/loss": 1.5, "val/loss": float("nan"), "skip": None})
    w.close()
    if w._tb is not None:  # tensorflow present in this image
        assert glob.glob(os.path.join(str(tmp_path), "tb", "events.*"))


def test_writers_disabled_by_default(tmp_path):
    from yololite_tpu.train.writers import MetricWriters
    w = MetricWriters(str(tmp_path), {})
    w.write(1, {"a": 1.0})
    w.close()
    assert not os.path.exists(os.path.join(str(tmp_path), "tb"))
