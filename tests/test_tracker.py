"""SORT/Kalman tracker tests: ID persistence, lifecycle, class gating, motion."""

import numpy as np

from yololite_tpu.track import KalmanSortTracker, xyxy_to_cxsysr, cxsysr_to_xyxy


def test_measurement_roundtrip():
    box = np.array([10.0, 20.0, 50.0, 100.0])
    z = xyxy_to_cxsysr(box)
    back = cxsysr_to_xyxy(z)
    np.testing.assert_allclose(back, box, atol=1e-3)


def test_id_persistence_and_min_hits():
    tr = KalmanSortTracker(min_hits=2, max_age=3)
    b = np.array([[10, 10, 50, 50]], np.float32)
    out1 = tr.update(b, [0.9], [0])
    assert out1 == []  # hits=1 < min_hits
    out2 = tr.update(b + 2.0, [0.9], [0])
    assert len(out2) == 1
    tid = out2[0]["track_id"]
    out3 = tr.update(b + 4.0, [0.9], [0])
    assert out3[0]["track_id"] == tid  # same identity across frames


def test_track_dies_after_max_age():
    tr = KalmanSortTracker(min_hits=1, max_age=2)
    b = np.array([[10, 10, 50, 50]], np.float32)
    tr.update(b, [0.9], [0])
    for _ in range(3):
        tr.update(np.zeros((0, 4)), [], [])
    assert len(tr) == 0


def test_class_gating_spawns_new_track():
    tr = KalmanSortTracker(min_hits=1, match_by_class=True)
    b = np.array([[10, 10, 50, 50]], np.float32)
    o1 = tr.update(b, [0.9], [0])
    o2 = tr.update(b, [0.9], [1])  # same box, different class
    assert o2[0]["track_id"] != o1[0]["track_id"]
    assert len(tr) == 2


def test_motion_prediction_tracks_moving_object():
    tr = KalmanSortTracker(min_hits=1, iou_threshold=0.2)
    tid = None
    for t in range(8):
        x = 10 + 8 * t
        b = np.array([[x, 10, x + 40, 50]], np.float32)
        out = tr.update(b, [0.9], [0])
        assert len(out) == 1
        if tid is None:
            tid = out[0]["track_id"]
        assert out[0]["track_id"] == tid  # constant-velocity KF keeps the lock
    assert len(tr) == 1


def test_two_objects_stay_separate():
    tr = KalmanSortTracker(min_hits=1)
    a = np.array([10, 10, 50, 50], np.float32)
    b = np.array([200, 200, 260, 280], np.float32)
    out = tr.update(np.stack([a, b]), [0.9, 0.8], [0, 0])
    ids0 = sorted(t["track_id"] for t in out)
    for t in range(5):
        out = tr.update(np.stack([a + t, b - t]), [0.9, 0.8], [0, 0])
        assert sorted(x["track_id"] for x in out) == ids0
