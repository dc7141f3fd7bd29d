"""Data pipeline tests: label parsing, caching, mosaic/cutmix, augment geometry,
padded collate, loader, weather tool."""

import os

import numpy as np
import pytest

import cv2

from yololite_tpu.data import YoloDataset, DataLoader, parse_yolo_label_file
from yololite_tpu.data.augment import (TrainTransform, ValTransform, hflip,
                                       vflip, random_affine)
from yololite_tpu.data.weather import augment_yolo, apply_weather, EFFECTS


@pytest.fixture(scope="module")
def ds_root(tmp_path_factory):
    from tests.test_train_e2e import make_toy_dataset
    root = str(tmp_path_factory.mktemp("ds"))
    make_toy_dataset(root, n_train=8, n_val=4, img=80)
    return root


def test_parse_yolo_label_file(tmp_path):
    p = tmp_path / "a.txt"
    p.write_text("0 0.5 0.5 0.2 0.4\n1 0.1 0.2 0.05 0.05\n")
    arr = parse_yolo_label_file(str(p))
    assert arr.shape == (2, 5)
    np.testing.assert_allclose(arr[0], [0, 0.5, 0.5, 0.2, 0.4])


def test_parse_polygon_collapses_to_bbox(tmp_path):
    p = tmp_path / "b.txt"
    # triangle polygon: (0.1,0.1), (0.5,0.1), (0.3,0.6)
    p.write_text("2 0.1 0.1 0.5 0.1 0.3 0.6\n")
    arr = parse_yolo_label_file(str(p))
    assert arr.shape == (1, 5)
    cls, xc, yc, w, h = arr[0]
    assert cls == 2
    np.testing.assert_allclose([xc, yc, w, h], [0.3, 0.35, 0.4, 0.5], atol=1e-6)


def test_dataset_padded_fixed_shapes(ds_root):
    ds = YoloDataset(os.path.join(ds_root, "train", "images"),
                     os.path.join(ds_root, "train", "labels"),
                     img_size=64, is_train=False, augment=False, max_boxes=13)
    s = ds.get(0, np.random.RandomState(0))
    assert s["image"].shape == (64, 64, 3) and s["image"].dtype == np.uint8
    assert s["boxes"].shape == (13, 4)
    assert s["labels"].shape == (13,)
    assert s["mask"].shape == (13,)
    assert s["mask"].sum() >= 1  # toy images always have GTs


def test_flip_box_geometry():
    img = np.zeros((40, 60, 3), np.uint8)
    boxes = np.array([[10.0, 5.0, 30.0, 25.0]])
    _, fb = hflip(img, boxes)
    np.testing.assert_allclose(fb, [[30, 5, 50, 25]])
    _, fb = vflip(img, boxes)
    np.testing.assert_allclose(fb, [[10, 15, 30, 35]])


def test_affine_keeps_center_box_visible():
    rng = np.random.RandomState(0)
    img = np.full((100, 100, 3), 200, np.uint8)
    boxes = np.array([[40.0, 40.0, 60.0, 60.0]])
    for _ in range(10):
        _, tb = random_affine(img, boxes, rng)
        # center box stays roughly in frame under rot20/shear10/scale1.15/t10%
        assert tb[0, 2] > tb[0, 0] and tb[0, 3] > tb[0, 1]
        assert tb[0, 0] > -60 and tb[0, 2] < 160


def test_train_transform_output(ds_root):
    tt = TrainTransform(96)
    img = (np.random.RandomState(0).rand(120, 200, 3) * 255).astype(np.uint8)
    boxes = np.array([[20.0, 20.0, 120.0, 100.0]])
    labels = np.array([0])
    rng = np.random.RandomState(1)
    canvas, b, l = tt(img, boxes, labels, rng)
    assert canvas.shape == (96, 96, 3) and canvas.dtype == np.uint8
    if len(b):
        assert b.min() >= 0 and b.max() <= 96


def test_mosaic_geometry(ds_root):
    ds = YoloDataset(os.path.join(ds_root, "train", "images"),
                     os.path.join(ds_root, "train", "labels"),
                     img_size=64, is_train=True, augment=True)
    img, boxes, labels = ds.mosaic(0, np.random.RandomState(0))
    assert img.shape == (128, 128, 3)
    assert len(boxes) >= 1
    assert boxes[:, 2].max() <= 128 + 1e-3
    assert len(boxes) == len(labels)


def test_cutmix_adds_box(ds_root):
    ds = YoloDataset(os.path.join(ds_root, "train", "images"),
                     os.path.join(ds_root, "train", "labels"),
                     img_size=64, is_train=True, augment=True)
    img = ds.load_image(0)
    boxes, labels = ds.load_label_processed(0, *img.shape[:2])
    n0 = len(boxes)
    img2, b2, l2 = ds.cutmix_focus_small(img, boxes, labels, 1,
                                         np.random.RandomState(0))
    assert len(b2) in (n0, n0 + 1)  # +1 unless patch didn't fit


def test_loader_batches_and_padding(ds_root):
    ds = YoloDataset(os.path.join(ds_root, "valid", "images"),
                     os.path.join(ds_root, "valid", "labels"),
                     img_size=64, is_train=False, augment=False)
    dl = DataLoader(ds, batch_size=3, shuffle=False, drop_last=False)
    batches = list(dl)
    assert len(batches) == 2  # 4 imgs -> 3 + 1(padded)
    assert batches[0]["image"].shape == (3, 64, 64, 3)
    assert batches[1]["nvalid"] == 1
    assert batches[1]["image"].shape == (3, 64, 64, 3)  # padded to full batch


def test_aug_taper_controls():
    from tests.test_train_e2e import make_toy_dataset
    import tempfile
    with tempfile.TemporaryDirectory() as root:
        make_toy_dataset(root, n_train=4, n_val=2, img=64)
        ds = YoloDataset(os.path.join(root, "train", "images"),
                         os.path.join(root, "train", "labels"),
                         img_size=64, is_train=True, augment=True)
        assert ds.mosaic_p > 0
        ds.set_mosaic_cutmix(0.0, 0.0)
        assert ds.mosaic_p == 0.0
        ds.set_augment(False)
        from yololite_tpu.data.augment import ValTransform
        assert isinstance(ds.transform, ValTransform)


def test_weather_tool(ds_root, tmp_path):
    out = str(tmp_path / "weather")
    n = augment_yolo(os.path.join(ds_root, "train", "images"),
                     os.path.join(ds_root, "train", "labels"),
                     out, effects=["fog", "rain"], per_image=1, seed=0)
    assert n == 8
    imgs = os.listdir(os.path.join(out, "images"))
    lbls = os.listdir(os.path.join(out, "labels"))
    assert len(imgs) == 8 and len(lbls) == 8


def test_weather_effects_change_pixels():
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    for eff in EFFECTS:
        out = apply_weather(img.copy(), eff, np.random.RandomState(1))
        assert out.shape == img.shape and out.dtype == np.uint8
        assert not np.array_equal(out, img), eff


def test_loader_num_workers_threads(ds_root):
    ds = YoloDataset(os.path.join(ds_root, "valid", "images"),
                     os.path.join(ds_root, "valid", "labels"),
                     img_size=64, is_train=False, augment=False)
    dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                    num_workers=3)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 64, 64, 3)
    # deterministic image content for the val transform regardless of threads
    dl0 = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    b0 = next(iter(dl0))
    np.testing.assert_array_equal(batches[0]["image"], b0["image"])

def test_strong_transform_output(ds_root):
    """StrongTrainTransform (reference get_strong_transform parity,
    augment.py:103-152): letterboxed canvas, boxes valid and clipped."""
    from yololite_tpu.data.augment import StrongTrainTransform
    rng = np.random.RandomState(0)
    t = StrongTrainTransform(img_size=128)
    hit = 0
    for seed in range(8):
        rng = np.random.RandomState(seed)
        img = (np.random.RandomState(1).rand(96, 80, 3) * 255).astype(np.uint8)
        boxes = np.array([[10, 12, 60, 70], [30, 30, 72, 78]], np.float32)
        labels = np.array([0, 1], np.int64)
        canvas, b, l = t(img, boxes, labels, rng)
        assert canvas.shape == (128, 128, 3) and canvas.dtype == np.uint8
        assert len(b) == len(l)
        if len(b):
            assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
            assert b.min() >= 0 and b.max() <= 128
            hit += 1
    assert hit >= 6  # strong augs may drop boxes occasionally, not always


def test_elastic_and_coarse_dropout_units():
    from yololite_tpu.data.augment import coarse_dropout, elastic_transform
    rng = np.random.RandomState(0)
    img = np.full((64, 64, 3), 200, np.uint8)
    out = coarse_dropout(img, rng)
    assert (out == 0).any() and (img == 200).all()  # holes added, input untouched
    rng = np.random.RandomState(1)
    boxes = np.array([[8, 8, 40, 40]], np.float32)
    img2, b2 = elastic_transform(img, boxes, rng, alpha=1.0, sigma=50.0)
    assert img2.shape == img.shape
    # alpha=1 displacement is sub-pixel scale: boxes barely move
    assert np.abs(b2 - boxes).max() < 2.0


def test_dataset_strong_preset(ds_root):
    from yololite_tpu.data import YoloDataset
    from yololite_tpu.data.augment import StrongTrainTransform
    ds = YoloDataset(os.path.join(ds_root, "train", "images"),
                     os.path.join(ds_root, "train", "labels"),
                     img_size=96, is_train=True, augment=True,
                     aug_preset="strong")
    assert isinstance(ds.transform, StrongTrainTransform)
    s = ds.get(0, np.random.RandomState(0))
    assert s["image"].shape == (96, 96, 3)
    # taper to no-aug flips back to ValTransform regardless of preset
    ds.set_augment(False)
    from yololite_tpu.data.augment import ValTransform
    assert isinstance(ds.transform, ValTransform)


def test_shard_striping_partitions_equally(ds_root):
    """Per-host stripes are EQUAL-LENGTH (DistributedSampler-style wrap-around
    padding), cover every file, and duplicate at most ceil overhead — unequal
    stripes would desync per-host steps_per_epoch and hang SPMD collectives."""
    img_dir = os.path.join(ds_root, "train", "images")
    lbl_dir = os.path.join(ds_root, "train", "labels")
    full = YoloDataset(img_dir, lbl_dir, img_size=96, is_train=True,
                       augment=False)
    shards = [YoloDataset(img_dir, lbl_dir, img_size=96, is_train=True,
                          augment=False, shard_index=i, shard_count=3)
              for i in range(3)]
    # every host sees exactly ceil(8/3)=3 files
    assert [len(s.img_files) for s in shards] == [3, 3, 3]
    union = sorted(set(sum((s.img_files for s in shards), [])))
    assert union == sorted(full.img_files)     # full cover
    # exactly (3*3 - 8) = 1 wrap-around duplicate
    assert len(sum((s.img_files for s in shards), [])) - len(union) == 1
    # label cache aligns with the stripe, not the full list
    for s in shards:
        assert len(s.labels_cache) == len(s.img_files)
    with pytest.raises(ValueError):
        YoloDataset(img_dir, lbl_dir, shard_index=3, shard_count=3)
    # degenerate: fewer files than shards still yields equal stripes
    tiny = [YoloDataset(img_dir, lbl_dir, img_size=96, is_train=True,
                        augment=False, shard_index=i, shard_count=16)
            for i in (0, 15)]
    assert len(tiny[0].img_files) == len(tiny[1].img_files) == 1


def test_lru_image_cache_budget_and_correctness(ds_root):
    img_dir = os.path.join(ds_root, "train", "images")
    lbl_dir = os.path.join(ds_root, "train", "labels")
    ds_ref = YoloDataset(img_dir, lbl_dir, img_size=96, is_train=False,
                         augment=False)
    one = ds_ref.load_image(0)
    # budget for ~3 decoded images -> dataset of 8 must evict but stay correct
    budget_mb = 3 * one.nbytes / 2**20
    ds = YoloDataset(img_dir, lbl_dir, img_size=96, is_train=False,
                     augment=False, cache_budget_mb=budget_mb)
    assert ds.lru_cache is not None and ds.image_cache is None
    for _ in range(2):  # two epochs
        for i in range(len(ds)):
            np.testing.assert_array_equal(ds.load_image(i), ds_ref.load_image(i))
            assert ds.lru_cache.nbytes <= budget_mb * 2**20
    # sequential scans with capacity < len(ds) always miss (LRU worst case)
    assert ds.lru_cache.misses > len(ds)
    # but temporal locality hits: the most recent index is still cached
    h0 = ds.lru_cache.hits
    ds.load_image(len(ds) - 1)
    assert ds.lru_cache.hits == h0 + 1


def test_lru_cache_rejects_oversized_single_image():
    from yololite_tpu.data.dataset import _LRUImageCache
    c = _LRUImageCache(budget_bytes=100)
    big = np.zeros((10, 10, 3), np.uint8)  # 300 B > budget
    c.put(0, big)
    assert c.get(0) is None and c.nbytes == 0


def test_sharded_loader_yields_only_stripe(ds_root):
    img_dir = os.path.join(ds_root, "train", "images")
    lbl_dir = os.path.join(ds_root, "train", "labels")
    ds = YoloDataset(img_dir, lbl_dir, img_size=96, is_train=True,
                     augment=False, shard_index=1, shard_count=2)
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=False,
                        seed=0, num_workers=0)
    n = sum(b["image"].shape[0] for b in loader)
    assert n == len(ds) and len(ds) == 4  # half of the 8 train images
