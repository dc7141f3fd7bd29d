"""Instance segmentation tests: mask ops, seg heads, seg dataset, e2e training."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import cv2
import yaml


def test_crop_mask_to_box():
    from yololite_tpu.ops.masks import crop_mask_to_box
    masks = jnp.ones((2, 8, 8))
    boxes = jnp.asarray([[0.0, 0.0, 32.0, 32.0],      # top-left quadrant of 64px
                         [32.0, 32.0, 64.0, 64.0]])
    out = np.asarray(crop_mask_to_box(masks, boxes, 64.0))
    assert out[0, :4, :4].min() == 1 and out[0, 4:, :].max() == 0
    assert out[1, 4:, 4:].min() == 1 and out[1, :4, :].max() == 0


def test_assemble_masks_matmul():
    from yololite_tpu.ops.masks import assemble_masks
    protos = jnp.zeros((8, 8, 2)).at[:, :, 0].set(10.0).at[:, :4, 1].set(-20.0)
    coeffs = jnp.asarray([[1.0, 0.0], [1.0, 1.0]])
    boxes = jnp.asarray([[0.0, 0.0, 64.0, 64.0]] * 2)
    m = np.asarray(assemble_masks(protos, coeffs, boxes, 64.0))
    assert m[0].min() > 0.99                     # sigmoid(10) everywhere
    assert m[1][:, :4].max() < 0.01              # suppressed left half
    assert m[1][:, 4:].min() > 0.99


def test_seg_model_shapes():
    from yololite_tpu.models import YOLOLiteMS, init_model
    m = YOLOLiteMS(backbone="mobilenetv4_conv_small_050", num_classes=2,
                   fpn_channels=32, cpu_variant=True, with_masks=True,
                   num_prototypes=8)
    params, bstats = init_model(m, 64)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    outs, protos = m.apply({"params": params, "batch_stats": bstats}, x,
                           train=False)
    assert outs[0].shape[-1] == 5 + 2 + 8
    assert protos.shape == (1, 16, 16, 8)        # stride 4


def make_seg_dataset(root, n_train=12, n_val=6, img=96, seed=0):
    """Toy seg data: filled triangles/rectangles with polygon labels."""
    rng = np.random.RandomState(seed)
    for split, n in (("train", n_train), ("valid", n_val)):
        idir = os.path.join(root, split, "images")
        ldir = os.path.join(root, split, "labels")
        os.makedirs(idir, exist_ok=True)
        os.makedirs(ldir, exist_ok=True)
        for i in range(n):
            canvas = (rng.rand(img, img, 3) * 40).astype(np.uint8)
            cls = rng.randint(0, 2)
            w = rng.randint(24, 48)
            h = rng.randint(24, 48)
            x1 = rng.randint(0, img - w)
            y1 = rng.randint(0, img - h)
            if cls == 0:   # red rectangle
                canvas[y1:y1 + h, x1:x1 + w] = (220, 30, 30)
                poly = [(x1, y1), (x1 + w, y1), (x1 + w, y1 + h), (x1, y1 + h)]
            else:          # green triangle
                poly = [(x1, y1 + h), (x1 + w, y1 + h), (x1 + w // 2, y1)]
                cv2.fillPoly(canvas, [np.asarray(poly, np.int32)], (30, 220, 30))
            coords = " ".join(f"{px / img:.6f} {py / img:.6f}" for px, py in poly)
            cv2.imwrite(os.path.join(idir, f"{i:04d}.jpg"),
                        cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
            with open(os.path.join(ldir, f"{i:04d}.txt"), "w") as f:
                f.write(f"{cls} {coords}\n")
    data_yaml = os.path.join(root, "data.yaml")
    with open(data_yaml, "w") as f:
        yaml.safe_dump({"train": f"{root}/train/images",
                        "val": f"{root}/valid/images",
                        "nc": 2, "names": ["rect", "tri"]}, f)
    return data_yaml


@pytest.fixture(scope="module")
def seg_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("segds"))
    return make_seg_dataset(root), root


def test_seg_dataset_masks(seg_data):
    from yololite_tpu.data import YoloDataset
    data_yaml, root = seg_data
    ds = YoloDataset(os.path.join(root, "train", "images"),
                     os.path.join(root, "train", "labels"),
                     img_size=96, is_train=False, augment=False,
                     max_boxes=8, task="segment")
    s = ds.get(0, np.random.RandomState(0))
    # masks ship host-bitpacked along W (1 bit/px H2D); unpack to verify
    assert s["masks_packed"].shape == (8, 24, 3)
    masks = np.unpackbits(s["masks_packed"], axis=-1, count=24)
    assert masks.shape == (8, 24, 24)
    n = int(s["mask"].sum())
    assert n >= 1
    # mask pixels fall inside the GT box (at proto res)
    for j in range(n):
        ys, xs = np.nonzero(masks[j])
        if len(xs):
            x1, y1, x2, y2 = s["boxes"][j] * (24 / 96.0)
            assert xs.min() >= int(x1) - 1 and xs.max() <= int(np.ceil(x2)) + 1
            assert ys.min() >= int(y1) - 1 and ys.max() <= int(np.ceil(y2)) + 1


@pytest.mark.slow
def test_seg_training_and_predict(seg_data, tmp_path):
    from yololite_tpu.train.loop import train_from_config
    from yololite_tpu.config import load_configs
    from yololite_tpu.eval.plots import read_metrics_csv

    data_yaml, root = seg_data
    run_dir = str(tmp_path / "segrun")
    cfg = load_configs(None, None, data_yaml, make_run_dir=False)
    cfg["model"] = {"arch": "YOLOLiteMS_CPU", "backbone": "mobilenetv4_conv_small_050",
                    "fpn_channels": 48, "width_multiple": 1.0, "depth_multiple": 0.5,
                    "head_depth": 1, "num_classes": 2, "num_anchors_per_level": 1,
                    "with_masks": True, "num_prototypes": 8}
    cfg["training"].update({
        "epochs": 2, "batch_size": 4, "img_size": 96, "lr": 3e-3,
        "optimizer": "adamw", "scheduler": "cosine", "ema": True,
        "ema_decay": 0.9, "amp": False, "augment": False, "seed": 0,
        "save_every": 100, "save_by": "AP50", "max_boxes": 8,
    })
    cfg["loss"] = {"topk_limit": 10, "area_cells_min": 0.0, "area_cells_max": 256,
                   "area_tol": 1.75, "lambda_mask": 6.125}
    cfg["logging"] = {"log_dir": run_dir}
    train_from_config(cfg)

    data = read_metrics_csv(os.path.join(run_dir, "metrics.csv"))
    assert len(data["epoch"]) == 2
    assert np.isfinite(data["train_loss"]).all()

    # predict returns masks in original image space
    from yololite_tpu import YoloLite
    ckpt = os.path.join(run_dir, "weights", "last_model_state.ckpt")
    model = YoloLite(ckpt)
    img_dir = os.path.join(root, "valid", "images")
    first = sorted(os.listdir(img_dir))[0]
    r = model.predict(os.path.join(img_dir, first), conf=0.01)[0]
    if len(r["boxes"]):
        assert r["masks"] is not None
        assert r["masks"].shape[1:] == (96, 96)
        assert r["masks"].dtype == np.uint8


def test_rle_roundtrip_and_area():
    from yololite_tpu.ops.masks import rle_area, rle_decode_np, rle_encode_np
    rng = np.random.RandomState(3)
    for _ in range(5):
        m = rng.rand(37, 53) > 0.6
        rle = rle_encode_np(m)
        assert rle["size"] == [37, 53]
        back = rle_decode_np(rle)
        assert np.array_equal(back.astype(bool), m)
        assert rle_area(rle) == int(m.sum())
    # all-zero and all-one edge cases
    for m in (np.zeros((5, 4), bool), np.ones((5, 4), bool)):
        assert np.array_equal(rle_decode_np(rle_encode_np(m)).astype(bool), m)


def test_seg_dataset_full_res_rles(seg_data):
    from yololite_tpu.data import YoloDataset
    from yololite_tpu.ops.masks import rle_area, rle_decode_np
    data_yaml, root = seg_data
    ds = YoloDataset(os.path.join(root, "train", "images"),
                     os.path.join(root, "train", "labels"),
                     img_size=96, is_train=False, augment=False,
                     max_boxes=8, task="segment")
    s = ds.get(0, np.random.RandomState(0))
    n = int(s["mask"].sum())
    assert len(s["gt_rles"]) == n
    for j in range(n):
        rle = s["gt_rles"][j]
        assert rle["size"] == [96, 96]            # image res, not proto res
        full = rle_decode_np(rle)
        # full-res mask pixels fall inside the GT box (tol 1px)
        ys, xs = np.nonzero(full)
        x1, y1, x2, y2 = s["boxes"][j]
        assert xs.min() >= int(x1) - 1 and xs.max() <= int(np.ceil(x2)) + 1
        assert ys.min() >= int(y1) - 1 and ys.max() <= int(np.ceil(y2)) + 1
        # area consistent with the proto-res mask scaled up (coarse check)
        proto_area = (np.unpackbits(s["masks_packed"][j], axis=-1,
                                    count=24).sum() * (96 / 24.0) ** 2)
        assert abs(rle_area(rle) - proto_area) / max(proto_area, 1) < 0.35


def test_segm_eval_full_res_rle():
    """Segm COCOeval on image-resolution RLE masks: perfect dets -> AP 1,
    half-overlapping dets land between 0 and 1, and full-res is what's
    measured (a det at the GT's box but wrong shape scores lower)."""
    from yololite_tpu.eval.coco import COCOEvaluator
    from yololite_tpu.ops.masks import rle_encode_np

    H = W = 96
    def circle(cx, cy, r):
        yy, xx = np.mgrid[:H, :W]
        return (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r

    images = [{"id": 1, "width": W, "height": H}]
    gt_mask = circle(40, 40, 18)
    anns = [{"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [22, 22, 36, 36], "area": float(gt_mask.sum()),
             "iscrowd": 0, "segmentation": rle_encode_np(gt_mask)}]

    ev = COCOEvaluator(num_classes=1, iou_type="segm")
    perfect = [{"image_id": 1, "category_id": 1, "bbox": [22, 22, 36, 36],
                "score": 0.9, "segmentation": rle_encode_np(gt_mask)}]
    s = ev.evaluate(images, anns, perfect)
    assert s["AP50"] == 1.0 and s["AP"] == 1.0

    # same bbox, but a square mask instead of the circle: bbox IoU would be 1,
    # mask IoU = pi/4 ~ 0.785 -> perfect under AP50, rejected at IoU .9
    square = np.zeros((H, W), bool)
    square[22:58, 22:58] = True
    boxy = [{"image_id": 1, "category_id": 1, "bbox": [22, 22, 36, 36],
             "score": 0.9, "segmentation": rle_encode_np(square)}]
    s2 = ev.evaluate(images, anns, boxy)
    assert s2["AP50"] == 1.0
    assert s2["AP"] < s["AP"]


def test_seg_mosaic_polygons(seg_data):
    """mosaic_segment: polygon mass lands where the source tile landed, and
    masks still fall inside their boxes after the 2S->S letterbox."""
    from yololite_tpu.data import YoloDataset
    data_yaml, root = seg_data
    ds = YoloDataset(os.path.join(root, "train", "images"),
                     os.path.join(root, "train", "labels"),
                     img_size=96, is_train=True, augment=True,
                     mosaic_p=1.0, cutmix_p=0.0, max_boxes=16, task="segment")
    canvas, polys, labels = ds.mosaic_segment(0, np.random.RandomState(0))
    assert canvas.shape == (192, 192, 3)
    assert len(polys) == len(labels) >= 4  # >=1 object per tile
    for p in polys:
        assert p.min() >= 0 and p.max() <= 192

    # the full sample path (mosaic -> flips/affine -> letterbox -> raster)
    s = ds.get(0, np.random.RandomState(1))
    n = int(s["mask"].sum())
    assert n >= 1
    ps = s["masks_packed"].shape[1]
    masks = np.unpackbits(s["masks_packed"], axis=-1, count=ps)
    for j in range(n):
        ys, xs = np.nonzero(masks[j])
        if len(xs):
            x1, y1, x2, y2 = s["boxes"][j] * (ps / 96.0)
            assert xs.min() >= int(x1) - 1 and xs.max() <= int(np.ceil(x2)) + 1
            assert ys.min() >= int(y1) - 1 and ys.max() <= int(np.ceil(y2)) + 1


def test_seg_affine_polygon_mapping(seg_data):
    """Affine on the seg path: mask pixels track the warped polygon (the box
    is recomputed FROM the warped polygon, so mask-in-box must still hold)."""
    from yololite_tpu.data import YoloDataset
    data_yaml, root = seg_data
    ds = YoloDataset(os.path.join(root, "train", "images"),
                     os.path.join(root, "train", "labels"),
                     img_size=96, is_train=True, augment=True,
                     mosaic_p=0.0, cutmix_p=0.0, max_boxes=8, task="segment")
    hit = 0
    for seed in range(20):  # affine fires with p=0.2 per sample
        s = ds.get(seed % len(ds), np.random.RandomState(seed))
        n = int(s["mask"].sum())
        ps = s["masks_packed"].shape[1]
        masks = np.unpackbits(s["masks_packed"], axis=-1, count=ps)
        for j in range(n):
            ys, xs = np.nonzero(masks[j])
            if len(xs):
                hit += 1
                x1, y1, x2, y2 = s["boxes"][j] * (ps / 96.0)
                assert xs.min() >= int(x1) - 1 and xs.max() <= int(np.ceil(x2)) + 1
                assert ys.min() >= int(y1) - 1 and ys.max() <= int(np.ceil(y2)) + 1
    assert hit > 5

def test_seg_cutmix_mask_aware(seg_data):
    """Mask-aware CutMix: the pasted donor instance arrives with a polygon
    whose rasterized mask matches the donor pixels actually composited."""
    from yololite_tpu.data import YoloDataset
    data_yaml, root = seg_data
    ds = YoloDataset(os.path.join(root, "train", "images"),
                     os.path.join(root, "train", "labels"),
                     img_size=96, is_train=True, augment=True,
                     max_boxes=8, task="segment")
    rng = np.random.RandomState(3)
    img = ds.load_image(0)
    h, w = img.shape[:2]
    items = ds.poly_cache[0]
    polys = [p * np.array([w, h], np.float32) for _, p in items]
    labels = np.array([c for c, _ in items], np.int64)
    n_before = len(polys)
    img2, polys2, labels2 = ds.cutmix_segment(img, polys, labels, 1, rng)
    assert len(polys2) == n_before + 1
    assert len(labels2) == n_before + 1
    assert labels2[-1] == ds.poly_cache[1][
        int(np.argmin([(p[:, 0].max() - p[:, 0].min()) *
                       (p[:, 1].max() - p[:, 1].min())
                       for _, p in ds.poly_cache[1]]))][0]
    # pixels changed exactly inside the pasted polygon (allow raster boundary)
    new_poly = polys2[-1]
    changed = np.any(img2 != img, axis=-1)
    pmask = np.zeros((h, w), np.uint8)
    cv2.fillPoly(pmask, [np.round(new_poly).astype(np.int32)], 1)
    assert changed[pmask > 0].mean() > 0.3          # donor visibly composited
    dil = cv2.dilate(pmask, np.ones((3, 3), np.uint8))
    assert not changed[dil == 0].any()               # nothing outside the polygon


def test_seg_cutmix_through_pipeline(seg_data):
    """cutmix-only seg pipeline (mosaic_p=0, cutmix_p=1): every sample gains
    an instance whose proto-res mask lies inside its box."""
    from yololite_tpu.data import YoloDataset
    data_yaml, root = seg_data
    ds = YoloDataset(os.path.join(root, "train", "images"),
                     os.path.join(root, "train", "labels"),
                     img_size=96, is_train=True, augment=True,
                     mosaic_p=0.0, cutmix_p=1.0, max_boxes=8, task="segment")
    base = YoloDataset(os.path.join(root, "train", "images"),
                       os.path.join(root, "train", "labels"),
                       img_size=96, is_train=False, augment=False,
                       max_boxes=8, task="segment")
    gained = 0
    for i in range(6):
        s = ds.get(i, np.random.RandomState(100 + i))
        b = base.get(i, np.random.RandomState(100 + i))
        assert s["masks_packed"].shape == (8, 24, 3)
        masks = np.unpackbits(s["masks_packed"], axis=-1, count=24)
        n = int(s["mask"].sum())
        gained += int(n > int(b["mask"].sum()))
        for j in range(n):
            ys, xs = np.nonzero(masks[j])
            if len(xs):
                x1, y1, x2, y2 = s["boxes"][j] * (24 / 96.0)
                assert xs.min() >= int(x1) - 1 and xs.max() <= int(np.ceil(x2)) + 1
                assert ys.min() >= int(y1) - 1 and ys.max() <= int(np.ceil(y2)) + 1
    assert gained >= 3  # paste can legitimately fail (size guards), not always


def test_val_seg_sample_cache(seg_data):
    """Deterministic val seg samples are cached per (idx, img_size) — the
    full-res GT RLE rebuild cost ~13 min/eval pass at scale (r5). Train
    datasets must NOT cache (aug stream varies per epoch)."""
    from yololite_tpu.data import YoloDataset
    data_yaml, root = seg_data
    val = YoloDataset(os.path.join(root, "train", "images"),
                      os.path.join(root, "train", "labels"),
                      img_size=96, is_train=False, augment=False,
                      max_boxes=8, task="segment")
    a = val.get(0, np.random.RandomState(0))
    b = val.get(0, np.random.RandomState(99))
    assert a is b  # cache hit, rng irrelevant on the deterministic path
    # size switch keys a fresh entry
    val.set_img_size(64)
    c = val.get(0, np.random.RandomState(0))
    assert c is not a and c["image"].shape[0] == 64

    tr = YoloDataset(os.path.join(root, "train", "images"),
                     os.path.join(root, "train", "labels"),
                     img_size=96, is_train=True, augment=True,
                     max_boxes=8, task="segment")
    x = tr.get(0, np.random.RandomState(0))
    y = tr.get(0, np.random.RandomState(0))
    assert x is not y
