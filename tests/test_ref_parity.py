"""Head-to-head numerics parity vs the REFERENCE implementation itself.

Everything else in tests/ validates this repo against the reference's *spec*
(file:line math re-derived). These tests go further: they import the
reference's own torch code from /root/reference (CPU), feed IDENTICAL inputs
to both implementations, and assert the outputs match:

  * decode parity: decode_preds_anchorfree (scripts/helpers/utils_ms.py:26-123)
    vs ops/decode.decode_anchorfree, all center/wh mode combinations.
  * loss parity: LossAF.forward (scripts/loss/loss.py:284-437) vs
    losses/simota.SimOTALoss — total + box/obj/cls components and the "pos"
    statistic, across scenarios hitting every assignment branch (empty image,
    orphan rescue/min-radius guard, anchor-conflict resolution, hard-negative
    mining with and without positives).

The reference's per-image Python-loop loss and this repo's fully-vectorized
static-shape loss must produce the same numbers — that is the claim being
proven. torchvision is stubbed (only its nms symbol is imported at module
scope by utils_ms; never called here).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_modules():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        ops.nms = None  # imported by utils_ms, not called in these tests
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from scripts.helpers import utils_ms
    from scripts.loss import loss as ref_loss
    return utils_ms, ref_loss


def _rand_levels(rng, batch, sizes, depth, scale=1.5):
    return [rng.normal(size=(batch, 1, s, s, depth)).astype(np.float32) * scale
            for s in sizes]


@pytest.mark.parametrize("center_mode", ["v8", "simple"])
@pytest.mark.parametrize("wh_mode", ["softplus", "v8", "exp"])
def test_decode_parity(ref_modules, center_mode, wh_mode):
    utils_ms, _ = ref_modules
    from yololite_tpu.ops.decode import decode_anchorfree

    img_size, C = 64, 7
    rng = np.random.RandomState(0)
    levels = _rand_levels(rng, batch=2, sizes=(8, 4, 2), depth=5 + C)

    ref = utils_ms.decode_preds_anchorfree(
        [torch.from_numpy(p) for p in levels], img_size,
        center_mode=center_mode, wh_mode=wh_mode)
    ours = decode_anchorfree([np.asarray(p) for p in levels], img_size,
                             center_mode=center_mode, wh_mode=wh_mode)

    np.testing.assert_allclose(np.asarray(ours["box"]), ref["box"].numpy(),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["obj"]), ref["obj"].numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["cls"]), ref["cls"].numpy(),
                               rtol=1e-6, atol=1e-6)


# loss settings = configs/train/standard_train.yaml (the shipped recipe)
LOSS_KW = dict(lambda_box=6.5, lambda_obj=1.0, lambda_cls=1.5,
               assign_cls_weight=1.0, center_radius_cells=3.5, topk_limit=20,
               cls_smoothing=0.03, area_cells_min=0.0, area_cells_max=256.0,
               area_tol=1.75, size_prior_w=0.2, ar_prior_w=0.1,
               iou_cost_w=3.0, center_cost_w=0.5)


def _scenario_targets(rng, img_size):
    """Per-image GT lists hitting every assignment branch."""
    def boxes(n, lo=4.0, hi=None, max_wh=60.0):
        hi = hi or (img_size - 4.0)
        x1 = rng.uniform(lo, hi - 8, size=n)
        y1 = rng.uniform(lo, hi - 8, size=n)
        w = rng.uniform(4.0, max_wh, size=n)
        h = rng.uniform(4.0, max_wh, size=n)
        x2 = np.minimum(x1 + w, img_size - 1.0)
        y2 = np.minimum(y1 + h, img_size - 1.0)
        return np.stack([x1, y1, x2, y2], 1).astype(np.float32)

    per_image = [
        boxes(5),                                   # normal
        np.zeros((0, 4), np.float32),               # empty image
        np.array([[3.0, 3.0, 5.0, 5.0],             # 2px orphan-rescue case
                  [8.0, 8.0, 120.0, 120.0]], np.float32),  # huge box
        boxes(12, max_wh=30.0),                     # dense overlap (conflicts)
    ]
    labels = [rng.randint(0, 5, size=len(b)).astype(np.int64) for b in per_image]
    return per_image, labels


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_loss_parity(ref_modules, seed):
    _, ref_loss = ref_modules
    from yololite_tpu.losses import LossConfig, SimOTALoss

    img_size, C = 128, 5
    rng = np.random.RandomState(seed)
    levels = _rand_levels(rng, batch=4, sizes=(16, 8, 4), depth=5 + C)
    gts, labels = _scenario_targets(rng, img_size)

    crit = ref_loss.LossAF(num_classes=C, img_size=img_size, **LOSS_KW)
    ref_targets = [{"boxes": torch.from_numpy(b), "labels": torch.from_numpy(l)}
                   for b, l in zip(gts, labels)]
    with torch.no_grad():
        _, ref_parts = crit([torch.from_numpy(p) for p in levels], ref_targets)

    M = 16
    B = len(gts)
    boxes_p = np.zeros((B, M, 4), np.float32)
    labels_p = np.zeros((B, M), np.int32)
    mask_p = np.zeros((B, M), bool)
    for i, (b, l) in enumerate(zip(gts, labels)):
        boxes_p[i, :len(b)] = b
        labels_p[i, :len(l)] = l
        mask_p[i, :len(b)] = True

    loss = SimOTALoss(LossConfig(num_classes=C, img_size=img_size, **LOSS_KW))
    total, parts = loss([np.asarray(p) for p in levels],
                        {"boxes": boxes_p, "labels": labels_p, "mask": mask_p})

    # measured agreement is fp32-rounding-level (rel <= 1.5e-7 across seeds);
    # 1e-5 leaves headroom for BLAS/runtime variation without admitting any
    # real assignment divergence (one flipped anchor moves components ~1e-2)
    assert float(parts["pos"]) == pytest.approx(ref_parts["pos"], abs=1e-6)
    for key in ("box", "obj", "cls"):
        assert float(parts[key]) == pytest.approx(ref_parts[key],
                                                  rel=1e-5, abs=1e-6), (
            f"seed={seed} component {key}: ours={float(parts[key])} "
            f"ref={ref_parts[key]}")
    ref_total = ref_parts["box"] + ref_parts["obj"] + ref_parts["cls"]
    assert float(total) == pytest.approx(ref_total, rel=1e-5, abs=1e-6)
