"""Numerics tests for torch/timm backbone weight import.

Builds torch "twin" networks — same math as the flax zoo blocks, registered in
execution order exactly as the timm families lay out their state_dicts — then
round-trips: torch random weights -> convert_backbone -> flax apply, and
asserts per-stage features match to ~1e-4 in f32. This verifies the layout
transforms (OIHW->HWIO, depthwise, linear transpose), the BN affine/running-
stat mapping, and the execution-order slot alignment end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from yololite_tpu.models.backbones.zoo import _specs, build_backbone  # noqa: E402
from yololite_tpu.models.backbones.torch_import import (  # noqa: E402
    convert_backbone, plan_flax_slots, group_torch_slots)
from yololite_tpu.models.backbones.torch_twin import TorchTwin  # noqa: E402

def _randomize_bn(model):
    g = torch.Generator().manual_seed(0)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape,
                                               generator=g) + 0.5)


@pytest.mark.parametrize("name", ["mobilenetv4_conv_small_050",
                                  "tf_efficientnet_lite0",
                                  "tf_efficientnetv2_b0"])
def test_torch_import_feature_parity(name):
    torch.manual_seed(3)
    twin = TorchTwin(name).eval()
    _randomize_bn(twin)
    sd = twin.state_dict()

    module, info = build_backbone(name, dtype=jnp.float32)
    import jax
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p, bs, report = convert_backbone(name, sd, variables["params"],
                                     variables["batch_stats"])
    assert report["assigned"] == len(plan_flax_slots(name))
    assert not report["skipped_flax"]
    assert not report["leftover_torch"]

    feats = module.apply({"params": p, "batch_stats": bs}, jnp.asarray(x),
                         train=False)
    with torch.no_grad():
        tfeats = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(feats) == len(tfeats)
    for i, (f, tf_) in enumerate(zip(feats, tfeats)):
        tf_ = tf_.numpy().transpose(0, 2, 3, 1)
        assert f.shape == tf_.shape, (i, f.shape, tf_.shape)
        err = np.max(np.abs(np.asarray(f) - tf_))
        scale = max(1.0, float(np.max(np.abs(tf_))))
        assert err / scale < 2e-4, f"stage {i}: max err {err}"


def test_resnet18_import_skips_tpu_stem_conv():
    """resnet18: timm has conv7x7+maxpool; our TPU stem's second conv keeps
    fresh init (reported in skipped_flax), everything else maps."""
    class TorchResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            layers = []
            c_in = 64
            for feats, stride in [(64, 1), (128, 2), (256, 2), (512, 2)]:
                blocks = []
                for bi in range(2):
                    s = stride if bi == 0 else 1
                    block = tnn.Module()
                    block.conv1 = tnn.Conv2d(c_in, feats, 3, s, 1, bias=False)
                    block.bn1 = tnn.BatchNorm2d(feats)
                    block.conv2 = tnn.Conv2d(feats, feats, 3, 1, 1, bias=False)
                    block.bn2 = tnn.BatchNorm2d(feats)
                    if s != 1 or c_in != feats:
                        block.downsample = tnn.Sequential(
                            tnn.Conv2d(c_in, feats, 1, s, bias=False),
                            tnn.BatchNorm2d(feats))
                    blocks.append(block)
                    c_in = feats
                layers.append(tnn.ModuleList(blocks))
            self.layers = tnn.ModuleList(layers)
            self.fc = tnn.Linear(512, 1000)

    sd = TorchResNet18().state_dict()
    module, _ = build_backbone("resnet18", dtype=jnp.float32)
    import jax
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3), jnp.float32))
    p, bs, report = convert_backbone("resnet18", sd, variables["params"],
                                     variables["batch_stats"])
    assert report["skipped_flax"] == ["ConvBNAct_1/Conv_0", "ConvBNAct_1/BatchNorm_0"]
    assert report["leftover_torch"] == ["fc"]
    n_slots = len(plan_flax_slots("resnet18"))
    assert report["assigned"] == n_slots - 2
    # converted tree still feeds the model
    feats = module.apply({"params": p, "batch_stats": bs},
                         jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    assert feats[-1].shape[-1] == 512


def test_group_torch_slots_shapes():
    twin = TorchTwin("tf_efficientnet_lite0")
    slots = group_torch_slots(twin.state_dict())
    kinds = {s.kind for s in slots}
    assert kinds == {"conv", "bn"}
    # every conv is immediately followed by its bn
    for a, b in zip(slots[::2], slots[1::2]):
        assert (a.kind, b.kind) == ("conv", "bn")
