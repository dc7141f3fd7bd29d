#!/usr/bin/env python
"""Import torch/timm pretrained backbone weights into a TPU zoo checkpoint.

Closes the pretrained-init gap with the reference (model_v2.py:84,257 passes
`pretrained=True` to timm): save the timm weights on any machine with
torch+timm

    import timm, torch
    m = timm.create_model("mobilenetv4_conv_small_050", pretrained=True)
    torch.save(m.state_dict(), "mnv4_small_050.pth")

then on this machine

    python tools/import_backbone.py --backbone mobilenetv4_conv_small_050 \
        --torch_state mnv4_small_050.pth --out weights/mnv4_050_backbone.ckpt

and train with `model.pretrained_backbone: weights/mnv4_050_backbone.ckpt`
(or `--pretrained_backbone` on tools/train.py).

The conversion is execution-order slot matching with strict shape checks
(yololite_tpu/models/backbones/torch_import.py); numerics verified in
tests/test_torch_import.py. Note: timm's `tf_*` variants use asymmetric SAME
padding while our convs pad symmetrically — imported weights are equivalent
initializations (boundary pixels of stride-2 layers differ slightly), which
detection fine-tuning absorbs.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_torch_state(path):
    if path.endswith(".npz"):
        import numpy as np
        z = np.load(path)
        return {k: z[k] for k in z.files}
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and hasattr(obj["model"], "items"):
        obj = obj["model"]
    return obj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", required=True)
    ap.add_argument("--torch_state", required=True,
                    help=".pth/.pt (torch.save of a timm state_dict) or .npz")
    ap.add_argument("--out", required=True, help="output backbone .ckpt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from yololite_tpu.models.backbones import build_backbone
    from yololite_tpu.models.backbones.torch_import import convert_backbone
    from yololite_tpu.train.checkpoint import save_checkpoint

    sd = load_torch_state(args.torch_state)
    module, info = build_backbone(args.backbone, dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3), jnp.float32))
    p, bs, report = convert_backbone(args.backbone, sd, variables["params"],
                                     variables["batch_stats"])
    meta = {"backbone": args.backbone, "source": "torch_import",
            "torch_state": os.path.basename(args.torch_state),
            "assigned": report["assigned"],
            "skipped_flax": report["skipped_flax"],
            "leftover_torch": report["leftover_torch"],
            "folded_scales": report["folded_scales"]}
    save_checkpoint(args.out, p, bs, meta)
    print(f"assigned {report['assigned']} slots"
          + (f", kept fresh: {report['skipped_flax']}" if report["skipped_flax"] else "")
          + (f", torch leftovers (head): {report['leftover_torch']}"
             if report["leftover_torch"] else ""))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
