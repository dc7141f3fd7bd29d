#!/usr/bin/env python
"""Training CLI (parity with reference tools/train.py).

Usage:
    python tools/train.py --model configs/models/edge_n.yaml \
        --train configs/train/standard_train.yaml --data dataset.yaml \
        [--epochs N --batch_size B --img_size S --save_by AP ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor JAX_PLATFORMS even on images that force-prepend an experimental TPU
# platform (the env var alone loses to the forced platform there; tests and
# the chunked driver rely on JAX_PLATFORMS=cpu actually meaning cpu)
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from yololite_tpu.config import apply_overrides, build_argparser, load_configs
from yololite_tpu.train.loop import train_from_config


def main():
    ap = build_argparser()
    opt = ap.parse_args()
    config = load_configs(model_yaml=opt.model, train_yaml=opt.train,
                          data_yaml=opt.data)
    config = apply_overrides(config, opt)
    results = train_from_config(config)
    print(f"Done. best {config['training'].get('save_by') or 'AP'}="
          f"{results.get('best_metric', -1):.4f} -> {results.get('log_dir')}")


if __name__ == "__main__":
    main()
