from yololite_tpu.config.config import (
    load_configs,
    apply_overrides,
    build_argparser,
    deep_merge,
    next_run_dir,
    save_merged_config,
)

__all__ = [
    "load_configs",
    "apply_overrides",
    "build_argparser",
    "deep_merge",
    "next_run_dir",
    "save_merged_config",
]
