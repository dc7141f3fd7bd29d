"""Data-parallel sharding over a jax.sharding.Mesh.

The reference is strictly single-device (SURVEY.md §2: no DP/TP/PP/NCCL
anywhere; device= one cuda index, tools/train.py:120-121). The TPU build adds
first-class data parallelism as its distributed story:

  - one mesh axis "data"; the batch dim of images/targets is sharded over it,
  - parameters/optimizer state are replicated,
  - the train step is jitted with these shardings; XLA inserts the gradient
    all-reduce over ICI automatically (the loss sums over the batch, so the
    per-shard grads psum to exactly the single-device gradient),
  - multi-host would extend the same mesh via jax.distributed.initialize —
    no custom comm backend, which is the idiomatic JAX replacement for "none".

Model sizes here are 0.55M-18M params (BENCHMARK.md:351-357): DP is the
idiomatic ceiling for parameters; TP/PP would only add latency. For LARGE
activations instead (P6 workloads at 1280px+, where one image's activation
footprint dominates HBM), the second mesh axis "spatial" shards the image
height dim across chips: XLA GSPMD spatially partitions every convolution and
inserts the halo exchanges over ICI automatically — the TPU-native equivalent
of manual activation-sharding runtimes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host setup: call once per host before building the mesh.

    Thin wrapper over `jax.distributed.initialize` — on TPU pods the arguments
    auto-discover from the environment; on other platforms pass them
    explicitly. Returns the global device count. After this, `make_mesh()`
    spans ALL hosts' devices and the same pjit'ed train step scales across
    DCN+ICI with no further changes (SPMD).
    """
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return len(jax.devices())


def make_mesh(n_devices: Optional[int] = None, devices=None,
              n_spatial: int = 1) -> Mesh:
    """Device mesh: ("data",) for pure DP, or ("data", "spatial") when
    n_spatial > 1 — n_devices is the DATA-axis size; total devices used is
    n_devices * n_spatial."""
    if devices is None:
        devices = jax.devices()
    n_spatial = max(1, int(n_spatial))
    if n_spatial > 1:
        n_data = int(n_devices) if n_devices is not None else \
            len(devices) // n_spatial
        need = n_data * n_spatial
        if len(devices) < need:
            raise ValueError(f"mesh {n_data}x{n_spatial} needs {need} devices,"
                             f" have {len(devices)}")
        arr = np.asarray(devices[:need]).reshape(n_data, n_spatial)
        return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))
    if n_devices is not None:
        devices = devices[: int(n_devices)]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """[B,H,W,C] images: batch over 'data', height over 'spatial' (if present).
    GSPMD propagates the spatial split through the conv stack with halo
    exchanges; reductions/reshapes that need the full image re-gather
    automatically."""
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices of more than one JAX process."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def is_multiprocess(mesh: Optional[Mesh]) -> bool:
    """Public: does this mesh span multiple JAX processes (a pod)?"""
    return mesh is not None and _multiprocess(mesh)


def shard_batch(batch: Dict[str, Any], mesh: Optional[Mesh]) -> Dict[str, Any]:
    """Put a host batch onto the mesh, batch-dim sharded over 'data'.
    Scalar entries (e.g. nvalid) are replicated.

    Multi-host: each process passes its LOCAL batch chunk (global batch =
    local batch x process_count along dim 0); the global array is assembled
    with `jax.make_array_from_process_local_data` — `device_put` cannot
    target non-addressable devices."""
    if mesh is None:
        return {k: jax.device_put(v) for k, v in batch.items()}
    ds = data_sharding(mesh)
    rs = replicated_sharding(mesh)
    ims = image_sharding(mesh)
    multi = _multiprocess(mesh)
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        sh = ims if (k == "image" and v.ndim == 4) else \
            (ds if v.ndim >= 1 else rs)
        if multi:
            out[k] = jax.make_array_from_process_local_data(sh, v)
        else:
            out[k] = jax.device_put(v, sh)
    return out


def replicate_tree(tree, mesh: Optional[Mesh]):
    """Replicate a pytree over the mesh. Multi-host: every process must hold
    identical leaf values (e.g. params initialized from one shared seed)."""
    if mesh is None:
        return tree
    rs = replicated_sharding(mesh)
    if _multiprocess(mesh):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(rs, np.asarray(x)),
            tree)
    return jax.device_put(tree, rs)
