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
idiomatic ceiling; TP/PP would only add latency.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


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


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[: int(n_devices)]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices of more than one JAX process."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


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
    multi = _multiprocess(mesh)
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        sh = ds if v.ndim >= 1 else rs
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
