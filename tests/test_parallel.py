"""Data-parallel correctness on the fake 8-device CPU mesh (SURVEY.md §4c).

The DP invariant: because the loss SUMS over images, sharding the batch over
the mesh must produce the same loss and the same parameter update as single
device execution (XLA all-reduces the per-shard grads)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yololite_tpu.models.detector import YOLOLiteMS
from yololite_tpu.parallel.mesh import make_mesh, shard_batch, replicate_tree
from yololite_tpu.train.steps import Trainer


def _tiny_cfg(img=32, nc=2):
    return {
        "model": {"arch": "YOLOLiteMS_CPU", "backbone": "mobilenetv4_conv_small_050",
                  "fpn_channels": 32, "head_depth": 1, "num_classes": nc,
                  "num_anchors_per_level": 1, "width_multiple": 1.0,
                  "depth_multiple": 0.5},
        "training": {"img_size": img, "lr": 1e-3, "optimizer": "adamw",
                     "weight_decay": 1e-4, "grad_clip": 1.0, "ema": True,
                     "ema_decay": 0.9, "amp": False},
        "loss": {"topk_limit": 5, "area_cells_min": 0.0, "area_cells_max": 256,
                 "area_tol": 1.75},
    }


def _batch(bs, img=32, m=4, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": (rng.rand(bs, img, img, 3) * 255).astype(np.uint8),
        "boxes": np.tile(np.array([[4.0, 4.0, 20.0, 20.0]], np.float32), (bs, m, 1)),
        "labels": np.zeros((bs, m), np.int32),
        "mask": np.tile(np.array([True, True] + [False] * (m - 2)), (bs, 1)),
    }


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_dp_loss_matches_single_device():
    from yololite_tpu.models.detector import build_model_from_config
    cfg = _tiny_cfg()
    batch = _batch(8)

    model = build_model_from_config(cfg, dtype=jnp.float32)

    t1 = Trainer(model, cfg, total_updates=10, mesh=None)
    s1 = t1.init_state(seed=0)
    # keep pristine copies: train_step donates its input state
    params0 = jax.tree.map(lambda x: np.asarray(x).copy(), s1.params)
    bstats0 = jax.tree.map(lambda x: np.asarray(x).copy(), s1.batch_stats)
    s1b, m1 = t1.train_step(s1, t1.put_batch(batch), t1.lr_vector(1e-3))

    mesh = make_mesh(8)
    t8 = Trainer(model, cfg, total_updates=10, mesh=mesh)
    s8 = t8.init_state(seed=0)
    s8b, m8 = t8.train_step(s8, t8.put_batch(batch), t8.lr_vector(1e-3))

    np.testing.assert_allclose(float(m1["total"]), float(m8["total"]),
                               rtol=2e-4, atol=2e-4)

    # gradient all-reduce == single-device gradient (compare grads directly;
    # comparing post-Adam params is ill-conditioned: the first Adam step is
    # sign-normalized, so fp noise in near-zero grads flips updates by ~lr)
    def loss_of(params, b):
        from yololite_tpu.train.steps import normalize_images
        x = normalize_images(b["image"], jnp.float32)
        outs = model.apply({"params": params, "batch_stats": bstats0},
                           x, train=False)
        total, _ = t1.loss(outs, {"boxes": b["boxes"], "labels": b["labels"],
                                  "mask": b["mask"]})
        return total

    gfn = jax.jit(jax.grad(loss_of))
    g1 = gfn(params0, t1.put_batch(batch))
    g8 = gfn(replicate_tree(jax.tree.map(jnp.asarray, params0), mesh),
             t8.put_batch(batch))
    rel = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))) /
              (np.max(np.abs(np.asarray(a))) + 1e-6))
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)))
    assert rel < 1e-3, rel


def test_dp_batch_actually_sharded():
    mesh = make_mesh(8)
    batch = shard_batch({"image": np.zeros((8, 16, 16, 3), np.uint8)}, mesh)
    sh = batch["image"].sharding
    assert sh.num_devices == 8
    # each device holds 1/8 of the batch dim
    shard_shape = sh.shard_shape(batch["image"].shape)
    assert shard_shape[0] == 1


def test_eval_step_on_mesh():
    from yololite_tpu.models.detector import build_model_from_config
    cfg = _tiny_cfg()
    mesh = make_mesh(8)
    model = build_model_from_config(cfg, dtype=jnp.float32)
    tr = Trainer(model, cfg, total_updates=10, mesh=mesh)
    state = tr.init_state(seed=0)
    metrics, dets = tr.eval_step(tr.ema_variables(state),
                                 tr.put_batch(_batch(8)))
    assert np.isfinite(float(metrics["total"]))
    assert np.asarray(dets["boxes"]).shape[0] == 8


def test_grad_accumulation_equivalence():
    """accumulate=2 over two half-batches ~= one step on the full batch
    (exact for the grads; adam state path identical up to mean-vs-sum scaling)."""
    from yololite_tpu.models.detector import build_model_from_config
    cfg = _tiny_cfg()
    full = _batch(4, seed=3)

    model = build_model_from_config(cfg, dtype=jnp.float32)

    cfg_acc = {**cfg, "training": {**cfg["training"], "accumulate": 2}}
    ta = Trainer(model, cfg_acc, total_updates=10, mesh=None)
    sa = ta.init_state(seed=0)
    half1 = {k: v[:2] for k, v in full.items()}
    half2 = {k: v[2:] for k, v in full.items()}
    sa, _ = ta.train_step(sa, ta.put_batch(half1), ta.lr_vector(1e-3))
    assert int(sa.updates) == 0  # no optimizer step yet
    sa, _ = ta.train_step(sa, ta.put_batch(half2), ta.lr_vector(1e-3))
    assert int(sa.updates) == 1  # applied after 2 micro-steps

    # params must have moved
    tb = Trainer(model, cfg, total_updates=10, mesh=None)
    sb = tb.init_state(seed=0)
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(sa.params),
                                jax.tree.leaves(sb.params)))
    assert moved


def test_dp_segmentation_train_step():
    """Segmentation batches (GT masks) shard over the mesh like boxes."""
    from yololite_tpu.models.detector import build_model_from_config
    cfg = _tiny_cfg()
    cfg["model"] = dict(cfg["model"], with_masks=True, num_prototypes=8)
    mesh = make_mesh(8)
    model = build_model_from_config(cfg, dtype=jnp.float32)
    tr = Trainer(model, cfg, total_updates=10, mesh=mesh)
    state = tr.init_state(seed=0)
    b = _batch(8)
    ps = 8  # 32px / proto stride 4
    rng = np.random.RandomState(0)
    b["masks"] = (rng.rand(8, 4, ps, ps) > 0.5).astype(np.uint8)
    db = tr.put_batch(b)
    assert "masks" in db
    state, m = tr.train_step(state, db, tr.lr_vector(1e-3))
    assert np.isfinite(float(m["total"]))
    assert "mask" in m  # mask loss reported


def _run_multihost(n_proc: int, devs_per_proc: int, timeout_s: int = 560):
    """Launch n_proc jax.distributed workers over CPU (devs_per_proc virtual
    devices each), assert identical post-step parameter checksums (grads
    all-reduced over the global mesh) and a working local-eval path."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = \
        f"--xla_force_host_platform_device_count={devs_per_proc}"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--coordinator", f"localhost:{port}",
             "--num_processes", str(n_proc), "--process_id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(n_proc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
    sums = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK")]
        assert line, f"no MULTIHOST_OK line:\n{out[-2000:]}"
        sums.append(line[0].split("checksum=")[1])
        assert any(l.startswith("MULTIHOST_EVAL_OK")
                   for l in out.splitlines()), \
            f"no MULTIHOST_EVAL_OK line:\n{out[-2000:]}"
    assert len(set(sums)) == 1, f"param checksums diverged: {sums}"


@pytest.mark.slow
def test_multihost_two_process_train_step():
    """2 processes x 4 virtual CPU devices = 8 global devices: one SPMD train
    step with per-host local batches + the local-eval validation path.
    Exercises parallel/mesh.py:init_distributed, multi-process
    shard_batch/replicate_tree, and Trainer.put_eval_batch end-to-end."""
    _run_multihost(2, 4)


@pytest.mark.slow
def test_multihost_four_process_train_step():
    """4 processes x 2 devices = the same 8-device global mesh with MORE
    process boundaries: per-host stripes are thinner and the collective spans
    4 host processes — the pod-scale topology the 2-process test can't see."""
    _run_multihost(4, 2, timeout_s=580)


def test_spatial_sharding_loss_matches_single_device():
    """dp=2 x spatial=4 mesh: image H sharded over 'spatial' (GSPMD halo
    exchange through the conv stack) must reproduce the single-device loss."""
    from yololite_tpu.models.detector import build_model_from_config
    cfg = _tiny_cfg(img=64)
    batch = _batch(4, img=64)

    model = build_model_from_config(cfg, dtype=jnp.float32)

    t1 = Trainer(model, cfg, total_updates=10, mesh=None)
    s1 = t1.init_state(seed=0)
    _, m1 = t1.train_step(s1, t1.put_batch(batch), t1.lr_vector(1e-3))

    mesh = make_mesh(2, n_spatial=4)
    assert mesh.shape == {"data": 2, "spatial": 4}
    tsp = Trainer(model, cfg, total_updates=10, mesh=mesh)
    ssp = tsp.init_state(seed=0)
    db = tsp.put_batch(batch)
    # image really is sharded over both axes
    shard_shape = db["image"].sharding.shard_shape(db["image"].shape)
    assert shard_shape[0] == 2 and shard_shape[1] == 16
    ssp, msp = tsp.train_step(ssp, db, tsp.lr_vector(1e-3))

    np.testing.assert_allclose(float(m1["total"]), float(msp["total"]),
                               rtol=2e-4, atol=2e-4)

    # eval (decode + NMS) under the same mesh
    metrics, dets = tsp.eval_step(tsp.ema_variables(ssp), db)
    assert np.isfinite(float(metrics["total"]))
