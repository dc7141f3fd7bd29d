"""End-to-end training smoke test on a tiny learnable synthetic dataset.

SURVEY.md §4(b): train a small model on toy data, assert loss decreases and
mAP > 0. Runs on the fake 8-device CPU mesh (DP path exercised when batch
divides devices).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import cv2
import yaml


def make_toy_dataset(root, n_train=16, n_val=8, img=96, seed=0):
    """Colored rectangles on dark noise. class0 = red box, class1 = green box."""
    rng = np.random.RandomState(seed)
    for split, n in (("train", n_train), ("valid", n_val)):
        img_dir = os.path.join(root, split, "images")
        lbl_dir = os.path.join(root, split, "labels")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lbl_dir, exist_ok=True)
        for i in range(n):
            canvas = (rng.rand(img, img, 3) * 40).astype(np.uint8)
            lines = []
            for _ in range(rng.randint(1, 3)):
                cls = rng.randint(0, 2)
                w = rng.randint(20, 40)
                h = rng.randint(20, 40)
                x1 = rng.randint(0, img - w)
                y1 = rng.randint(0, img - h)
                color = (220, 30, 30) if cls == 0 else (30, 220, 30)
                canvas[y1:y1 + h, x1:x1 + w] = color
                cx, cy = (x1 + w / 2) / img, (y1 + h / 2) / img
                lines.append(f"{cls} {cx:.6f} {cy:.6f} {w / img:.6f} {h / img:.6f}")
            cv2.imwrite(os.path.join(img_dir, f"{i:04d}.jpg"),
                        cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
            with open(os.path.join(lbl_dir, f"{i:04d}.txt"), "w") as f:
                f.write("\n".join(lines) + "\n")
    data_yaml = os.path.join(root, "data.yaml")
    with open(data_yaml, "w") as f:
        yaml.safe_dump({"train": f"{root}/train/images", "val": f"{root}/valid/images",
                        "nc": 2, "names": ["red", "green"]}, f)
    return data_yaml


@pytest.fixture(scope="module")
def toy_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("toyds"))
    return make_toy_dataset(root)


def _toy_config(data_yaml, run_dir, epochs=3, img_size=96):
    from yololite_tpu.config import load_configs
    cfg = load_configs(None, None, data_yaml, make_run_dir=False)
    cfg["model"] = {"arch": "YOLOLiteMS_CPU", "backbone": "mobilenetv4_conv_small_050",
                    "fpn_channels": 48, "width_multiple": 1.0, "depth_multiple": 0.5,
                    "head_depth": 1, "num_classes": 2, "num_anchors_per_level": 1}
    cfg["training"].update({
        "epochs": epochs, "batch_size": 8, "img_size": img_size, "lr": 3e-3,
        "optimizer": "adamw", "weight_decay": 1e-4, "scheduler": "cosine",
        "grad_clip": 1.0, "ema": True, "ema_decay": 0.9, "amp": False,
        "augment": False, "use_p6": False, "use_p2": False, "seed": 0,
        "save_every": 100, "save_by": "AP50", "max_boxes": 20,
    })
    cfg["loss"] = {"lambda_box": 6.5, "lambda_obj": 1.0, "lambda_cls": 1.5,
                   "topk_limit": 10, "area_cells_min": 0.0, "area_cells_max": 256,
                   "area_tol": 1.75, "assign_cls_weight": 1.0}
    cfg["logging"] = {"log_dir": run_dir}
    return cfg


def test_train_e2e_loss_decreases_and_artifacts(toy_data, tmp_path):
    from yololite_tpu.train.loop import train_from_config
    from yololite_tpu.eval.plots import read_metrics_csv

    run_dir = str(tmp_path / "run")
    cfg = _toy_config(toy_data, run_dir, epochs=3)
    results = train_from_config(cfg)

    csv_path = os.path.join(run_dir, "metrics.csv")
    assert os.path.exists(csv_path)
    data = read_metrics_csv(csv_path)
    assert len(data["epoch"]) == 3
    # training signal: last train loss below the first
    assert data["train_loss"][-1] < data["train_loss"][0]
    # artifact set parity
    assert os.path.exists(os.path.join(run_dir, "merged_config.yaml"))
    assert os.path.exists(os.path.join(run_dir, "weights", "last_model_state.ckpt"))
    assert os.path.exists(os.path.join(run_dir, "loss_curve.png"))
    assert os.path.exists(os.path.join(run_dir, "sanity_check.jpg"))
    assert os.path.exists(os.path.join(run_dir, "eval_results.json"))
    assert "coco" in results


def test_checkpoint_roundtrip_and_resume(toy_data, tmp_path):
    from yololite_tpu.train.checkpoint import load_checkpoint, model_from_meta
    from yololite_tpu.train.loop import train_from_config
    import jax.numpy as jnp

    run_dir = str(tmp_path / "run_a")
    cfg = _toy_config(toy_data, run_dir, epochs=1)
    train_from_config(cfg)
    ckpt = os.path.join(run_dir, "weights", "last_model_state.ckpt")
    sd, meta = load_checkpoint(ckpt)
    assert meta["num_classes"] == 2
    assert meta["backbone"] == "mobilenetv4_conv_small_050"
    assert meta["names"] == ["red", "green"]
    model = model_from_meta(meta)
    # the rebuilt model must accept the stored params
    x = jnp.zeros((1, meta["img_size"], meta["img_size"], 3), jnp.float32)
    outs = model.apply({"params": sd["params"], "batch_stats": sd["batch_stats"]},
                       x, train=False)
    assert len(outs) == 3

    # resume: second 1-epoch run starting from the checkpoint
    run_dir2 = str(tmp_path / "run_b")
    cfg2 = _toy_config(toy_data, run_dir2, epochs=1)
    cfg2["training"]["resume"] = ckpt
    results = train_from_config(cfg2)
    assert os.path.exists(os.path.join(run_dir2, "weights", "last_model_state.ckpt"))


def test_full_state_resume(toy_data, tmp_path):
    """save_optimizer: true writes EMA + Adam state; resume restores exactly
    (TPU extra over the reference's weights-only resume)."""
    from yololite_tpu.train.checkpoint import load_checkpoint
    from yololite_tpu.train.loop import train_from_config

    run_dir = str(tmp_path / "full_a")
    cfg = _toy_config(toy_data, run_dir, epochs=1)
    cfg["training"]["save_optimizer"] = True
    train_from_config(cfg)
    ckpt = os.path.join(run_dir, "weights", "last_model_state.ckpt")
    sd, _ = load_checkpoint(ckpt)
    assert "opt_state" in sd and "ema_params" in sd
    assert int(np.asarray(sd["updates"])) > 0

    # resume picks up the optimizer state and the update counter
    from yololite_tpu.models.detector import build_model_from_config
    from yololite_tpu.train.steps import Trainer
    import jax.numpy as jnp
    model = build_model_from_config(cfg, dtype=jnp.float32)
    tr = Trainer(model, cfg, total_updates=100)
    st = tr.state_from_full(sd)
    assert int(st.updates) == int(np.asarray(sd["updates"]))
    leaves = [l for l in __import__("jax").tree.leaves(st.opt_state)
              if hasattr(l, "size") and l.size > 1]
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)  # adam moments restored
    # the restored live params must be the RAW training weights, not the EMA copy
    import jax
    flat_live = jax.tree.leaves(st.params)
    flat_raw = jax.tree.leaves(jax.tree.map(np.asarray, sd["raw_params"]))
    flat_ema = jax.tree.leaves(jax.tree.map(np.asarray, sd["ema_params"]))
    assert all(np.allclose(a, b) for a, b in zip(flat_live, flat_raw))
    assert any(not np.allclose(a, b) for a, b in zip(flat_live, flat_ema))


def test_exact_resume_matches_uninterrupted_trajectory(toy_data, tmp_path):
    """Train 2N steps straight vs N steps -> full checkpoint -> resume -> N
    steps: the two trajectories must produce identical losses step-for-step
    (VERDICT r1 item 3)."""
    import jax
    import jax.numpy as jnp
    from yololite_tpu.models.detector import build_model_from_config
    from yololite_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from yololite_tpu.train.steps import Trainer
    from flax import serialization as ser

    cfg = _toy_config(toy_data, str(tmp_path), epochs=1, img_size=64)
    cfg["model"]["fpn_channels"] = 32
    rng = np.random.RandomState(0)
    n_steps = 3

    def fixed_batch(i):
        r = np.random.RandomState(100 + i)
        return {
            "image": (r.rand(4, 64, 64, 3) * 255).astype(np.uint8),
            "boxes": np.tile(np.array([[6, 6, 36, 36]], np.float32), (4, 8, 1)),
            "labels": np.zeros((4, 8), np.int32),
            "mask": np.tile(np.array([True] + [False] * 7), (4, 1)),
        }

    def new_trainer():
        model = build_model_from_config(cfg, dtype=jnp.float32)
        return Trainer(model, cfg, total_updates=2 * n_steps)

    # A: uninterrupted 2N steps
    tr_a = new_trainer()
    state_a = tr_a.init_state(seed=0)
    losses_a = []
    for i in range(2 * n_steps):
        state_a, m = tr_a.train_step(state_a, tr_a.put_batch(fixed_batch(i)),
                                     tr_a.lr_vector(3e-3))
        losses_a.append(float(m["total"]))

    # B: N steps, full checkpoint, fresh Trainer, resume, N more steps
    tr_b = new_trainer()
    state_b = tr_b.init_state(seed=0)
    for i in range(n_steps):
        state_b, m = tr_b.train_step(state_b, tr_b.put_batch(fixed_batch(i)),
                                     tr_b.lr_vector(3e-3))
        assert np.isclose(float(m["total"]), losses_a[i], rtol=1e-5)
    ckpt = str(tmp_path / "mid.ckpt")
    save_checkpoint(ckpt, tr_b.ema_variables(state_b)["params"],
                    tr_b.ema_variables(state_b)["batch_stats"],
                    {"num_classes": 2},
                    extra_state={"raw_params": state_b.params,
                                 "raw_batch_stats": state_b.batch_stats,
                                 "ema_params": state_b.ema_params,
                                 "ema_batch_stats": state_b.ema_batch_stats,
                                 "updates": state_b.updates,
                                 "micro": state_b.micro,
                                 "opt_state": ser.to_state_dict(state_b.opt_state)})
    sd, _ = load_checkpoint(ckpt)
    tr_c = new_trainer()
    state_c = tr_c.state_from_full(sd)
    for i in range(n_steps, 2 * n_steps):
        state_c, m = tr_c.train_step(state_c, tr_c.put_batch(fixed_batch(i)),
                                     tr_c.lr_vector(3e-3))
        assert np.isclose(float(m["total"]), losses_a[i], rtol=1e-5), (
            f"step {i}: resumed {float(m['total'])} != straight {losses_a[i]}")


def test_start_epoch_continues_schedule(toy_data, tmp_path):
    """Chunked long runs: --resume + --start_epoch continues the cosine LR
    and CSV numbering instead of replaying warmup from zero."""
    import csv
    from yololite_tpu.train.loop import train_from_config

    def read_rows(run_dir):
        with open(os.path.join(run_dir, "metrics.csv")) as f:
            return list(csv.DictReader(f))

    # straight 4-epoch run
    run_a = str(tmp_path / "straight")
    cfg = _toy_config(toy_data, run_a, epochs=4)
    cfg["training"]["save_optimizer"] = True
    train_from_config(cfg)
    rows_a = read_rows(run_a)
    assert [r["epoch"] for r in rows_a] == ["1", "2", "3", "4"]

    # chunked: epochs 0-2, then resume with start_epoch=2 to 4
    run_b = str(tmp_path / "chunk1")
    cfg1 = _toy_config(toy_data, run_b, epochs=4)
    cfg1["training"]["save_optimizer"] = True
    # real chunked usage keeps --epochs <total> and the process is killed
    # mid-run; here chunk 1 simply runs 2 of the 4 epochs
    cfg1["training"]["epochs"] = 2
    train_from_config(cfg1)

    run_c = str(tmp_path / "chunk2")
    cfg2 = _toy_config(toy_data, run_c, epochs=4)
    cfg2["training"]["save_optimizer"] = True
    cfg2["training"]["resume"] = os.path.join(run_b, "weights",
                                              "last_model_state.ckpt")
    cfg2["training"]["start_epoch"] = 2
    train_from_config(cfg2)
    rows_c = read_rows(run_c)
    # continuation numbering: only epochs 3,4 appear
    assert [r["epoch"] for r in rows_c] == ["3", "4"]
    # the continued run's LR matches the straight run's schedule tail
    for ra, rc in zip(rows_a[2:], rows_c):
        np.testing.assert_allclose(float(ra["lr_g0"]), float(rc["lr_g0"]),
                                   rtol=1e-6)


def test_chunked_driver_fault_injection_exact_trajectory(toy_data, tmp_path):
    """Kill a chunked run abruptly mid-epoch (fault injection via
    YOLOLITE_FAULT_CRASH_AFTER_EPOCH -> os._exit, no cleanup), let
    tools/run_chunked_train.sh resume it, and assert the completed run's
    post-resume trajectory EXACTLY matches an uninterrupted run — the chunked
    driver's core promise (exact resume incl. optimizer/EMA + resume-stable
    data order)."""
    import csv
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # yaml configs for the CLI path (the driver invokes tools/train.py)
    model_yaml = str(tmp_path / "model.yaml")
    with open(model_yaml, "w") as f:
        yaml.safe_dump({"model": {
            "arch": "YOLOLiteMS_CPU",
            "backbone": "mobilenetv4_conv_small_050", "fpn_channels": 48,
            "width_multiple": 1.0, "depth_multiple": 0.5, "head_depth": 1,
            "num_classes": 2, "num_anchors_per_level": 1}}, f)
    train_yaml = str(tmp_path / "train.yaml")
    with open(train_yaml, "w") as f:
        yaml.safe_dump({
            # run dirs under runs/train: the chunked driver resolves its run
            # dir by grepping "saved to .../runs/train/<n>" from the log
            "logging": {"log_dir": "runs/train"},
            "training": {
                "lr": 3e-3, "optimizer": "adamw", "weight_decay": 1e-4,
                "scheduler": "cosine", "grad_clip": 1.0, "ema": True,
                "ema_decay": 0.9, "amp": False, "augment": False,
                "use_p6": False, "use_p2": False, "seed": 0,
                "save_every": 100, "save_by": "AP50", "max_boxes": 20,
                "num_workers": 0, "save_optimizer": True},
            "loss": {"lambda_box": 6.5, "lambda_obj": 1.0, "lambda_cls": 1.5,
                     "topk_limit": 10, "area_cells_min": 0.0,
                     "area_cells_max": 256, "area_tol": 1.75,
                     "assign_cls_weight": 1.0}}, f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # share the suite's persistent compile cache with the subprocesses
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
    env.pop("YOLOLITE_FAULT_CRASH_AFTER_EPOCH", None)

    def read_rows(run_dir):
        with open(os.path.join(run_dir, "metrics.csv")) as f:
            return list(csv.DictReader(f))

    def latest_run():
        return os.path.realpath(os.path.join(repo, "runs", "train", "latest"))

    # A: uninterrupted 4-epoch run through the same CLI
    out_a = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "train.py"),
         "--model", model_yaml, "--train", train_yaml, "--data", toy_data,
         "--epochs", "4", "--batch_size", "8", "--img_size", "96"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=repo)
    assert out_a.returncode == 0, out_a.stdout[-3000:] + out_a.stderr[-2000:]
    rows_a = read_rows(latest_run())
    assert [r["epoch"] for r in rows_a] == ["1", "2", "3", "4"]

    # B: chunked driver with a crash injected 3 batches into epoch 3
    env_b = dict(env)
    env_b["YOLOLITE_FAULT_CRASH_AFTER_EPOCH"] = "2"
    log_b = str(tmp_path / "chunked.log")
    out_b = subprocess.run(
        ["bash", os.path.join(repo, "tools", "run_chunked_train.sh"),
         model_yaml, train_yaml, toy_data, "4", "8", "96", log_b, "3000"],
        capture_output=True, text=True, timeout=2400, env=env_b, cwd=repo)
    with open(log_b) as f:
        log_text = f.read()
    assert out_b.returncode == 0, log_text[-3000:]
    # the injected crash actually happened and the driver resumed from it
    assert "chunk from epoch 0" in log_text and "chunk from epoch 2" in log_text
    done = [l for l in log_text.splitlines() if "run complete at epoch 4" in l]
    assert done, log_text[-2000:]
    run_b2 = done[0].split("(dir ")[1].rstrip(") =")
    rows_b = read_rows(os.path.join(repo, run_b2))
    assert [r["epoch"] for r in rows_b] == ["3", "4"]

    # exact trajectory: post-resume epochs reproduce the uninterrupted run
    for ra, rb in zip(rows_a[2:], rows_b):
        for k in ("train_loss", "val_loss", "AP50", "lr_g0"):
            np.testing.assert_allclose(
                float(ra[k]), float(rb[k]), rtol=1e-5,
                err_msg=f"epoch {ra['epoch']} {k}: straight {ra[k]} "
                        f"vs chunked-resume {rb[k]}")


def test_max_boxes_auto_sizes_to_dataset(toy_data, tmp_path):
    """`training.max_boxes: auto` (r5): GT padding capacity M is derived from
    the dataset's true max instance count (the SimOTA assignment cost scales
    with M — BENCHMARK_TPU.md train-step attribution). Toy set has <=2
    GT/image and augment=False, so auto must resolve to the floor of 16."""
    from yololite_tpu.data.dataset import max_instances_per_image
    from yololite_tpu.train.loop import train_from_config

    root = os.path.dirname(toy_data)
    assert max_instances_per_image(os.path.join(root, "train", "labels")) <= 2
    assert max_instances_per_image("/nonexistent/dir") == 0

    run_dir = str(tmp_path / "run_auto")
    cfg = _toy_config(toy_data, run_dir, epochs=1)
    cfg["training"]["max_boxes"] = "auto"
    results = train_from_config(cfg)
    assert "coco" in results
    # the merged config records what auto resolved to via the run artifacts;
    # the training ran end-to-end with the sized-down capacity
    assert os.path.exists(os.path.join(run_dir, "weights",
                                       "last_model_state.ckpt"))
