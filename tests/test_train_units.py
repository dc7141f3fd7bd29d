"""Unit tests: schedulers, EMA ramp, optimizer param groups, checkpoint meta."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from yololite_tpu.train.ema import ema_update, ema_warmup_limit
from yololite_tpu.train.optim import (GROUP_BACKBONE, GROUP_HEAD, GROUP_NECK,
                                      group_index_tree)
from yololite_tpu.train.schedulers import build_scheduler


def _cfg(sched, epochs=100, warmup=0, **kw):
    return {"training": {"scheduler": sched, "epochs": epochs,
                         "warmup_epochs": warmup, **kw}}


def test_cosine_schedule():
    s = build_scheduler(_cfg("cosine", epochs=10), steps_per_epoch=5)
    assert s.lr_factor(0, 0) == 1.0
    for e in range(10):
        s.end_epoch(e)
    # after 10 steps of T_max=10 -> cos(pi) -> 0
    assert abs(s.lr_factor(10, 50)) < 1e-9


def test_warmup_factors():
    s = build_scheduler(_cfg("cosine", epochs=10, warmup=3), steps_per_epoch=5)
    assert s.lr_factor(0, 0) == 0.1
    assert abs(s.lr_factor(1, 5) - (0.1 + 0.9 / 3)) < 1e-9
    assert abs(s.lr_factor(3, 15) - 1.0) < 1e-9


def test_step_multistep():
    s = build_scheduler(_cfg({"type": "step", "step_size": 2, "gamma": 0.5},
                             epochs=10), 1)
    for e in range(4):
        s.end_epoch(e)
    assert abs(s.lr_factor(4, 0) - 0.25) < 1e-9
    s2 = build_scheduler(_cfg({"type": "multistep", "milestones": [2, 4],
                               "gamma": 0.1}, epochs=10), 1)
    for e in range(5):
        s2.end_epoch(e)
    assert abs(s2.lr_factor(5, 0) - 0.01) < 1e-9


def test_onecycle_shape():
    s = build_scheduler(_cfg("onecycle", epochs=10), steps_per_epoch=10)
    f0 = s.lr_factor(0, 0)
    fpeak = s.lr_factor(3, 30)   # pct_start=0.3 -> peak at step 30
    fend = s.lr_factor(9, 99)
    assert f0 < fpeak and abs(fpeak - 1.0) < 1e-6 and fend < 0.01


def test_plateau():
    s = build_scheduler(_cfg({"type": "plateau", "patience": 1, "factor": 0.5},
                             epochs=10), 1)
    assert s.lr_factor(0, 0) == 1.0
    s.observe(1.0)   # best
    s.observe(0.9)   # bad 1
    s.observe(0.8)   # bad 2 > patience -> decay
    assert s.lr_factor(3, 0) == 0.5


def test_none_scheduler():
    s = build_scheduler({"training": {"epochs": 5}}, 1)
    assert s.lr_factor(3, 10) == 1.0


def test_ema_ramp():
    assert ema_warmup_limit(10000) == 2000
    assert ema_warmup_limit(10) == 100
    ema = {"w": jnp.zeros(3)}
    new = {"w": jnp.ones(3)}
    # early updates: d small -> ema moves fast toward new value
    out1 = ema_update(ema, new, jnp.asarray(1), 0.995, 100)
    d1 = 0.995 * (1 - math.exp(-1 / 100))
    np.testing.assert_allclose(np.asarray(out1["w"]), (1 - d1), rtol=1e-5)
    # late updates: d ~= decay
    out2 = ema_update(ema, new, jnp.asarray(100000), 0.995, 100)
    np.testing.assert_allclose(np.asarray(out2["w"]), 1 - 0.995, rtol=1e-4)


def test_ema_non_float_copied():
    ema = {"n": jnp.zeros((), jnp.int32)}
    new = {"n": jnp.asarray(7, jnp.int32)}
    out = ema_update(ema, new, jnp.asarray(5), 0.995, 100)
    assert int(out["n"]) == 7


def test_param_groups():
    from yololite_tpu.models import YOLOLiteMS, init_model
    m = YOLOLiteMS(backbone="mobilenetv4_conv_small_050", num_classes=2,
                   fpn_channels=32, cpu_variant=True, use_p6=True)
    params, _ = init_model(m, 64)
    idx = group_index_tree(params)
    flat = jax.tree_util.tree_flatten_with_path(idx)[0]
    tops = {}
    for path, g in flat:
        top = path[0].key
        tops.setdefault(top, set()).add(g)
    assert tops["backbone"] == {GROUP_BACKBONE}
    assert tops["head3"] == {GROUP_HEAD}
    assert tops["head5"] == {GROUP_HEAD}
    # reference quirk: head6 lands in the NECK group (train.py:256-261)
    assert tops["head6"] == {GROUP_NECK}
    assert tops["lateral3"] == {GROUP_NECK}
    assert tops["smooth4"] == {GROUP_NECK}


def test_determinism_same_seed_same_loss():
    """JAX determinism (SURVEY §5 'race detection: standard determinism flags'):
    identical seed + data -> bit-identical first-step loss."""
    import numpy as np
    from yololite_tpu.models.detector import build_model_from_config
    from yololite_tpu.train.steps import Trainer

    cfg = {"model": {"arch": "YOLOLiteMS_CPU",
                     "backbone": "mobilenetv4_conv_small_050",
                     "fpn_channels": 32, "head_depth": 1, "num_classes": 2,
                     "num_anchors_per_level": 1, "depth_multiple": 0.5},
           "training": {"img_size": 32, "lr": 1e-3, "ema": False, "amp": False},
           "loss": {"topk_limit": 5}}
    rng = np.random.RandomState(0)
    batch = {"image": (rng.rand(2, 32, 32, 3) * 255).astype(np.uint8),
             "boxes": np.tile(np.array([[4., 4., 20., 20.]], np.float32), (2, 4, 1)),
             "labels": np.zeros((2, 4), np.int32),
             "mask": np.tile(np.array([True, False, False, False]), (2, 1))}

    losses = []
    for _ in range(2):
        model = build_model_from_config(cfg)
        tr = Trainer(model, cfg, total_updates=10)
        st = tr.init_state(seed=42)
        _, m = tr.train_step(st, tr.put_batch(batch), tr.lr_vector(1e-3))
        losses.append(float(m["total"]))
    assert losses[0] == losses[1], losses


def test_orbax_checkpoint_roundtrip(tmp_path):
    import numpy as np
    import jax.numpy as jnp
    from yololite_tpu.train.checkpoint import (load_checkpoint,
                                               save_checkpoint_orbax)
    params = {"layer": {"w": jnp.arange(6.0).reshape(2, 3)}}
    bstats = {"bn": {"mean": jnp.zeros(3)}}
    meta = {"num_classes": 2, "backbone": "x", "img_size": 64, "config": {}}
    path = save_checkpoint_orbax(str(tmp_path / "ckpt_orbax"), params, bstats,
                                 meta)
    sd, m2 = load_checkpoint(path)  # auto-detects the orbax directory format
    np.testing.assert_allclose(np.asarray(sd["params"]["layer"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert m2["num_classes"] == 2


def test_async_orbax_checkpoint_roundtrip(tmp_path):
    import numpy as np
    from yololite_tpu.train.checkpoint import (
        load_checkpoint, save_checkpoint_orbax_async, wait_for_checkpoints)
    p = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    bs = {"m": np.ones(3, np.float32)}
    path = str(tmp_path / "last.ckpt")
    save_checkpoint_orbax_async(path, p, bs, {"backbone": "x"})
    wait_for_checkpoints()
    sd, meta = load_checkpoint(path)
    np.testing.assert_array_equal(sd["params"]["w"], p["w"])
    assert meta["backbone"] == "x"
