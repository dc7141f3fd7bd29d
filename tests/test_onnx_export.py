"""First-party ONNX export: protobuf codec, jaxpr->ONNX emitter, numpy runner.

Reference parity target: export/export_onnx.py:179-332 (raw/decoded ONNX CPU
artifacts) + tools/infer_onnx.py:143-233 (host-side NMS postproc). The
environment has no `onnx`/`onnxruntime`, so correctness is established two
independent ways:
  1. the protobuf codec parses a file serialized by TORCH's own C++ ONNX
     exporter (field-number cross-validation against a foreign writer);
  2. emitted graphs are executed by the first-party numpy runner and compared
     against the jitted jax reference outputs.
"""

import numpy as np
import pytest


# --------------------------------------------------------------------------- #
# codec
# --------------------------------------------------------------------------- #

def test_proto_roundtrip_simple():
    from yololite_tpu.deploy import onnx_proto as P

    t = P.tensor_proto("w", np.arange(12, dtype=np.float32).reshape(3, 4))
    model = {
        "ir_version": 8,
        "producer_name": "yololite_tpu",
        "graph": {
            "name": "g",
            "node": [{"op_type": "Relu", "input": ["x"], "output": ["y"],
                      "name": "n0",
                      "attribute": [P.attr("axis", 1), P.attr("f", 0.5),
                                    P.attr("ints", [1, 2, 3]),
                                    P.attr("mode", "constant")]}],
            "initializer": [t],
            "input": [P.value_info("x", np.float32, (3, 4))],
            "output": [P.value_info("y", np.float32, (3, 4))],
        },
        "opset_import": [{"domain": "", "version": 17}],
    }
    data = P.serialize_model(model)
    back = P.parse_model(data)
    assert back["ir_version"] == 8
    assert back["graph"]["node"][0]["op_type"] == "Relu"
    attrs = {a["name"]: P.attr_value(a)
             for a in back["graph"]["node"][0]["attribute"]}
    assert attrs == {"axis": 1, "f": 0.5, "ints": [1, 2, 3],
                     "mode": "constant"}
    w = P.tensor_to_array(back["graph"]["initializer"][0])
    np.testing.assert_array_equal(w, np.arange(12, np.float32).reshape(3, 4)
                                  if False else
                                  np.arange(12, dtype=np.float32).reshape(3, 4))
    vi = back["graph"]["input"][0]
    dims = [d["dim_value"] for d in vi["type"]["tensor_type"]["shape"]["dim"]]
    assert dims == [3, 4]
    # negative int64 varint (e.g. Slice ends of -1)
    t2 = P.tensor_proto("neg", np.asarray([-1, -(2 ** 40)], np.int64))
    back2 = P.decode_msg(P.encode_msg(t2, P.TENSOR_PROTO), P.TENSOR_PROTO)
    np.testing.assert_array_equal(P.tensor_to_array(back2),
                                  [-1, -(2 ** 40)])


def test_codec_parses_torch_serialized_onnx(tmp_path):
    """Cross-validate field numbers against torch's C++ ONNX serializer."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    import torch.onnx._internal.torchscript_exporter.onnx_proto_utils as opu
    from yololite_tpu.deploy import onnx_proto as P
    from yololite_tpu.deploy.onnx_run import load_onnx

    # torch's exporter serializes fully, then re-parses with the `onnx`
    # package only to inline onnxscript functions (absent here: no-op).
    orig = opu._add_onnxscript_fn
    opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    try:
        m = nn.Sequential(nn.Conv2d(3, 4, 3, padding=1), nn.SiLU(),
                          nn.MaxPool2d(2))
        x = torch.randn(1, 3, 8, 8)
        path = str(tmp_path / "t.onnx")
        torch.onnx.export(m, x, path, opset_version=17, dynamo=False)
    finally:
        opu._add_onnxscript_fn = orig

    with open(path, "rb") as f:
        mp = P.parse_model(f.read())
    assert mp["producer_name"] == "pytorch"
    assert mp["opset_import"][0]["version"] == 17
    ops = [n["op_type"] for n in mp["graph"]["node"]]
    assert ops == ["Conv", "Sigmoid", "Mul", "MaxPool"]
    w = P.tensor_to_array(mp["graph"]["initializer"][0])
    np.testing.assert_allclose(w, m[0].weight.detach().numpy(), rtol=1e-6)

    # and the runner executes the foreign file bit-for-bit vs torch
    g = load_onnx(path)
    out = g(x.numpy())[0]
    np.testing.assert_allclose(out, m(x).detach().numpy(), atol=1e-5)


# --------------------------------------------------------------------------- #
# emitter + runner vs jax
# --------------------------------------------------------------------------- #

def test_emit_small_flax_model_parity(tmp_path):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from yololite_tpu.deploy.onnx_emit import export_fn_to_onnx
    from yololite_tpu.deploy.onnx_run import load_onnx

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME")(x)
            x = nn.silu(x)
            x = nn.Conv(8, (3, 3), feature_group_count=8, padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=True)(x)
            x = jax.nn.softplus(x)
            g = jnp.max(x, axis=(1, 2))          # reductions
            return g / (1.0 + jnp.abs(g))

    m = M()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    fn = lambda img: m.apply(v, img)  # noqa: E731
    ref = np.asarray(fn(x))
    path = str(tmp_path / "m.onnx")
    export_fn_to_onnx(fn, (x,), path, input_names=["images"])
    g = load_onnx(path)
    out = g(np.asarray(x))[0]
    np.testing.assert_allclose(out, ref, atol=2e-3)
    s = g.summary()
    assert s["ops"]["Conv"] == 2 and s["inputs"] == ["images"]


def test_emit_op_coverage_parity(tmp_path):
    """Shape ops, comparisons, Where, Slice/rev, pad, einsum, pooling."""
    import jax
    import jax.numpy as jnp
    from yololite_tpu.deploy.onnx_emit import export_fn_to_onnx
    from yololite_tpu.deploy.onnx_run import load_onnx

    w = jnp.asarray(np.random.RandomState(1).randn(4, 5), jnp.float32)

    def fn(x):  # x [2,3,4]
        a = jnp.einsum("bij,jk->bik", x, w)             # dot_general
        b = jnp.transpose(a, (0, 2, 1))[:, 1:4:2]        # transpose+slice
        c = jnp.where(b > 0, b, 0.1 * b)                 # select_n
        d = jnp.pad(c, ((0, 0), (1, 1), (0, 2)))         # pad
        e = jnp.flip(d, axis=2)                          # rev
        f = jnp.clip(e, -1.0, 1.0)                       # clamp/min/max
        g = jnp.concatenate([f, f], axis=1)              # concat
        h = (g != 0).astype(jnp.float32)                 # ne + cast
        p = jax.lax.reduce_window(
            g, -jnp.inf, jax.lax.max, (1, 2, 2), (1, 2, 2),
            "VALID")                                     # maxpool-ish
        return h.sum(axis=(1, 2)) + p.sum(axis=(1, 2))   # reduce_sum

    x = jnp.asarray(np.random.RandomState(2).randn(2, 3, 4), jnp.float32)
    ref = np.asarray(fn(x))
    path = str(tmp_path / "ops.onnx")
    export_fn_to_onnx(fn, (x,), path, input_names=["x"])
    out = load_onnx(path)(np.asarray(x))[0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------- #
# full checkpoint export parity (reference export_onnx.py duality)
# --------------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import jax.numpy as jnp
    from yololite_tpu.models.detector import build_model_from_config, init_model
    from yololite_tpu.train.checkpoint import build_meta, save_checkpoint

    img_size = 64
    cfg = {
        "model": {"arch": "YOLOLiteMS_CPU",
                  "backbone": "mobilenetv4_conv_small_050",
                  "fpn_channels": 32, "width_multiple": 1.0,
                  "depth_multiple": 0.5, "head_depth": 1,
                  "num_classes": 3, "num_anchors_per_level": 1},
        "training": {"img_size": img_size},
    }
    model = build_model_from_config(cfg, dtype=jnp.float32)
    params, batch_stats = init_model(model, img_size, seed=3, batch=1)
    meta = build_meta(cfg, {"AP": 0.0}, "AP", ["a", "b", "c"],
                      model.get_num_anchors_per_level())
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny.ckpt")
    save_checkpoint(path, params, batch_stats, meta)
    return path, img_size


def _jax_decoded(ckpt_path, images_u8):
    import jax.numpy as jnp
    from yololite_tpu.ops.decode import decode_anchorfree
    from yololite_tpu.train.checkpoint import load_checkpoint, model_from_meta
    from yololite_tpu.train.steps import normalize_images

    sd, meta = load_checkpoint(ckpt_path)
    model = model_from_meta(meta, dtype=jnp.float32)
    variables = {"params": sd["params"], "batch_stats": sd["batch_stats"]}
    x = normalize_images(jnp.asarray(images_u8), jnp.float32)
    outs = model.apply(variables, x, train=False)
    d = decode_anchorfree(outs, int(meta["img_size"]))
    return {"boxes_xyxy": np.asarray(d["box"]),
            "obj_logits": np.asarray(d["obj"]),
            "cls_logits": np.asarray(d["cls"])}


def test_export_onnx_decoded_parity(tiny_ckpt, tmp_path):
    from yololite_tpu.deploy.export import export_onnx, load_exported

    ckpt, img_size = tiny_ckpt
    art = export_onnx(ckpt, out_dir=str(tmp_path), fmt="decoded", batch=1,
                      img_size=img_size)
    assert art.endswith("_decoded.onnx")
    call, meta = load_exported(art)
    assert meta["runtime"] == "onnx"
    rng = np.random.RandomState(0)
    images = (rng.rand(1, img_size, img_size, 3) * 255).astype(np.uint8)
    out = call(images)
    ref = _jax_decoded(ckpt, images)
    assert set(out) == {"boxes_xyxy", "obj_logits", "cls_logits"}
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), ref[k],
                                   rtol=1e-3, atol=1e-3, err_msg=k)


def test_export_onnx_dynamic_batch(tiny_ckpt, tmp_path):
    """One dynamic-batch artifact serves multiple batch sizes (reference
    export_onnx.py:303-309 dynamic_axes parity): traced at batch 2, executed
    at batch 1 and batch 3, each matching the jax graph at that batch."""
    from yololite_tpu.deploy import onnx_proto as P
    from yololite_tpu.deploy.export import export_onnx
    from yololite_tpu.deploy.onnx_run import load_onnx

    ckpt, img_size = tiny_ckpt
    art = export_onnx(ckpt, out_dir=str(tmp_path), fmt="decoded",
                      img_size=img_size, dynamic_batch=True)
    # the batch dim is declared symbolic in the serialized file
    with open(art, "rb") as f:
        mp = P.parse_model(f.read())
    in_dims = mp["graph"]["input"][0]["type"]["tensor_type"]["shape"]["dim"]
    assert in_dims[0].get("dim_param") == "batch"
    for vo in mp["graph"]["output"]:
        od = vo["type"]["tensor_type"]["shape"]["dim"]
        assert od[0].get("dim_param") == "batch", vo["name"]

    g = load_onnx(art)
    rng = np.random.RandomState(7)
    for b in (1, 3):
        images = (rng.rand(b, img_size, img_size, 3) * 255).astype(np.uint8)
        outs = g(images)
        names = g.summary()["outputs"]
        out = dict(zip(names, outs))
        ref = _jax_decoded(ckpt, images)
        for k in ref:
            assert out[k].shape[0] == b
            np.testing.assert_allclose(np.asarray(out[k]), ref[k],
                                       rtol=1e-3, atol=1e-3,
                                       err_msg=f"{k} @batch={b}")


def test_export_onnx_dynamic_batch_raw(tiny_ckpt, tmp_path):
    """raw-format dynamic-batch export (conv trunk incl. SPPF pooling) runs
    at a batch size other than the traced one."""
    from yololite_tpu.deploy.export import export_onnx, load_exported

    ckpt, img_size = tiny_ckpt
    art = export_onnx(ckpt, out_dir=str(tmp_path), fmt="raw",
                      img_size=img_size, dynamic_batch=True)
    call, meta = load_exported(art)
    out = call(np.zeros((3, img_size, img_size, 3), np.uint8))
    assert all(o.shape[0] == 3 for o in out)


def test_export_onnx_raw_and_nms_gate(tiny_ckpt, tmp_path):
    from yololite_tpu.deploy.export import export_onnx, load_exported

    ckpt, img_size = tiny_ckpt
    art = export_onnx(ckpt, out_dir=str(tmp_path), fmt="raw", batch=1,
                      img_size=img_size)
    call, meta = load_exported(art)
    out = call(np.zeros((1, img_size, img_size, 3), np.uint8))
    assert isinstance(out, tuple) and len(out) == len(meta["outputs"])
    # per-level maps [B,S,S,5+C]
    assert out[0].shape[0] == 1 and out[0].shape[-1] == 5 + 3

    with pytest.raises(ValueError):
        export_onnx(ckpt, out_dir=str(tmp_path), fmt="nms")


def test_infer_exported_host_postproc_on_onnx(tiny_ckpt, tmp_path):
    """decoded .onnx + host NMS produces finite, in-range detections."""
    import sys
    sys.path.insert(0, "tools")
    from yololite_tpu.deploy.export import export_onnx, load_exported
    from tools.infer_exported import postprocess_decoded

    ckpt, img_size = tiny_ckpt
    art = export_onnx(ckpt, out_dir=str(tmp_path), fmt="decoded",
                      img_size=img_size)
    call, _ = load_exported(art)
    rng = np.random.RandomState(1)
    images = (rng.rand(1, img_size, img_size, 3) * 255).astype(np.uint8)
    out = call(images)
    boxes, scores, classes, kept = postprocess_decoded(out, conf=0.0, iou=0.5,
                                                       max_det=50)
    assert len(kept) == len(boxes)
    assert len(boxes) > 0
    assert np.isfinite(boxes).all()
    assert (boxes[:, :2] <= boxes[:, 2:] + 1e-3).all()
    assert scores.max() <= 1.0 + 1e-6


@pytest.mark.slow
def test_emit_diverse_backbones(tmp_path):
    """The emitter covers the zoo's op variety: SE blocks (efflite has none,
    effv2 does), SPPF max-pool (cs3darknet), GELU/LayerNorm (convnextv2)."""
    import jax
    import jax.numpy as jnp
    from yololite_tpu.deploy.onnx_emit import export_fn_to_onnx
    from yololite_tpu.deploy.onnx_run import load_onnx
    from yololite_tpu.models.backbones.zoo import build_backbone

    for name in ("tf_efficientnetv2_b0", "cs3darknet_focus_m",
                 "convnextv2_tiny"):
        try:
            bb, _info = build_backbone(name, dtype=jnp.float32)
        except (KeyError, ValueError):
            continue  # not in this zoo build
        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                        jnp.float32)
        v = bb.init(jax.random.PRNGKey(0), x, train=False)
        fn = lambda img: tuple(bb.apply(v, img, train=False))  # noqa: E731
        ref = [np.asarray(r) for r in fn(x)]
        path = str(tmp_path / f"{name}.onnx")
        export_fn_to_onnx(fn, (x,), path, input_names=["images"])
        outs = load_onnx(path)(np.asarray(x))
        assert len(outs) == len(ref)
        for o, r in zip(outs, ref):
            np.testing.assert_allclose(o, r, rtol=1e-3, atol=1e-3,
                                       err_msg=name)


@pytest.mark.slow
def test_onnx_seg_decoded_parity(tmp_path):
    """Segmentation decoded graph (protonet + coef head) through the ONNX
    emitter matches the JAX graph (mask_coef / protos / boxes)."""
    import jax.numpy as jnp
    from yololite_tpu.deploy.export import export_onnx, load_exported
    from yololite_tpu.models.detector import build_model_from_config, init_model
    from yololite_tpu.ops.decode import decode_anchorfree
    from yololite_tpu.train.checkpoint import build_meta, save_checkpoint
    from yololite_tpu.train.checkpoint import load_checkpoint, model_from_meta
    from yololite_tpu.train.steps import normalize_images

    img = 64
    cfg = {"model": {"arch": "YOLOLiteMS_CPU",
                     "backbone": "mobilenetv4_conv_small_050",
                     "fpn_channels": 32, "width_multiple": 1.0,
                     "depth_multiple": 0.5, "head_depth": 1,
                     "num_classes": 3, "num_anchors_per_level": 1,
                     "with_masks": True},
           "training": {"img_size": img}}
    model = build_model_from_config(cfg, dtype=jnp.float32)
    params, bstats = init_model(model, img, seed=5, batch=1)
    meta = build_meta(cfg, {"AP": 0.0}, "AP", ["a", "b", "c"],
                     model.get_num_anchors_per_level())
    ck = str(tmp_path / "seg.ckpt")
    save_checkpoint(ck, params, bstats, meta)

    path = export_onnx(ck, out_dir=str(tmp_path), fmt="decoded", img_size=img)
    call, _ = load_exported(path)
    x = (np.random.RandomState(1).rand(1, img, img, 3) * 255).astype(np.uint8)
    out = {k: np.asarray(v) for k, v in call(x).items()}

    outs, protos = model.apply({"params": params, "batch_stats": bstats},
                               normalize_images(jnp.asarray(x), jnp.float32),
                               train=False)
    d = decode_anchorfree(outs, img, num_classes=model.num_classes)
    np.testing.assert_allclose(out["boxes_xyxy"], np.asarray(d["box"]),
                               atol=0.05)
    np.testing.assert_allclose(out["mask_coef"], np.asarray(d["coef"]),
                               atol=0.01)
    np.testing.assert_allclose(out["protos"], np.asarray(protos), atol=0.01)
