"""YoloLite-TPU: a TPU-native (JAX/XLA/Pallas/pjit) anchor-free object detection framework.

A from-scratch rebuild of the capabilities of Lillthorin/YoloLite-Official-Repo
(reference: /root/reference) designed TPU-first:

- Static-shape, jit-compiled forward -> decode -> NMS graphs (MXU-friendly NHWC convs,
  bf16 compute, fused conv+BN+SiLU epilogues via XLA).
- Vectorized SimOTA assignment (no per-image Python loop; reference
  `scripts/loss/loss.py:304` is the anti-pattern this design removes).
- Data parallelism via `jax.sharding.Mesh` + NamedSharding over ICI
  (the reference is single-device; see SURVEY.md section on parallelism).
- Host-side numpy/cv2 input pipeline with padded fixed-shape targets.

Public API (mirrors the reference V2 pip API described in README.md:20-42 and
consumed by benchmark.py:73-107):

    from yololite_tpu import YoloLite
    model = YoloLite("runs/train/1/weights/best.ckpt")
    results = model.predict("image.jpg")
    model.train(data="dataset.yaml", epochs=100)
    model.val(data="dataset.yaml")
    model.export(format="stablehlo")
"""

__version__ = "0.1.0"

from yololite_tpu.api import YoloLite  # noqa: E402,F401

__all__ = ["YoloLite", "__version__"]
