import json
from yololite_tpu import YoloLite
model = YoloLite("edge_m")
r = model.train(data="/tmp/synth4/data.yaml", epochs=60, batch_size=16,
                img_size=320, workers=0, run_dir="runs/synth_study",
                save_by="AP50", seed=0, save_every=1000)
c = r.get("coco", {})
print("EDGE_M_FINAL", json.dumps({"AP50": c.get("AP50"), "AP": c.get("AP")}))
