import json, os
from yololite_tpu import YoloLite

results = {}
for name in ("edge_n", "edge_s"):
    model = YoloLite(name)
    r = model.train(data="/tmp/synth4/data.yaml", epochs=60, batch_size=16,
                    img_size=320, workers=0, run_dir="runs/synth_study",
                    save_by="AP50", seed=0, save_every=1000)
    results[name] = {"best": r.get("best_metric"), "coco": r.get("coco", {}),
                     "log_dir": r.get("log_dir")}
    print(json.dumps({name: results[name]["coco"]}), flush=True)
print("FINAL", json.dumps({k: {"AP50": v["coco"].get("AP50"),
                               "AP": v["coco"].get("AP")} for k, v in results.items()}))
