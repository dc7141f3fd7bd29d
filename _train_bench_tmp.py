import time
import numpy as np
import jax
import jax.numpy as jnp
from yololite_tpu.models.detector import build_model_from_config
from yololite_tpu.train.steps import Trainer

cfg = {"model": {"arch":"YOLOLiteMS_CPU","backbone":"mobilenetv4_conv_small_050",
       "depth_multiple":0.65,"width_multiple":0.60,"fpn_channels":160,"head_depth":1,
       "num_classes":3,"num_anchors_per_level":1},
       "training":{"img_size":640,"lr":1e-3,"optimizer":"adamw","weight_decay":1e-4,
                   "grad_clip":1.0,"ema":True,"ema_decay":0.995,"amp":True},
       "loss":{"topk_limit":20,"area_cells_min":0.0,"area_cells_max":256,"area_tol":1.75}}
model = build_model_from_config(cfg, dtype=jnp.bfloat16)
tr = Trainer(model, cfg, total_updates=1000)
state = tr.init_state(seed=0)
B = 64
m = 50
rng = np.random.RandomState(0)
batch = {"image": (rng.rand(B,640,640,3)*255).astype(np.uint8),
         "boxes": (rng.rand(B,m,4)*300).astype(np.float32),
         "labels": rng.randint(0,3,(B,m)).astype(np.int32),
         "mask": rng.rand(B,m) < 0.2}
batch["boxes"][...,2:] += batch["boxes"][...,:2] + 20
db = tr.put_batch(batch)
lrv = tr.lr_vector(1e-3)
state, met = tr.train_step(state, db, lrv)
jax.block_until_ready(met["total"])
t0 = time.perf_counter()
iters = 10
for _ in range(iters):
    state, met = tr.train_step(state, db, lrv)
jax.block_until_ready(met["total"])
dt = (time.perf_counter()-t0)/iters
print(f"edge_n@640 train step (B={B}, bf16, SimOTA+AdamW+EMA): {dt*1e3:.1f} ms/step = {B/dt:.0f} img/s")
