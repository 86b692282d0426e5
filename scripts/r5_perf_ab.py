"""On-chip perf A/Bs for round 5.

1. Binning-capacity headroom sweep: every cost in the tiled path (pair
   sort, layout, kernel grid) scales with the STATIC capacities, not the
   occupancy. Trainers call auto_tile_config with the generous default
   headroom=3.0 (sized for densification growth mid-phase); bench measures
   at 1.5. This sweep quantifies what the trainers are paying for that
   headroom — drop-counted regrowth (maybe_regrow_tile_config) is the
   safety net that makes a tighter default safe.

2. Trained-scene step timing: the synthetic 100k random cloud is
   adversarial (deep tiles). This times the SAME train step on the actual
   fine_all output of the committed dense validation run (53k trained
   gaussians), giving the it/s figure that end-to-end budgets should use.

Output: val_runs/perf_ab_r5.json.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from egogaussian_tpu.config import Config
from egogaussian_tpu.data import make_synthetic_video, stack_cameras
from egogaussian_tpu.models import adam_init
from egogaussian_tpu.models.optim import adam_update, gaussian_lr_tree
from egogaussian_tpu.train.common import (
    auto_tile_config, image_loss, mask_grad, pick_backend, render_gaussians,
)

print("backend:", jax.default_backend(), flush=True)
rec = {}


def time_step(model, width, height, headroom, n_warm=60, n_iter=40,
              overrides=None):
    vid = make_synthetic_video(width=width, height=height, n_bg=128,
                               n_obj=32, frames_static=2, frames_dynamic=1)
    batch = stack_cameras(vid.cameras[:4])
    cfg = Config()
    opt_state = adam_init(model.params)
    lr_tree = gaussian_lr_tree(model.params, jnp.int32(100), cfg.opt, 1.0,
                               label_lr=0.0)
    tile_cfg = auto_tile_config(model, batch.camera(0), headroom=headroom)
    if overrides:
        tile_cfg = dataclasses.replace(tile_cfg, **overrides)
    backend = pick_backend(tile_cfg, "auto")

    @jax.jit
    def train_step(model, opt_state, fidx):
        cam, gt, hand, _ = batch.frame(fidx)

        def loss_fn(params):
            m = dataclasses.replace(model, params=params)
            res = render_gaussians(m, cam, jnp.zeros(3),
                                   tile_config=tile_cfg, backend=backend)
            return image_loss(mask_grad(res.image, hand), gt, 0.2)

        loss, grads = jax.value_and_grad(loss_fn)(model.params)
        new_params, new_opt = adam_update(model.params, grads, opt_state,
                                          lr_tree)
        return dataclasses.replace(model, params=new_params), new_opt, loss

    m, o, loss = train_step(model, opt_state, jnp.int32(0))
    jax.block_until_ready(loss)
    for i in range(n_warm):
        m, o, loss = train_step(m, o, jnp.int32(i % 4))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(n_iter):
        m, o, loss = train_step(m, o, jnp.int32(i % 4))
    jax.block_until_ready(loss)
    ips = n_iter / (time.perf_counter() - t0)
    res = jax.jit(lambda mm: render_gaussians(
        mm, batch.camera(0), jnp.zeros(3), tile_config=tile_cfg,
        backend=backend))(m)
    return round(ips, 2), int(res.dropped_pairs), tile_cfg


# ---- 1. headroom sweep on the bench scene ----
model = bench._scene(bench.N_GAUSSIANS)
for w, h, tag in ((640, 480, "480p"), (1600, 900, "1600x900")):
    for hr in (3.0, 1.5, 1.2):
        ips, dropped, tc = time_step(model, w, h, hr)
        rec[f"{tag}_hr{hr}"] = {
            "ips": ips, "dropped": dropped,
            "max_pairs": tc.max_pairs, "max_slots": tc.max_slots,
        }
        print(tag, "headroom", hr, "->", ips, "it/s, dropped", dropped,
              "max_pairs", tc.max_pairs, flush=True)

# ---- 2. trained-scene step timing ----
ply = "/root/repo/val_runs/480p_dense_r4/output/fine_all/gaussians_all.ply"
if os.path.exists(ply):
    from egogaussian_tpu.models.gaussians import load_ply

    tm = load_ply(ply, spatial_lr_scale=1.2)
    rec["trained_n_alive"] = int(np.asarray(tm.num_alive))
    for hr in (3.0, 1.5):
        ips, dropped, tc = time_step(tm, 640, 480, hr, n_warm=20)
        rec[f"trained_480p_hr{hr}"] = {"ips": ips, "dropped": dropped,
                                       "max_pairs": tc.max_pairs}
        print("trained 480p headroom", hr, "->", ips, "it/s, dropped",
              dropped, flush=True)
else:
    rec["trained_scene"] = "PLY missing (dense validation output not found)"

with open("/root/repo/val_runs/perf_ab_r5.json", "w") as f:
    json.dump(rec, f, indent=1)
print("written val_runs/perf_ab_r5.json", flush=True)
