"""On-chip A/B: crop-window coarse step vs full-frame (r4 perf item).

Builds a 100k-gaussian object whose projected support covers ~1/3 of a 480p
frame (representative of the coarse stage's object-only model), a FrameBatch
whose obj_masks match the support, and times `coarse_step` with and without
the crop window the driver would pick (train/common.pose_crop_size). Also
compile-proves the d=1 label path at the new tile_size=32 default (Mosaic
rejects zero-sized pads only at real-chip compile time — CPU tests cannot
catch it) and checks crop-vs-full loss equality on the chip.

Output: one JSON line -> val_runs/crop_ab_r4.json
"""
import dataclasses
import json
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
from egogaussian_tpu.models.pose import identity_pose
from egogaussian_tpu.render.project import project_gaussians
from egogaussian_tpu.train.common import (
    auto_tile_config, pick_backend, pose_crop_size, render_label_image,
)
from egogaussian_tpu.train.coarse_pose import coarse_step

W, H = 640, 480
print("backend:", jax.default_backend(), flush=True)

model = bench._scene(bench.N_GAUSSIANS)
# concentrate the cloud so its projection covers ~20% of the frame
# (representative of an egocentric manipulated object)
model = dataclasses.replace(
    model, params=dataclasses.replace(model.params, xyz=model.params.xyz * 0.2)
)
model = dataclasses.replace(
    model,
    aux=dataclasses.replace(
        model.aux, is_object=jnp.ones(model.capacity, jnp.int32)
    ),
)

vid = make_synthetic_video(width=W, height=H, n_bg=128, n_obj=32,
                           frames_static=2, frames_dynamic=1)
batch = stack_cameras(vid.cameras[:4])
cam = batch.camera(0)
proj = project_gaussians(
    model.params.xyz, model.covariance(), cam.viewmat, cam.fx, cam.fy,
    cam.cx, cam.cy, W, H, valid_mask=model.aux.alive,
)
mu = np.asarray(proj.means2d)
ok = np.asarray(proj.radii) > 0
x0, x1 = np.percentile(mu[ok, 0], [2, 98])
y0, y1 = np.percentile(mu[ok, 1], [2, 98])
mask = np.zeros((1, H, W), np.float32)
mask[0, int(max(y0, 0)):int(min(y1, H)), int(max(x0, 0)):int(min(x1, W))] = 1.0
print(f"support bbox ~({x0:.0f},{y0:.0f})..({x1:.0f},{y1:.0f})", flush=True)
batch = dataclasses.replace(
    batch,
    obj_masks=jnp.asarray(np.repeat(mask[None], batch.num_frames, 0)),
    obj_mask_valid=jnp.ones(batch.num_frames, bool),
)

cfg = Config()
tile_cfg = auto_tile_config(model, cam, headroom=1.5)
backend = pick_backend(tile_cfg, "auto")
crop = pose_crop_size(batch, cfg, "crop_ab")
print("tile_cfg:", tile_cfg, "crop:", crop, flush=True)
assert crop is not None, "A/B scene produced no crop window — shrink the object"

opt_state = adam_init(model.params)
pose = identity_pose()
pose_opt = adam_init(pose)
drop0 = jnp.int32(0)
eye4, eye3 = jnp.eye(4), jnp.eye(3)
F = batch.num_frames
table_T = jnp.tile(eye4[None], (F + 1, 1, 1))
table_R = jnp.tile(eye3[None], (F + 1, 1, 1))


def timed(fn, n=30):
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return n / (time.perf_counter() - t0), out


def step(it, grad_params, crop_size):
    return coarse_step(
        model, opt_state, pose, pose_opt, batch, 0, table_T, table_R, -1,
        it, drop0, train_pose=True, first_frame=False,
        grad_params=grad_params, opt_cfg=cfg.opt, coarse_cfg=cfg.coarse,
        backend=backend, tile_config=tile_cfg, crop_size=crop_size,
    )


rec = {"crop_size": list(crop) if crop else None,
       "tile_size": tile_cfg.tile_size}
for name, it, gp in (("coarse_warmup", 100, False),
                     ("coarse_full", 25_600, True)):
    ips_full, out_f = timed(lambda: step(it, gp, None))
    ips_crop, out_c = timed(lambda: step(it, gp, crop))
    rec[f"{name}_full_ips"] = round(ips_full, 2)
    rec[f"{name}_crop_ips"] = round(ips_crop, 2)
    rec[f"{name}_loss_full"] = float(out_f[4])
    rec[f"{name}_loss_crop"] = float(out_c[4])
    rec[f"{name}_crop_escapes"] = int(out_c[7])
    print(name, "full", rec[f"{name}_full_ips"], "crop",
          rec[f"{name}_crop_ips"], "escapes", rec[f"{name}_crop_escapes"],
          "dloss", abs(rec[f"{name}_loss_full"] - rec[f"{name}_loss_crop"]),
          flush=True)

# d=1 label path at the ts32 default (compile-or-die on the real chip)
lbl = render_label_image(model, cam, backend="pallas", tile_config=tile_cfg)
jax.block_until_ready(lbl)
rec["label_d1_ts32_ok"] = bool(np.isfinite(np.asarray(lbl)).all())
print("label d=1 ts32:", rec["label_d1_ts32_ok"], flush=True)

with open("val_runs/crop_ab_r4.json", "w") as f:
    json.dump(rec, f)
print(json.dumps(rec), flush=True)
