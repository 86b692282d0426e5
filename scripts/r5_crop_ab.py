"""On-chip crop-window A/B with the r5 directional-growth loop.

The r4 A/B (`evidence/onchip_r5/crop_ab_fixedwin.json`) used the driver's
initial window un-grown: 1442 counted escapes and a (correctly) different
loss — the counted-escape case, not an equivalence proof. This script runs
the FULL driver protocol: start from `pose_crop_size`, step, and on any
escape grow via `maybe_grow_crop` (directional, r5) until escapes == 0 —
then assert crop-vs-full loss equality on the chip and time both paths at
the final window.

Output: val_runs/crop_ab_r5.json (one JSON object).
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
    auto_tile_config, crop_escape_count, maybe_grow_crop, pick_backend,
    pose_crop_size,
)
from egogaussian_tpu.train.coarse_pose import coarse_step

W, H = 640, 480
print("backend:", jax.default_backend(), flush=True)

model = bench._scene(bench.N_GAUSSIANS)
# Tight object: the r5 first attempt at xyz*0.2 left a support of 690x544
# px — wider than the 640-frame, so no crop window exists and growth
# (correctly) disabled. 0.08 + clipped tails keeps the opacity-aware reach
# well inside the frame so the equality branch actually runs.
model = dataclasses.replace(
    model, params=dataclasses.replace(
        model.params,
        xyz=jnp.clip(model.params.xyz * 0.08, -0.45, 0.45),
    )
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
batch = dataclasses.replace(
    batch,
    obj_masks=jnp.asarray(np.repeat(mask[None], batch.num_frames, 0)),
    obj_mask_valid=jnp.ones(batch.num_frames, bool),
)

cfg = Config()
tile_cfg = auto_tile_config(model, cam, headroom=1.5)
backend = pick_backend(tile_cfg, "auto")
crop0 = pose_crop_size(batch, cfg, "crop_ab")
assert crop0 is not None, "A/B scene produced no crop window"

opt_state = adam_init(model.params)
pose = identity_pose()
pose_opt = adam_init(pose)
drop0 = jnp.int32(0)
eye4, eye3 = jnp.eye(4), jnp.eye(3)
F = batch.num_frames
table_T = jnp.tile(eye4[None], (F + 1, 1, 1))
table_R = jnp.tile(eye3[None], (F + 1, 1, 1))


def step(it, grad_params, crop_size, crop_max):
    return coarse_step(
        model, opt_state, pose, pose_opt, batch, 0, table_T, table_R, -1,
        it, drop0, train_pose=True, first_frame=False,
        grad_params=grad_params, opt_cfg=cfg.opt, coarse_cfg=cfg.coarse,
        backend=backend, tile_config=tile_cfg, crop_size=crop_size,
        crop_max=crop_max,
    )


def timed(fn, n=30):
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return n / (time.perf_counter() - t0), out


rec = {"tile_size": tile_cfg.tile_size, "crop_initial": list(crop0)}

# --- driver growth protocol: grow until escapes == 0 (or crop disables) ---
crop = crop0
growth_path = []
for attempt in range(8):
    cmax = jnp.zeros((3,), jnp.int32)
    out = step(100, False, crop, cmax)
    stat = np.asarray(out[7])
    growth_path.append({"crop": list(crop), "escapes": int(stat[0]),
                        "need": [int(stat[1]), int(stat[2])]})
    print("growth:", growth_path[-1], flush=True)
    if int(stat[0]) == 0:
        break
    crop, _, changed = maybe_grow_crop(
        crop, stat, 0, batch, "crop_ab")
    if crop is None or not changed:
        break
rec["growth_path"] = growth_path
rec["crop_final"] = list(crop) if crop else None

if crop is not None:
    rec["crop_area_frac"] = round(crop[0] * crop[1] / (W * H), 3)
    for name, it, gp in (("coarse_warmup", 100, False),
                         ("coarse_full", 25_600, True)):
        ips_full, out_f = timed(lambda: step(it, gp, None, jnp.int32(0)))
        ips_crop, out_c = timed(
            lambda: step(it, gp, crop, jnp.zeros((3,), jnp.int32)))
        rec[f"{name}_full_ips"] = round(ips_full, 2)
        rec[f"{name}_crop_ips"] = round(ips_crop, 2)
        rec[f"{name}_loss_full"] = float(out_f[4])
        rec[f"{name}_loss_crop"] = float(out_c[4])
        rec[f"{name}_escapes"] = crop_escape_count(out_c[7])
        rec[f"{name}_dloss"] = abs(
            rec[f"{name}_loss_full"] - rec[f"{name}_loss_crop"])
        print(name, "full", ips_full, "crop", ips_crop,
              "dloss", rec[f"{name}_dloss"],
              "escapes", rec[f"{name}_escapes"], flush=True)

with open("/root/repo/val_runs/crop_ab_r5.json", "w") as f:
    json.dump(rec, f, indent=1)
print("written val_runs/crop_ab_r5.json", flush=True)
