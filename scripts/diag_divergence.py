"""Decisive on-TPU experiments for the round-2 pallas training divergence.

STATUS.md round-2 "OPEN INVESTIGATION": static training at 480p/160p
diverged on TPU with backend=pallas (loss 0.37 -> 0.47 over 160 iters)
while identical code converged on CPU. The queued decisive tests never ran
(relay outage). This script packages them:

  A. grad check at INIT, 160p and 480p, kNN scene: pallas / tiled /
     pallas+bwd_exact_total vs oracle (rel per field + # offending
     gaussians).
  B. training A/B: 200 std iters with backend=pallas and backend=tiled,
     same rng; loss trajectories printed every 10 iters.
  C. along the TILED trajectory, every 25 iters: pallas-vs-oracle grad rel
     on the CURRENT state (localizes when the error appears without
     needing it to compound).
  D. on the worst state found: render/debug.check_layout (pair-for-pair
     layout differential) + check_tilegrid_kernel (dense HIGHEST-precision
     per-tile reference) -> separates layout bugs from kernel numerics.
     The state is saved to <out>/bad_state.npz for offline replay.

Usage: python scripts/diag_divergence.py [--width 160 --height 120]
       [--iters 200] [--out val_runs/diag_r3]
Every result is printed as it lands (partial results survive a tunnel
death) and appended to <out>/diag.jsonl.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(out_dir, rec):
    print(json.dumps(rec), flush=True)
    with open(os.path.join(out_dir, "diag.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")


GRAD_FIELDS = ("xyz", "log_scales", "quats", "opacity_logit", "features_dc")


def grad_report(gr_ref, gr_x):
    """Per-field rel error + # of gaussians whose xyz-grad rel error > 0.1."""
    import jax.numpy as jnp

    rep = {}
    worst = 0.0
    for name in GRAD_FIELDS:
        a, b = getattr(gr_ref, name), getattr(gr_x, name)
        scale = float(jnp.max(jnp.abs(a))) or 1.0
        rel = float(jnp.max(jnp.abs(a - b))) / scale
        rep[name] = float(f"{rel:.4g}")
        worst = max(worst, rel)
    a, b = gr_ref.xyz, gr_x.xyz
    scale = float(jnp.max(jnp.abs(a))) or 1.0
    per_g = np.asarray(jnp.max(jnp.abs(a - b), axis=-1)) / scale
    rep["n_offenders_xyz_gt_0.1"] = int((per_g > 0.1).sum())
    rep["worst"] = float(f"{worst:.4g}")
    return rep, worst


def make_problem(width, height, n_bg=4000, n_obj=400, seed=7):
    from egogaussian_tpu.data import make_synthetic_video, stack_cameras
    from egogaussian_tpu.models import from_points

    vid = make_synthetic_video(
        width=width, height=height, n_bg=n_bg, n_obj=n_obj,
        frames_static=4, frames_dynamic=2, seed=seed,
    )
    model = from_points(vid.points, vid.colors, spatial_lr_scale=1.2, seed=0)
    batch = stack_cameras(vid.cameras[:4])
    return model, batch


def loss_and_grad_fns(model, batch, tile_cfg):
    """Training-loss grad (same loss as _static_step mode=std) per backend."""
    import jax
    import jax.numpy as jnp

    from egogaussian_tpu.train.common import (
        image_loss, mask_grad, render_gaussians,
    )

    def make(backend, cfg):
        def loss(params, m0):
            m = dataclasses.replace(m0, params=params)
            cam, gt, hand, _ = batch.frame(0)
            res = render_gaussians(m, cam, jnp.zeros(3), backend=backend,
                                   tile_config=cfg)
            return image_loss(mask_grad(res.image, hand), gt, 0.2)

        return jax.jit(jax.grad(loss))

    cfg_exact = dataclasses.replace(tile_cfg, bwd_exact_total=True)
    return {
        "oracle": make("oracle", None),
        "tiled": make("tiled", tile_cfg),
        "pallas": make("pallas", tile_cfg),
        "pallas_exact_total": make("pallas", cfg_exact),
    }


def experiment_A(out_dir, width, height):
    model, batch = make_problem(width, height)
    from egogaussian_tpu.train.common import auto_tile_config

    tile_cfg = auto_tile_config(model, batch.camera(0))
    fns = loss_and_grad_fns(model, batch, tile_cfg)
    gr_o = fns["oracle"](model.params, model)
    rec = {"exp": "A_init_grads", "shape": [width, height],
           "capacity": model.capacity}
    worst = {}
    for name in ("tiled", "pallas", "pallas_exact_total"):
        rep, w = grad_report(gr_o, fns[name](model.params, model))
        rec[name] = rep
        worst[name] = w
    log(out_dir, rec)
    return worst


def run_training(model0, batch, backend, tile_cfg, n_iter, opt_cfg,
                 record_every=10, state_hook=None):
    import jax.numpy as jnp

    from egogaussian_tpu.models import adam_init
    from egogaussian_tpu.train.static import _static_step

    model = model0
    opt_state = adam_init(model.params)
    rng = np.random.RandomState(0)
    drop = jnp.int32(0)
    losses = []
    states = {}
    for it in range(1, n_iter + 1):
        fidx = rng.randint(batch.num_frames)
        model, opt_state, loss, _, drop = _static_step(
            model, opt_state, batch, fidx, batch.hand_masks, it, drop,
            mode="std", backend=backend, tile_config=tile_cfg,
            opt_cfg=opt_cfg,
        )
        if it % record_every == 0:
            losses.append((it, round(float(loss), 5)))
        if state_hook and it % state_hook == 0:
            states[it] = model
    return losses, model, int(drop), states


def experiment_BC(out_dir, width, height, n_iter):
    import jax.numpy as jnp

    from egogaussian_tpu.config import Config
    from egogaussian_tpu.train.common import auto_tile_config

    model0, batch = make_problem(width, height)
    cfg = Config()
    tile_cfg = auto_tile_config(model0, batch.camera(0))

    # B: loss trajectories
    traj = {}
    for backend in ("pallas", "tiled"):
        losses, _, drop, _ = run_training(
            model0, batch, backend, tile_cfg, n_iter, cfg.opt)
        traj[backend] = losses
        log(out_dir, {"exp": "B_training", "backend": backend,
                      "shape": [width, height], "dropped": drop,
                      "losses": losses})

    # C: grad checks along the tiled trajectory
    _, _, _, states = run_training(
        model0, batch, "tiled", tile_cfg, n_iter, cfg.opt, state_hook=25)
    fns = loss_and_grad_fns(model0, batch, tile_cfg)
    worst_state, worst_rel = None, 0.0
    for it, m in sorted(states.items()):
        gr_o = fns["oracle"](m.params, m)
        rec = {"exp": "C_grad_along_traj", "it": it,
               "shape": [width, height]}
        for name in ("pallas", "pallas_exact_total", "tiled"):
            rep, w = grad_report(gr_o, fns[name](m.params, m))
            rec[name] = rep
            if name == "pallas" and w > worst_rel:
                worst_rel, worst_state = w, (it, m)
        log(out_dir, rec)
    return traj, worst_state, worst_rel, batch, tile_cfg


def experiment_D(out_dir, state, batch, tile_cfg, width, height):
    import jax.numpy as jnp

    from egogaussian_tpu.render.api import _colors_from_sh
    from egogaussian_tpu.render.debug import check_layout, check_tilegrid_kernel
    from egogaussian_tpu.render.project import project_gaussians

    it, model = state
    # persist the failing state for offline replay
    np.savez(
        os.path.join(out_dir, "bad_state.npz"),
        **{f"p_{k}": np.asarray(getattr(model.params, k))
           for k in GRAD_FIELDS + ("label", "features_rest")},
        alive=np.asarray(model.aux.alive), it=it,
    )
    cam = batch.camera(0)
    proj = project_gaussians(
        model.params.xyz, model.covariance(), cam.viewmat,
        cam.fx, cam.fy, cam.cx, cam.cy, width, height,
        valid_mask=model.aux.alive,
    )
    sh = jnp.concatenate(
        [model.params.features_dc, model.params.features_rest], axis=1)
    cols = _colors_from_sh(sh, model.sh_degree, model.params.xyz,
                           cam.camera_center)
    opac = jnp.where(model.aux.alive, model.opacity, 0.0)
    lay = check_layout(proj, cols, opac, width, height, tile_cfg)
    ker = check_tilegrid_kernel(proj, cols, opac, width, height, tile_cfg)
    log(out_dir, {"exp": "D_debug_checks", "it": it,
                  "layout": lay._asdict(),
                  "kernel_vs_dense_ref": {
                      k: (float(f"{v:.4g}") if isinstance(v, float) else v)
                      for k, v in ker._asdict().items()}})


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--height", type=int, default=120)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--out", default="/root/repo/val_runs/diag_r3")
    p.add_argument("--skip-480p-init", action="store_true")
    a = p.parse_args()
    os.makedirs(a.out, exist_ok=True)

    import jax
    log(a.out, {"exp": "env", "backend": jax.default_backend(),
                "devices": [str(d) for d in jax.devices()]})

    worst = experiment_A(a.out, a.width, a.height)
    if not a.skip_480p_init:
        experiment_A(a.out, 640, 480)

    traj, worst_state, worst_rel, batch, tile_cfg = experiment_BC(
        a.out, a.width, a.height, a.iters)
    if worst_state is not None and worst_rel > 1e-2:
        experiment_D(a.out, worst_state, batch, tile_cfg, a.width, a.height)
    else:
        log(a.out, {"exp": "D_debug_checks", "skipped":
                    f"worst pallas grad rel along trajectory {worst_rel:.4g}"
                    " <= 1e-2 — nothing to diagnose"})


if __name__ == "__main__":
    main()
