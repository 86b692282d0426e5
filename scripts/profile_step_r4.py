"""Phase-level decomposition of the 480p/100k bench train step.

VERDICT r3 item 2: roofline_frac 0.013 says the step is nowhere near the
HBM bound — this script measures WHERE the ~22 ms actually goes, by timing
each pipeline phase as its own jitted function on the real chip:

  proj        EWA projection of N gaussians (fwd / fwd+bwd)
  bin         pair expansion + packed-key sort + range search (fwd only —
              binning is integer side computation, no grad)
  layout      bin + slot streams + the [SC]-row pair gather + chunk
              transpose (fwd / fwd+bwd: the bwd adds the scatter-add VJP)
  kernel      the tilegrid Pallas compositor on the prepared layout
              (fwd / fwd+bwd)
  loss        L1+SSIM on a [3, H, W] image (fwd+bwd)
  adam        optimizer update from precomputed grads
  render_fwd / step_grad / full_step   end-to-end composites

Phases overlap (layout includes bin includes proj), so the JSON reports
both raw times and first-difference "marginal" costs. Run on TPU:
  python scripts/profile_step_r4.py [--width 640 --height 480 --iters 50]
Writes val_runs/profile_r4.json (one JSON object, also printed).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--warmup_train", type=int, default=300)
    ap.add_argument("--out", default="val_runs/profile_r4.json")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _scene
    from egogaussian_tpu.config import Config
    from egogaussian_tpu.data import make_synthetic_video, stack_cameras
    from egogaussian_tpu.models import adam_init
    from egogaussian_tpu.models.optim import adam_update, gaussian_lr_tree
    from egogaussian_tpu.render.project import project_gaussians
    from egogaussian_tpu.render.tiled import bin_pairs, composite_pallas
    from egogaussian_tpu.render.pallas_raster import (
        _CHUNK, make_tilegrid_compositor,
    )
    from egogaussian_tpu.train.common import (
        auto_tile_config, image_loss, mask_grad, model_colors, pick_backend,
        render_gaussians,
    )

    model = _scene(a.n)
    vid = make_synthetic_video(
        width=a.width, height=a.height, n_bg=128, n_obj=32,
        frames_static=2, frames_dynamic=1,
    )
    batch = stack_cameras(vid.cameras[:4])
    cfg = Config()
    opt_state = adam_init(model.params)
    lr_tree = gaussian_lr_tree(
        model.params, jnp.int32(100), cfg.opt, 1.0, label_lr=0.0
    )
    tile_cfg = auto_tile_config(model, batch.camera(0), headroom=1.5)
    backend = pick_backend(tile_cfg, "auto")
    assert backend == "pallas", backend
    cam = batch.camera(0)
    _, gt, hand, _ = batch.frame(0)
    bg = jnp.zeros(3)

    @jax.jit
    def train_step(model, opt_state, fidx):
        cam_i, gt_i, hand_i, _ = batch.frame(fidx)

        def loss_fn(params):
            m = dataclasses.replace(model, params=params)
            res = render_gaussians(m, cam_i, bg, tile_config=tile_cfg,
                                   backend=backend)
            return image_loss(mask_grad(res.image, hand_i), gt_i, 0.2)

        loss, grads = jax.value_and_grad(loss_fn)(model.params)
        new_params, new_opt = adam_update(model.params, grads, opt_state,
                                          lr_tree)
        return dataclasses.replace(model, params=new_params), new_opt, loss

    # anneal with REAL training like the bench does, so the measured
    # distribution is the bench's distribution
    model, opt_state, loss = train_step(model, opt_state, jnp.int32(0))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(a.warmup_train):
        model, opt_state, loss = train_step(model, opt_state,
                                            jnp.int32(i % 4))
    jax.block_until_ready(loss)
    warm_ips = a.warmup_train / (time.perf_counter() - t0)

    def timed(fn, *args, n_iter=a.iters):
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / n_iter * 1e3  # ms

    params = model.params
    alive = model.aux.alive
    opac = model.opacity
    cov = jax.jit(lambda p: dataclasses.replace(model, params=p).covariance())

    ms = {}
    ms["dispatch_noop"] = timed(jax.jit(lambda x: x + 1.0), jnp.float32(0))

    # --- projection ---
    def proj_of(p, m):
        return project_gaussians(
            p.xyz, dataclasses.replace(model, params=p).covariance(),
            cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height, valid_mask=m,
        )

    ms["proj_fwd"] = timed(jax.jit(lambda p: proj_of(p, alive)), params)
    pj = jax.jit(lambda p: proj_of(p, alive))(params)
    cot_p = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.random.RandomState(0).randn(*x.shape),
                              x.dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.zeros_like(x), pj)

    def proj_loss(p):
        pr = proj_of(p, alive)
        return (jnp.vdot(pr.means2d, cot_p.means2d)
                + jnp.vdot(pr.conics, cot_p.conics)
                + jnp.vdot(pr.depths, cot_p.depths))

    ms["proj_grad"] = timed(jax.jit(jax.grad(proj_loss)), params)

    # --- binning (integer side computation, fwd only) ---
    def bin_of(p):
        pr = proj_of(p, alive)
        o = jnp.where(alive, opac, 0.0)
        order, g_sorted, tile_sorted, starts, tile_cnt, dropped, _ = (
            bin_pairs(pr, cam.width, cam.height, tile_cfg, opacities=o)
        )
        return jnp.sum(tile_cnt), dropped, jnp.sum(starts)

    ms["bin_fwd"] = timed(jax.jit(bin_of), params)

    # --- layout: bin + slot streams + pair gather + chunk transpose ---
    # (mirrors composite_pallas's tilegrid prelude, tiled.py:527-593)
    sc = tile_cfg.max_slots or tile_cfg.max_pairs
    sc = -(-sc // _CHUNK) * _CHUNK
    n_slots = sc // _CHUNK
    ts = tile_cfg.tile_size
    n_tx = -(-cam.width // ts)
    n_ty = -(-cam.height // ts)
    n_tiles = n_tx * n_ty

    def layout_of(p):
        pr = proj_of(p, alive)
        o = jnp.where(alive, opac, 0.0)
        colors = model_colors(dataclasses.replace(model, params=p))
        order, g_sorted, _, starts, tile_cnt, dropped, _ = bin_pairs(
            pr, cam.width, cam.height, tile_cfg, opacities=o)
        padded_cnt = ((tile_cnt + _CHUNK - 1) // _CHUNK) * _CHUNK
        starts2 = jnp.cumsum(padded_cnt) - padded_cnt
        overflowed = starts2 + padded_cnt > sc
        packed = jnp.concatenate(
            [pr.means2d, pr.conics, o[:, None], colors, pr.depths[:, None]],
            axis=1)[order]

        def stream(vals_t):
            buf = jnp.zeros((sc,), jnp.int32).at[starts2].max(
                vals_t, mode="drop")
            return jax.lax.cummax(buf)

        q = jnp.arange(sc, dtype=jnp.int32)
        a_q = stream(starts)
        b_q = stream(starts2)
        p_q = jnp.clip(a_q + (q - b_q), 0, tile_cfg.max_pairs - 1)
        vals = packed[g_sorted[p_q]]
        fit_slots = jnp.sum(jnp.where(overflowed, 0, padded_cnt)) // _CHUNK
        meta = jnp.stack([
            jnp.where(overflowed, 0, starts2 // _CHUNK),
            jnp.where(overflowed, 0, tile_cnt),
            jnp.broadcast_to(fit_slots, (n_tiles,)),
        ])
        ch = vals.shape[-1]
        ch16 = (ch + 7) // 8 * 8
        vals = jnp.pad(vals, ((0, 0), (0, ch16 - ch))).reshape(
            n_slots, _CHUNK, ch16).transpose(0, 2, 1)
        return meta, vals, tile_cnt, overflowed

    ms["layout_fwd"] = timed(jax.jit(layout_of), params)
    meta_c, vals_c, tile_cnt_c, _ = jax.jit(layout_of)(params)
    cot_v = jnp.asarray(
        np.random.RandomState(1).randn(*vals_c.shape), jnp.float32)
    ms["layout_grad"] = timed(
        jax.jit(jax.grad(lambda p: jnp.vdot(layout_of(p)[1], cot_v))), params)

    # --- kernel in isolation on the prepared layout ---
    d = 3
    compositor = make_tilegrid_compositor(
        n_slots, n_tiles, d, ts, n_tx,
        interpret=jax.default_backend() != "tpu")
    bg1 = bg[None, :]
    ms["kernel_fwd"] = timed(
        jax.jit(lambda v: compositor(meta_c, v, bg1)), vals_c)
    img_c, alpha_c, depth_c = jax.jit(
        lambda v: compositor(meta_c, v, bg1))(vals_c)
    ci = jnp.asarray(np.random.RandomState(2).randn(*img_c.shape), jnp.float32)
    ca = jnp.asarray(np.random.RandomState(3).randn(*alpha_c.shape), jnp.float32)
    cd = jnp.asarray(np.random.RandomState(4).randn(*depth_c.shape), jnp.float32)

    def kernel_loss(v):
        i, al, de = compositor(meta_c, v, bg1)
        return jnp.vdot(i, ci) + jnp.vdot(al, ca) + jnp.vdot(de, cd)

    ms["kernel_grad"] = timed(jax.jit(jax.grad(kernel_loss)), vals_c)

    # --- image loss in isolation ---
    img_full = jax.jit(lambda p: render_gaussians(
        dataclasses.replace(model, params=p), cam, bg, tile_config=tile_cfg,
        backend=backend).image)(params)
    ms["loss_grad"] = timed(
        jax.jit(jax.grad(
            lambda im: image_loss(mask_grad(im, hand), gt, 0.2))), img_full)

    # --- adam in isolation ---
    grads_c = jax.jit(jax.grad(lambda p: image_loss(
        mask_grad(render_gaussians(
            dataclasses.replace(model, params=p), cam, bg,
            tile_config=tile_cfg, backend=backend).image, hand),
        gt, 0.2)))(params)
    ms["adam"] = timed(
        jax.jit(lambda g: adam_update(params, g, opt_state, lr_tree)),
        grads_c)

    # --- end-to-end composites ---
    ms["render_fwd"] = timed(jax.jit(lambda p: render_gaussians(
        dataclasses.replace(model, params=p), cam, bg, tile_config=tile_cfg,
        backend=backend).image), params)
    ms["step_grad"] = timed(jax.jit(jax.grad(lambda p: image_loss(
        mask_grad(render_gaussians(
            dataclasses.replace(model, params=p), cam, bg,
            tile_config=tile_cfg, backend=backend).image, hand),
        gt, 0.2))), params)
    ms["full_step"] = timed(train_step, model, opt_state, jnp.int32(0))

    pairs_total = int(jnp.sum(tile_cnt_c))
    occupied = int(jnp.sum(tile_cnt_c > 0))
    marginal = {
        "bin_sort_after_proj": round(ms["bin_fwd"] - ms["proj_fwd"], 3),
        "gather_transpose_after_bin": round(
            ms["layout_fwd"] - ms["bin_fwd"], 3),
        "layout_bwd_extra": round(ms["layout_grad"] - ms["layout_fwd"], 3),
        "kernel_bwd_extra": round(ms["kernel_grad"] - ms["kernel_fwd"], 3),
        "proj_bwd_extra": round(ms["proj_grad"] - ms["proj_fwd"], 3),
        "sum_of_parts": round(
            ms["layout_grad"] + ms["kernel_grad"] + ms["loss_grad"]
            + ms["adam"], 3),
    }
    out = {
        "shape": f"{a.width}x{a.height}",
        "n_gaussians": a.n,
        "warmup_ips": round(warm_ips, 2),
        "tile_cfg": {
            "max_pairs": tile_cfg.max_pairs,
            "max_slots": tile_cfg.max_slots,
            "max_per_tile": tile_cfg.max_per_tile,
            "tile_size": tile_cfg.tile_size,
        },
        "pairs_total": pairs_total,
        "occupied_tiles": occupied,
        "n_tiles": n_tiles,
        "n_slots": n_slots,
        "phase_ms": {k: round(v, 3) for k, v in ms.items()},
        "marginal_ms": marginal,
    }
    print(json.dumps(out), flush=True)
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
