"""Stage 5: fine-tune the full scene (object + background together).

Behavioral twin of reference `trainers/fine_all.py:25-138`:
  object PLY + background PLY combined into one model; 40k iterations;
  pose FROZEN (poses applied as fixed per-frame transforms); full-frame
  0.8*L1 + 0.2*(1-SSIM) with hand-mask gradient gating only; 4:1 dynamic
  frame sampling; no densification — only the opacity-clamp pass the
  reference applies inside the [densify_from, densify_until) window on
  iterations NOT divisible by opacity_reset_interval (fine_all.py:121-124;
  faithfully reproduced — it keeps opacities <= 0.01 through that window
  which culls floaters before the final convergence).
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.config import Config
from egogaussian_tpu.data.readers import FrameBatch, stack_cameras
from egogaussian_tpu.models.gaussians import GaussianModel, combine_models, save_ply
from egogaussian_tpu.models.optim import adam_init, adam_update, expon_lr
from egogaussian_tpu.models.pose import PoseSequence
from egogaussian_tpu.train.common import (
    auto_tile_config,
    image_loss,
    pick_backend,
    mask_grad,
    render_gaussians,
)
from egogaussian_tpu.models.densify import reset_opacity
from egogaussian_tpu.train.static import _log_dropped_pairs
from egogaussian_tpu.utils.console import CONSOLE
from egogaussian_tpu.utils.logging import log_metrics


def _fine_all_body(
    model: GaussianModel,
    opt_state,
    batch: FrameBatch,
    cam_idx: jnp.ndarray,
    accum_T: jnp.ndarray,
    accum_R: jnp.ndarray,
    it: jnp.ndarray,
    clamp_opacity: jnp.ndarray,
    drop_max=0,
    lambda_dssim: float = 0.2,
    backend: str = "tiled",
    tile_config=None,
    opt_cfg=None,
    xyz_lr_mult=None,
):
    """One stage-5 iteration. The frozen per-frame pose is gathered in-jit
    from the device-resident accumulated tables ([F,4,4]/[F,3,3]); the LR
    tree (train_fine_all_setup with divide_3dgs_lr_by=1, fine_all.py:55 +
    per-iteration xyz expon schedule) is computed in-jit from the traced
    iteration counter; `clamp_opacity` applies the reference's stray
    opacity clamp (fine_all.py:121-124) inside the same dispatch.

    `xyz_lr_mult` (traced scalar, optional): per-scene spatial-extent
    factor for the multi-scene lockstep — the xyz LR is linear in
    spatial_lr_scale so scenes stored at spatial 1.0 train exactly as if
    theirs were `mult` (parallel/multi_scene.py)."""
    cam, gt, hand, _ = batch.frame(cam_idx)
    bg = jnp.zeros(3, model.params.xyz.dtype)
    fixed_T = accum_T[cam_idx]
    fixed_R = accum_R[cam_idx]
    o = opt_cfg
    spatial = model.spatial_lr_scale
    xyz_lr = expon_lr(
        jnp.asarray(it, jnp.float32),
        o.position_lr_init * spatial,
        o.position_lr_final * spatial,
        lr_delay_mult=o.position_lr_delay_mult,
        max_steps=o.position_lr_max_steps,
    )
    if xyz_lr_mult is not None:
        xyz_lr = xyz_lr * jnp.asarray(xyz_lr_mult, jnp.float32)
    lrs = dict(
        xyz=xyz_lr,
        features_dc=o.feature_lr,
        features_rest=o.feature_lr / 20.0,
        log_scales=o.scaling_lr,
        quats=o.rotation_lr,
        opacity_logit=o.opacity_lr,
        label=0.0,
    )
    lr_tree = dataclasses.replace(
        jax.tree_util.tree_map(lambda x: 0.0, model.params),
        **{k: jnp.asarray(v, jnp.float32) for k, v in lrs.items()},
    )

    def loss_fn(params):
        m = dataclasses.replace(model, params=params)
        res = render_gaussians(
            m, cam, bg, pose_T=fixed_T, extra_rot=fixed_R, backend=backend,
            tile_config=tile_config,
        )
        img = mask_grad(res.image, hand)
        return image_loss(img, gt, lambda_dssim), res.dropped_pairs

    (loss, dropped), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        model.params
    )
    new_params, new_opt = adam_update(model.params, grads, opt_state, lr_tree)
    model = dataclasses.replace(model, params=new_params)
    clamped_model, clamped_opt = reset_opacity(model, new_opt)
    model, new_opt = jax.tree_util.tree_map(
        lambda a, b: jnp.where(clamp_opacity, b, a),
        (model, new_opt), (clamped_model, clamped_opt),
    )
    return model, new_opt, loss, jnp.maximum(drop_max, dropped)


_fine_all_step = jax.jit(
    _fine_all_body,
    static_argnames=("lambda_dssim", "backend", "tile_config", "opt_cfg"),
)


def fine_tune_all(
    cameras: Sequence,
    obj_model: GaussianModel,
    bg_model: GaussianModel,
    pose_seq: PoseSequence,
    cfg: Config,
    static_phase_frames: List[List[int]],
    dynamic_phase_frames: List[List[int]],
    save_dir: Optional[str] = None,
    seed: int = 0,
    backend: str = "auto",
    checkpoint_every: int = 0,
) -> GaussianModel:
    rng = np.random.RandomState(seed)
    ap = cfg.fine_all
    model = combine_models(obj_model, bg_model)
    model = dataclasses.replace(model, spatial_lr_scale=obj_model.spatial_lr_scale)
    batch = stack_cameras(list(cameras))

    static_list = [f for ph in static_phase_frames for f in ph]
    dynamic_list = [f for ph in dynamic_phase_frames for f in ph]
    frames = static_list + dynamic_list
    weights = np.array([1.0] * len(static_list) + [4.0] * len(dynamic_list))
    weights = weights / weights.sum()

    opt_state = adam_init(model.params)
    tile_cfg = auto_tile_config(model, batch.camera(0), tile_size=cfg.render.tile_size)
    backend = pick_backend(tile_cfg, backend)
    # pose frozen all stage: accumulate ONCE, keep device-resident
    accum_T = pose_seq.accum_T()
    accum_R = pose_seq.accum_R()

    # mid-stage checkpoint/resume (iteration-granular; no densification in
    # this stage so the capacity is fixed by combine_models and the saved
    # state restores into the freshly-combined model's shapes)
    from egogaussian_tpu.train.ckpt_hook import StageCheckpointer

    ckpt = StageCheckpointer(
        os.path.join(save_dir, "ckpt_fine_all.npz")
        if save_dir and checkpoint_every else None,
        checkpoint_every,
    )
    start_it = 0
    if ckpt.exists():
        (model, opt_state), start_it, _ = ckpt.try_restore(
            (model, opt_state), rng, jax.random.PRNGKey(0)
        )
    CONSOLE.log(
        f"[fine_all] {int(model.num_alive)} gaussians, "
        f"{len(frames)} frames, {ap.total_num_iter} iters"
    )

    drop_max = jnp.int32(0)
    last_drop = 0
    for it in range(start_it + 1, ap.total_num_iter + 1):
        if it == 1:
            cam_idx = static_phase_frames[0][0]
        else:
            cam_idx = int(frames[rng.choice(len(frames), p=weights)])
        # the reference's stray opacity clamp (fine_all.py:121-124) runs
        # inside the step under a traced flag — no second dispatch
        clamp = (
            ap.densify_from_iter < it < ap.densify_until_iter
            and bool(it % ap.opacity_reset_interval)
        )
        model, opt_state, loss, drop_max = _fine_all_step(
            model, opt_state, batch, cam_idx, accum_T, accum_R, it, clamp,
            drop_max, lambda_dssim=ap.lambda_dssim, backend=backend,
            tile_config=tile_cfg, opt_cfg=cfg.opt,
        )
        if it % ap.opacity_reset_interval == 0:
            from egogaussian_tpu.train.common import maybe_regrow_tile_config

            tile_cfg, last_drop, changed = maybe_regrow_tile_config(
                model, batch.camera(0), tile_cfg, drop_max, last_drop,
                "fine_all",
            )
            if changed:
                drop_max, last_drop = jnp.int32(0), 0
            log_metrics(
                "fine_all", it, loss=loss, alive=model.num_alive,
                capacity=model.capacity, dropped_pairs=drop_max,
            )
        ckpt.maybe_save(
            it, (model, opt_state), rng, jax.random.PRNGKey(0)
        )

    _log_dropped_pairs("fine_all", None, drop_max)
    if save_dir:
        save_ply(model, os.path.join(save_dir, "gaussians_all.ply"))
    return model
