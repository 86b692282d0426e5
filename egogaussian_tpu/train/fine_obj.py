"""Stage 3: joint fine-tuning of object shape + per-frame pose.

Behavioral twin of reference `trainers/fine_obj.py:27-237` (run twice, once
from the static-phase object PLY and once from the coarse-stage PLY):

  70k iterations sampling all frames with dynamic weighted 5:1.
  Static frame -> shape only; dynamic frame -> the frame's stored pose delta
  is loaded into the trainable pose and (possibly) refined; after the step
  the updated delta is written back and the accumulated transforms refresh.
  Pose LRs start at 0 (train_fine_obj_setup, gaussian_model.py:782-809 —
  the dividers are commented out in the reference), and are restored to the
  full obj_*_lr at densify_until_iter: the pose effectively trains only in
  the last (total - densify_until) iterations.
  Gaussian LRs are the /5 dividers with the xyz expon schedule; densify/
  prune which_object=1 every 50 iters in [500, 45k] + object opacity resets.
  Loss: 0.8*L1+0.2*(1-SSIM) on gt*obj_mask + 0.2*L2(obj_mask, alpha),
  hand-gradient gating on image and alpha.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.config import Config
from egogaussian_tpu.data.readers import stack_cameras
from egogaussian_tpu.models.gaussians import GaussianModel, ensure_capacity, save_ply
from egogaussian_tpu.models.optim import adam_init, expon_lr
from egogaussian_tpu.models.pose import (
    ObjectPose,
    PoseSequence,
    pose_from_rt,
    save_pose_sequence,
)
from egogaussian_tpu.train.coarse_pose import _pose_core
from egogaussian_tpu.train.static import (
    _densify_jit,
    _log_dropped_pairs,
    _reset_opacity_jit,
)
from egogaussian_tpu.utils.console import CONSOLE
from egogaussian_tpu.utils.logging import log_metrics


def _fine_lr_tree(model, it, opt, divide_3dgs: float = 5.0):
    """Gaussian LRs for fine_obj: /5 dividers, opacity not divided, xyz expon
    schedule (train_fine_obj_setup + update_learning_rate per iter). `it`
    may be traced — called from inside the stage jit."""
    spatial = model.spatial_lr_scale
    xyz_lr = expon_lr(
        jnp.asarray(it, jnp.float32),
        opt.position_lr_init * spatial / divide_3dgs,
        opt.position_lr_final * spatial / divide_3dgs,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )
    lrs = dict(
        xyz=xyz_lr,
        features_dc=opt.feature_lr / divide_3dgs,
        features_rest=opt.feature_lr / 20.0 / divide_3dgs,
        log_scales=opt.scaling_lr / divide_3dgs,
        quats=opt.rotation_lr / divide_3dgs,
        opacity_logit=opt.opacity_lr,
        label=0.0,
    )
    return dataclasses.replace(
        jax.tree_util.tree_map(lambda x: 0.0, model.params),
        **{k: jnp.asarray(v, jnp.float32) for k, v in lrs.items()},
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "train_pose", "opt_cfg", "fine_cfg", "backend", "tile_config",
        "crop_size",
    ),
)
def _fine_obj_step(
    model: GaussianModel,
    opt_state,
    pose_seq: PoseSequence,
    pose_opt,
    batch,
    cam_idx: jnp.ndarray,
    it: jnp.ndarray,
    drop_max,
    train_pose: bool,
    opt_cfg=None,
    fine_cfg=None,
    backend: str = "tiled",
    tile_config=None,
    crop_size=None,
    crop_max=0,
):
    """Stage-3 iteration with the pose sequence DEVICE-RESIDENT: the frame's
    stored delta is loaded in-jit, the accumulated transforms are recomputed
    in-jit by the associative scan (O(F) tiny matmuls — noise next to the
    render), and the trained delta is written back in-jit gated on the pose
    LR being live. The previous host-side version synced the full accum
    tables to numpy after every dynamic write-back and blocked on a float()
    per iteration for the LR schedule — over the remote-TPU tunnel those
    round trips cost more than the whole compiled step."""
    fp = fine_cfg
    accum_T = pose_seq.accum_T()
    accum_R = pose_seq.accum_R()
    eye4 = jnp.eye(4, dtype=accum_T.dtype)
    eye3 = jnp.eye(3, dtype=accum_R.dtype)
    if train_pose:
        # load the frame's stored delta into the trainable pose
        # (fine_obj.py:113-119 .data injection twin); fixed prefix is the
        # accumulation through cam_idx - 1 (identity at frame 0)
        pose = pose_from_rt(
            pose_seq.rotations[cam_idx], pose_seq.translations[cam_idx]
        )
        prev = jnp.maximum(cam_idx - 1, 0)
        fixed_T = jnp.where(cam_idx > 0, accum_T[prev], eye4)
        fixed_R = jnp.where(cam_idx > 0, accum_R[prev], eye3)
    else:
        pose = ObjectPose(jnp.zeros(3, eye4.dtype), eye3[:, :2])
        fixed_T = accum_T[cam_idx]
        fixed_R = accum_R[cam_idx]

    lr_tree = _fine_lr_tree(model, it, opt_cfg)
    # pose LR: zero until densify_until, then full (fine_obj.py:90-95 +
    # train_fine_obj_setup's zeroed groups)
    pose_live = it >= fp.densify_until_iter
    plr_t = jnp.where(pose_live, opt_cfg.obj_translation_lr, 0.0)
    plr_r = jnp.where(pose_live, opt_cfg.obj_rotation_lr, 0.0)

    (model, opt_state, pose, pose_opt, loss, radii, drop_max,
     crop_max) = _pose_core(
        model, opt_state, pose, pose_opt, batch, cam_idx,
        fixed_T, fixed_R, lr_tree, plr_t, plr_r,
        jnp.asarray(True), drop_max,
        train_pose=train_pose,
        lambda_image=fp.lambda_Ll1_image,
        lambda_dssim=fp.lambda_dssim,
        lambda_l1_alpha=fp.lambda_Ll1_alpha,
        lambda_l2_alpha=fp.lambda_Ll2_alpha,
        backend=backend,
        tile_config=tile_config,
        crop_size=crop_size,
        crop_max=crop_max,
    )
    if train_pose and opt_cfg.obj_translation_lr > 0:
        # write back (fine_obj.py:216-224) only once the pose LR is live —
        # before densify_until the delta is untouched by construction
        upd = pose_seq.update_frame(cam_idx, pose)
        pose_seq = jax.tree_util.tree_map(
            lambda a, b: jnp.where(pose_live, b, a), pose_seq, upd
        )
    return model, opt_state, pose_seq, pose_opt, loss, radii, drop_max, crop_max


def fine_tune_obj(
    cameras: Sequence,
    obj_model: GaussianModel,
    pose_seq: PoseSequence,
    cfg: Config,
    static_phase_frames: List[List[int]],
    dynamic_phase_frames: List[List[int]],
    cameras_extent: float,
    save_dir: Optional[str] = None,
    seed: int = 0,
    backend: str = "auto",
    checkpoint_every: int = 0,
) -> Tuple[PoseSequence, GaussianModel]:
    """Stage 3 for ONE object PLY variant. The reference driver calls this
    twice (from-static and from-coarse, fine_obj.py:49-61) and stage 5 picks
    one; the CLI does the same."""
    rng = np.random.RandomState(seed)
    fp = cfg.fine
    model = obj_model
    batch = stack_cameras(list(cameras))
    pose_seq = pose_seq

    static_list = [f for ph in static_phase_frames for f in ph]
    dynamic_list = [
        f for ph in dynamic_phase_frames for f in ph
        if bool(np.asarray(pose_seq.solved)[f])
    ]
    frames = static_list + dynamic_list
    weights = np.array([1.0] * len(static_list) + [5.0] * len(dynamic_list))
    weights = weights / weights.sum()
    CONSOLE.log(
        f"[fine_obj] {len(static_list)} static + {len(dynamic_list)} dynamic "
        f"frames, {fp.total_num_iter} iters"
    )

    opt_state = adam_init(model.params)
    from egogaussian_tpu.train.common import (
        auto_tile_config, maybe_grow_crop, pick_backend, pose_crop_size,
    )
    tile_cfg = auto_tile_config(model, batch.camera(0), tile_size=cfg.render.tile_size)
    backend = pick_backend(tile_cfg, backend)
    crop_size = pose_crop_size(batch, cfg, "fine_obj")
    pose_opt = adam_init(ObjectPose(jnp.zeros(3), jnp.eye(3)[:, :2]))
    key = jax.random.PRNGKey(seed)

    # mid-stage checkpoint/resume (iteration-granular, train/ckpt_hook.py)
    from egogaussian_tpu.train.ckpt_hook import StageCheckpointer

    ckpt = StageCheckpointer(
        os.path.join(save_dir, "ckpt_fine_obj.npz")
        if save_dir and checkpoint_every else None,
        checkpoint_every,
    )
    start_it = 0
    if ckpt.exists():
        cap = ckpt.peek_capacity()
        while model.capacity < cap:
            model, opt_state, _ = ensure_capacity(
                model, opt_state, min_free=model.capacity + 1
            )
        (model, opt_state, pose_opt, pose_seq), start_it, key = ckpt.try_restore(
            (model, opt_state, pose_opt, pose_seq), rng, key
        )
        tile_cfg = auto_tile_config(model, batch.camera(0), tile_size=cfg.render.tile_size)
        backend = pick_backend(tile_cfg, backend)

    drop_max = jnp.int32(0)
    last_drop = 0
    # [count, need_w, need_h] when crop is active (render/crop.crop_window)
    crop_max = (jnp.zeros((3,), jnp.int32) if crop_size is not None
                else jnp.int32(0))
    last_crop = 0
    for it in range(start_it + 1, fp.total_num_iter + 1):
        if it == 1:
            cam_idx, train_p = static_phase_frames[0][0], False
        else:
            cam_idx = int(frames[rng.choice(len(frames), p=weights)])
            train_p = cam_idx in dynamic_list
        (model, opt_state, pose_seq, pose_opt, loss, radii, drop_max,
         crop_max) = _fine_obj_step(
            model, opt_state, pose_seq, pose_opt, batch,
            cam_idx, it, drop_max,
            train_pose=train_p,
            opt_cfg=cfg.opt,
            fine_cfg=fp,
            backend=backend,
            tile_config=tile_cfg,
            crop_size=crop_size,
            crop_max=crop_max,
        )

        if it % fp.densification_interval == 0:
            from egogaussian_tpu.train.common import maybe_regrow_tile_config

            tile_cfg, last_drop, changed = maybe_regrow_tile_config(
                model, batch.camera(0), tile_cfg, drop_max, last_drop,
                "fine_obj",
            )
            if changed:
                drop_max, last_drop = jnp.int32(0), 0
            crop_size, last_crop, cchanged = maybe_grow_crop(
                crop_size, crop_max, last_crop, batch, "fine_obj",
            )
            if cchanged:
                crop_max = (jnp.zeros((3,), jnp.int32)
                            if crop_size is not None else jnp.int32(0))
            from egogaussian_tpu.train.common import crop_escape_count

            log_metrics(
                "fine_obj", it, loss=loss, alive=model.num_alive,
                capacity=model.capacity, dropped_pairs=drop_max,
                crop_escapes=crop_escape_count(crop_max),
            )
        if it < fp.densify_until_iter and it > fp.densify_from_iter:
            if it % fp.densification_interval == 0:
                size_threshold = 20.0 if it > fp.opacity_reset_interval else None
                key, sub = jax.random.split(key)
                res = _densify_jit(
                    model, opt_state, sub,
                    max_grad=fp.densify_grad_threshold,
                    min_opacity=fp.min_opacity,
                    extent=cameras_extent,
                    max_screen_size=size_threshold,
                    percent_dense=cfg.opt.percent_dense,
                    which_object=1,
                )
                model, opt_state = res.model, res.opt_state
                if int(res.overflow):
                    CONSOLE.log(
                        f"[fine_obj] it {it}: densify overflow — "
                        f"{int(res.overflow)} candidates dropped"
                    )
                model, opt_state, grew = ensure_capacity(model, opt_state)
                if grew:
                    tile_cfg = auto_tile_config(model, batch.camera(0), tile_size=cfg.render.tile_size)
            if it % fp.opacity_reset_interval == 0:
                model, opt_state = _reset_opacity_jit(
                    model, opt_state, which_object=1
                )
        ckpt.maybe_save(
            it, (model, opt_state, pose_opt, pose_seq), rng, key
        )

    _log_dropped_pairs("fine_obj", None, drop_max)
    if save_dir:
        save_pose_sequence(
            os.path.join(save_dir, "obj_pose_sequence.npz"),
            pose_seq,
            [c.image_name for c in cameras],
        )
        save_ply(model, os.path.join(save_dir, "gaussians_fine.ply"))
    return pose_seq, model
