"""Stage 2: coarse per-frame object-pose estimation.

Behavioral twin of reference `trainers/coarse_obj_pose.py:88-369`
(SURVEY.md §3.3), re-architected for TPU:

  * The apply/reverse xyz mutation dance is replaced by rendering from
    `xyz' = where(is_object, T_trainable ∘ T_accum_prev (xyz), xyz)` as a
    pure function of (params, pose); covariance of object Gaussians is
    rotated by the same rotation (render(..., rot_cov=True) twin).
  * The pose sequence is a dense PoseSequence pytree; accumulated transforms
    are an associative scan (models/pose.py) recomputed on device.
  * The warm-up / densify-window / restore LR choreography
    (coarse_obj_pose.py:178-193) is host-computed per iteration into LR
    trees passed to ONE jitted step (two variants: pose-trainable /
    pose-fixed).

Schedule per dynamic frame (30k iters each, CoarseParams):
  it < warm_up(20k):       pose-only (gaussian LRs zero unless first frame
                           of phase, which trains shape at /10 LRs)
  warm_up..densify_from:   gaussians at /10 LRs, xyz at /100
  densify window (20.5k-25.5k): pose frozen, xyz back to /10 with expon
                           schedule, densify/prune which_object=1 every 500,
                           object opacity reset every 2.5k
  after:                   pose LR restored (full), densification off
Frame selection: p=0.4 current frame (pose trainable; last dynamic frame
trains against next static phase's frames), else weighted previous frame
(static 1x, solved dynamic 2x) with a nonempty object mask; iteration 1
always uses the very first static frame.
Loss: 1.0*[0.9*L1 + 0.1*(1-SSIM)](gt*obj_mask, render) + 0.5*L2(obj_mask,
alpha), hand-mask gradient gating on image AND alpha.
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
from egogaussian_tpu.data.readers import FrameBatch, stack_cameras
from egogaussian_tpu.models.densify import add_densification_stats
from egogaussian_tpu.models.gaussians import GaussianModel, ensure_capacity, save_ply
from egogaussian_tpu.models.optim import (
    adam_init,
    adam_update,
    expon_lr,
    gaussian_lr_tree,
)
from egogaussian_tpu.models.pose import (
    ObjectPose,
    PoseSequence,
    empty_pose_sequence,
    identity_pose,
    pose_to_se3,
    save_pose_sequence,
)
from egogaussian_tpu.ops.losses import l1_loss, l2_loss
from egogaussian_tpu.train.common import (
    auto_tile_config,
    crop_escape_count,
    image_loss,
    pick_backend,
    mask_grad,
    render_gaussians,
)
from egogaussian_tpu.train.static import (
    _densify_jit,
    _log_dropped_pairs,
    _reset_opacity_jit,
)
from egogaussian_tpu.utils.console import CONSOLE
from egogaussian_tpu.utils.logging import log_metrics


def _pose_core(
    model: GaussianModel,
    opt_state,
    pose: ObjectPose,
    pose_opt_state,
    batch: FrameBatch,
    cam_idx: jnp.ndarray,
    fixed_T: jnp.ndarray,
    fixed_R: jnp.ndarray,
    lr_tree,
    pose_lr_t: jnp.ndarray,
    pose_lr_r: jnp.ndarray,
    record_stats: jnp.ndarray,
    drop_max,
    train_pose: bool,
    lambda_image: float = 1.0,
    lambda_dssim: float = 0.1,
    lambda_l1_alpha: float = 0.0,
    lambda_l2_alpha: float = 0.5,
    backend: str = "tiled",
    tile_config=None,
    grad_params: bool = True,
    param_grad_gate=None,
    crop_size=None,
    crop_max=0,
):
    """One pose-optimization iteration (shared core of stages 2 and 3 —
    always called from inside a stage-level jit).

    `crop_size` (static (crop_w, crop_h), optional) renders only a window
    auto-placed over (object-splat reach ∪ mask bbox) and computes the
    losses as crop sums normalized by the FULL frame's pixel count —
    provably identical loss and gradients whenever the returned
    `crop_out` count is 0 (render/crop.py has the argument; the escape
    count is the proof obligation, tracked like dropped_pairs). The
    reference renders the full frame every iteration
    (coarse_obj_pose.py:240-260) — this is a TPU-build optimization with
    no reference twin.
    grad_params=False skips the Gaussian-parameter backward entirely (the
    coarse warm-up trains pose only for 20k of 30k iters — no point paying
    for param gradients that meet zero learning rates).

    `param_grad_gate` (traced 0/1 scalar, optional) zeroes the parameter
    grads BEFORE adam_update. This reproduces the grad_params=False path
    exactly while the backward still exists in the graph — zero LRs alone
    would not (Adam moments would accumulate the gated grads and the step
    count diverges). The multi-scene lockstep uses it for scenes whose
    static grad_params flag would have been False.

    `train_pose` may be a python bool (static — XLA folds the selects and
    dead-code-eliminates the unused branch, reproducing the original
    two-variant compilation) or a traced boolean scalar (per-scene flags
    in the multi-scene lockstep, `coarse_step_traced`). A False flag must
    leave the pose AND its Adam moments bit-identical — zero-gradient
    updates would still decay the moments — so the pose update is
    where-gated, not lr-zeroed."""
    cam, gt, hand, obj_mask = batch.frame(cam_idx)
    bg = jnp.zeros(3, model.params.xyz.dtype)
    probe = jnp.zeros((model.capacity, 2), model.params.xyz.dtype)
    tp = jnp.asarray(train_pose)
    if crop_size is not None:
        from egogaussian_tpu.render.crop import crop_plane, mask_rect

        cw, ch = int(crop_size[0]), int(crop_size[1])
        rect = mask_rect(obj_mask)
        # sums over the crop / full-frame count == the full-frame means
        # (every outside pixel is exactly 0 in pred AND target)
        loss_scale = (cw * ch) / float(batch.width * batch.height)

    def loss_fn(params, pose_p, probe):
        m = dataclasses.replace(model, params=params)
        T = jnp.where(tp, pose_to_se3(pose_p) @ fixed_T, fixed_T)
        R_extra = jnp.where(tp, pose_p.rotation @ fixed_R, fixed_R)
        res = render_gaussians(
            m, cam, bg, pose_T=T, extra_rot=R_extra, means2d_probe=probe,
            backend=backend, tile_config=tile_config,
            crop_size=crop_size,
            crop_rect=rect if crop_size is not None else None,
        )
        if crop_size is not None:
            ox, oy = res.crop_offset[0], res.crop_offset[1]
            gt_c = crop_plane(gt, ox, oy, cw, ch)
            hand_c = crop_plane(hand, ox, oy, cw, ch)
            mask_c = crop_plane(obj_mask, ox, oy, cw, ch)
        else:
            gt_c, hand_c, mask_c = gt, hand, obj_mask
        img = mask_grad(res.image, hand_c)
        alpha = mask_grad(res.alpha, hand_c)
        gt_obj = gt_c * mask_c
        loss = lambda_image * image_loss(img, gt_obj, lambda_dssim)
        loss = loss + lambda_l1_alpha * l1_loss(mask_c, alpha)
        loss = loss + lambda_l2_alpha * l2_loss(mask_c, alpha)
        if crop_size is not None:
            loss = loss * loss_scale
        return loss, (res.radii, loss, res.dropped_pairs, res.crop_outside)

    if grad_params:
        grads, (radii, loss, dropped, crop_out) = jax.grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(model.params, pose, probe)
        param_grads, pose_grads, probe_grads = grads
    else:
        grads, (radii, loss, dropped, crop_out) = jax.grad(
            loss_fn, argnums=(1, 2), has_aux=True
        )(jax.lax.stop_gradient(model.params), pose, probe)
        pose_grads, probe_grads = grads
        param_grads = jax.tree_util.tree_map(jnp.zeros_like, model.params)

    if param_grad_gate is not None:
        g = jnp.asarray(param_grad_gate, model.params.xyz.dtype)
        param_grads = jax.tree_util.tree_map(lambda x: x * g, param_grads)

    # densification stats only after warm-up (coarse_obj_pose.py:283-287);
    # NDC-unit gradient scaling like the CUDA backward (see static.py)
    ndc_scale = jnp.array(
        [batch.width * 0.5, batch.height * 0.5], model.params.xyz.dtype
    )
    stats_model = add_densification_stats(model, probe_grads * ndc_scale, radii)
    model = jax.tree_util.tree_map(
        lambda a, b: jnp.where(record_stats, b, a), model, stats_model
    )

    new_params, new_opt = adam_update(model.params, param_grads, opt_state, lr_tree)
    model = dataclasses.replace(model, params=new_params)

    pose_lrs = ObjectPose(translation=pose_lr_t, rot6d=pose_lr_r)
    new_pose, new_popt = adam_update(
        pose, pose_grads, pose_opt_state, pose_lrs
    )
    sel = lambda new, old: jax.tree_util.tree_map(
        lambda a, b: jnp.where(tp, a, b), new, old
    )
    pose = sel(new_pose, pose)
    pose_opt_state = sel(new_popt, pose_opt_state)
    return (model, new_opt, pose, pose_opt_state, loss, radii,
            jnp.maximum(drop_max, dropped),
            jnp.maximum(jnp.asarray(crop_max, jnp.int32),
                        jnp.asarray(crop_out, jnp.int32)))


pose_step = functools.partial(
    jax.jit,
    static_argnames=(
        "train_pose", "lambda_image", "lambda_dssim", "lambda_l1_alpha",
        "lambda_l2_alpha", "backend", "tile_config", "grad_params",
        "crop_size",
    ),
)(_pose_core)


def _coarse_lr_tree(model, it, opt, cp, first_frame):
    """Gaussian-field LR tree for the coarse stage: /10 dividers, opacity NOT
    divided (train_coarse_obj_setup, gaussian_model.py:810-849); zeroed
    during warm-up unless it's the first frame of the phase; xyz choreography
    per coarse_obj_pose.py:178-196. `it` is TRACED — the whole tree is
    computed inside the stage jit (host-side eager LR ops over the remote-TPU
    tunnel cost more than the compiled step itself). `first_frame` may be a
    python bool (folded) or a traced scalar (multi-scene lockstep)."""
    spatial = model.spatial_lr_scale
    base = opt.position_lr_init * spatial / 10.0
    ff = jnp.asarray(first_frame)
    xyz_expon = expon_lr(
        jnp.asarray(it - cp.densify_from_iter, jnp.float32),
        base,
        opt.position_lr_final * spatial / 10.0,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )
    xyz_warm = jnp.where(ff, jnp.float32(base), jnp.float32(0.0))
    xyz = jnp.where(
        it < cp.warm_up_iter,
        xyz_warm,
        jnp.where(it <= cp.densify_from_iter, base / 10.0, xyz_expon),
    )
    # non-xyz fields: active outside warm-up (or on the phase's first frame)
    af = jnp.where(ff | (it >= cp.warm_up_iter), 1.0, 0.0)
    lrs = dict(
        xyz=xyz,
        features_dc=opt.feature_lr / 10.0 * af,
        features_rest=opt.feature_lr / 20.0 / 10.0 * af,
        log_scales=opt.scaling_lr / 10.0 * af,
        quats=opt.rotation_lr / 10.0 * af,
        opacity_logit=opt.opacity_lr * af,
        label=jnp.float32(0.0),
    )
    return dataclasses.replace(
        jax.tree_util.tree_map(lambda x: 0.0, model.params),
        **{k: jnp.asarray(v, jnp.float32) for k, v in lrs.items()},
    )


def _coarse_pose_lrs(it, opt, cp):
    """Pose LR: active until densify_from, frozen in the window, restored
    after densify_until (coarse_obj_pose.py:185-192). `it` may be traced."""
    in_window = (it >= cp.densify_from_iter) & (it < cp.densify_until_iter)
    return (
        jnp.where(in_window, 0.0, opt.obj_translation_lr),
        jnp.where(in_window, 0.0, opt.obj_rotation_lr),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "train_pose", "first_frame", "grad_params", "opt_cfg", "coarse_cfg",
        "backend", "tile_config", "crop_size",
    ),
)
def coarse_step(
    model: GaussianModel,
    opt_state,
    pose: ObjectPose,
    pose_opt_state,
    batch: FrameBatch,
    cam_idx: jnp.ndarray,
    table_T: jnp.ndarray,
    table_R: jnp.ndarray,
    fixed_idx: jnp.ndarray,
    it: jnp.ndarray,
    drop_max,
    train_pose: bool,
    first_frame: bool,
    grad_params: bool,
    count_advance=0,
    opt_cfg=None,
    coarse_cfg=None,
    backend: str = "tiled",
    tile_config=None,
    crop_size=None,
    crop_max=0,
):
    """Stage-2 iteration: the full per-iteration LR choreography (gaussian
    tree, pose LR freeze window, densify-stat gating) runs IN-JIT from the
    traced iteration counter; the fixed accumulated transform is gathered
    from identity-prefixed per-frame tables ([F+1,4,4]/[F+1,3,3], row 0 =
    identity for "no prefix") by the traced `fixed_idx + 1`."""
    return _coarse_body(
        model, opt_state, pose, pose_opt_state, batch, cam_idx, table_T,
        table_R, fixed_idx, it, drop_max, train_pose, first_frame,
        grad_params, opt_cfg, coarse_cfg, backend, tile_config,
        count_advance=count_advance, crop_size=crop_size, crop_max=crop_max,
    )


def _coarse_body(model, opt_state, pose, pose_opt_state, batch, cam_idx,
                 table_T, table_R, fixed_idx, it, drop_max, train_pose,
                 first_frame, grad_params, opt_cfg, coarse_cfg, backend,
                 tile_config, param_grad_gate=None, xyz_lr_mult=None,
                 count_advance=None, crop_size=None, crop_max=0):
    """Shared body of `coarse_step` (static flags) and `coarse_step_traced`
    (per-scene traced flags for the multi-scene lockstep).

    `xyz_lr_mult` (traced scalar, optional) scales the xyz LR — the coarse
    LR tree is linear in the STATIC spatial_lr_scale, so scenes with
    different nerf++ extents share one compilation by training at
    spatial_lr_scale=1 with their extent expressed here (exactly like
    multi_scene_static_step).

    `count_advance` (traced scalar, optional): advance the parameter Adam
    step count by this many extra steps before the update — the bit-exact
    residue of elided warm-up no-op iterations (see estimate_coarse_obj_pose:
    an adam_update with zero grads on zero moments changes NOTHING but the
    count, so k skipped steps fold into count += k here, keeping the hot
    loop at one dispatch per REAL step)."""
    cp = coarse_cfg
    if count_advance is not None:
        opt_state = dataclasses.replace(
            opt_state,
            count=opt_state.count + jnp.asarray(count_advance, jnp.int32),
        )
    lr_tree = _coarse_lr_tree(model, it, opt_cfg, cp, first_frame)
    if xyz_lr_mult is not None:
        lr_tree = dataclasses.replace(
            lr_tree, xyz=lr_tree.xyz * jnp.asarray(xyz_lr_mult, jnp.float32)
        )
    plr_t, plr_r = _coarse_pose_lrs(it, opt_cfg, cp)
    return _pose_core(
        model, opt_state, pose, pose_opt_state, batch, cam_idx,
        table_T[fixed_idx + 1], table_R[fixed_idx + 1], lr_tree,
        plr_t, plr_r, it > cp.warm_up_iter, drop_max,
        train_pose=train_pose,
        lambda_image=cp.lambda_image,
        lambda_dssim=cp.lambda_dssim,
        lambda_l1_alpha=cp.lambda_Ll1_alpha,
        lambda_l2_alpha=cp.lambda_Ll2_alpha,
        backend=backend,
        tile_config=tile_config,
        grad_params=grad_params,
        param_grad_gate=param_grad_gate,
        crop_size=crop_size,
        crop_max=crop_max,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "grad_params", "opt_cfg", "coarse_cfg", "backend", "tile_config",
    ),
)
def coarse_step_traced(
    model: GaussianModel,
    opt_state,
    pose: ObjectPose,
    pose_opt_state,
    batch: FrameBatch,
    cam_idx: jnp.ndarray,
    table_T: jnp.ndarray,
    table_R: jnp.ndarray,
    fixed_idx: jnp.ndarray,
    it: jnp.ndarray,
    drop_max,
    train_pose: jnp.ndarray,
    first_frame: jnp.ndarray,
    grad_params: bool = True,
    param_grad_gate=None,
    xyz_lr_mult=None,
    opt_cfg=None,
    coarse_cfg=None,
    backend: str = "tiled",
    tile_config=None,
):
    """`coarse_step` with train_pose/first_frame TRACED (boolean scalars):
    the flag combinations share ONE compilation, which is what lets the
    multi-scene lockstep give every scene its own per-iteration flags
    (jax.vmap can't batch over static arguments). Matches the static-flag
    step bit-for-bit including pose Adam moments
    (tests/test_multi_scene_coarse.py). `grad_params` stays static — it
    selects whether the parameter backward exists at all; the multi-scene
    caller passes the OR over scenes and gates each scene whose static
    flag would have been False via `param_grad_gate` (zeroed grads through
    the SAME adam_update — moments and step count match the
    grad_params=False path exactly; zero LRs alone would not)."""
    return _coarse_body(
        model, opt_state, pose, pose_opt_state, batch, cam_idx, table_T,
        table_R, fixed_idx, it, drop_max, train_pose, first_frame,
        grad_params, opt_cfg, coarse_cfg, backend, tile_config,
        param_grad_gate=param_grad_gate, xyz_lr_mult=xyz_lr_mult,
    )


@jax.jit
def _accum_tables(pose_seq: PoseSequence):
    """Identity-prefixed accumulated-transform tables for traced gathers:
    row i+1 holds the accumulation through frame i, row 0 the identity."""
    T = pose_seq.accum_T()
    R = pose_seq.accum_R()
    return (
        jnp.concatenate([jnp.eye(4, dtype=T.dtype)[None], T]),
        jnp.concatenate([jnp.eye(3, dtype=R.dtype)[None], R]),
    )


def estimate_coarse_obj_pose(
    cameras: Sequence,
    obj_model: GaussianModel,
    cfg: Config,
    static_phase_frames: List[List[int]],
    dynamic_phase_frames: List[List[int]],
    cameras_extent: float,
    save_dir: Optional[str] = None,
    seed: int = 0,
    backend: str = "auto",
    checkpoint_every: int = 0,
    skip_noop_warmup: bool = True,
) -> Tuple[PoseSequence, GaussianModel, Dict[int, str]]:
    """Stage 2. Returns (pose_sequence over all cameras, refined object
    model, {camera_index: image_name} for solved frames).

    checkpoint_every > 0 enables FRAME-granular mid-stage resume: after
    each solved frame (30k iters in the reference schedule) the
    (model, pose_seq) state plus host RNG/solved-set snapshot to
    ckpt_coarse.npz, and a fresh call skips already-solved frames. (The
    reference's equivalent is its per-frame atomic pose save + manual
    uncomment-to-resume, coarse_obj_pose.py:19-28, train.py:122.)"""
    from egogaussian_tpu.train.common import maybe_grow_crop, pose_crop_size

    rng = np.random.RandomState(seed)
    cp = cfg.coarse
    model = obj_model
    batch = stack_cameras(list(cameras))
    tile_cfg = auto_tile_config(model, batch.camera(0), tile_size=cfg.render.tile_size)
    backend = pick_backend(tile_cfg, backend)
    crop_size = pose_crop_size(batch, cfg, "coarse")
    F = batch.num_frames
    pose_seq = empty_pose_sequence(F)
    solved_names: Dict[int, str] = {}

    from egogaussian_tpu.train.ckpt_hook import StageCheckpointer

    ckpt = StageCheckpointer(
        os.path.join(save_dir, "ckpt_coarse.npz")
        if save_dir and checkpoint_every else None,
        # any nonzero value saves after every solved frame
        1 if checkpoint_every else 0,
    )
    if ckpt.exists():
        cap = ckpt.peek_capacity()
        opt_tmp = adam_init(model.params)
        while model.capacity < cap:
            model, opt_tmp, _ = ensure_capacity(
                model, opt_tmp, min_free=model.capacity + 1
            )
        key_dummy = jax.random.PRNGKey(0)
        (model, pose_seq), _, _ = ckpt.try_restore(
            (model, pose_seq), rng, key_dummy
        )
        solved_names = dict(ckpt.extra or {})
        tile_cfg = auto_tile_config(model, batch.camera(0), tile_size=cfg.render.tile_size)
        backend = pick_backend(tile_cfg, backend)
        CONSOLE.log(f"[coarse] resume: {len(solved_names)} frames solved")

    drop_max = jnp.int32(0)
    last_drop = 0
    # [count, need_w, need_h] when crop is active (render/crop.crop_window)
    crop_max = (jnp.zeros((3,), jnp.int32) if crop_size is not None
                else jnp.int32(0))
    last_crop = 0
    for phase, dyn_frames in enumerate(dynamic_phase_frames):
        # append first frame of the next static phase (coarse_obj_pose.py:137)
        frames = list(dyn_frames) + [static_phase_frames[phase + 1][0]]
        CONSOLE.log(
            f"[coarse] phase {phase}: frames {frames[0]}..{frames[-1]} "
            f"({len(frames)} incl. next-static anchor)"
        )
        for i, f_cur in enumerate(frames):
            if f_cur in solved_names:
                continue  # frame-granular resume: already solved
            # device-resident accumulated-transform tables, built ONCE per
            # frame-solve (only already-solved frames are ever gathered, and
            # those rows don't change while f_cur trains)
            table_T, table_R = _accum_tables(pose_seq)

            # previous-frame sampling pool (static 1x, solved dynamic 2x;
            # only frames with a nonempty object mask)
            pool: List[int] = []
            weights: List[float] = []
            for g in static_phase_frames[phase]:
                pool.append(g)
                weights.append(1.0)
            for g in dyn_frames:
                if g < f_cur and g in solved_names:
                    pool.append(g)
                    weights.append(2.0)
            mask_ok = np.asarray(
                jnp.sum(
                    batch.obj_masks[jnp.asarray(pool)].astype(jnp.int32),
                    axis=(1, 2, 3),
                ) > 0
            )
            pool = [p for p, ok in zip(pool, mask_ok) if ok]
            weights = np.array(
                [w for w, ok in zip(weights, mask_ok) if ok], np.float64
            )
            weights = weights / weights.sum()

            pose = identity_pose()
            pose_opt = adam_init(pose)
            opt_state = adam_init(model.params)  # fresh Adam per frame
            key = jax.random.PRNGKey(seed * 1000 + f_cur)
            first_frame = i == 0
            is_last = i == len(frames) - 1
            next_static = static_phase_frames[phase + 1]
            pending_noop = 0  # elided no-op iterations (see below)
            loss = jnp.float32(np.nan)

            for it in range(1, cp.total_num_iter + 1):
                # --- frame selection (coarse_obj_pose.py:196-222) ---
                if it == 1:
                    cam_idx, train_p = static_phase_frames[0][0], False
                elif rng.rand() <= cp.curr_vpt_prob:
                    cam_idx = (
                        next_static[rng.randint(len(next_static))]
                        if is_last
                        else f_cur
                    )
                    train_p = True
                else:
                    cam_idx = pool[rng.choice(len(pool), p=weights)]
                    train_p = False

                # Warm-up previous-frame iterations of non-first frames are
                # EXACT no-ops: train_pose=False where-gates the pose AND
                # its Adam state, grad_params=False yields all-zero param
                # grads onto all-zero moments (fresh Adam per frame — only
                # the step count advances), and record_stats is False inside
                # the warm-up so densify stats don't move either. The
                # reference pays a full render+backward for each
                # (coarse_obj_pose.py:196-222 with :178-193's zeroed LRs);
                # here they are elided and their Adam count advance folds
                # into the next real step (count_advance) — bit-exact,
                # enforced by tests/test_coarse_noop_skip.py. This removes
                # ~curr_vpt_prob-complement of warm-up ≈ 40% of ALL coarse
                # iterations from the device.
                if (skip_noop_warmup and not first_frame and not train_p
                        and it < cp.warm_up_iter):
                    pending_noop += 1
                    continue

                fixed_idx = (f_cur - 1) if train_p else cam_idx
                (model, opt_state, pose, pose_opt, loss, radii, drop_max,
                 crop_max) = coarse_step(
                    model, opt_state, pose, pose_opt, batch,
                    cam_idx, table_T, table_R, fixed_idx, it, drop_max,
                    train_pose=train_p,
                    first_frame=first_frame,
                    grad_params=first_frame or it >= cp.warm_up_iter,
                    count_advance=np.int32(pending_noop),
                    opt_cfg=cfg.opt,
                    coarse_cfg=cp,
                    backend=backend,
                    tile_config=tile_cfg,
                    crop_size=crop_size,
                    crop_max=crop_max,
                )
                pending_noop = 0

                if it % cp.densification_interval == 0:
                    from egogaussian_tpu.train.common import (
                        maybe_regrow_tile_config,
                    )

                    tile_cfg, last_drop, changed = maybe_regrow_tile_config(
                        model, batch.camera(0), tile_cfg, drop_max,
                        last_drop, "coarse",
                    )
                    if changed:
                        drop_max, last_drop = jnp.int32(0), 0
                    crop_size, last_crop, cchanged = maybe_grow_crop(
                        crop_size, crop_max, last_crop, batch, "coarse",
                    )
                    if cchanged:
                        crop_max = (jnp.zeros((3,), jnp.int32)
                                    if crop_size is not None
                                    else jnp.int32(0))
                    log_metrics(
                        "coarse", it, frame=f_cur, loss=loss,
                        alive=model.num_alive, capacity=model.capacity,
                        dropped_pairs=drop_max,
                        crop_escapes=crop_escape_count(crop_max),
                    )

                # --- densification window (coarse_obj_pose.py:324-337) ---
                if it < cp.densify_until_iter and it > cp.densify_from_iter:
                    if it % cp.densification_interval == 0:
                        size_threshold = (
                            20.0 if it > cp.opacity_reset_interval else None
                        )
                        key, sub = jax.random.split(key)
                        res = _densify_jit(
                            model, opt_state, sub,
                            max_grad=cp.densify_grad_threshold,
                            min_opacity=cp.min_opacity,
                            extent=cameras_extent,
                            max_screen_size=size_threshold,
                            percent_dense=cfg.opt.percent_dense,
                            which_object=1,
                        )
                        model, opt_state = res.model, res.opt_state
                        if int(res.overflow):
                            CONSOLE.log(
                                f"[coarse] it {it}: densify overflow — "
                                f"{int(res.overflow)} candidates dropped"
                            )
                        model, opt_state, grew = ensure_capacity(model, opt_state)
                        if grew:
                            tile_cfg = auto_tile_config(model, batch.camera(0), tile_size=cfg.render.tile_size)
                    if it % cp.opacity_reset_interval == 0:
                        model, opt_state = _reset_opacity_jit(
                            model, opt_state, which_object=1
                        )

            # write the solved delta back ONCE per frame (the inner loop's
            # trained pose never feeds back into this frame's own fixed
            # prefix, so per-iteration write-backs were pure host overhead)
            pose_seq = pose_seq.update_frame(f_cur, pose)
            solved_names[f_cur] = cameras[f_cur].image_name
            ckpt.maybe_save(
                len(solved_names), (model, pose_seq), rng,
                jax.random.PRNGKey(0), extra=dict(solved_names),
            )
            CONSOLE.log(
                f"[coarse] solved frame {cameras[f_cur].image_name} "
                f"({i+1}/{len(frames)}), loss {float(loss):.4f}"
            )
            if save_dir:
                save_pose_sequence(
                    os.path.join(save_dir, "obj_pose_sequence.npz"),
                    pose_seq,
                    [c.image_name for c in cameras],
                )
                if (i + 1) % cp.save_ply_every == 0:
                    save_ply(
                        model,
                        os.path.join(save_dir, "ply", f"gaussians_frame{f_cur}.ply"),
                    )

    _log_dropped_pairs("coarse", None, drop_max)
    if crop_size is not None and crop_escape_count(crop_max):
        CONSOLE.log(
            f"[coarse] WARNING — up to {crop_escape_count(crop_max)} "
            "splats/render escaped "
            "the crop window since the last growth (their out-of-window "
            "gradients were lost; window grows automatically at the next "
            "densify-interval check)"
        )
    if save_dir:
        save_ply(model, os.path.join(save_dir, "ply", "gaussians_final.ply"))
        save_pose_sequence(
            os.path.join(save_dir, "obj_pose_sequence.npz"),
            pose_seq,
            [c.image_name for c in cameras],
        )
    return pose_seq, model, solved_names
