"""Full pipeline orchestration: stages 1.0 -> 6.

Behavioral twin of reference `train.py:67-187` (SURVEY.md §3.1):

  1.0 train_static        -> static/ply/static_phase0_obj.ply + pred obj masks
  1.1 complete the dataset's object masks with the predicted ones
  1.2 train_background    -> background/static_bg.ply
  2   coarse pose         -> coarse/obj_pose_sequence.npz + ply/gaussians_final.ply
  3   fine-tune object    -> fine_obj/{from-static,from-coarse}/...
  4   interpolate poses   -> interpolate_pose_{static,coarse}/obj_pose_sequence.npz
  5   fine-tune all       -> fine_all/gaussians_all.ply
  6   eval                -> evaluation/results.txt

Differences by design: stages communicate through BOTH in-memory objects and
the same on-disk artifacts as the reference (PLY + pose files), and every
stage can resume from its predecessor's files via `resume=True` — the
reference only supports this by manually uncommenting lines
(train.py:76,104,122,139,161,176; SURVEY.md §5 failure-recovery row).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from egogaussian_tpu.config import Config
from egogaussian_tpu.data.readers import (
    SceneData,
    phase_membership_mask,
    split_viewpoints_by_phase,
)
from egogaussian_tpu.models.gaussians import GaussianModel, load_ply
from egogaussian_tpu.models.pose import (
    PoseSequence,
    interpolate_pose_sequence,
    load_pose_sequence,
)
from egogaussian_tpu.train.static import train_static, train_background
from egogaussian_tpu.train.coarse_pose import estimate_coarse_obj_pose
from egogaussian_tpu.train.fine_obj import fine_tune_obj
from egogaussian_tpu.train.fine_all import fine_tune_all
from egogaussian_tpu.eval.render_results import render_results, calculate_metric
from egogaussian_tpu.utils.console import CONSOLE


@dataclasses.dataclass
class PipelineResult:
    final_model: GaussianModel
    pose_seq: PoseSequence
    metrics: Dict[str, Dict[str, float]]


def apply_predicted_masks(cameras, pred_masks: Dict[str, np.ndarray]):
    """Stage 1.1: complete partial object-mask sets with the static stage's
    predictions (reference train.py:80-90 copies predicted PNGs into the
    dataset dir; here masks are injected into the camera list directly).

    Only frames whose mask FILE is absent (obj_mask is None) are completed —
    the reference only copies files that don't exist, so a shipped all-zero
    mask (object genuinely absent/occluded in that frame) is ground truth
    and must survive, not be overwritten by a model prediction."""
    import jax.numpy as jnp

    out = []
    for cam in cameras:
        if cam.obj_mask is None and cam.image_name in pred_masks:
            cam = dataclasses.replace(
                cam, obj_mask=jnp.asarray(pred_masks[cam.image_name][None])
            )
        out.append(cam)
    return out


def run_pipeline(
    scene: SceneData,
    cfg: Config,
    save_dir: str,
    training_frames: Optional[Sequence[str]] = None,
    dynamic_eval_frames: Optional[Sequence[str]] = None,
    static_eval_frames: Optional[Sequence[str]] = None,
    static_phases: Optional[List] = None,
    dynamic_phases: Optional[List] = None,
    seed: int = 0,
    backend: str = "auto",
    resume: bool = False,
    lpips_fn=None,
    fine_variant: str = "from-coarse",
    checkpoint_every: int = 0,
    mesh=None,
) -> PipelineResult:
    """`mesh`: optional jax.sharding.Mesh with a "data" axis — the static and
    background stages then run their frame batches frame-data-parallel
    (train/static._dp_static_step); pose stages are sequential by nature
    (each frame's pose chains off the previous) and stay single-device."""
    cameras = scene.cameras
    extent = scene.cameras_extent
    static_groups = split_viewpoints_by_phase(cameras, static_phases, training_frames)
    dynamic_groups = split_viewpoints_by_phase(cameras, dynamic_phases, training_frames)
    os.makedirs(save_dir, exist_ok=True)

    # experiment metrics: JSONL always (under <save_dir>/logs), wandb mirror
    # when cfg.log.use_wandb (reference wandb usage: train_static.py:54,112)
    from egogaussian_tpu.utils.logging import MetricsLogger, active_logger

    metrics_logger = MetricsLogger(
        log_dir=os.path.join(save_dir, "logs"),
        use_wandb=cfg.log.use_wandb,
        project=cfg.log.wandb_project,
        run_name=os.path.basename(os.path.normpath(save_dir)),
    )
    with active_logger(metrics_logger):
        return _run_pipeline_stages(
            scene, cfg, save_dir, cameras, extent, static_groups,
            dynamic_groups, training_frames, dynamic_eval_frames,
            static_eval_frames, seed, backend, resume, lpips_fn,
            fine_variant, checkpoint_every, mesh, dynamic_phases,
        )


def _run_pipeline_stages(
    scene, cfg, save_dir, cameras, extent, static_groups, dynamic_groups,
    training_frames, dynamic_eval_frames, static_eval_frames, seed, backend,
    resume, lpips_fn, fine_variant, checkpoint_every, mesh, dynamic_phases,
) -> PipelineResult:

    # ---- Stage 1.0: static phases (EVERY phase, re-initialized per phase —
    # reference train.py:69 + trainers/train_static.py:52; the object model
    # passed downstream is phase 0's, but the predicted object masks come
    # from ALL phases so stage 1.1 can complete the dataset) ----
    static_dir = os.path.join(save_dir, "static")
    obj_ply = os.path.join(static_dir, "ply", "static_phase0_obj.ply")
    last_ply = os.path.join(
        static_dir, "ply", f"static_phase{len(static_groups) - 1}.ply"
    )
    if resume and os.path.exists(obj_ply) and os.path.exists(last_ply):
        CONSOLE.log("[pipeline] resume: static stage artifacts found")
        obj_model = load_ply(obj_ply, is_object=True, spatial_lr_scale=extent)
        pred_masks = _load_pred_masks(os.path.join(static_dir, "obj_masks"))
    else:
        static_results = train_static(
            cameras, scene.points, scene.colors, cfg, static_groups, extent,
            save_dir=static_dir, seed=seed, backend=backend,
            checkpoint_every=checkpoint_every, mesh=mesh,
        )
        obj_model = static_results[0].obj_model
        obj_model = dataclasses.replace(obj_model, spatial_lr_scale=extent)
        pred_masks = {}
        for r in static_results:
            pred_masks.update(r.pred_masks)

    # ---- Stage 1.1: complete object masks ----
    cameras = apply_predicted_masks(cameras, pred_masks)
    # Completeness check (reference train.py:90 asserts every image has an
    # obj mask after the copy): every static training frame must now carry
    # either a shipped mask or a prediction — an all-zero mask on a static
    # frame would make the coarse stage's next-static anchor loss silently
    # train against gt*0.
    missing = [
        cameras[i].image_name
        for g in static_groups
        for i in g
        if cameras[i].image_name not in pred_masks
        and (
            cameras[i].obj_mask is None
            or float(np.asarray(cameras[i].obj_mask).sum()) == 0
        )
    ]
    assert not missing, (
        f"stage 1.1: {len(missing)} static frames have no object mask "
        f"(shipped or predicted): {missing[:5]}"
    )

    # ---- Stage 1.2: background ----
    bg_dir = os.path.join(save_dir, "background")
    bg_ply = os.path.join(bg_dir, "static_bg.ply")
    all_train_idx = sorted({i for g in static_groups + dynamic_groups for i in g})
    if resume and os.path.exists(bg_ply):
        CONSOLE.log("[pipeline] resume: background artifacts found")
        bg_model = load_ply(bg_ply, force_bg=True, spatial_lr_scale=extent)
    else:
        bg_model = train_background(
            cameras, scene.points, scene.colors, cfg, all_train_idx, extent,
            save_dir=bg_dir, seed=seed, backend=backend,
            checkpoint_every=checkpoint_every, mesh=mesh,
        )
        bg_model = dataclasses.replace(bg_model, spatial_lr_scale=extent)

    # ---- Stage 2: coarse object pose ----
    coarse_dir = os.path.join(save_dir, "coarse")
    coarse_pose_path = os.path.join(coarse_dir, "obj_pose_sequence.npz")
    coarse_ply = os.path.join(coarse_dir, "ply", "gaussians_final.ply")
    if resume and os.path.exists(coarse_pose_path) and os.path.exists(coarse_ply):
        CONSOLE.log("[pipeline] resume: coarse artifacts found")
        pose_seq, _ = load_pose_sequence(coarse_pose_path)
        coarse_model = load_ply(coarse_ply, is_object=True, spatial_lr_scale=extent)
    else:
        pose_seq, coarse_model, _ = estimate_coarse_obj_pose(
            cameras, obj_model, cfg, static_groups, dynamic_groups, extent,
            save_dir=coarse_dir, seed=seed, backend=backend,
            checkpoint_every=checkpoint_every,
        )

    # ---- Stage 3: fine-tune object (two variants like the reference) ----
    fine_results = {}
    for variant, base_model in (
        ("from-static", obj_model),
        ("from-coarse", coarse_model),
    ):
        fdir = os.path.join(save_dir, "fine_obj", variant)
        fply = os.path.join(fdir, "gaussians_fine.ply")
        fpose = os.path.join(fdir, "obj_pose_sequence.npz")
        if resume and os.path.exists(fply) and os.path.exists(fpose):
            CONSOLE.log(f"[pipeline] resume: fine_obj {variant} found")
            seq_v, _ = load_pose_sequence(fpose)
            model_v = load_ply(fply, is_object=True, spatial_lr_scale=extent)
        else:
            seq_v, model_v = fine_tune_obj(
                cameras, base_model, pose_seq, cfg, static_groups,
                dynamic_groups, extent, save_dir=fdir, seed=seed,
                backend=backend, checkpoint_every=checkpoint_every,
            )
        fine_results[variant] = (seq_v, model_v)

    # ---- Stage 4: interpolate missing poses (both variants) ----
    interp: Dict[str, PoseSequence] = {}
    for variant, (seq_v, _) in fine_results.items():
        # Full phase-range membership (not the training-filtered group span):
        # interpolation must fill EVERY frame of each dynamic phase, incl.
        # held-out eval frames and phase endpoints absent from the groups
        # (reference interpolate_pose.py:92-99 walks the whole dynamic phase
        # range from the phase index file).
        dyn_mask = phase_membership_mask(cameras, dynamic_phases)
        # also the next-static anchor frames are solved; include them
        dyn_mask |= np.asarray(seq_v.solved)
        interp[variant] = interpolate_pose_sequence(seq_v, dyn_mask)
        idir = os.path.join(
            save_dir, f"interpolate_pose_{variant.replace('from-', '')}"
        )
        os.makedirs(idir, exist_ok=True)
        from egogaussian_tpu.models.pose import save_pose_sequence

        save_pose_sequence(
            os.path.join(idir, "obj_pose_sequence.npz"),
            interp[variant],
            [c.image_name for c in cameras],
        )

    # ---- Stage 5: fine-tune all ----
    seq_final = interp[fine_variant]
    obj_final = fine_results[fine_variant][1]
    fine_all_dir = os.path.join(save_dir, "fine_all")
    final_ply = os.path.join(fine_all_dir, "gaussians_all.ply")
    if resume and os.path.exists(final_ply):
        CONSOLE.log("[pipeline] resume: fine_all artifacts found")
        final_model = load_ply(final_ply, spatial_lr_scale=extent)
    else:
        final_model = fine_tune_all(
            cameras, obj_final, bg_model, seq_final, cfg,
            static_groups, dynamic_groups, save_dir=fine_all_dir,
            seed=seed, backend=backend, checkpoint_every=checkpoint_every,
        )

    # ---- Stage 6: evaluation ----
    eval_dir = os.path.join(save_dir, "evaluation")
    buckets = render_results(
        cameras, final_model, seq_final,
        training_frames=training_frames,
        dynamic_eval_frames=dynamic_eval_frames,
        static_eval_frames=static_eval_frames,
        save_dir=eval_dir, backend=backend,
    )
    metrics = calculate_metric(buckets, save_dir=eval_dir, lpips_fn=lpips_fn)

    return PipelineResult(
        final_model=final_model, pose_seq=seq_final, metrics=metrics
    )


def _load_pred_masks(mask_dir: str) -> Dict[str, np.ndarray]:
    masks = {}
    if not os.path.isdir(mask_dir):
        return masks
    from PIL import Image

    for fname in os.listdir(mask_dir):
        if fname.endswith(".png"):
            with Image.open(os.path.join(mask_dir, fname)) as im:
                masks[fname[:-4]] = (
                    np.asarray(im, np.float32) / 255.0 > 0.5
                ).astype(np.float32)
    return masks
