"""End-to-end pipeline smoke test: all 6 stages on the synthetic 2-phase
video at tiny iteration counts (SURVEY.md §4), plus resume."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from egogaussian_tpu.data import make_synthetic_video
from egogaussian_tpu.data.readers import SceneData, compute_nerfpp_norm
from egogaussian_tpu.pipeline import apply_predicted_masks, run_pipeline
from tests.test_train import tiny_config


def test_apply_predicted_masks_preserves_shipped_zero_mask():
    """Stage 1.1 completes only frames whose mask FILE is absent
    (obj_mask is None). A shipped all-zero mask is ground truth (object
    genuinely absent in that frame) and must NOT be overwritten by a
    prediction — the reference only copies files that don't exist
    (train.py:80-90)."""
    vid = make_synthetic_video(width=32, height=24, n_bg=40, n_obj=10,
                               frames_static=2, frames_dynamic=1)
    cams = list(vid.cameras)
    zero = jnp.zeros_like(cams[0].obj_mask)
    cams[0] = dataclasses.replace(cams[0], obj_mask=zero)   # shipped, empty
    cams[1] = dataclasses.replace(cams[1], obj_mask=None)   # file absent
    pred = np.ones((cams[0].height, cams[0].width), np.float32)
    preds = {cams[0].image_name: pred, cams[1].image_name: pred}
    out = apply_predicted_masks(cams, preds)
    # shipped all-zero mask survives untouched
    assert float(np.asarray(out[0].obj_mask).sum()) == 0.0
    # absent mask is completed from the prediction
    assert out[1].obj_mask is not None
    assert float(np.asarray(out[1].obj_mask).sum()) > 0


@pytest.fixture(scope="module")
def scene_and_phases():
    vid = make_synthetic_video(
        width=48, height=36, n_bg=120, n_obj=30,
        frames_static=3, frames_dynamic=2,
    )
    # Deliberately "delete" the shipped obj mask of static phase 1's FIRST
    # frame (the coarse stage's next-static anchor). Stage 1.0 must train
    # phase 1 too, and stage 1.1 must complete this mask from phase 1's
    # label predictions — with first_phase_only (the round-1 bug) the
    # anchor loss would silently train against gt*0 (reference
    # train.py:69-90 behavior).
    anchor = vid.static_phases[1][0]
    cam = vid.cameras[anchor]
    # None = the mask FILE is missing (obj_mask_valid False), like a real
    # dataset whose shipped masks don't cover this frame — the label phase
    # must then exclude it from BCE training (an all-zero stand-in would
    # actively train the label toward zero)
    vid.cameras[anchor] = dataclasses.replace(cam, obj_mask=None)
    scene = SceneData(
        cameras=vid.cameras,
        points=vid.points,
        colors=vid.colors,
        nerf_norm=compute_nerfpp_norm(vid.cameras),
        image_names=vid.image_names,
    )
    return vid, scene


@pytest.mark.slow
def test_full_pipeline(scene_and_phases, tmp_path_factory):
    vid, scene = scene_and_phases
    save_dir = str(tmp_path_factory.mktemp("pipeline"))
    cfg = tiny_config()
    names = vid.image_names
    result = run_pipeline(
        scene, cfg, save_dir,
        training_frames=names[:-1],
        dynamic_eval_frames=[names[3]],
        static_eval_frames=[names[-1]],
        static_phases=vid.static_phases,
        dynamic_phases=vid.dynamic_phases,
    )
    assert int(result.final_model.num_alive) > 0
    # all stage artifacts on disk
    import os

    for p in (
        "static/ply/static_phase0_obj.ply",
        "static/ply/static_phase1_obj.ply",  # ALL static phases trained
        "background/static_bg.ply",
        "coarse/obj_pose_sequence.npz",
        "coarse/ply/gaussians_final.ply",
        "fine_obj/from-coarse/gaussians_fine.ply",
        "interpolate_pose_coarse/obj_pose_sequence.npz",
        "fine_all/gaussians_all.ply",
        "evaluation/results.txt",
    ):
        assert os.path.exists(os.path.join(save_dir, p)), p
    # metrics exist and are finite
    assert "dynamic_eval" in result.metrics
    assert np.isfinite(result.metrics["dynamic_eval"]["psnr"])
    # every dynamic frame got a pose
    solved = np.asarray(result.pose_seq.solved)
    for ph in vid.dynamic_phases:
        for f in range(ph[0], ph[1] + 1):
            assert solved[f], f

    # stage 1.1 completed the deleted anchor mask from phase-1 predictions:
    # a nonzero predicted mask PNG exists for it
    from PIL import Image

    anchor_name = vid.image_names[vid.static_phases[1][0]]
    mask_png = os.path.join(save_dir, "static", "obj_masks", f"{anchor_name}.png")
    assert os.path.exists(mask_png), mask_png
    with Image.open(mask_png) as im:
        assert np.asarray(im).sum() > 0, "predicted anchor mask is empty"

    # resume path: re-running with resume=True loads artifacts (fast)
    result2 = run_pipeline(
        scene, cfg, save_dir,
        training_frames=names[:-1],
        dynamic_eval_frames=[names[3]],
        static_eval_frames=[names[-1]],
        static_phases=vid.static_phases,
        dynamic_phases=vid.dynamic_phases,
        resume=True,
    )
    assert int(result2.final_model.num_alive) > 0


@pytest.mark.slow
def test_pipeline_interior_dynamic_holdout(tmp_path_factory):
    """Reference-protocol split through the whole pipeline: an INTERIOR
    dynamic frame held out of training (export_colmap's fixed split). The
    coarse chain must solve across the 2-video-frame gap, and stage-4
    interpolation (interpolate_pose_sequence N-th-root contract,
    models/pose.py:211) must fill the held-out frame's pose so dynamic_eval
    renders at a non-identity object pose."""
    vid = make_synthetic_video(
        width=48, height=36, n_bg=120, n_obj=30,
        frames_static=3, frames_dynamic=3,
    )
    scene = SceneData(
        cameras=vid.cameras,
        points=vid.points,
        colors=vid.colors,
        nerf_norm=compute_nerfpp_norm(vid.cameras),
        image_names=vid.image_names,
    )
    names = vid.image_names
    d0, d1 = vid.dynamic_phases[0]
    s0, s1 = vid.static_phases[-1]
    dyn_eval = d0 + (d1 - d0) // 2          # interior dynamic frame
    stat_eval = s0 + (s1 - s0) // 2         # interior static frame
    train = [n for i, n in enumerate(names) if i not in (dyn_eval, stat_eval)]
    save_dir = str(tmp_path_factory.mktemp("pipeline_holdout"))
    result = run_pipeline(
        scene, tiny_config(), save_dir,
        training_frames=train,
        dynamic_eval_frames=[names[dyn_eval]],
        static_eval_frames=[names[stat_eval]],
        static_phases=vid.static_phases,
        dynamic_phases=vid.dynamic_phases,
    )
    # the held-out frame got a pose from interpolation, and it is not the
    # identity (the object genuinely moves every dynamic frame)
    solved = np.asarray(result.pose_seq.solved)
    assert solved[dyn_eval]
    delta = np.asarray(result.pose_seq.deltas()[dyn_eval])
    assert np.abs(delta - np.eye(4)).max() > 1e-4
    # eval buckets produced finite metrics for both held-out frames
    assert np.isfinite(result.metrics["dynamic_eval"]["psnr"])
    assert np.isfinite(result.metrics["static_eval"]["psnr"])


@pytest.mark.slow
def test_pipeline_two_dynamic_phases(tmp_path_factory):
    """Full pipeline on a MULTI-phase video (static-dynamic-static-dynamic-
    static): exercises the per-phase coarse anchors (each dynamic phase
    chains to the FIRST frame of the NEXT static phase,
    coarse_obj_pose.py:137), per-phase interpolation ranges, and stage 1.0
    training of all three static phases — paths a single-cycle video never
    hits end-to-end."""
    import os

    vid = make_synthetic_video(
        width=40, height=30, n_bg=100, n_obj=25,
        frames_static=2, frames_dynamic=2, n_cycles=2,
    )
    scene = SceneData(
        cameras=vid.cameras,
        points=vid.points,
        colors=vid.colors,
        nerf_norm=compute_nerfpp_norm(vid.cameras),
        image_names=vid.image_names,
    )
    names = vid.image_names
    save_dir = str(tmp_path_factory.mktemp("pipeline_2phase"))
    result = run_pipeline(
        scene, tiny_config(), save_dir,
        training_frames=names,
        dynamic_eval_frames=[names[vid.dynamic_phases[0][0]]],
        static_eval_frames=[names[-1]],
        static_phases=vid.static_phases,
        dynamic_phases=vid.dynamic_phases,
    )
    # every frame of BOTH dynamic phases got a solved pose, and the poses
    # in the two phases move in opposite directions (cycle-1 inverse step)
    solved = np.asarray(result.pose_seq.solved)
    for ph in vid.dynamic_phases:
        for f in range(ph[0], ph[1] + 1):
            assert solved[f], f
    # all three static phases trained
    for p in range(3):
        assert os.path.exists(os.path.join(
            save_dir, "static", "ply", f"static_phase{p}_obj.ply")), p
    assert np.isfinite(result.metrics["dynamic_eval"]["psnr"])
    assert np.isfinite(result.metrics["static_eval"]["psnr"])
