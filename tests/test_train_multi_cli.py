"""End-to-end smoke of the multi-video CLI (cli/train_multi.py): two tiny
synthetic datasets in the reference layout, scene-parallel stages 1.0-1.2
on the 8-device virtual mesh, artifact layout identical to the single-video
pipeline so run_pipeline(resume=True) can continue stages 2-6."""
import dataclasses as dc
import os

import pytest

from egogaussian_tpu.config import Config
from egogaussian_tpu.data.export_colmap import export_colmap_dataset
from egogaussian_tpu.data.synthetic import make_synthetic_video


@pytest.mark.slow
def test_train_multi_stage1(tmp_path):
    datasets, outputs = [], []
    for s in (0, 3):
        vid = make_synthetic_video(width=32, height=24, n_bg=40, n_obj=12,
                                   frames_static=3, frames_dynamic=2, seed=s)
        ds = tmp_path / f"video{s}"
        export_colmap_dataset(vid, str(ds))
        datasets.append(str(ds))
        outputs.append(str(tmp_path / f"out{s}"))

    from egogaussian_tpu.cli.train_multi import main

    rc = main([
        "--videos", *datasets, "--outputs", *outputs, "--mesh", "2x4",
        "--stage1_only", "--backend", "tiled",
        "--densification_interval", "2", "--opacity_reset_interval", "5",
        "--s_std_train_iter", "6", "--s_entropy_reg_iter", "3",
        "--s_label_train_iter", "3", "--s_densify_until_iter", "8",
        "--s_rewind_frames", "2",
        "--b_std_train_iter", "6", "--b_entropy_reg_iter", "3",
        "--b_densify_until_iter", "6",
        "--s_frame_batch", "4", "--b_frame_batch", "4",
    ])
    assert rc == 0
    for out in outputs:
        assert os.path.exists(
            os.path.join(out, "static", "ply", "static_phase0_obj.ply"))
        assert os.path.exists(
            os.path.join(out, "static", "ply", "static_phase1.ply"))
        assert os.path.isdir(os.path.join(out, "static", "obj_masks"))
        assert os.path.exists(
            os.path.join(out, "background", "static_bg.ply"))
        assert os.path.exists(os.path.join(out, "cfg_args.json"))

    # resume: a second stage1-only run must skip both stages (no retrain)
    import time

    t0 = time.time()
    rc = main([
        "--videos", *datasets, "--outputs", *outputs, "--mesh", "2x4",
        "--stage1_only", "--resume", "--backend", "tiled",
        "--s_std_train_iter", "6", "--s_entropy_reg_iter", "3",
        "--s_label_train_iter", "3",
        "--b_std_train_iter", "6", "--b_entropy_reg_iter", "3",
    ])
    assert rc == 0
    assert time.time() - t0 < 60, "resume must not retrain"

    # stage 2 scene-parallel: resume past stage 1, run the lockstep coarse
    # stage, stop (--through_coarse); artifacts follow the single-video
    # pipeline layout so run_pipeline(resume=True) would skip stage 2
    coarse_args = [
        "--videos", *datasets, "--outputs", *outputs, "--mesh", "2x4",
        "--through_coarse", "--resume", "--backend", "tiled",
        "--s_std_train_iter", "6", "--s_entropy_reg_iter", "3",
        "--s_label_train_iter", "3",
        "--b_std_train_iter", "6", "--b_entropy_reg_iter", "3",
        "--c_warm_up_iter", "6", "--c_total_num_iter", "10",
        "--c_densify_from_iter", "7", "--c_densify_until_iter", "9",
        "--c_densification_interval", "2", "--c_opacity_reset_interval", "4",
    ]
    rc = main(coarse_args)
    assert rc == 0
    import numpy as np

    for out in outputs:
        pose_npz = os.path.join(out, "coarse", "obj_pose_sequence.npz")
        assert os.path.exists(pose_npz)
        assert os.path.exists(
            os.path.join(out, "coarse", "ply", "gaussians_final.ply"))
        # every dynamic frame + next-static anchor must be solved
        with np.load(pose_npz) as z:
            assert z["solved"].sum() >= 3

    t0 = time.time()
    rc = main(coarse_args)
    assert rc == 0
    assert time.time() - t0 < 60, "coarse resume must not retrain"

    # ---- stages 3-6: fine_obj lanes (2 videos x 2 variants), host
    # interpolation, fine_all lockstep, per-video eval ----
    fine_flags = [
        "--f_total_num_iter", "8", "--f_densify_from_iter", "3",
        "--f_densify_until_iter", "6", "--f_densification_interval", "2",
        "--f_opacity_reset_interval", "5",
        "--a_total_num_iter", "6", "--a_densify_from_iter", "2",
        "--a_densify_until_iter", "4", "--a_opacity_reset_interval", "5",
    ]
    rc = main([a for a in coarse_args if a != "--through_coarse"]
              + fine_flags)
    assert rc == 0
    for out in outputs:
        for v in ("from-static", "from-coarse"):
            assert os.path.exists(
                os.path.join(out, "fine_obj", v, "gaussians_fine.ply"))
            assert os.path.exists(
                os.path.join(out, "fine_obj", v, "obj_pose_sequence.npz"))
        assert os.path.exists(
            os.path.join(out, "interpolate_pose_coarse",
                         "obj_pose_sequence.npz"))
        assert os.path.exists(
            os.path.join(out, "fine_all", "gaussians_all.ply"))
        assert os.path.exists(
            os.path.join(out, "evaluation", "results.txt"))

    # equivalence vs a per-video pipeline: rerun video 0 from its stage-1/2
    # artifacts through the SINGLE-video resumable pipeline in a copied
    # output dir (same seed) — the lockstep stages 3+5 must reproduce it
    import shutil

    from egogaussian_tpu.cli.train import main as train_main

    solo = str(tmp_path / "solo0")
    shutil.copytree(outputs[0], solo)
    for sub in ("fine_obj", "fine_all", "interpolate_pose_coarse",
                "interpolate_pose_static", "evaluation"):
        shutil.rmtree(os.path.join(solo, sub), ignore_errors=True)
    rc = train_main([
        "-s", datasets[0], "--model_path", solo, "--resume", "--seed", "0",
        "--backend", "tiled",
        "--densification_interval", "2", "--opacity_reset_interval", "5",
        "--s_std_train_iter", "6", "--s_entropy_reg_iter", "3",
        "--s_label_train_iter", "3",
        "--b_std_train_iter", "6", "--b_entropy_reg_iter", "3",
        "--c_warm_up_iter", "6", "--c_total_num_iter", "10",
        "--c_densify_from_iter", "7", "--c_densify_until_iter", "9",
        "--c_densification_interval", "2", "--c_opacity_reset_interval", "4",
    ] + fine_flags)
    assert rc is not None  # cli.train.main returns the PipelineResult
    from egogaussian_tpu.models.gaussians import load_ply
    import numpy as np

    m_multi = load_ply(os.path.join(outputs[0], "fine_all",
                                    "gaussians_all.ply"))
    m_solo = load_ply(os.path.join(solo, "fine_all", "gaussians_all.ply"))
    assert int(m_multi.num_alive) == int(m_solo.num_alive)
    np.testing.assert_allclose(
        np.asarray(m_multi.params.xyz[: int(m_multi.num_alive)]),
        np.asarray(m_solo.params.xyz[: int(m_solo.num_alive)]),
        atol=1e-5,
    )
