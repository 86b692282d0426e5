"""Multi-video training CLI: several datasets in ONE process on a
(scene, data) mesh.

The reference trains V videos as V SLURM jobs on V GPUs (train.sh:13-19);
here the shared stages run scene-parallel in-process:

  stage 1.0 static     -> train_static_scenes (lockstep over the scene axis)
  stage 1.1 masks      -> per-scene completion + completeness assert
  stage 1.2 background -> train_background_scenes
  stage 2   coarse     -> train_coarse_scenes: the frame-sequential pose
                          chain runs per scene, but all scenes solve their
                          k-th frame slot simultaneously (per-scene traced
                          flags in multi_scene_coarse_step)
  stage 3   fine_obj   -> train_fine_scenes: BOTH variants of every video
                          as 2V lockstep lanes
  stage 4   interpolate-> host-side per scene (cheap)
  stage 5   fine_all   -> train_fine_all_scenes (V lockstep scenes)
  stage 6   eval       -> per-scene run_pipeline(resume=True): finds every
                          stage artifact on disk and only renders + scores.
  Lane counts that don't divide the scene axis fall back to the per-video
  pipeline for the affected stages.

Usage:
  python -m egogaussian_tpu.cli.train_multi \
      --videos ds1 ds2 --outputs out1 out2 --mesh 2x4 [--stage1_only]

`--mesh SxD`: S-way scene axis x D-way frame-data axis (needs S*D
devices). Every dataset follows the reference layout (split/*.txt etc.);
all config flags of cli.train apply (shared schedule across videos).
"""
from __future__ import annotations

import dataclasses
import os
from argparse import ArgumentParser

from egogaussian_tpu.config import add_config_args, extract_config, save_config
from egogaussian_tpu.data.readers import (
    load_colmap_scene,
    phase_membership_mask,
    read_phase_index,
    read_split_file,
    split_viewpoints_by_phase,
)
from egogaussian_tpu.utils.console import CONSOLE


def main(argv=None):
    parser = ArgumentParser(
        description="EgoGaussian-TPU multi-video training (scene x data mesh)"
    )
    add_config_args(parser)
    parser.add_argument("--videos", nargs="+", required=True,
                        metavar="DATASET_DIR")
    parser.add_argument("--outputs", nargs="*", default=[],
                        metavar="OUTPUT_DIR",
                        help="default: <dataset>/output per video")
    parser.add_argument("--mesh", default="1x1", metavar="SxD",
                        help="scene x data mesh, e.g. 2x4 (needs S*D devices)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--stage1_only", action="store_true",
                        help="stop after the scene-parallel stages 1.0-1.2")
    parser.add_argument("--through_coarse", action="store_true",
                        help="stop after the scene-parallel coarse stage 2")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--checkpoint_every", type=int, default=0)
    parser.add_argument("--fine_variant", default="from-coarse",
                        choices=("from-static", "from-coarse"),
                        help="which stage-3 variant feeds stage 5")
    args = parser.parse_args(argv)
    cfg = extract_config(args)
    backend = cfg.render.backend

    srcs = [os.path.abspath(s) for s in args.videos]
    outs = [os.path.abspath(o) for o in args.outputs] or [
        os.path.join(s, "output") for s in srcs
    ]
    if len(outs) != len(srcs):
        parser.error(f"{len(srcs)} videos but {len(outs)} outputs")

    import jax

    from egogaussian_tpu.parallel import make_mesh
    from egogaussian_tpu.parallel.scene_trainer import (
        SceneInput,
        train_background_scenes,
        train_static_scenes,
    )

    n_scene, n_data = (int(x) for x in args.mesh.lower().split("x"))
    devices = jax.devices()
    if len(devices) < n_scene * n_data:
        parser.error(
            f"--mesh {args.mesh} needs {n_scene * n_data} devices, "
            f"{len(devices)} visible (virtual CPU mesh: "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N)"
        )
    mesh = make_mesh(n_scene=n_scene, n_data=n_data,
                     devices=devices[: n_scene * n_data])
    CONSOLE.print(f"Mesh {mesh}: {len(srcs)} videos")

    scenes, splits, static_groups_all, inputs = [], [], [], []
    for i, src in enumerate(srcs):
        split_dir = os.path.join(src, "split")
        training = read_split_file(
            os.path.join(split_dir, "training_frames.txt"))
        dyn_eval = read_split_file(
            os.path.join(split_dir, "dynamic_eval_frames.txt"))
        st_eval = read_split_file(
            os.path.join(split_dir, "static_eval_frames.txt"))
        st_ph, dy_ph = read_phase_index(
            os.path.join(split_dir, "phase_frame_index.txt"))
        CONSOLE.print(f"Loading COLMAP scene from {src}")
        scene = load_colmap_scene(src, cfg.model.images, cfg.model.resolution)
        scenes.append(scene)
        splits.append((training, dyn_eval, st_eval, st_ph, dy_ph))

        os.makedirs(outs[i], exist_ok=True)
        cfg_i = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, source_path=src, model_path=outs[i])
        )
        save_config(cfg_i, os.path.join(outs[i], "cfg_args.json"))
        static_groups = split_viewpoints_by_phase(
            scene.cameras, st_ph, training)
        static_groups_all.append(static_groups)
        inputs.append(SceneInput(
            cameras=scene.cameras, points=scene.points, colors=scene.colors,
            static_phase_frames=static_groups,
            cameras_extent=scene.cameras_extent,
            save_dir=os.path.join(outs[i], "static"), seed=args.seed + i,
        ))

    # ---- stage 1.0: static phases, scene-parallel ----
    static_done = args.resume and all(
        os.path.exists(os.path.join(
            o, "static", "ply", "static_phase0_obj.ply")) for o in outs
    )
    results = None
    if static_done:
        CONSOLE.log("[multi] resume: static artifacts found for all scenes")
    else:
        results = train_static_scenes(
            inputs, cfg, mesh, backend=backend, first_phase_only=False,
        )

    # ---- stage 1.1 + 1.2: mask completion + background, scene-parallel ----
    from egogaussian_tpu.pipeline import _load_pred_masks, apply_predicted_masks

    bg_inputs, bg_frames = [], []
    for i, scene in enumerate(scenes):
        pred = _load_pred_masks(os.path.join(outs[i], "static", "obj_masks"))
        if results is not None:
            for r in results[i]:
                pred.update(r.pred_masks)
        cams = apply_predicted_masks(scene.cameras, pred)
        scenes[i] = dataclasses.replace(scene, cameras=cams)
        training, _, _, st_ph, dy_ph = splits[i]
        dynamic_groups = split_viewpoints_by_phase(cams, dy_ph, training)
        all_train = sorted({
            j for g in static_groups_all[i] + dynamic_groups for j in g
        })
        bg_frames.append(all_train)
        bg_inputs.append(SceneInput(
            cameras=cams, points=scene.points, colors=scene.colors,
            static_phase_frames=static_groups_all[i],
            cameras_extent=scene.cameras_extent,
            save_dir=os.path.join(outs[i], "background"),
            seed=args.seed + i,
        ))

    bg_done = args.resume and all(
        os.path.exists(os.path.join(o, "background", "static_bg.ply"))
        for o in outs
    )
    if bg_done:
        CONSOLE.log("[multi] resume: background artifacts found")
    else:
        train_background_scenes(
            bg_inputs, cfg, mesh, bg_frames, backend=backend,
        )

    if args.stage1_only:
        CONSOLE.print("[multi] stage 1 complete (--stage1_only)")
        return 0

    # ---- stage 2: coarse object pose, scene-parallel (frame slots in
    # lockstep; artifacts identical to estimate_coarse_obj_pose so
    # run_pipeline(resume=True) skips the stage below) ----
    from egogaussian_tpu.models.gaussians import load_ply
    from egogaussian_tpu.parallel.scene_trainer import (
        CoarseSceneInput,
        train_coarse_scenes,
    )

    coarse_done = args.resume and all(
        os.path.exists(os.path.join(o, "coarse", "obj_pose_sequence.npz"))
        and os.path.exists(
            os.path.join(o, "coarse", "ply", "gaussians_final.ply"))
        for o in outs
    )
    if coarse_done:
        CONSOLE.log("[multi] resume: coarse artifacts found for all scenes")
    else:
        coarse_inputs = []
        for i, scene in enumerate(scenes):
            ext = scene.cameras_extent
            if results is not None:
                obj_model = results[i][0].obj_model
            else:
                obj_model = load_ply(
                    os.path.join(
                        outs[i], "static", "ply", "static_phase0_obj.ply"),
                    is_object=True, spatial_lr_scale=ext,
                )
            obj_model = dataclasses.replace(obj_model, spatial_lr_scale=ext)
            training, _, _, st_ph, dy_ph = splits[i]
            dynamic_groups = split_viewpoints_by_phase(
                scene.cameras, dy_ph, training)
            coarse_inputs.append(CoarseSceneInput(
                cameras=scene.cameras, obj_model=obj_model,
                static_phase_frames=static_groups_all[i],
                dynamic_phase_frames=dynamic_groups,
                cameras_extent=ext,
                save_dir=os.path.join(outs[i], "coarse"),
                seed=args.seed + i,
            ))
        train_coarse_scenes(coarse_inputs, cfg, mesh, backend=backend)

    if args.through_coarse:
        CONSOLE.print("[multi] stage 2 complete (--through_coarse)")
        return 0

    # ---- stage 3: fine_obj — BOTH variants of every video as lockstep
    # lanes on the scene axis (the reference runs the two variants
    # sequentially per video, fine_obj.py:49-61; the 2V lane runs are
    # independent, so they share one lockstep). Artifacts land exactly
    # where run_pipeline(resume=True)'s stage-3 gate looks, so the final
    # per-video pass below skips straight to interpolation + eval. ----
    import numpy as np

    from egogaussian_tpu.models.pose import (
        interpolate_pose_sequence,
        load_pose_sequence,
        save_pose_sequence,
    )
    from egogaussian_tpu.parallel.scene_trainer import (
        FineAllSceneInput,
        FineSceneInput,
        train_fine_all_scenes,
        train_fine_scenes,
    )

    variants = ("from-static", "from-coarse")
    dynamic_groups_all = []
    for i, scene in enumerate(scenes):
        training, _, _, _, dy_ph = splits[i]
        dynamic_groups_all.append(
            split_viewpoints_by_phase(scene.cameras, dy_ph, training)
        )

    fine_done = args.resume and all(
        os.path.exists(os.path.join(o, "fine_obj", v, "gaussians_fine.ply"))
        and os.path.exists(
            os.path.join(o, "fine_obj", v, "obj_pose_sequence.npz"))
        for o in outs for v in variants
    )
    lanes_fit = (2 * len(scenes)) % n_scene == 0
    if fine_done:
        CONSOLE.log("[multi] resume: fine_obj artifacts found for all scenes")
    elif not lanes_fit:
        CONSOLE.log(
            f"[multi] fine_obj lanes (2x{len(scenes)}) not divisible by "
            f"scene axis {n_scene} — stages 3-5 fall back to per-video runs"
        )
    else:
        lanes = []
        for i, scene in enumerate(scenes):
            ext = scene.cameras_extent
            seq, _ = load_pose_sequence(
                os.path.join(outs[i], "coarse", "obj_pose_sequence.npz"))
            for variant, ply in (
                ("from-static", os.path.join(
                    outs[i], "static", "ply", "static_phase0_obj.ply")),
                ("from-coarse", os.path.join(
                    outs[i], "coarse", "ply", "gaussians_final.ply")),
            ):
                base = load_ply(ply, is_object=True, spatial_lr_scale=ext)
                lanes.append(FineSceneInput(
                    cameras=scene.cameras, obj_model=base, pose_seq=seq,
                    static_phase_frames=static_groups_all[i],
                    dynamic_phase_frames=dynamic_groups_all[i],
                    cameras_extent=ext,
                    save_dir=os.path.join(outs[i], "fine_obj", variant),
                    seed=args.seed + i,
                ))
        CONSOLE.print(f"[multi] stage 3: {len(lanes)} fine_obj lanes lockstep")
        train_fine_scenes(lanes, cfg, mesh, backend=backend)

    # ---- stages 4+5: interpolate (host-side, exactly run_pipeline's
    # stage 4 for the chosen variant) + fine_all lockstep ----
    fine_all_done = args.resume and all(
        os.path.exists(os.path.join(o, "fine_all", "gaussians_all.ply"))
        for o in outs
    )
    variant = args.fine_variant
    fine_ready = all(
        os.path.exists(
            os.path.join(o, "fine_obj", variant, "gaussians_fine.ply"))
        for o in outs
    )
    if fine_all_done:
        CONSOLE.log("[multi] resume: fine_all artifacts found for all scenes")
    elif len(scenes) % n_scene == 0 and fine_ready:
        fa_inputs = []
        for i, scene in enumerate(scenes):
            ext = scene.cameras_extent
            fdir = os.path.join(outs[i], "fine_obj", variant)
            seq_v, _ = load_pose_sequence(
                os.path.join(fdir, "obj_pose_sequence.npz"))
            # full phase-range membership, incl. held-out frames and phase
            # endpoints absent from the training-filtered groups (see
            # pipeline.py stage 4 / reference interpolate_pose.py:92-99)
            dyn_mask = phase_membership_mask(scene.cameras, splits[i][4])
            dyn_mask |= np.asarray(seq_v.solved)
            interp = interpolate_pose_sequence(seq_v, dyn_mask)
            idir = os.path.join(
                outs[i], f"interpolate_pose_{variant.replace('from-', '')}")
            os.makedirs(idir, exist_ok=True)
            save_pose_sequence(
                os.path.join(idir, "obj_pose_sequence.npz"), interp,
                [c.image_name for c in scene.cameras],
            )
            obj_f = load_ply(os.path.join(fdir, "gaussians_fine.ply"),
                             is_object=True, spatial_lr_scale=ext)
            bg_m = load_ply(
                os.path.join(outs[i], "background", "static_bg.ply"),
                force_bg=True, spatial_lr_scale=ext,
            )
            fa_inputs.append(FineAllSceneInput(
                cameras=scene.cameras, obj_model=obj_f, bg_model=bg_m,
                pose_seq=interp,
                static_phase_frames=static_groups_all[i],
                dynamic_phase_frames=dynamic_groups_all[i],
                save_dir=os.path.join(outs[i], "fine_all"),
                seed=args.seed + i,
            ))
        CONSOLE.print(
            f"[multi] stage 5: {len(fa_inputs)} fine_all scenes lockstep")
        train_fine_all_scenes(fa_inputs, cfg, mesh, backend=backend)
    elif len(scenes) % n_scene:
        CONSOLE.log(
            f"[multi] fine_all: {len(scenes)} scenes not divisible by scene "
            f"axis {n_scene} — falling back to per-video runs"
        )

    # ---- remaining per-video stitching (interpolation for the unchosen
    # variant + stage 6 eval; any stage whose lockstep was skipped above
    # trains here) via the resumable pipeline ----
    from egogaussian_tpu.pipeline import run_pipeline

    for i, scene in enumerate(scenes):
        training, dyn_eval, st_eval, st_ph, dy_ph = splits[i]
        CONSOLE.print(f"[multi] stages 3-6 for video {srcs[i]}")
        run_pipeline(
            scene, cfg, outs[i],
            training_frames=training, dynamic_eval_frames=dyn_eval,
            static_eval_frames=st_eval, static_phases=st_ph,
            dynamic_phases=dy_ph, seed=args.seed + i,
            backend=backend, resume=True,
            fine_variant=args.fine_variant,
            checkpoint_every=args.checkpoint_every,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
