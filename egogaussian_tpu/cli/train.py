"""Training CLI — drop-in twin of reference `train.py`.

Usage (same dataset layout and split files as the reference):
  python -m egogaussian_tpu.cli.train -s <dataset_dir> -m <output_dir> \
      [--resume] [--backend tiled] [--seed 0]

Reads the reference split layout (train.py:53-65):
  <dataset>/split/training_frames.txt
  <dataset>/split/dynamic_eval_frames.txt
  <dataset>/split/static_eval_frames.txt
  <dataset>/split/phase_frame_index.txt   (alternating static/dynamic pairs)
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

from egogaussian_tpu.config import add_config_args, extract_config, save_config
from egogaussian_tpu.data.readers import (
    load_colmap_scene,
    read_phase_index,
    read_split_file,
)
from egogaussian_tpu.pipeline import run_pipeline
from egogaussian_tpu.utils.console import CONSOLE


def main(argv=None):
    parser = ArgumentParser(description="EgoGaussian-TPU training pipeline")
    add_config_args(parser)
    parser.add_argument("--resume", action="store_true",
                        help="resume from existing stage artifacts")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--checkpoint_every", type=int, default=0,
                        help="mid-stage checkpoint interval (0 = off)")
    parser.add_argument("--lpips_weights", default=None,
                        help=".npz LPIPS weights (eval/lpips.py)")
    parser.add_argument("--mesh", type=int, default=0, metavar="N",
                        help="frame-data-parallel training over an N-device "
                             "mesh (0 = single device); frame batches are "
                             "sharded across devices and gradients psum'd "
                             "over ICI")
    args = parser.parse_args(argv)
    cfg = extract_config(args)

    mesh = None
    if args.mesh and args.mesh > 1:
        import jax

        from egogaussian_tpu.parallel import make_mesh

        devices = jax.devices()
        if len(devices) < args.mesh:
            parser.error(
                f"--mesh {args.mesh}: only {len(devices)} devices visible "
                "(for a virtual CPU mesh set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N)"
            )
        mesh = make_mesh(n_data=args.mesh, devices=devices[: args.mesh])
        CONSOLE.print(f"Frame-DP over {args.mesh} devices: {mesh}")

    src = cfg.model.source_path
    out = cfg.model.model_path or os.path.join(src, "output")
    os.makedirs(out, exist_ok=True)
    save_config(cfg, os.path.join(out, "cfg_args.json"))

    split_dir = os.path.join(src, "split")
    training_frames = read_split_file(os.path.join(split_dir, "training_frames.txt"))
    dynamic_eval = read_split_file(
        os.path.join(split_dir, "dynamic_eval_frames.txt")
    )
    static_eval = read_split_file(os.path.join(split_dir, "static_eval_frames.txt"))
    static_phases, dynamic_phases = read_phase_index(
        os.path.join(split_dir, "phase_frame_index.txt")
    )

    CONSOLE.print(f"Loading COLMAP scene from {src}")
    scene = load_colmap_scene(src, cfg.model.images, cfg.model.resolution)
    CONSOLE.print(
        f"{len(scene.cameras)} cameras, {len(scene.points)} init points, "
        f"extent {scene.cameras_extent:.3f}"
    )
    # input.ply + cameras.json for external viewers (reference
    # scene/__init__.py:79-91)
    from egogaussian_tpu.data.readers import write_scene_artifacts

    write_scene_artifacts(scene, out)

    lpips_fn = None
    if args.lpips_weights:
        from egogaussian_tpu.eval.lpips import LPIPS

        lpips_fn = LPIPS(weights_path=args.lpips_weights)

    result = run_pipeline(
        scene, cfg, out,
        training_frames=training_frames,
        dynamic_eval_frames=dynamic_eval,
        static_eval_frames=static_eval,
        static_phases=static_phases,
        dynamic_phases=dynamic_phases,
        seed=args.seed,
        backend=cfg.render.backend,
        resume=args.resume,
        lpips_fn=lpips_fn,
        checkpoint_every=args.checkpoint_every,
        mesh=mesh,
    )
    CONSOLE.print("Final metrics:", result.metrics)
    return result


if __name__ == "__main__":
    main()
