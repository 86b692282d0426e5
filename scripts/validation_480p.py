"""Full-protocol validation run at 480p, through the CLI.

VERDICT r1 item 3: all round-1 quality evidence was 48x36-96x72 synthetic
at ~1/40 schedule. This script runs the WHOLE 6-stage pipeline at 640x480
on a richer synthetic multi-phase video, exported as a reference-layout
COLMAP dataset (data/export_colmap.py) and consumed through the real CLI
(`egogaussian_tpu.cli.train`), at an honest 1/SCALE of the reference
schedule (default 1/4: every iteration count AND cadence interval divided
by 4, so the densify/reset/warm-up choreography keeps its shape).

Metrics land in <out>/output/evaluation/results.txt, computed from 8-bit
round-tripped images per the reference protocol (eval_metric.py:139-161).

Usage: python scripts/validation_480p.py [--out DIR] [--scale 4]
Resumable: re-running continues from stage artifacts + mid-stage ckpts.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/root/repo/val_runs/480p")
    p.add_argument("--scale", type=int, default=4, help="schedule divisor")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--backend", default="auto",
                   help="rasterizer backend for all stages "
                        "(auto|oracle|tiled|pallas)")
    # Camera coverage is the binding constraint on held-out static-view
    # quality (r3 analysis: training-frame PSNR decays 34->26.5 dB along
    # the trajectory tail at 8+6+8 frames; the held-out tail view sits at
    # the extrapolation end). Denser runs lift it at ~linear TPU cost in
    # the coarse stage (30k/scale iters per extra dynamic frame).
    p.add_argument("--frames_static", type=int, default=8)
    p.add_argument("--frames_dynamic", type=int, default=6)
    a = p.parse_args()
    k = a.scale

    ds = os.path.join(a.out, "dataset")
    if not os.path.exists(os.path.join(ds, "sparse", "0", "points3D.bin")):
        from egogaussian_tpu.data.export_colmap import export_colmap_dataset
        from egogaussian_tpu.data.synthetic import make_synthetic_video

        print("generating synthetic 480p video...", flush=True)
        vid = make_synthetic_video(
            width=a.width, height=a.height, n_bg=4000, n_obj=400,
            frames_static=a.frames_static, frames_dynamic=a.frames_dynamic,
            seed=7,
        )
        export_colmap_dataset(vid, ds)
        print(f"dataset exported to {ds}", flush=True)

    from egogaussian_tpu.cli.train import main as train_main

    argv = [
        "-s", ds,
        "--model_path", os.path.join(a.out, "output"),
        "--resume",
        "--checkpoint_every", "2000",
        # global cadences (static stage uses the opt group)
        "--densification_interval", str(max(100 // k, 10)),
        "--opacity_reset_interval", str(max(3000 // k, 100)),
        "--position_lr_max_steps", str(30000 // k),
        # stage 1.0 static
        "--s_std_train_iter", str(50000 // k),
        "--s_entropy_reg_iter", str(10000 // k),
        "--s_label_train_iter", str(30000 // k),
        "--s_densify_until_iter", str(40000 // k),
        # stage 1.2 background
        "--b_std_train_iter", str(80000 // k),
        "--b_entropy_reg_iter", str(10000 // k),
        "--b_densify_until_iter", str(60000 // k),
        # stage 2 coarse
        "--c_warm_up_iter", str(20000 // k),
        "--c_total_num_iter", str(30000 // k),
        "--c_densify_from_iter", str(20500 // k),
        "--c_densify_until_iter", str(25500 // k),
        "--c_opacity_reset_interval", str(max(2500 // k, 100)),
        "--c_densification_interval", str(max(500 // k, 25)),
        # stage 3 fine object
        "--f_total_num_iter", str(70000 // k),
        "--f_densify_from_iter", str(max(500 // k, 50)),
        "--f_densify_until_iter", str(45000 // k),
        "--f_opacity_reset_interval", str(max(3000 // k, 100)),
        "--f_densification_interval", str(max(50 // k, 12)),
        # stage 5 fine all
        "--a_total_num_iter", str(40000 // k),
        "--a_densify_until_iter", str(5000 // k),
        "--a_opacity_reset_interval", str(max(3000 // k, 100)),
        "--backend", a.backend,
    ]
    print("running CLI pipeline:", " ".join(argv), flush=True)
    result = train_main(argv)

    res_path = os.path.join(a.out, "output", "evaluation", "results.txt")
    if os.path.exists(res_path):
        print("==== results.txt ====")
        print(open(res_path).read())
    return result


if __name__ == "__main__":
    main()
