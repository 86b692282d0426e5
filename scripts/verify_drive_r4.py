"""Round-4 verify drive: full 6-stage pipeline on the REAL TPU through the
public API (run_pipeline), exercising this round's trainer changes at the
surface:
  * coarse warm-up no-op elision (skip_noop_warmup default path)
  * MetricsLogger wiring (logs/metrics.jsonl must carry entries from every
    stage at the densify-interval cadence)
Asserts stage artifacts, metrics coverage, and eval PSNR sanity.

Run (holds the TPU tunnel): python scripts/verify_drive_r4.py [--out DIR]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def drive_config():
    from egogaussian_tpu.config import Config

    cfg = Config()
    # long enough that eval PSNR reflects code health, not schedule
    # starvation (a 200-iter static stage renders a near-black heldout
    # view at this scale — observed in the first drive attempt)
    cfg.static = dataclasses.replace(
        cfg.static, std_train_iter=300, entropy_reg_iter=60,
        label_train_iter=60, densify_from_iter=20, densify_until_iter=200,
        rewind_frames=3, label_lr=0.05,
    )
    cfg.static_bg = dataclasses.replace(
        cfg.static_bg, std_train_iter=300, entropy_reg_iter=60,
        densify_from_iter=20, densify_until_iter=200,
    )
    cfg.opt = dataclasses.replace(
        cfg.opt, densification_interval=25, opacity_reset_interval=2000,
    )
    cfg.coarse = dataclasses.replace(
        cfg.coarse, warm_up_iter=150, total_num_iter=220,
        densify_from_iter=160, densify_until_iter=200,
        densification_interval=20, opacity_reset_interval=2000,
    )
    cfg.fine = dataclasses.replace(
        cfg.fine, total_num_iter=150, densify_from_iter=20,
        densify_until_iter=100, densification_interval=25,
        opacity_reset_interval=2000,
    )
    cfg.fine_all = dataclasses.replace(
        cfg.fine_all, total_num_iter=150, densify_from_iter=10,
        densify_until_iter=50, opacity_reset_interval=40,
    )
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="val_runs/verify_r4")
    a = ap.parse_args()

    import jax

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    from egogaussian_tpu.data import make_synthetic_video
    from egogaussian_tpu.data.readers import SceneData, compute_nerfpp_norm
    from egogaussian_tpu.pipeline import run_pipeline

    vid = make_synthetic_video(
        width=96, height=72, n_bg=300, n_obj=60,
        frames_static=3, frames_dynamic=3,
    )
    scene = SceneData(
        cameras=vid.cameras, points=vid.points, colors=vid.colors,
        nerf_norm=compute_nerfpp_norm(vid.cameras),
        image_names=vid.image_names,
    )
    cfg = drive_config()
    names = vid.image_names
    os.makedirs(a.out, exist_ok=True)

    # Interior-holdout split (export_colmap's fixed reference-protocol
    # split): held-out dynamic frame mid-phase — the coarse chain must
    # bridge the gap and stage-4 interpolation must pose the eval frame.
    d0, d1 = vid.dynamic_phases[0]
    s0, s1 = vid.static_phases[-1]
    dyn_eval = d0 + (d1 - d0) // 2
    stat_eval = s0 + (s1 - s0) // 2
    train = [n for i, n in enumerate(names) if i not in (dyn_eval, stat_eval)]

    result = run_pipeline(
        scene, cfg, a.out,
        training_frames=train,
        dynamic_eval_frames=[names[dyn_eval]],
        static_eval_frames=[names[stat_eval]],
        static_phases=vid.static_phases,
        dynamic_phases=vid.dynamic_phases,
        resume=True,
    )

    # --- assertions at the public surface ---
    for p in (
        "static/ply/static_phase0_obj.ply",
        "background/static_bg.ply",
        "coarse/obj_pose_sequence.npz",
        "fine_obj/from-coarse/gaussians_fine.ply",
        "fine_all/gaussians_all.ply",
        "evaluation/results.txt",
        "logs/metrics.jsonl",
    ):
        assert os.path.exists(os.path.join(a.out, p)), f"missing {p}"

    stages_seen = set()
    with open(os.path.join(a.out, "logs", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            stages_seen.add(rec.get("stage"))
            assert "loss" in rec and "alive" in rec, rec
    expected = {"static", "bg", "coarse", "fine_obj", "fine_all"}
    assert expected <= stages_seen, (
        f"metrics.jsonl missing stages: {expected - stages_seen}"
    )

    psnr = result.metrics.get("dynamic_eval", {}).get("psnr", 0.0)
    print("metrics:", result.metrics, flush=True)
    assert psnr > 12.0, f"dynamic_eval PSNR {psnr} below sanity floor"
    print("VERIFY DRIVE OK — stages logged:", sorted(stages_seen), flush=True)


if __name__ == "__main__":
    main()
