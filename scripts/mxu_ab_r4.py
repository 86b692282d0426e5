"""On-TPU A/B of TileConfig.mxu_accum (MXU-matmul accumulation in the
tilegrid kernels) on the bench headline step + per-flavor correctness
vs the tiled XLA compositor (Mosaic-lowering proof — interpret-mode tests
cannot catch lowering-class failures; cf. the d=1 zero-pad lesson).

Run on TPU: python scripts/mxu_ab_r4.py
Appends JSON to val_runs/mxu_ab_r4.jsonl.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    import bench
    from egogaussian_tpu.data import make_synthetic_video, stack_cameras
    from egogaussian_tpu.train.common import auto_tile_config, render_gaussians

    rec = {}
    # correctness first: fwd image vs tiled on the same binned layout,
    # both flavors, full 480p scene
    model = bench._scene(100_000, seed=5)
    vid = make_synthetic_video(width=640, height=480, n_bg=64, n_obj=16,
                               frames_static=2, frames_dynamic=1, seed=5)
    batch = stack_cameras(vid.cameras[:2])
    cam = batch.camera(0)
    base_cfg = auto_tile_config(model, cam, headroom=1.5)

    def img(which_backend, cfg):
        return jax.jit(lambda p: render_gaussians(
            dataclasses.replace(model, params=p), cam, jnp.zeros(3),
            backend=which_backend, tile_config=cfg,
        ).image)(model.params)

    ref = img("tiled", base_cfg)
    for flavor in (False, True):
        cfg = dataclasses.replace(base_cfg, mxu_accum=flavor)
        err = float(jnp.max(jnp.abs(img("pallas", cfg) - ref)))
        rec[f"fwd_err_vs_tiled_mxu{int(flavor)}"] = float(f"{err:.3g}")
        assert err < 2.5e-3, (flavor, err)

    # grad check at the kNN shape (deep tiles) for the mxu flavor
    errs = bench._kernel_max_err(width=160, height=120, scene="knn",
                                 check=False)
    rec["knn_grad_rel_default"] = errs["grad_rel"]

    # timing: full train step, both flavors
    for flavor in (False, True):
        model_t = bench._scene(100_000, seed=3)
        ips, roofline = bench._train_iters_per_sec(
            model_t, 640, 480, n_warmup_train=300, n_iter=50,
            mxu_accum=flavor,
        )
        rec[f"ips_480p_mxu{int(flavor)}"] = round(ips, 2)
        print(f"mxu_accum={flavor}: {ips:.2f} it/s", flush=True)

    os.makedirs("/root/repo/val_runs", exist_ok=True)
    with open("/root/repo/val_runs/mxu_ab_r4.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
