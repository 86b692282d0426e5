"""On-TPU A/B of the saturation early-skip on the REAL fine_all workload.

The 480p validation's fine_all stage (68k combined gaussians, deep tiles:
max_per_tile 4096 -> up to 32 chunks/tile) ran at ~7 it/s — the regime the
skip targets. Loads the validation run's final gaussians_all.ply + its
dataset, rebuilds the stage's render fwd+bwd step, and times it with the
skip at its default threshold (1e-7) vs disabled (eps=0 -> the predicate
max(T) >= 0 is always true, i.e. every chunk computed). The module global
is read at pallas trace time, so each setting is traced into a FRESH jit
wrapper. Appends JSON to val_runs/fineall_skip_ab.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN = "/root/repo/val_runs/480p_pallas"


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    from egogaussian_tpu.data.readers import load_colmap_scene, stack_cameras
    from egogaussian_tpu.models.gaussians import load_ply
    from egogaussian_tpu.models import adam_init
    from egogaussian_tpu.models.optim import adam_update, gaussian_lr_tree
    from egogaussian_tpu.render import pallas_raster
    from egogaussian_tpu.train.common import (
        auto_tile_config, image_loss, mask_grad, render_gaussians,
    )
    from egogaussian_tpu.config import Config

    scene = load_colmap_scene(os.path.join(RUN, "dataset"))
    batch = stack_cameras(scene.cameras)
    model = load_ply(os.path.join(RUN, "output", "fine_all",
                                  "gaussians_all.ply"),
                     spatial_lr_scale=scene.cameras_extent)
    print(f"{int(model.num_alive)} gaussians, capacity {model.capacity}",
          flush=True)
    tile_cfg = auto_tile_config(model, batch.camera(0))
    print("tile config:", tile_cfg, flush=True)
    cfg = Config()
    opt_state = adam_init(model.params)
    lr_tree = gaussian_lr_tree(model.params, jnp.int32(100), cfg.opt, 1.0,
                               label_lr=0.0)

    rec = {"n_alive": int(model.num_alive),
           "max_pairs": tile_cfg.max_pairs,
           "max_per_tile": tile_cfg.max_per_tile}
    for eps, name in ((1e-7, "skip_on"), (0.0, "skip_off")):
        pallas_raster._SAT_SKIP_EPS = eps

        def step(m, opt, fidx):
            cam, gt, hand, _ = batch.frame(fidx)

            def loss_fn(params):
                mm = dataclasses.replace(m, params=params)
                res = render_gaussians(mm, cam, jnp.zeros(3),
                                       backend="pallas",
                                       tile_config=tile_cfg)
                return image_loss(mask_grad(res.image, hand), gt, 0.2)

            loss, grads = jax.value_and_grad(loss_fn)(m.params)
            p, o = adam_update(m.params, grads, opt, lr_tree)
            return dataclasses.replace(m, params=p), o, loss

        jstep = jax.jit(step)  # fresh wrapper -> re-traces the kernel
        m, o = model, opt_state
        m, o, loss = jstep(m, o, jnp.int32(0))
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        n = 50
        for i in range(n):
            m, o, loss = jstep(m, o, jnp.int32(i % len(scene.cameras)))
        jax.block_until_ready(loss)
        ips = n / (time.perf_counter() - t0)
        rec[name] = round(ips, 2)
        print(f"{name} (eps={eps}): {ips:.2f} it/s", flush=True)

    pallas_raster._SAT_SKIP_EPS = 1e-7
    rec["speedup"] = round(rec["skip_on"] / rec["skip_off"], 3)
    os.makedirs("/root/repo/val_runs", exist_ok=True)
    with open("/root/repo/val_runs/fineall_skip_ab.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
