"""Benchmark: full training iteration (rasterize fwd + bwd + Adam) at 480p.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload: 100k Gaussians with a trained-scene-like footprint distribution
(median splat radius a few pixels — matching post-densification 3DGS
statistics rather than raw kNN-seeded init, which produces pathological
screen-filling splats), binning capacities auto-tuned the way the stage
trainers do (train/common.py auto_tile_config).

Baseline: the reference trains vanilla 3DGS on a Titan Xp (train.sh:5-7);
published 3DGS training throughput on that class of GPU at ~480p with
~100k Gaussians is ~25-35 full iterations/sec. BASELINE.json publishes no
number, so vs_baseline is computed against a nominal 30 it/s.
"""
import json
import time

import numpy as np

BASELINE_ITERS_PER_SEC = 30.0
N_GAUSSIANS = 100_000
WIDTH, HEIGHT = 640, 480


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from egogaussian_tpu.data import make_synthetic_video, stack_cameras
    from egogaussian_tpu.models import adam_init, from_points
    from egogaussian_tpu.models.optim import adam_update, gaussian_lr_tree
    from egogaussian_tpu.config import Config
    from egogaussian_tpu.train.common import (
        auto_tile_config, image_loss, mask_grad, pick_backend, render_gaussians,
    )

    rng = np.random.RandomState(0)
    # room-like scene: structure shell + uniformly spread interior (matches
    # trained-scene tile occupancy; a tight central clutter would pile half
    # the splats into a few tiles, which no real capture produces)
    pts = np.concatenate(
        [
            rng.randn(N_GAUSSIANS // 2, 3) * 2.0,
            rng.uniform(-2.0, 2.0, (N_GAUSSIANS // 2, 3)),
        ]
    ).astype(np.float32)
    cols = rng.rand(len(pts), 3).astype(np.float32)
    model = from_points(pts, cols, capacity=N_GAUSSIANS)
    # trained-scene splat sizes: log-normal around ~2px at the camera depth
    # (raw kNN init at 100k random points yields screen-filling splats that
    # no real pipeline ever renders)
    log_scales = (np.log(0.008) + 0.5 * rng.randn(len(pts), 3)).astype(np.float32)
    params = dataclasses.replace(
        model.params,
        log_scales=model.params.log_scales.at[: len(pts)].set(log_scales),
    )
    model = dataclasses.replace(model, params=params)
    opt_state = adam_init(model.params)

    vid = make_synthetic_video(
        width=WIDTH, height=HEIGHT, n_bg=128, n_obj=32,
        frames_static=2, frames_dynamic=1,
    )
    batch = stack_cameras(vid.cameras[:4])
    cfg = Config()
    lr_tree = gaussian_lr_tree(model.params, jnp.int32(100), cfg.opt, 1.0, label_lr=0.0)
    tile_cfg = auto_tile_config(model, batch.camera(0), headroom=1.5)
    backend = pick_backend(tile_cfg, "auto")

    @jax.jit
    def train_step(model, opt_state, fidx):
        cam, gt, hand, _ = batch.frame(fidx)

        def loss_fn(params):
            m = dataclasses.replace(model, params=params)
            res = render_gaussians(m, cam, jnp.zeros(3), tile_config=tile_cfg,
                                   backend=backend)
            return image_loss(mask_grad(res.image, hand), gt, 0.2)

        loss, grads = jax.value_and_grad(loss_fn)(model.params)
        new_params, new_opt = adam_update(model.params, grads, opt_state, lr_tree)
        return dataclasses.replace(model, params=new_params), new_opt, loss

    model, opt_state, loss = train_step(model, opt_state, jnp.int32(0))
    jax.block_until_ready(loss)

    n_iter = 50
    t0 = time.perf_counter()
    for i in range(n_iter):
        model, opt_state, loss = train_step(model, opt_state, jnp.int32(i % 4))
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    ips = n_iter / dt

    print(
        json.dumps(
            {
                "metric": "train_iters_per_sec_480p_100k",
                "value": round(ips, 3),
                "unit": "iters/sec (full fwd+bwd+adam, 640x480, 100k gaussians)",
                "vs_baseline": round(ips / BASELINE_ITERS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
