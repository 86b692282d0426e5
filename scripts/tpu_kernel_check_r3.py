"""On-TPU check of the saturation early-skip kernels (round 3).

Must run on the real chip: Mosaic lowering bugs (e.g. the round-3 d=1
zero-sized-pad class) are invisible to CPU/interpret tests. Checks:

1. tilegrid fwd+bwd compile and run for d=3 and d=1 (label), both
   backward flavors (default / exact_total).
2. Dense-reference kernel gates on the kNN training-init scene
   (render/debug.check_tilegrid_kernel semantics via bench helpers).
3. The deep-stack saturation scene: tail grads exactly zero on-chip.

Exit 0 = all green. Appends a JSON line to val_runs/kernel_check_r3.jsonl.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    from egogaussian_tpu.ops import covariance_from_scaling_rotation
    from egogaussian_tpu.render.camera import Camera, look_at
    from egogaussian_tpu.render.api import render
    from egogaussian_tpu.render.tiled import TileConfig

    rec = {}
    R, t = look_at(np.array([0.0, 0.0, -4.0]), np.zeros(3))
    cam = Camera.from_colmap(R, t, 60.0, 60.0, 64, 48)
    k = jax.random.PRNGKey(0)
    n = 200
    means = jax.random.normal(k, (n, 3))
    cov = covariance_from_scaling_rotation(
        jnp.exp(jax.random.normal(k, (n, 3)) * 0.3 - 2.5),
        jax.random.normal(k, (n, 4)),
    )
    cols = jax.random.uniform(k, (n, 3))
    ops = jax.random.uniform(k, (n,), minval=0.3, maxval=0.95)
    labels = jax.random.normal(k, (n, 1))

    for exact in (False, True):
        cfg = TileConfig(max_per_tile=256, max_pairs=8192, tile_size=16,
                         compositor="tilegrid", bwd_exact_total=exact)

        # d=3 fwd + bwd
        def loss3(c):
            r = render(cam, means, cov, ops, jnp.zeros(3), colors_precomp=c,
                       backend="pallas", tile_config=cfg)
            return jnp.mean(r.image ** 2) + jnp.mean(r.alpha) + jnp.mean(r.depth)

        g3 = jax.jit(jax.grad(loss3))(cols)
        g3.block_until_ready()

        # d=1 (label path)
        def loss1(lb):
            r = render(cam, means, cov, ops, jnp.zeros(1), colors_precomp=lb,
                       backend="pallas", tile_config=cfg)
            return jnp.mean(r.image ** 2)

        g1 = jax.jit(jax.grad(loss1))(labels)
        g1.block_until_ready()
        rec[f"compile_exact{int(exact)}"] = "ok"
        print(f"exact_total={exact}: d=3 + d=1 compile/run OK", flush=True)

    # deep-stack saturation scene: tail grads exactly zero on-chip
    n = 140
    z = jnp.linspace(0.0, 2.0, n)
    dmeans = jnp.stack([jnp.zeros(n), jnp.zeros(n), z], axis=1)
    dcov = covariance_from_scaling_rotation(
        jnp.full((n, 3), 2.0), jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    )
    dcols = jax.random.uniform(jax.random.PRNGKey(31), (n, 3))
    dops = jnp.full((n,), 0.2)
    cam32 = Camera.from_colmap(R, t, 60.0, 60.0, 32, 32)
    cfg = TileConfig(max_per_tile=256, max_pairs=8192, tile_size=16,
                     compositor="tilegrid")

    def dloss(c):
        r = render(cam32, dmeans, dcov, dops, jnp.zeros(3), colors_precomp=c,
                   backend="pallas", tile_config=cfg)
        return jnp.mean((r.image - 0.5) ** 2) + 0.1 * jnp.mean(r.depth)

    gd = np.asarray(jax.jit(jax.grad(dloss))(dcols))
    tail_zero = bool((gd[130:] == 0.0).all())
    rec["sat_tail_exact_zero"] = tail_zero
    print("saturated tail grads exactly zero on-chip:", tail_zero, flush=True)
    assert tail_zero, "early-skip did not engage on TPU"

    # dense-reference gates (same checks bench.py gates every round; the
    # knn scene also compiles + compares the d=1 label path on-chip)
    import bench
    errs = bench._kernel_max_err(scene="knn")
    rec.update({k2: v for k2, v in errs.items()})
    print("kernel_max_err(knn):", errs, flush=True)
    assert errs["dense_ref_fwd"] < 1e-4, errs
    assert errs["dense_ref_grad"] < 1e-3, errs

    os.makedirs("/root/repo/val_runs", exist_ok=True)
    with open("/root/repo/val_runs/kernel_check_r3.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("KERNEL CHECK OK", flush=True)


if __name__ == "__main__":
    main()
