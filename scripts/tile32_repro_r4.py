"""Reproduce the round-3 ts=32 VMEM blocker with full error text.

tile_ab_r3.jsonl recorded "vals block [1152,16,128] f32 = 9.4 MB x2
double-buffered > 16 MB scoped VMEM" for the tilegrid backward at
tile_size=32 — a shape that looks like the ENTIRE chunk-padded pair array,
not the (1, ch16, 128) emit_pipeline block. This script compiles fwd and
bwd separately at ts=32 on a small-but-representative scene and prints the
exact Mosaic error, so the fix targets the real allocation.

Run on TPU: python scripts/tile32_repro_r4.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    from bench import _scene
    from egogaussian_tpu.data import make_synthetic_video, stack_cameras
    from egogaussian_tpu.train.common import (
        auto_tile_config, image_loss, mask_grad, render_gaussians,
    )

    model = _scene(100_000, seed=3)
    vid = make_synthetic_video(width=640, height=480, n_bg=128, n_obj=32,
                               frames_static=2, frames_dynamic=1)
    batch = stack_cameras(vid.cameras[:2])
    cam, gt, hand, _ = batch.frame(0)
    tile_cfg = auto_tile_config(model, batch.camera(0), headroom=1.5,
                                tile_size=32)
    print("ts=32 config:", tile_cfg, flush=True)

    def fwd(params):
        m = dataclasses.replace(model, params=params)
        res = render_gaussians(m, cam, jnp.zeros(3), tile_config=tile_cfg,
                               backend="pallas")
        return image_loss(mask_grad(res.image, hand), gt, 0.2)

    try:
        out = jax.jit(fwd)(model.params)
        jax.block_until_ready(out)
        print("fwd OK, loss", float(out), flush=True)
    except Exception as e:
        print("FWD FAILED:\n", str(e)[:3000], flush=True)
        return

    try:
        g = jax.jit(jax.grad(fwd))(model.params)
        jax.block_until_ready(g.xyz)
        print("bwd OK", flush=True)
    except Exception as e:
        print("BWD FAILED:\n", str(e)[:3000], flush=True)


if __name__ == "__main__":
    main()
