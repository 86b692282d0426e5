"""Gaussian-sharded rendering: depth-slab decomposition across devices.

The SURVEY §2.3 "stretch" row: for large scenes, split the N Gaussians into
per-device DEPTH SLABS (disjoint camera-space depth ranges). Front-to-back
alpha compositing factorizes exactly across depth-disjoint groups:

  img   = img_0 + T_0 * (img_1 + T_1 * (img_2 + ...)) + (prod_k T_k) * bg
  alpha = 1 - prod_k T_k
  depth = depth_0 + T_0 * depth_1 + ...

where (img_k, depth_k, T_k) are each slab's premultiplied color/depth and
per-pixel transmittance — so each device rasterizes ~N/D Gaussians
independently and the merge is D fused-multiply-adds over the image (tiny
vs rasterization). Slab boundaries are depth ranks (device k gets ranks
[kN/D, (k+1)N/D)), which preserves global per-pixel depth order exactly.

This version keeps parameters replicated (compute parallelism); a
memory-sharded variant would add an all-to-all re-slab step when depth
order drifts.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from egogaussian_tpu.render.camera import Camera
from egogaussian_tpu.render.oracle import RenderOutput
from egogaussian_tpu.render.project import project_gaussians


def _slab_partial(
    slab_idx: jnp.ndarray,
    n_slabs: int,
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    valid_mask: jnp.ndarray,
    camera: Camera,
    backend: str,
    tile_config,
):
    """(img, depth, log_T) for this device's depth slab (premultiplied, no
    background)."""
    from egogaussian_tpu.render.api import render

    proj = project_gaussians(
        means3d, cov3d, camera.viewmat, camera.fx, camera.fy,
        camera.cx, camera.cy, camera.width, camera.height,
        valid_mask=valid_mask,
    )
    # global depth ranks (identical on every device: same replicated inputs)
    visible = proj.radii > 0
    n = means3d.shape[0]
    n_vis = jnp.sum(visible.astype(jnp.int32))
    order = jnp.argsort(jnp.where(visible, proj.depths, jnp.inf))
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    lo = slab_idx * n_vis // n_slabs
    hi = (slab_idx + 1) * n_vis // n_slabs
    in_slab = (rank >= lo) & (rank < hi) & visible

    res = render(
        camera, means3d, cov3d, opacities,
        bg=jnp.zeros((colors.shape[-1],), means3d.dtype),
        colors_precomp=colors, valid_mask=in_slab,
        backend=backend, tile_config=tile_config,
    )
    # alpha = 1 - T for the slab; keep log for numerically exact chaining
    t_slab = jnp.clip(1.0 - res.alpha[0], 1e-12, 1.0)
    return res.image, res.depth, jnp.log(t_slab)


def make_sharded_render(
    mesh: Mesh,
    camera: Camera,
    axis: str = "data",
    backend: str = "tiled",
    tile_config=None,
):
    """Jitted depth-slab sharded renderer over `axis` of `mesh`.

    Returned fn(means3d, cov3d, colors, opacities, valid_mask, bg=None) ->
    RenderOutput with all Gaussian inputs replicated; each device rasterizes
    one slab and the partials are combined with an all_gather + ordered
    transmittance chain (D tiny FMAs on the image). `bg` ([C]) adds the
    docstring's (prod_k T_k) * bg term (default black).
    """
    n_slabs = mesh.shape[axis]

    def shard_fn(means3d, cov3d, colors, opacities, valid_mask):
        slab = jax.lax.axis_index(axis)
        img, depth, log_t = _slab_partial(
            slab, n_slabs, means3d, cov3d, colors, opacities, valid_mask,
            camera, backend, tile_config,
        )
        # gather every slab's partials (small: D x image)
        imgs = jax.lax.all_gather(img, axis)  # [D, C, H, W]
        depths = jax.lax.all_gather(depth, axis)  # [D, 1, H, W]
        log_ts = jax.lax.all_gather(log_t, axis)  # [D, H, W]

        # front-to-back chain: prefix transmittance of the slabs BEFORE k
        log_prefix = jnp.cumsum(log_ts, axis=0) - log_ts  # exclusive
        t_prefix = jnp.exp(log_prefix)[:, None]  # [D, 1, H, W]
        out_img = jnp.sum(imgs * t_prefix, axis=0)
        out_depth = jnp.sum(depths * t_prefix, axis=0)
        t_total = jnp.exp(jnp.sum(log_ts, axis=0))  # [H, W]
        out_alpha = (1.0 - t_total)[None]
        return out_img, out_alpha, out_depth

    repl = NamedSharding(mesh, P())
    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        ),
        in_shardings=(repl,) * 5,
        out_shardings=(repl,) * 3,
    )

    def render_sharded(means3d, cov3d, colors, opacities, valid_mask, bg=None):
        img, alpha, depth = fn(means3d, cov3d, colors, opacities, valid_mask)
        if bg is not None:
            # t_total = prod_k T_k = 1 - alpha; slab partials carry no bg
            img = img + (1.0 - alpha) * jnp.asarray(bg)[:, None, None]
        return RenderOutput(
            image=img, alpha=alpha, depth=depth,
            radii=jnp.zeros((means3d.shape[0],), jnp.int32),
        )

    return render_sharded
