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

Two variants:

  * make_sharded_render — parameters REPLICATED (compute parallelism):
    every device sees all N Gaussians and rasterizes the depth-rank slab
    with its index.
  * make_memory_sharded_render — parameters SHARDED over the mesh axis
    (memory scaling for multi-M-Gaussian scenes): each device OWNS N/D
    arbitrary Gaussians; per frame, global depth-quantile boundaries are
    agreed via a psum'd histogram, and an all-to-all RE-SLAB exchanges
    Gaussians so device k holds exactly the ones in depth band k. Bands
    are disjoint depth intervals, so the front-to-back factorization
    (above) stays exact; only load balance is approximate.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
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
        out_img, out_alpha, out_depth = _merge_slabs(imgs, depths, log_ts)
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


def _merge_slabs(imgs, depths, log_ts):
    """Ordered front-to-back merge of per-slab partials (slab 0 = nearest).
    imgs [D, C, H, W], depths [D, 1, H, W], log_ts [D, H, W]."""
    log_prefix = jnp.cumsum(log_ts, axis=0) - log_ts  # exclusive
    t_prefix = jnp.exp(log_prefix)[:, None]  # [D, 1, H, W]
    out_img = jnp.sum(imgs * t_prefix, axis=0)
    out_depth = jnp.sum(depths * t_prefix, axis=0)
    t_total = jnp.exp(jnp.sum(log_ts, axis=0))  # [H, W]
    return out_img, (1.0 - t_total)[None], out_depth


def make_memory_sharded_render(
    mesh: Mesh,
    camera: Camera,
    axis: str = "data",
    backend: str = "tiled",
    tile_config=None,
    capacity_factor: float = 2.0,
    depth_bins: int = 256,
):
    """Memory-sharded renderer: Gaussian params are SHARDED over `axis`
    (device k owns rows [kC, (k+1)C) of each array — arbitrary Gaussians,
    NOT depth-sorted), so the per-device parameter footprint is N/D.

    Per frame each device:
      1. projects its own shard, computes visible depths
      2. builds a local depth histogram; a psum makes it global, and the
         D-quantile boundaries define disjoint depth bands (band k for
         device k, ascending)
      3. routes each owned Gaussian to its band's device via ONE packed
         all-to-all (the "re-slab"); per-destination capacity is
         ceil(C/D * capacity_factor) — overflowed Gaussians are dropped
         and counted (returned as `dropped` for observability)
      4. rasterizes the received band against its camera (disjoint depth
         intervals keep the slab factorization exact)
      5. all_gather + ordered transmittance merge, as the replicated path

    Returned fn(means3d, cov3d, colors, opacities, valid_mask, bg=None)
    takes arrays sharded on dim 0 over `axis` and returns
    (RenderOutput, dropped:int32 scalar).
    """
    n_slabs = mesh.shape[axis]

    def shard_fn(means3d, cov3d, colors, opacities, valid_mask):
        c = means3d.shape[0]  # local shard size
        d_col = colors.shape[-1]
        cap = max(1, int(np.ceil(c / n_slabs * capacity_factor)))
        proj = project_gaussians(
            means3d, cov3d, camera.viewmat, camera.fx, camera.fy,
            camera.cx, camera.cy, camera.width, camera.height,
            valid_mask=valid_mask,
        )
        visible = proj.radii > 0

        # ---- global depth-quantile boundaries via psum'd histogram ----
        big = jnp.float32(1e10)
        local_min = jnp.min(jnp.where(visible, proj.depths, big))
        local_max = jnp.max(jnp.where(visible, proj.depths, -big))
        mn = jax.lax.pmin(local_min, axis)
        mx = jax.lax.pmax(local_max, axis)
        span = jnp.maximum(mx - mn, 1e-6)
        bin_of = jnp.clip(
            ((proj.depths - mn) / span * depth_bins).astype(jnp.int32),
            0, depth_bins - 1,
        )
        hist = jnp.zeros((depth_bins,), jnp.int32).at[
            jnp.where(visible, bin_of, depth_bins)
        ].add(1, mode="drop")
        hist = jax.lax.psum(hist, axis)
        cum = jnp.cumsum(hist)
        total = cum[-1]
        # boundary bins: smallest bin with cum >= k*total/D  (k = 1..D-1)
        targets = (
            jnp.arange(1, n_slabs, dtype=jnp.int32) * total + n_slabs - 1
        ) // n_slabs
        bound_bins = jnp.searchsorted(cum, targets, side="left")  # [D-1]

        # destination band of each local gaussian (invisible -> dropped)
        dest = jnp.searchsorted(bound_bins, bin_of, side="right")  # [C]
        dest = jnp.where(visible, dest, n_slabs)  # n_slabs == drop

        # ---- pack fields and scatter into the [D, cap] send buffer ----
        packed = jnp.concatenate(
            [
                means3d,
                cov3d,
                colors,
                opacities[:, None],
                visible.astype(means3d.dtype)[:, None],
            ],
            axis=1,
        )  # [C, F]
        f = packed.shape[1]
        # rank of each gaussian within its destination band
        order = jnp.argsort(dest)  # stable groups by dest
        dest_s = dest[order]
        first = jnp.searchsorted(dest_s, jnp.arange(n_slabs + 1))
        rank_s = jnp.arange(c, dtype=jnp.int32) - first[
            jnp.clip(dest_s, 0, n_slabs)
        ]
        slot_s = jnp.where(
            (dest_s < n_slabs) & (rank_s < cap),
            dest_s * cap + rank_s,
            n_slabs * cap,
        )
        send = jnp.zeros((n_slabs * cap, f), packed.dtype).at[slot_s].set(
            packed[order], mode="drop"
        ).reshape(n_slabs, cap, f)
        dropped = jnp.sum(
            ((dest_s < n_slabs) & (rank_s >= cap)).astype(jnp.int32)
        )
        dropped = jax.lax.psum(dropped, axis)

        # ---- the re-slab ----
        # tiled all_to_all: block k of my send goes to device k; my block j
        # afterwards is what device j sent me -> [D, cap, F]
        recv = jax.lax.all_to_all(
            send, axis, split_axis=0, concat_axis=0, tiled=True
        ).reshape(n_slabs * cap, f)
        r_means = recv[:, 0:3]
        r_cov = recv[:, 3:9]
        r_cols = recv[:, 9:9 + d_col]
        r_op = recv[:, 9 + d_col]
        r_valid = recv[:, 10 + d_col] > 0.5

        from egogaussian_tpu.render.api import render

        res = render(
            camera, r_means, r_cov, r_op,
            bg=jnp.zeros((d_col,), means3d.dtype),
            colors_precomp=r_cols, valid_mask=r_valid,
            backend=backend, tile_config=tile_config,
        )
        t_slab = jnp.clip(1.0 - res.alpha[0], 1e-12, 1.0)
        imgs = jax.lax.all_gather(res.image, axis)
        depths = jax.lax.all_gather(res.depth, axis)
        log_ts = jax.lax.all_gather(jnp.log(t_slab), axis)
        out_img, out_alpha, out_depth = _merge_slabs(imgs, depths, log_ts)
        return out_img, out_alpha, out_depth, dropped

    repl = NamedSharding(mesh, P())
    shard0 = NamedSharding(mesh, P(axis))
    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        ),
        in_shardings=(shard0,) * 5,
        out_shardings=(repl,) * 4,
    )

    def render_msharded(means3d, cov3d, colors, opacities, valid_mask, bg=None):
        img, alpha, depth, dropped = fn(
            means3d, cov3d, colors, opacities, valid_mask
        )
        if bg is not None:
            img = img + (1.0 - alpha) * jnp.asarray(bg)[:, None, None]
        out = RenderOutput(
            image=img, alpha=alpha, depth=depth,
            radii=jnp.zeros((means3d.shape[0],), jnp.int32),
            dropped_pairs=dropped,
        )
        return out, dropped

    return render_msharded
