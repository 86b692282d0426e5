"""Reference (oracle) compositor: every Gaussian against every pixel.

This pure-jnp renderer defines the framework's compositing semantics and is
the correctness oracle for the tiled and Pallas rasterizers (SURVEY.md §7
step 2). It replaces the CUDA forward/backward of diff-gaussian-rasterization
for small scenes and tests; gradients come from jax.grad for free.

Semantics (matching the graphdeco/ashawkey CUDA rasterizer used by the
reference, minus its early-termination truncation which only exists for GPU
perf):
  alpha_i(p) = min(0.99, opacity_i * exp(-0.5 d^T Conic d)), zeroed < 1/255
  w_i = alpha_i * prod_{j<i} (1 - alpha_j)  (front-to-back depth order)
  rgb   = sum w_i c_i + T_final * bg
  alpha = 1 - T_final = sum w_i
  depth = sum w_i z_i          (ashawkey fork: unnormalized expected depth)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from egogaussian_tpu.render.project import ProjectedGaussians

ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99


class RenderOutput(NamedTuple):
    image: jnp.ndarray  # [D, H, W]
    alpha: jnp.ndarray  # [1, H, W]
    depth: jnp.ndarray  # [1, H, W]
    radii: jnp.ndarray  # [N]
    # pairs silently lost to the tiled/pallas static binning capacities
    # (0 for the exact oracle; scalar i32 from the binned backends)
    dropped_pairs: jnp.ndarray = 0


def pixel_alphas(
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    opacities: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Alpha of each Gaussian [G] at each pixel (px, py) [...]: -> [G, ...]."""
    dx = px[None] - means2d[:, 0].reshape((-1,) + (1,) * px.ndim)
    dy = py[None] - means2d[:, 1].reshape((-1,) + (1,) * py.ndim)
    a = conics[:, 0].reshape((-1,) + (1,) * px.ndim)
    b = conics[:, 1].reshape((-1,) + (1,) * px.ndim)
    c = conics[:, 2].reshape((-1,) + (1,) * px.ndim)
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    power = jnp.minimum(power, 0.0)
    alpha = opacities.reshape((-1,) + (1,) * px.ndim) * jnp.exp(power)
    alpha = jnp.minimum(alpha, ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)
    return jnp.where(valid.reshape((-1,) + (1,) * px.ndim), alpha, 0.0)


def composite_oracle(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    bg: jnp.ndarray,
    width: int,
    height: int,
    chunk_size: int = 256,
) -> RenderOutput:
    """Composite all Gaussians over the full image, front-to-back.

    Args:
      colors: [N, D] per-Gaussian colors (D=3 RGB, or 1 for label rendering)
      opacities: [N] activated opacities in [0, 1]
      bg: [D] background color
    """
    n = proj.depths.shape[0]
    d = colors.shape[-1]
    valid = proj.radii > 0

    # Depth order: culled Gaussians sort to the back with +inf depth.
    order = jnp.argsort(jnp.where(valid, proj.depths, jnp.inf))
    means2d = proj.means2d[order]
    conics = proj.conics[order]
    depths = proj.depths[order]
    cols = colors[order]
    ops = opacities[order]
    valid_s = valid[order]

    # Pixel centers. The CUDA rasterizer uses pixel coords (x, y) = (col, row)
    # evaluated at integer pixel positions + 0.5.
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=means2d.dtype) + 0.5,
        jnp.arange(width, dtype=means2d.dtype) + 0.5,
        indexing="ij",
    )

    pad = (-n) % chunk_size
    if pad:
        means2d = jnp.pad(means2d, ((0, pad), (0, 0)))
        conics = jnp.pad(conics, ((0, pad), (0, 0)))
        depths = jnp.pad(depths, (0, pad))
        cols = jnp.pad(cols, ((0, pad), (0, 0)))
        ops = jnp.pad(ops, (0, pad))
        valid_s = jnp.pad(valid_s, (0, pad))
    num_chunks = (n + pad) // chunk_size

    # remat: without it, jax.grad through the scan stacks every chunk's
    # [G, H, W] alpha/weight intermediates as residuals — O(N*H*W) HBM
    # (tens of GB at 320x240 with 20k gaussians). Recomputing the chunk
    # forward during the backward pass is far cheaper.
    @jax.checkpoint
    def chunk_step(carry, idx):
        log_t, acc_img, acc_alpha, acc_depth = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, idx * chunk_size, chunk_size)
        alpha = pixel_alphas(sl(means2d), sl(conics), sl(ops), xs, ys, sl(valid_s))
        # log transmittance within the chunk (exclusive cumsum), on top of carry
        log1m = jnp.log1p(-alpha)  # alpha <= 0.99 so finite
        excl = jnp.cumsum(log1m, axis=0) - log1m
        w = alpha * jnp.exp(log_t[None] + excl)  # [G, H, W]
        acc_img = acc_img + jnp.einsum("ghw,gd->dhw", w, sl(cols))
        acc_alpha = acc_alpha + jnp.sum(w, axis=0)
        acc_depth = acc_depth + jnp.einsum("ghw,g->hw", w, sl(depths))
        log_t = log_t + jnp.sum(log1m, axis=0)
        return (log_t, acc_img, acc_alpha, acc_depth), None

    init = (
        jnp.zeros((height, width), dtype=means2d.dtype),
        jnp.zeros((d, height, width), dtype=means2d.dtype),
        jnp.zeros((height, width), dtype=means2d.dtype),
        jnp.zeros((height, width), dtype=means2d.dtype),
    )
    (log_t, img, alpha, depth), _ = jax.lax.scan(
        chunk_step, init, jnp.arange(num_chunks)
    )
    t_final = jnp.exp(log_t)
    img = img + t_final[None] * bg[:, None, None]
    return RenderOutput(
        image=img,
        alpha=alpha[None],
        depth=depth[None],
        radii=proj.radii,
    )
