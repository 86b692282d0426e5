"""High-level differentiable render API.

Functional redesign of reference `gaussian_renderer/__init__.py:18-107`
(render) and `gaussian_renderer/render_helper.py` (label rendering). Instead
of a stateful rasterizer object + retain_grad side channels, `render` is a
pure function of arrays; screen-space-gradient harvesting for densification
uses an explicit `means2d_probe` zeros input — take jax.grad w.r.t. it to
get the reference's `viewspace_points.grad`.

Backends:
  "oracle": pure-jnp all-pairs compositor (correctness reference, small scenes)
  "tiled":  binned, log-space-transmittance XLA renderer (fast path)
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from egogaussian_tpu.ops.sh import eval_sh, sh_to_rgb
from egogaussian_tpu.render.camera import Camera
from egogaussian_tpu.render.oracle import composite_oracle, RenderOutput
from egogaussian_tpu.render.project import project_gaussians


class RenderResult(NamedTuple):
    image: jnp.ndarray  # [D, H, W] (crop_size when cropped)
    alpha: jnp.ndarray  # [1, H, W]
    depth: jnp.ndarray  # [1, H, W]
    radii: jnp.ndarray  # [N] int32; >0 == the reference's visibility_filter
    means2d: jnp.ndarray  # [N, 2] projected screen means (FULL-frame coords)
    # scalar i32: pairs silently dropped by the binned backends' static
    # capacities this render (0 == exact; trainers log the running max)
    dropped_pairs: jnp.ndarray = 0
    # crop-window rendering (render/crop.py): window origin (ox, oy) i32 and
    # the coverage-escape count (0 == the cropped render is provably
    # loss-identical to the full frame for masked-object losses)
    crop_offset: jnp.ndarray = None
    crop_outside: jnp.ndarray = 0


def _colors_from_sh(
    sh_coeffs: jnp.ndarray, sh_degree: int, means3d: jnp.ndarray, campos: jnp.ndarray
) -> jnp.ndarray:
    """Evaluate SH towards the camera (reference render() python-SH path,
    gaussian_renderer/__init__.py:77-85). sh_coeffs: [N, K, 3]."""
    if sh_degree == 0:
        return jnp.clip(sh_to_rgb(sh_coeffs[:, 0, :]), 0.0, None)
    import jax

    dirs = means3d - campos[None]
    dirs = dirs * jax.lax.rsqrt(
        jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-16
    )
    rgb = eval_sh(sh_degree, jnp.swapaxes(sh_coeffs, -1, -2), dirs)
    return jnp.clip(rgb + 0.5, 0.0, None)


def render(
    camera: Camera,
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacities: jnp.ndarray,
    bg: jnp.ndarray,
    sh_coeffs: Optional[jnp.ndarray] = None,
    sh_degree: int = 0,
    colors_precomp: Optional[jnp.ndarray] = None,
    valid_mask: Optional[jnp.ndarray] = None,
    means2d_probe: Optional[jnp.ndarray] = None,
    backend: str = "tiled",
    tile_config=None,
    crop_size: Optional[tuple] = None,
    crop_rect: Optional[jnp.ndarray] = None,
) -> RenderResult:
    """Differentiable rasterization of N Gaussians into `camera`.

    Args:
      means3d: [N, 3]; cov3d: [N, 6] packed; opacities: [N] in [0, 1]
      sh_coeffs: [N, K, 3] SH colors (used unless colors_precomp given)
      colors_precomp: [N, D] overrides SH (label channel / color override)
      valid_mask: [N] alive mask (capacity padding rows culled)
      means2d_probe: [N, 2] zeros; added to projected means so that
        d(loss)/d(probe) recovers screen-space gradients for densification
      backend: "oracle" | "tiled"
      crop_size: optional STATIC (crop_w, crop_h) — composite only a
        window of that size, auto-placed on device over (splat reach ∪
        crop_rect) each call (render/crop.py). Projection, radii and probe
        gradients stay full-frame-identical; image/alpha/depth come back at
        crop_size and `crop_offset`/`crop_outside` report the window.
      crop_rect: optional (x0, y0, x1, y1) f32 must-cover rect (e.g. the
        object-mask bbox from render.crop.mask_rect)
    """
    proj = project_gaussians(
        means3d,
        cov3d,
        camera.viewmat,
        camera.fx,
        camera.fy,
        camera.cx,
        camera.cy,
        camera.width,
        camera.height,
        valid_mask=valid_mask,
    )
    means2d = proj.means2d
    if means2d_probe is not None:
        means2d = means2d + means2d_probe
        proj = proj._replace(means2d=means2d)

    if colors_precomp is not None:
        colors = colors_precomp
    else:
        assert sh_coeffs is not None, "need sh_coeffs or colors_precomp"
        colors = _colors_from_sh(sh_coeffs, sh_degree, means3d, camera.camera_center)

    if backend == "auto":
        # stream compositor's VMEM use is occupancy-independent (see
        # train/common.py pick_backend)
        backend = "pallas" if tile_config is not None else "tiled"

    comp_w, comp_h = camera.width, camera.height
    crop_offset, crop_outside = None, 0
    if crop_size is not None:
        from egogaussian_tpu.render.crop import crop_window

        crop_w, crop_h = int(crop_size[0]), int(crop_size[1])
        if backend == "oracle":
            align = 1  # grid-free compositor
        else:
            from egogaussian_tpu.render.tiled import TileConfig

            align = (tile_config or TileConfig()).tile_size
        ox, oy, crop_outside = crop_window(
            proj, opacities, valid_mask, crop_rect,
            crop_w, crop_h, camera.width, camera.height, align=align,
        )
        # exact window shift: means2d = fx*x/z + cx, so shifting by the
        # integer origin is the principal-point shift cx - ox (affine in
        # pixel coords; radii/conics/depths untouched)
        shift = jnp.stack([ox, oy]).astype(means2d.dtype)
        proj = proj._replace(means2d=means2d - shift[None, :])
        comp_w, comp_h = crop_w, crop_h
        crop_offset = jnp.stack([ox, oy])

    if backend == "oracle":
        out = composite_oracle(proj, colors, opacities, bg, comp_w, comp_h)
    elif backend == "tiled":
        from egogaussian_tpu.render.tiled import composite_tiled

        out = composite_tiled(
            proj, colors, opacities, bg, comp_w, comp_h, config=tile_config,
        )
    elif backend == "pallas":
        from egogaussian_tpu.render.tiled import composite_pallas

        out = composite_pallas(
            proj, colors, opacities, bg, comp_w, comp_h, config=tile_config,
        )
    else:
        raise ValueError(f"unknown render backend: {backend}")

    return RenderResult(
        image=out.image,
        alpha=out.alpha,
        depth=out.depth,
        radii=out.radii,
        means2d=means2d,
        dropped_pairs=out.dropped_pairs,
        crop_offset=crop_offset,
        crop_outside=crop_outside,
    )


def render_label(
    camera: Camera,
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacities: jnp.ndarray,
    labels: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray] = None,
    backend: str = "tiled",
) -> jnp.ndarray:
    """Render the per-Gaussian scalar label as a 1-channel image with geometry
    detached (gradient flows only through the label color), matching reference
    `render_helper.get_render_label` (render_helper.py:38-64).

    Returns [1, H, W] label image (black background).
    """
    import jax

    res = render(
        camera,
        jax.lax.stop_gradient(means3d),
        jax.lax.stop_gradient(cov3d),
        jax.lax.stop_gradient(opacities),
        bg=jnp.zeros((1,), dtype=means3d.dtype),
        colors_precomp=labels[:, None],
        valid_mask=valid_mask,
        backend=backend,
    )
    return res.image
