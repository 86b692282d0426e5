"""Crop-window rendering support for the masked-loss stages.

The coarse pose stage (reference trainers/coarse_obj_pose.py:249-260) and
fine_obj stage (trainers/fine_obj.py) render the OBJECT Gaussians only, on a
black background, against `gt * obj_mask` — so every pixel outside
(object-splat reach ∪ object mask) is exactly zero in BOTH prediction and
target, contributing zero loss and zero gradient (L1: |0-0|; SSIM of all-zero
windows is exactly 1 under the SAME zero-padded blur; alpha L1/L2: |0-0|).
Rendering only a window that covers that support, and normalizing loss sums
by the FULL frame's pixel count, is therefore loss- and gradient-IDENTICAL
to the full-frame render (up to f32 summation order) — while the kernel
grid, output arrays and SSIM cost all shrink by the area ratio. The
reference pays the full frame every iteration; there is no reference twin
for this (TPU-build optimization).

Exactness is never assumed, it is COUNTED (same discipline as
`dropped_pairs`): `crop_window` returns the number of splats whose
opacity-aware reach (the same `opacity_aabb_radius` the binning cull uses)
escapes the window, plus a mask-escape indicator; trainers track the running
max and grow the window (one recompile, like capacity regrowth) if it is
ever nonzero.

The window OFFSET is computed on device from the current projection each
iteration (the window auto-tracks the object as its pose trains — no host
syncs); only the window SIZE is static.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from egogaussian_tpu.render.oracle import ALPHA_EPS
from egogaussian_tpu.render.tiled import opacity_aabb_radius


def mask_rect(mask: jnp.ndarray) -> jnp.ndarray:
    """Bounding rect (x0, y0, x1, y1) of nonzero pixels of a [1, H, W] (or
    [H, W]) mask, in EXCLUSIVE-end pixel-index coordinates. Empty mask ->
    the empty rect (+big, +big, -big, -big) that is a no-op under union."""
    m = (mask[0] if mask.ndim == 3 else mask) > 0
    h, w = m.shape
    rows = jnp.any(m, axis=1)
    cols = jnp.any(m, axis=0)
    y0 = jnp.argmax(rows).astype(jnp.float32)
    y1 = (h - jnp.argmax(rows[::-1])).astype(jnp.float32)
    x0 = jnp.argmax(cols).astype(jnp.float32)
    x1 = (w - jnp.argmax(cols[::-1])).astype(jnp.float32)
    big = jnp.float32(1e9)
    empty = ~jnp.any(m)
    return jnp.where(
        empty,
        jnp.stack([big, big, -big, -big]),
        jnp.stack([x0, y0, x1, y1]),
    )


@jax.jit
def mask_rect_table(masks: jnp.ndarray) -> jnp.ndarray:
    """[F, 1, H, W] (or [F, H, W]) mask stack -> [F, 4] (x0, y0, x1, y1)
    exclusive-end bboxes, one device pass (drivers fetch the tiny table
    instead of the full mask stack when sizing the static crop window).
    Empty masks get the degenerate rect (0, 0, 0, 0)."""
    m = (masks[:, 0] if masks.ndim == 4 else masks) > 0
    f, h, w = m.shape
    rows = jnp.any(m, axis=2)  # [F, H]
    cols = jnp.any(m, axis=1)  # [F, W]
    y0 = jnp.argmax(rows, axis=1)
    y1 = h - jnp.argmax(rows[:, ::-1], axis=1)
    x0 = jnp.argmax(cols, axis=1)
    x1 = w - jnp.argmax(cols[:, ::-1], axis=1)
    any_ = jnp.any(m, axis=(1, 2))
    rect = jnp.stack([x0, y0, x1, y1], axis=1).astype(jnp.int32)
    return jnp.where(any_[:, None], rect, 0)


def crop_window(
    proj,
    opacities: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray],
    rect: Optional[jnp.ndarray],
    crop_w: int,
    crop_h: int,
    width: int,
    height: int,
    align: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Place a static (crop_w x crop_h) window over the support of the
    scene + a required rect, and count coverage escapes.

    `align` MUST be the compositing tile size for the tiled/pallas
    backends: pair inclusion is tile-granular (a splat's 3-sigma AABB can
    cut through its alpha >= eps region, so which pixels see its tail
    depends on tile boundaries) — with the window origin a tile multiple,
    every crop tile coincides with a full-frame tile and the cropped
    pixels are BIT-comparable to the full-frame render's. An unaligned
    window is still a valid render but differs from full-frame by up to
    ~op*exp(-4.5) at AABB-boundary pixels.

    Args:
      proj: ProjectedGaussians (full-frame projection — NOT shifted)
      opacities: [N] in [0, 1]
      valid_mask: [N] bool alive mask (or None)
      rect: optional (x0, y0, x1, y1) f32 must-cover rect in pixel-index
        coords (exclusive end), e.g. from `mask_rect` — or None
      crop_w, crop_h: STATIC window size in pixels (<= width/height)
      width, height: full frame size

    Returns:
      (ox, oy): i32 scalars, window origin, clipped to stay inside the frame
      outside: i32[3] — [escape_count, need_w, need_h].
        escape_count: number of splats whose in-frame opacity-aware reach
        escapes the window, PLUS 1 if `rect` itself escapes. 0 means the
        cropped render's loss (sum-normalized by the full frame) is exactly
        the full-frame loss. need_w/need_h: the window size per axis that
        provably covers the CURRENT support under this placement scheme
        (extent + 2*align slack absorbing the origin snap/clip) — the
        host's growth response reads these to grow only the axis that
        actually escaped (a symmetric grow at small frames crosses the
        disable bound immediately; see train/common.maybe_grow_crop).
    """
    assert crop_w <= width and crop_h <= height, "crop larger than frame"
    sg = jax.lax.stop_gradient
    mu = sg(proj.means2d)
    radii = sg(proj.radii).astype(jnp.float32)
    op = sg(opacities)
    r_aabb, _ = opacity_aabb_radius(radii, op)
    ok = (radii > 0) & (op >= ALPHA_EPS)
    if valid_mask is not None:
        ok = ok & valid_mask
    # In-frame reach per splat, in pixel-CENTER coordinates (pixel x covers
    # center x + 0.5; the compositors evaluate alpha at centers only).
    lo_x = jnp.maximum(mu[:, 0] - r_aabb, 0.5)
    hi_x = jnp.minimum(mu[:, 0] + r_aabb, width - 0.5)
    lo_y = jnp.maximum(mu[:, 1] - r_aabb, 0.5)
    hi_y = jnp.minimum(mu[:, 1] + r_aabb, height - 0.5)
    reach = ok & (lo_x <= hi_x) & (lo_y <= hi_y)

    big = jnp.float32(1e9)
    sx0 = jnp.min(jnp.where(reach, lo_x, big))
    sx1 = jnp.max(jnp.where(reach, hi_x, -big))
    sy0 = jnp.min(jnp.where(reach, lo_y, big))
    sy1 = jnp.max(jnp.where(reach, hi_y, -big))
    if rect is not None:
        # mask pixel k has center k + 0.5: [x0, x1) covers centers
        # [x0 + 0.5, x1 - 0.5]
        sx0 = jnp.minimum(sx0, rect[0] + 0.5)
        sy0 = jnp.minimum(sy0, rect[1] + 0.5)
        sx1 = jnp.maximum(sx1, rect[2] - 0.5)
        sy1 = jnp.maximum(sy1, rect[3] - 0.5)

    def place(lo, hi, size, full):
        # center the window on the union's midpoint (empty union -> 0),
        # then snap the origin DOWN to the alignment grid
        c = jnp.where(hi >= lo, 0.5 * (lo + hi), 0.5 * size)
        o = jnp.floor((c - 0.5 * size) / align) * align
        o_max = (full - size) // align * align  # static, stays aligned
        return jnp.clip(o, 0.0, float(o_max)).astype(jnp.int32)

    ox = place(sx0, sx1, crop_w, width)
    oy = place(sy0, sy1, crop_h, height)

    oxf = ox.astype(jnp.float32)
    oyf = oy.astype(jnp.float32)
    # Escape = some in-frame pixel center this splat can reach (alpha >=
    # ALPHA_EPS) lies outside the window. Conservative (AABB >= true
    # elliptical reach), so outside == 0 PROVES coverage.
    esc = reach & (
        (lo_x < oxf + 0.5) | (hi_x > oxf + crop_w - 0.5)
        | (lo_y < oyf + 0.5) | (hi_y > oyf + crop_h - 0.5)
    )
    outside = jnp.sum(esc.astype(jnp.int32))
    if rect is not None:
        rect_esc = (
            (rect[0] < oxf) | (rect[1] < oyf)
            | (rect[2] > oxf + crop_w) | (rect[3] > oyf + crop_h)
        ) & (rect[2] > rect[0])  # empty rect never escapes
        outside = outside + rect_esc.astype(jnp.int32)
    # Minimum per-axis window size that covers the current support under
    # centering + snap-down-by-<align + frame-edge clip: extent + 2*align.
    need_w = jnp.where(
        sx1 >= sx0, jnp.ceil(sx1 - sx0 + 1.0) + 2 * align, 0.0
    ).astype(jnp.int32)
    need_h = jnp.where(
        sy1 >= sy0, jnp.ceil(sy1 - sy0 + 1.0) + 2 * align, 0.0
    ).astype(jnp.int32)
    return ox, oy, jnp.stack([outside, need_w, need_h])


def crop_plane(plane: jnp.ndarray, ox, oy, crop_w: int, crop_h: int):
    """dynamic_slice a [C, H, W] plane to [C, crop_h, crop_w] at (oy, ox)."""
    return jax.lax.dynamic_slice(
        plane, (0, oy, ox), (plane.shape[0], crop_h, crop_w)
    )
