"""Shared training-step machinery for all stages.

Redesign notes (vs. the reference trainers/ package):
  * Hand-mask **gradient** gating (the reference's
    `render_image.register_hook(lambda g: g * (1 - hand_mask))`,
    train_static.py:91) is expressed functionally:
    `img_used = img*(1-m) + stop_gradient(img)*m` — identical value,
    identical gradient, jit-safe (SURVEY.md §7 step 6).
  * The apply/reverse pose dance (reference mutates _xyz, renders, reverses,
    writes back into Adam each iteration — coarse_obj_pose.py:229-317) is
    replaced by rendering from `xyz' = where(is_object, T(xyz), xyz)` as a
    pure function; there is nothing to reverse (SURVEY.md §7 hard-part 3).
  * Learning-rate choreography is data: per-field LR trees computed on host
    per iteration and passed into one jitted step.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.models.gaussians import GaussianModel
from egogaussian_tpu.models.optim import AdamState
from egogaussian_tpu.ops.losses import l1_loss, ssim
from egogaussian_tpu.ops.sh import sh_to_rgb
from egogaussian_tpu.render.api import render, RenderResult
from egogaussian_tpu.render.camera import Camera
from egogaussian_tpu.utils.console import CONSOLE


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    model: GaussianModel
    opt_state: AdamState
    step: jnp.ndarray  # int32


def mask_grad(img: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero gradients at masked pixels without changing the forward value."""
    return img * (1.0 - mask) + jax.lax.stop_gradient(img) * mask


def image_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float
) -> jnp.ndarray:
    """(1-l)*L1 + l*(1-SSIM) — the standard 3DGS photometric loss."""
    return (1.0 - lambda_dssim) * l1_loss(pred, gt) + lambda_dssim * (
        1.0 - ssim(pred, gt)
    )


def opacity_entropy(opacity_logit: jnp.ndarray, visible: jnp.ndarray) -> jnp.ndarray:
    """Mean binary entropy of visible Gaussians' opacities, computed FROM THE
    LOGITS (reference train_static.py:97-102 computes
    -o log(o+1e-10) - (1-o) log(1-o+1e-10) on probabilities; under jit XLA
    reassociates (1-o)+1e-10 into (1+1e-10)-o == 1-o, so saturated opacities
    hit log(0) = -inf and 0 * -inf = NaN. log_sigmoid is exact and never
    -inf for finite logits)."""
    x = opacity_logit
    o = jax.nn.sigmoid(x)
    ent = -(o * jax.nn.log_sigmoid(x) + (1.0 - o) * jax.nn.log_sigmoid(-x))
    w = visible.astype(ent.dtype)
    return jnp.sum(ent * w) / jnp.maximum(jnp.sum(w), 1.0)


def model_colors(model: GaussianModel) -> jnp.ndarray:
    """Degree-0 SH -> RGB with non-negativity clamp (the CUDA rasterizer's
    SH path clamps at 0; gaussian_renderer/__init__.py:77-87)."""
    return jnp.clip(sh_to_rgb(model.params.features_dc[:, 0, :]), 0.0, None)


def render_gaussians(
    model: GaussianModel,
    camera: Camera,
    bg: jnp.ndarray,
    pose_T: Optional[jnp.ndarray] = None,
    extra_rot: Optional[jnp.ndarray] = None,
    which_object: int = 1,
    means2d_probe: Optional[jnp.ndarray] = None,
    colors_override: Optional[jnp.ndarray] = None,
    backend: str = "tiled",
    tile_config=None,
    crop_size=None,
    crop_rect=None,
) -> RenderResult:
    """Render the model, optionally moving the object subset by a rigid
    transform and rotating its covariance (reference render(...) with
    rot_cov=True/accum_R, gaussian_renderer/__init__.py:18-107).

    Args:
      pose_T: [4, 4] SE(3) applied to Gaussians with is_object==which_object
      extra_rot: [3, 3] rotation for those Gaussians' covariance (usually
        pose_T's rotation, possibly including the trainable frame delta)
      crop_size/crop_rect: crop-window rendering (see render.api.render)
    """
    p = model.params
    xyz = p.xyz
    if pose_T is not None:
        moved = xyz @ pose_T[:3, :3].T + pose_T[:3, 3]
        obj_mask = (model.aux.is_object == which_object)[:, None]
        xyz = jnp.where(obj_mask, moved, xyz)
    if extra_rot is not None:
        cov3d = model.covariance_rotated(extra_rot, which_object)
    else:
        cov3d = model.covariance()
    colors = colors_override if colors_override is not None else model_colors(model)
    return render(
        camera,
        xyz,
        cov3d,
        model.opacity,
        bg,
        colors_precomp=colors,
        valid_mask=model.aux.alive,
        means2d_probe=means2d_probe,
        backend=backend,
        tile_config=tile_config,
        crop_size=crop_size,
        crop_rect=crop_rect,
    )


def pick_backend(tile_config, backend: str = "auto") -> str:
    """Resolve backend="auto": the Pallas stream compositor processes pairs
    in fixed 128-row chunks, so its VMEM footprint is independent of per-tile
    occupancy — it is the right choice whenever binning capacities are known
    (tile_config present). Without a tile_config the XLA tiled path sizes
    itself from defaults."""
    if backend != "auto":
        return backend
    if tile_config is not None:
        return "pallas"
    return "tiled"


def auto_tile_config(model: GaussianModel, camera: Camera,
                     headroom: float = 1.5, tile_size: int = 32):
    """Host-side: estimate binning capacities for the current scene/camera
    (render/tiled.py estimate_tile_config). Call at stage/phase start.

    headroom default 1.5 (was 3.0 until r5): every cost in the tiled path —
    pair sort, layout gather/scatter, kernel grid — scales with the STATIC
    capacities, not the occupancy, and the on-chip sweep
    (evidence/onchip_r5/perf_ab_r5.json) measured 39.2 -> 50.2 it/s
    @480p/100k (and 52.8 -> 61.2 on the trained validation scene) going
    3.0 -> 1.5 with zero drops. Densification growth past the headroom is
    the COUNTED case: maybe_regrow_tile_config re-estimates and recompiles
    at the next densify-interval host sync (drops are never silent), so a
    tight default trades rare recompiles for ~25% on every iteration.

    tile_size default 32: the on-chip 2x2 layout x tile-size A/B
    (evidence/onchip_r5/layout_ts_ab.jsonl, 480p/100k) has ts=32 ahead 48.6 vs
    44.9 it/s — 4x fewer kernel grid steps and ~25% less chunk padding
    beat the larger per-tile pixel block."""
    from egogaussian_tpu.render.project import project_gaussians
    from egogaussian_tpu.render.tiled import estimate_tile_config

    proj = project_gaussians(
        model.params.xyz, model.covariance(), camera.viewmat,
        camera.fx, camera.fy, camera.cx, camera.cy,
        camera.width, camera.height, valid_mask=model.aux.alive,
    )
    return estimate_tile_config(
        proj.means2d, proj.radii, proj.depths, camera.width, camera.height,
        tile_size=tile_size, headroom=headroom,
        opacities=jnp.where(model.aux.alive, model.opacity, 0.0),
    )


def maybe_regrow_tile_config(model, camera, tile_cfg, drop_max, last_drop,
                             stage: str):
    """Drop-triggered capacity re-estimation, called at host-sync
    boundaries (densify/reset intervals). The opacity-aware pair cull
    makes binning capacities opacity-dependent, so capacities estimated
    right after an opacity reset can be outgrown as opacities retrain
    upward; instead of silently dropping pairs for the rest of the phase,
    re-estimate from the CURRENT scene (one extra recompile).

    Only the three CAPACITY fields are re-estimated — tile_size,
    compositor flavor, bwd_exact_total etc. are preserved from the
    caller's config (they select kernels, not sizes).

    Returns (tile_cfg, last_drop, changed). Callers should treat a
    `changed` regrowth as a new baseline: reset the device drop counter
    to 0 and pass last_drop=0 afterwards, so persistent drops BELOW the
    historical maximum still retrigger (the counter is a running max)."""
    import dataclasses

    from egogaussian_tpu.utils.console import CONSOLE

    d = int(drop_max)
    if d <= last_drop:
        return tile_cfg, last_drop, False

    def merge(est):
        # capacities only; keep every kernel-selecting field of tile_cfg
        return dataclasses.replace(
            tile_cfg,
            max_pairs=max(est.max_pairs, tile_cfg.max_pairs),
            max_per_tile=max(est.max_per_tile, tile_cfg.max_per_tile),
            max_slots=max(est.max_slots or 0, tile_cfg.max_slots or 0)
            or None,
        )

    grown = merge(auto_tile_config(model, camera,
                                   tile_size=tile_cfg.tile_size))
    if grown == tile_cfg:
        # the estimate didn't grow (the dropping frame isn't the estimation
        # camera, or occupancy is spiky) — force headroom up instead
        grown = merge(auto_tile_config(model, camera, headroom=6.0,
                                       tile_size=tile_cfg.tile_size))
    CONSOLE.log(
        f"[{stage}] up to {d} pairs/render dropped since last check — "
        f"re-estimated binning capacities "
        f"(max_pairs {tile_cfg.max_pairs} -> {grown.max_pairs}, "
        f"max_per_tile {tile_cfg.max_per_tile} -> {grown.max_per_tile})"
    )
    return grown, d, grown != tile_cfg


def pose_crop_size(batch, cfg, stage: str):
    """Static crop-window size for the masked-object stages (2 and 3).

    Sized from the data: the per-iteration window auto-centers on
    (splat reach ∪ mask bbox) on device (render/crop.py), so the static
    SIZE must cover the largest such union — bounded by the largest union
    of CONSECUTIVE frames' mask bboxes (the warm-up starts the object at
    the previous frame's pose) plus `cfg.render.pose_crop_margin` px per
    side (splat 3-sigma tails beyond the mask + SSIM window + drift
    between coverage checks). Rounded to TPU-friendly multiples (width to
    128 lanes, height to 8 sublanes). Returns None when cropping is
    disabled or the window wouldn't shrink the frame meaningfully
    (>= ~80% of its area)."""
    import numpy as np

    if not cfg.render.pose_crop:
        return None
    from egogaussian_tpu.render.crop import mask_rect_table

    w, h = batch.width, batch.height
    rects = np.asarray(mask_rect_table(batch.obj_masks))  # [F, 4]
    nonempty = rects[:, 2] > rects[:, 0]
    if not nonempty.any():
        return None
    margin = cfg.render.pose_crop_margin
    # per-frame extents and the union of consecutive nonempty frames
    widths = (rects[:, 2] - rects[:, 0]).astype(np.int64)
    heights = (rects[:, 3] - rects[:, 1]).astype(np.int64)
    need_w = int(widths[nonempty].max())
    need_h = int(heights[nonempty].max())
    ne = np.flatnonzero(nonempty)
    for a, b in zip(ne[:-1], ne[1:]):
        uw = int(max(rects[a, 2], rects[b, 2]) - min(rects[a, 0], rects[b, 0]))
        uh = int(max(rects[a, 3], rects[b, 3]) - min(rects[a, 1], rects[b, 1]))
        need_w = max(need_w, uw)
        need_h = max(need_h, uh)
    cw = min(-(-(need_w + 2 * margin) // 128) * 128, w)
    ch = min(-(-(need_h + 2 * margin) // 8) * 8, h)
    if cw * ch >= 0.8 * w * h:
        return None
    CONSOLE.log(
        f"[{stage}] crop-window rendering {cw}x{ch} of {w}x{h} "
        f"({100.0 * cw * ch / (w * h):.0f}% area; margin {margin}px)"
    )
    return (cw, ch)


def crop_escape_count(crop_out_max) -> int:
    """Escape count from the device-tracked crop stat — i32[3]
    [count, need_w, need_h] when crop is active, scalar 0 otherwise."""
    a = np.asarray(crop_out_max)
    return int(a[0]) if a.ndim else int(a)


def maybe_grow_crop(crop_size, crop_out_max, last_crop_out, batch, stage: str):
    """Coverage-escape response, called at host-sync boundaries with the
    device running-max crop stat ([escape_count, need_w, need_h] from
    render/crop.py crop_window). Escaped splats lose their out-of-window
    gradient, so (same discipline as dropped-pair capacity regrowth) the
    window GROWS — one recompile — until it covers. Growth is DIRECTIONAL:
    only the axis whose tracked need exceeds the current size grows (to the
    need, rounded up to the 128/8 sizing multiples); a symmetric grow at
    small frames crosses the 80%-area disable bound immediately and loses
    the win exactly on the runs that matter (observed r4: 512x384 of
    640x480 escaped in height only — 512x448 at 75% area still crops, the
    old symmetric response disabled). Degenerates to full-frame (None) only
    when no covering window stays under 80% of the frame.
    Returns (crop_size, last_crop_out, changed)."""
    if crop_size is None:
        return None, last_crop_out, False
    stat = np.asarray(crop_out_max)
    c = int(stat[0]) if stat.ndim else int(stat)
    if c <= last_crop_out:
        return crop_size, last_crop_out, False
    w, h = batch.width, batch.height
    need_w = int(stat[1]) if stat.ndim else 0
    need_h = int(stat[2]) if stat.ndim else 0
    cw, ch = crop_size
    if need_w > cw:
        cw = min(-(-need_w // 128) * 128, w)
    if need_h > ch:
        ch = min(-(-need_h // 8) * 8, h)
    if (cw, ch) == tuple(crop_size):
        # escapes without a tracked need excess (stale stat vector or a
        # clip corner case) — fall back to one symmetric granule
        cw = min(cw + 128, w)
        ch = min(ch + 64, h)
    if cw * ch >= 0.8 * w * h:
        CONSOLE.log(
            f"[{stage}] {c} splats escaped the {crop_size[0]}x{crop_size[1]} "
            f"crop window (need {need_w}x{need_h}) — disabling crop "
            f"(full-frame rendering)"
        )
        return None, 0, True
    CONSOLE.log(
        f"[{stage}] {c} splats escaped the {crop_size[0]}x{crop_size[1]} "
        f"crop window — growing to {cw}x{ch}"
    )
    return (cw, ch), 0, True


def render_label_image(
    model: GaussianModel, camera: Camera, backend: str = "tiled",
    tile_config=None,
) -> jnp.ndarray:
    """[1, H, W] label rendering with detached geometry
    (reference get_render_label, render_helper.py:38-64)."""
    sg = jax.lax.stop_gradient
    res = render(
        camera,
        sg(model.params.xyz),
        sg(model.covariance()),
        sg(model.opacity),
        bg=jnp.zeros((1,), model.params.xyz.dtype),
        colors_precomp=model.params.label,
        valid_mask=model.aux.alive,
        backend=backend,
        tile_config=tile_config,
    )
    return res.image
