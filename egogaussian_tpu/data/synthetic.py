"""Synthetic 2-phase egocentric video for tests and benchmarks.

The reference has no test data generator (SURVEY.md §4 calls for "an
end-to-end smoke test on a synthetic 2-phase video — a textured cube
translating between two static clips"); this module is that generator.

A ground-truth Gaussian scene (colored background shell + a small colored
cube "object") is rendered with the oracle compositor along an orbiting
camera path. During the dynamic phase the cube undergoes a known per-frame
rigid motion, giving ground-truth pose sequences to validate the coarse/fine
pose stages against. Hand masks simulate an occluding hand blob; object
masks are the GT object's alpha footprint.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.ops.covariance import covariance_from_scaling_rotation
from egogaussian_tpu.ops.se3 import make_se3, se3_apply
from egogaussian_tpu.render.camera import Camera, look_at
from egogaussian_tpu.render.oracle import composite_oracle
from egogaussian_tpu.render.project import project_gaussians


@dataclasses.dataclass
class SyntheticVideo:
    cameras: List[Camera]  # with gt_image / hand_mask / obj_mask filled
    image_names: List[str]
    static_phases: List[Tuple[int, int]]  # inclusive frame-number ranges
    dynamic_phases: List[Tuple[int, int]]
    # ground truth for assertions:
    gt_obj_deltas: np.ndarray  # [F, 4, 4] per-frame object delta (identity off-phase)
    points: np.ndarray  # noisy init point cloud [N, 3]
    colors: np.ndarray  # [N, 3]
    gt_means: np.ndarray  # GT gaussian centers at rest pose
    gt_is_object: np.ndarray  # [N] bool


def _gt_scene(seed: int, n_bg: int, n_obj: int):
    rng = np.random.RandomState(seed)
    # background: inward-facing shell of radius 4
    dirs = rng.randn(n_bg, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    bg_pts = dirs * 4.0
    bg_cols = (dirs * 0.5 + 0.5).astype(np.float32)
    # object: cube of side 0.8 at origin
    obj_pts = rng.uniform(-0.4, 0.4, (n_obj, 3))
    obj_cols = np.clip(obj_pts + 0.6, 0, 1).astype(np.float32)
    pts = np.concatenate([bg_pts, obj_pts]).astype(np.float32)
    cols = np.concatenate([bg_cols, obj_cols])
    is_obj = np.zeros(len(pts), bool)
    is_obj[n_bg:] = True
    scales = np.where(is_obj[:, None], 0.09, 0.35).astype(np.float32)
    return pts, cols, is_obj, scales


def make_synthetic_video(
    width: int = 64,
    height: int = 48,
    n_bg: int = 300,
    n_obj: int = 80,
    frames_static: int = 6,
    frames_dynamic: int = 4,
    seed: int = 0,
    with_hand: bool = True,
    n_cycles: int = 1,
) -> SyntheticVideo:
    """Alternating static/dynamic phases, reference phase_frame_index
    structure (train.py:60-65): n_cycles+1 static phases bracketing
    n_cycles dynamic phases. n_cycles=1 (default) is the classic
    static-dynamic-static video; n_cycles=2 exercises the multi-phase
    paths (per-phase coarse anchors, per-phase interpolation ranges).
    Even cycles move the object by a fixed SE(3) step per frame; odd
    cycles apply the inverse step (the object returns), so every dynamic
    phase has genuinely different motion."""
    pts, cols, is_obj, scales = _gt_scene(seed, n_bg, n_obj)
    s, d = frames_static, frames_dynamic
    total = s * (n_cycles + 1) + d * n_cycles

    # per-frame object delta: translate +x and rotate about z during dynamics
    deltas = np.tile(np.eye(4, dtype=np.float32), (total, 1, 1))
    ang = 0.12
    step_T = np.asarray(
        make_se3(
            jnp.asarray(
                np.array(
                    [
                        [np.cos(ang), -np.sin(ang), 0],
                        [np.sin(ang), np.cos(ang), 0],
                        [0, 0, 1.0],
                    ],
                    np.float32,
                )
            ),
            jnp.asarray(np.array([0.12, 0.0, 0.04], np.float32)),
        )
    )
    inv_step_T = np.linalg.inv(step_T).astype(np.float32)
    for c in range(n_cycles):
        start = c * (s + d) + s
        step = step_T if c % 2 == 0 else inv_step_T
        for f in range(start, start + d):
            deltas[f] = step

    quats = np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (len(pts), 1))
    cov3d_rest = covariance_from_scaling_rotation(
        jnp.asarray(np.repeat(scales, 3, axis=1).reshape(-1, 3)), jnp.asarray(quats)
    )
    opac = jnp.full((len(pts),), 0.95)
    colors_j = jnp.asarray(cols)

    cameras: List[Camera] = []
    names: List[str] = []
    accum = np.eye(4, dtype=np.float32)
    focal = 0.9 * width
    rng = np.random.RandomState(seed + 1)
    for f in range(total):
        accum = deltas[f] @ accum
        # move object points to frame pose
        moved = np.asarray(
            se3_apply(jnp.asarray(accum), jnp.asarray(pts[is_obj]))
        )
        means = pts.copy()
        means[is_obj] = moved
        # camera orbit
        theta = 0.35 * np.sin(2 * np.pi * f / total)
        eye = np.array([3.2 * np.sin(theta), -0.4, -3.2 * np.cos(theta)])
        R, t = look_at(eye, np.array([0.0, 0.0, 0.0]))
        cam = Camera.from_colmap(R, t, focal, focal, width, height)

        proj = project_gaussians(
            jnp.asarray(means), cov3d_rest, cam.viewmat,
            cam.fx, cam.fy, cam.cx, cam.cy, width, height,
        )
        out = composite_oracle(
            proj, colors_j, opac, jnp.zeros(3), width, height
        )
        img = np.asarray(out.image)

        # object mask: footprint of object-only render
        proj_o = project_gaussians(
            jnp.asarray(moved), cov3d_rest[is_obj], cam.viewmat,
            cam.fx, cam.fy, cam.cx, cam.cy, width, height,
        )
        out_o = composite_oracle(
            proj_o, colors_j[is_obj], opac[is_obj], jnp.zeros(3), width, height
        )
        obj_mask = (np.asarray(out_o.alpha) > 0.5).astype(np.float32)

        # hand mask: a wandering square blob near the bottom
        hand = np.zeros((1, height, width), np.float32)
        if with_hand:
            hw = height // 4
            x0 = int((width - hw) * (0.5 + 0.3 * np.sin(f * 0.7)))
            y0 = height - hw - 1
            hand[0, y0 : y0 + hw, x0 : x0 + hw] = 1.0

        name = f"{f:06d}"
        cameras.append(
            dataclasses.replace(
                cam,
                image_name=name,
                gt_image=jnp.asarray(img),
                hand_mask=jnp.asarray(hand),
                obj_mask=jnp.asarray(obj_mask),
            )
        )
        names.append(name)

    noisy = pts + rng.randn(*pts.shape).astype(np.float32) * 0.02
    return SyntheticVideo(
        cameras=cameras,
        image_names=names,
        static_phases=[
            (c * (s + d), c * (s + d) + s - 1) for c in range(n_cycles + 1)
        ],
        dynamic_phases=[
            (c * (s + d) + s, c * (s + d) + s + d - 1)
            for c in range(n_cycles)
        ],
        gt_obj_deltas=deltas,
        points=noisy,
        colors=cols,
        gt_means=pts,
        gt_is_object=is_obj,
    )
