"""Novel-view / trajectory rendering suite.

Behavioral twins of the reference's webpage-visualization helpers
(trainers/eval_metric.py): render_singleview_w_new_pose (:181),
render_multiview (:218), render_freeiview (:296), render_trajectory (:417),
render_double_trajectory (:457). All are pure functions over
(model, pose sequence, cameras) returning/saving PNG frames.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.models.gaussians import (
    GaussianModel,
    combine_models,
    make_it_a_point,
)
from egogaussian_tpu.models.pose import PoseSequence
from egogaussian_tpu.ops.quaternion import quat_to_rotmat, rotmat_to_quat, quat_normalize
from egogaussian_tpu.render.camera import Camera
from egogaussian_tpu.train.common import render_gaussians


def _save(path: str, img) -> None:
    from egogaussian_tpu.utils.visualize import to_uint8_image
    from PIL import Image

    Image.fromarray(to_uint8_image(img)).save(path)


def interpolate_cameras(cam_a: Camera, cam_b: Camera, n: int) -> List[Camera]:
    """Interpolate n camera poses between two views: slerp-ish on the
    rotation (via quaternion nlerp) + lerp on position (reference
    interpolate_lists over viewer pose matrices, eval_metric.py)."""
    Ra = np.asarray(cam_a.viewmat[:3, :3])
    Rb = np.asarray(cam_b.viewmat[:3, :3])
    qa = np.asarray(rotmat_to_quat(jnp.asarray(Ra)))
    qb = np.asarray(rotmat_to_quat(jnp.asarray(Rb)))
    if np.dot(qa, qb) < 0:
        qb = -qb
    ca = np.asarray(cam_a.camera_center)
    cb = np.asarray(cam_b.camera_center)
    cams = []
    for t in np.linspace(0.0, 1.0, n):
        q = np.asarray(quat_normalize(jnp.asarray((1 - t) * qa + t * qb)))
        R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        center = (1 - t) * ca + t * cb
        tvec = -R @ center
        cams.append(cam_a.with_pose(R, tvec))
    return cams


def render_freeview(
    cameras: Sequence[Camera],
    model: GaussianModel,
    pose_seq: PoseSequence,
    view_start: Camera,
    view_end: Optional[Camera] = None,
    save_dir: Optional[str] = None,
    backend: str = "tiled",
) -> List[np.ndarray]:
    """Render the dynamic scene timeline from an interpolated novel-camera
    path (render_freeiview twin): frame f uses the object pose of frame f but
    the interpolated viewer camera."""
    n = len(cameras)
    view_end = view_end or cameras[len(cameras) // 2]
    path_cams = interpolate_cameras(view_start, view_end, n)
    accum_T = pose_seq.accum_T()
    accum_R = pose_seq.accum_R()
    frames = []
    for f, (cam, vcam) in enumerate(zip(cameras, path_cams)):
        img = np.asarray(
            render_gaussians(
                model, vcam, jnp.zeros(3), pose_T=accum_T[f],
                extra_rot=accum_R[f], backend=backend,
            ).image
        )
        frames.append(img)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            _save(os.path.join(save_dir, f"{cam.image_name}.png"), img)
    return frames


def render_multiview(
    cameras: Sequence[Camera],
    model: GaussianModel,
    pose_seq: PoseSequence,
    view_cams: Sequence[Camera],
    save_dir: Optional[str] = None,
    backend: str = "tiled",
) -> List[np.ndarray]:
    """Render each timeline frame from several FIXED novel views side by
    side (render_multiview twin)."""
    from egogaussian_tpu.utils.visualize import make_montage

    accum_T = pose_seq.accum_T()
    accum_R = pose_seq.accum_R()
    frames = []
    for f, cam in enumerate(cameras):
        panels = [
            np.asarray(
                render_gaussians(
                    model, vc, jnp.zeros(3), pose_T=accum_T[f],
                    extra_rot=accum_R[f], backend=backend,
                ).image
            )
            for vc in view_cams
        ]
        monty = make_montage(
            panels,
            captions=[f"view {i} | {cam.image_name}" for i in range(len(panels))],
            rows=1,
        )
        frames.append(np.asarray(monty))
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            monty.save(os.path.join(save_dir, f"{cam.image_name}.png"))
    return frames


def render_trajectory(
    cameras: Sequence[Camera],
    bg_model: GaussianModel,
    obj_model: GaussianModel,
    pose_seq: PoseSequence,
    view_cam: Optional[Camera] = None,
    save_dir: Optional[str] = None,
    color: str = "red",
    start_frame: int = 0,
    backend: str = "tiled",
) -> GaussianModel:
    """Accumulate the object's trajectory as colored point blobs over the
    background and render each step (render_trajectory twin,
    eval_metric.py:417-455). Returns the final background+trail model."""
    point = make_it_a_point(obj_model, color=color)
    accum_T = np.asarray(pose_seq.accum_T())
    view_cam = view_cam or cameras[0]
    scene = bg_model
    for f, cam in enumerate(cameras):
        moved = dataclasses.replace(
            point,
            params=dataclasses.replace(
                point.params,
                xyz=point.params.xyz @ jnp.asarray(accum_T[f][:3, :3]).T
                + jnp.asarray(accum_T[f][:3, 3]),
            ),
        )
        if f >= start_frame:
            scene = combine_models(scene, moved)
        img = np.asarray(
            render_gaussians(
                scene, view_cam, jnp.ones(3), backend=backend
            ).image
        )
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            _save(os.path.join(save_dir, f"{cam.image_name}.png"), img)
    return scene


def render_double_trajectory(
    cameras: Sequence[Camera],
    bg_model: GaussianModel,
    obj_model: GaussianModel,
    pose_seq_1: PoseSequence,
    pose_seq_2: PoseSequence,
    view_cam: Optional[Camera] = None,
    save_dir: Optional[str] = None,
    backend: str = "tiled",
) -> GaussianModel:
    """Two pose sequences overlaid as red/blue trails (render_double_
    trajectory twin, eval_metric.py:457-496) — e.g. coarse vs fine poses."""
    scene = render_trajectory(
        cameras, bg_model, obj_model, pose_seq_1, view_cam,
        save_dir=None, color="red", backend=backend,
    )
    return render_trajectory(
        cameras, scene, obj_model, pose_seq_2, view_cam,
        save_dir=save_dir, color="blue", backend=backend,
    )
