"""Camera model.

TPU-native redesign of reference `scene/cameras.py` + `utils/graphics_utils.py`.
The reference precomputes OpenGL-style NDC projection matrices
(getProjectionMatrix, graphics_utils.py:51-71) because the CUDA rasterizer
wants them; our rasterizer projects directly with pinhole intrinsics
(fx, fy, cx, cy), which is simpler and numerically friendlier. The camera is
a frozen pytree so it can be passed through jit and stacked into batches
(one stacked array per field) for data-parallel frame sampling.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def fov_to_focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single view: world-to-camera transform + pinhole intrinsics + GT data.

    viewmat: [4, 4] world-to-camera (camera looks down +z).
    Static (aux) fields width/height/image_name keep shapes compile-time
    constant; array fields are traced and can be stacked/sharded.
    """

    viewmat: jnp.ndarray  # [4,4] float32
    fx: jnp.ndarray  # scalar
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    image_name: str = dataclasses.field(metadata=dict(static=True), default="")
    # Ground-truth/feature stacks, resident on device ([C,H,W], optional)
    gt_image: Optional[jnp.ndarray] = None
    hand_mask: Optional[jnp.ndarray] = None  # [1,H,W] 1=hand pixel
    obj_mask: Optional[jnp.ndarray] = None  # [1,H,W] 1=object pixel
    est_depth: Optional[jnp.ndarray] = None
    pred_cb: Optional[jnp.ndarray] = None

    @property
    def znear(self) -> float:
        return 0.01  # reference scene/cameras.py:61

    @property
    def zfar(self) -> float:
        return 100.0  # reference scene/cameras.py:62

    @property
    def fov_x(self) -> float:
        return focal_to_fov(float(self.fx), self.width)

    @property
    def fov_y(self) -> float:
        return focal_to_fov(float(self.fy), self.height)

    @property
    def camera_center(self) -> jnp.ndarray:
        """Camera position in world coordinates (reference cameras.py:70)."""
        R = self.viewmat[:3, :3]
        t = self.viewmat[:3, 3]
        return -R.T @ t

    @classmethod
    def from_colmap(
        cls,
        R_w2c: np.ndarray,
        t_w2c: np.ndarray,
        fx: float,
        fy: float,
        width: int,
        height: int,
        image_name: str = "",
        cx: Optional[float] = None,
        cy: Optional[float] = None,
        gt_image: Optional[np.ndarray] = None,
        hand_mask: Optional[np.ndarray] = None,
        obj_mask: Optional[np.ndarray] = None,
        est_depth: Optional[np.ndarray] = None,
        pred_cb: Optional[np.ndarray] = None,
    ) -> "Camera":
        viewmat = np.eye(4, dtype=np.float32)
        viewmat[:3, :3] = R_w2c
        viewmat[:3, 3] = t_w2c
        return cls(
            viewmat=jnp.asarray(viewmat),
            fx=jnp.float32(fx),
            fy=jnp.float32(fy),
            cx=jnp.float32(width / 2.0 if cx is None else cx),
            cy=jnp.float32(height / 2.0 if cy is None else cy),
            width=int(width),
            height=int(height),
            image_name=image_name,
            gt_image=None if gt_image is None else jnp.asarray(gt_image),
            hand_mask=None if hand_mask is None else jnp.asarray(hand_mask),
            obj_mask=None if obj_mask is None else jnp.asarray(obj_mask),
            est_depth=None if est_depth is None else jnp.asarray(est_depth),
            pred_cb=None if pred_cb is None else jnp.asarray(pred_cb),
        )

    def with_pose(self, R_w2c: np.ndarray, t_w2c: np.ndarray) -> "Camera":
        """New camera with replaced extrinsics (viewer paths; reference
        reprocess_cam, cameras.py:83-87)."""
        viewmat = np.eye(4, dtype=np.float32)
        viewmat[:3, :3] = np.asarray(R_w2c)
        viewmat[:3, 3] = np.asarray(t_w2c)
        return dataclasses.replace(self, viewmat=jnp.asarray(viewmat))


def look_at(
    eye: np.ndarray, target: np.ndarray, up: np.ndarray = np.array([0.0, -1.0, 0.0])
) -> tuple[np.ndarray, np.ndarray]:
    """Build a world-to-camera (R, t) looking from eye at target (+z forward)."""
    eye = np.asarray(eye, dtype=np.float64)
    fwd = np.asarray(target, dtype=np.float64) - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, dtype=np.float64))
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)  # world->cam rows
    t = -R @ eye
    return R.astype(np.float32), t.astype(np.float32)
