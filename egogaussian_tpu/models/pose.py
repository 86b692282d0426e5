"""Trainable object pose and per-frame pose sequences.

TPU-native redesign of reference `utils/geometry_utils.py` (ObjectMove
nn.Module, pose-sequence dict accumulation) and
`trainers/interpolate_pose.py` (Decomposition: N-th root of a rigid
transform found by 1500 SGD steps).

Design changes vs the reference:
  * The pose is a tiny pytree (translation + 6D rotation), optimized by the
    same hand-rolled Adam as the Gaussians — no nn.Module, no .data injection.
  * Pose sequences are dense arrays [F, ...] with a `solved` mask instead of
    a python dict keyed by image name; accumulation is a log-depth
    associative scan on device (ops/se3.py) instead of a CPU loop.
  * The N-th matrix root is computed in CLOSED FORM (axis-angle rotation
    root + geometric-series translation solve) instead of 1500 SGD steps —
    exact, deterministic, and ~1000x cheaper (interpolate_pose.py:28-63 is
    the behavioral twin).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.ops.rotation6d import rot6d_to_rotmat, rotmat_to_rot6d
from egogaussian_tpu.ops.se3 import (
    accumulate_rotations,
    accumulate_transforms,
    make_se3,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ObjectPose:
    """Trainable rigid object move (reference ObjectMove,
    geometry_utils.py:14-33): translation [3] + 6D rotation [3, 2]."""

    translation: jnp.ndarray
    rot6d: jnp.ndarray

    @property
    def rotation(self) -> jnp.ndarray:
        return rot6d_to_rotmat(self.rot6d)


def identity_pose(dtype=jnp.float32) -> ObjectPose:
    return ObjectPose(
        translation=jnp.zeros((3,), dtype),
        rot6d=jnp.eye(3, dtype=dtype)[:, :2],
    )


def pose_from_rt(R: jnp.ndarray, t: jnp.ndarray) -> ObjectPose:
    return ObjectPose(translation=jnp.asarray(t), rot6d=rotmat_to_rot6d(jnp.asarray(R)))


def pose_to_se3(pose: ObjectPose) -> jnp.ndarray:
    return make_se3(pose.rotation, pose.translation)


def apply_pose(pose: ObjectPose, xyz: jnp.ndarray) -> jnp.ndarray:
    """R x + t on [N, 3] (ObjectMove.forward, geometry_utils.py:20-25)."""
    return xyz @ pose.rotation.T + pose.translation


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PoseSequence:
    """Per-frame object pose deltas over a video.

    translations [F, 3], rotations [F, 3, 3], solved [F] bool. Frame f's
    *delta* moves the object from frame f-1's pose to frame f's pose;
    unsolved frames hold the identity. The accumulated transform for frame f
    is delta_f @ ... @ delta_0 (reference get_accum_T_seq semantics,
    geometry_utils.py:152-169).
    """

    translations: jnp.ndarray
    rotations: jnp.ndarray
    solved: jnp.ndarray

    @property
    def num_frames(self) -> int:
        return self.translations.shape[0]

    def deltas(self) -> jnp.ndarray:
        """Per-frame 4x4 deltas with identity at unsolved frames."""
        eye = jnp.eye(4, dtype=self.translations.dtype)
        T = make_se3(self.rotations, self.translations)
        return jnp.where(self.solved[:, None, None], T, eye[None])

    def accum_T(self) -> jnp.ndarray:
        """[F, 4, 4] accumulated transforms A_f = T_f ... T_0."""
        return accumulate_transforms(self.deltas())

    def accum_R(self) -> jnp.ndarray:
        """[F, 3, 3] accumulated rotations (get_accum_R_seq twin)."""
        eye = jnp.eye(3, dtype=self.rotations.dtype)
        R = jnp.where(self.solved[:, None, None], self.rotations, eye[None])
        return accumulate_rotations(R)

    def update_frame(self, frame: int | jnp.ndarray, pose: ObjectPose) -> "PoseSequence":
        return dataclasses.replace(
            self,
            translations=self.translations.at[frame].set(pose.translation),
            rotations=self.rotations.at[frame].set(pose.rotation),
            solved=self.solved.at[frame].set(True),
        )


def empty_pose_sequence(num_frames: int, dtype=jnp.float32) -> PoseSequence:
    return PoseSequence(
        translations=jnp.zeros((num_frames, 3), dtype),
        rotations=jnp.tile(jnp.eye(3, dtype=dtype)[None], (num_frames, 1, 1)),
        solved=jnp.zeros((num_frames,), bool),
    )


# ---------------------------------------------------------------------------
# Pose sequence (de)serialization — interop with the reference's
# obj_pose_sequence.pth dict {frame_name: {"translation", "rotation"}}
# ---------------------------------------------------------------------------

def save_pose_sequence(path: str, seq: PoseSequence, frame_names: list[str]) -> None:
    """Atomic save (tmp + os.replace like reference coarse_obj_pose.py:19-28)
    as npz keyed by frame names."""
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            translations=np.asarray(seq.translations),
            rotations=np.asarray(seq.rotations),
            solved=np.asarray(seq.solved),
            frame_names=np.asarray(frame_names),
        )
    os.replace(tmp, path)


def load_pose_sequence(path: str) -> tuple[PoseSequence, list[str]]:
    data = np.load(path, allow_pickle=False)
    seq = PoseSequence(
        translations=jnp.asarray(data["translations"]),
        rotations=jnp.asarray(data["rotations"]),
        solved=jnp.asarray(data["solved"]),
    )
    return seq, [str(x) for x in data["frame_names"]]


# ---------------------------------------------------------------------------
# Closed-form N-th root of a rigid transform (pose interpolation)
# ---------------------------------------------------------------------------

def _rotmat_log(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log map: rotation matrix -> axis-angle vector [3]."""
    cos_theta = jnp.clip(0.5 * (jnp.trace(R) - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = 0.5 * jnp.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )
    # near theta=0: w ~ axis*sin(theta) so axis*theta ~ w * theta/sin(theta)
    sin_theta = jnp.sin(theta)
    scale = jnp.where(sin_theta > 1e-6, theta / jnp.maximum(sin_theta, 1e-12), 1.0)
    return w * scale


def _rotmat_exp(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exp map: axis-angle vector [3] -> rotation matrix."""
    theta = jnp.linalg.norm(w)
    safe = jnp.maximum(theta, 1e-12)
    k = w / safe
    K = jnp.array(
        [[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]]
    )
    R = (
        jnp.eye(3)
        + jnp.sin(theta) * K
        + (1.0 - jnp.cos(theta)) * (K @ K)
    )
    return jnp.where(theta > 1e-8, R, jnp.eye(3) + K * theta)


def se3_nth_root(T: jnp.ndarray, n: int) -> jnp.ndarray:
    """Closed-form D with D^n = T for a rigid transform T [4, 4].

    Rotation root via axis-angle /n; translation via the geometric series
    t = (I + R_d + ... + R_d^{n-1}) t_d  =>  t_d = S^{-1} t.
    Behavioral twin of reference Decomposition (interpolate_pose.py:28-63)
    which solves the same problem with 1500 SGD steps.
    """
    R = T[:3, :3]
    t = T[:3, 3]
    w = _rotmat_log(R)
    R_d = _rotmat_exp(w / n)
    # S = sum_{k=0}^{n-1} R_d^k  (computed by scan, n is static & small)
    def body(carry, _):
        S, P = carry  # running sum, running power
        return (S + P, P @ R_d), None

    (S, _), _ = jax.lax.scan(body, (jnp.zeros((3, 3)), jnp.eye(3)), None, length=n)
    t_d = jnp.linalg.solve(S, t)
    return make_se3(R_d, t_d)


def interpolate_pose_sequence(
    seq: PoseSequence, dynamic_mask: Optional[np.ndarray] = None
) -> PoseSequence:
    """Fill unsolved dynamic frames with equal per-frame N-th-root deltas.

    Reference interpolate_pose.py:65-116: for each run of consecutive
    unsolved frames followed by a solved frame with delta T, every frame in
    the run (and the solved frame) gets delta T^(1/(run+1)). Host-side loop
    over frames (cheap, runs once per stage) calling the jitted closed-form
    root.
    """
    F = seq.num_frames
    solved = np.asarray(seq.solved)
    if dynamic_mask is None:
        dynamic_mask = np.ones(F, bool)
    trans = np.asarray(seq.translations).copy()
    rots = np.asarray(seq.rotations).copy()
    new_solved = solved.copy()

    root_fn = jax.jit(se3_nth_root, static_argnums=1)
    run: list[int] = []
    for f in range(F):
        if not dynamic_mask[f]:
            run = []
            continue
        if solved[f]:
            if run:
                n = len(run) + 1
                T = np.asarray(make_se3(jnp.asarray(rots[f]), jnp.asarray(trans[f])))
                D = np.asarray(root_fn(jnp.asarray(T), n))
                for g in run + [f]:
                    rots[g] = D[:3, :3]
                    trans[g] = D[:3, 3]
                    new_solved[g] = True
            run = []
        else:
            run.append(f)
    return PoseSequence(
        translations=jnp.asarray(trans),
        rotations=jnp.asarray(rots),
        solved=jnp.asarray(new_solved),
    )
