"""SE(3) rigid-transform algebra, pure jnp.

Functional twin of the reference's pose-sequence machinery
(`utils/geometry_utils.py:136-200`: get_T_seq / get_accum_T_seq /
get_accum_R_seq / apply_T_xyz / reverse_T_xyz). The reference builds python
dicts of per-frame 4x4 transforms on CPU; here pose sequences are dense
arrays [F, 4, 4] so that accumulation is a single `lax.associative_scan`
and per-frame lookup is a traced gather — everything stays on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def make_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build 4x4 homogeneous transforms from R [..., 3, 3] and t [..., 3]."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def se3_compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a then... composition a @ b (apply b first, then a)."""
    return a @ b


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of rigid transforms [..., 4, 4]: [R^T, -R^T t]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    return make_se3(Rt, t_inv)


def se3_apply(T: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """Apply transforms T [..., 4, 4] to points xyz [..., N, 3] (or [N, 3])."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, xyz) + t[..., None, :]


def accumulate_transforms(T_seq: jnp.ndarray) -> jnp.ndarray:
    """Running products A_k = T_k @ T_{k-1} @ ... @ T_0 for T_seq [F, 4, 4].

    TPU-native replacement for reference get_accum_T_seq (python loop of
    matmuls): log-depth `lax.associative_scan` over the frame axis.
    Note the reference accumulates newest-on-the-left (T_n ... T_1), so the
    combine is reversed-order matmul.
    """
    return jax.lax.associative_scan(lambda a, b: b @ a, T_seq, axis=0)


def accumulate_rotations(R_seq: jnp.ndarray) -> jnp.ndarray:
    """Running products of rotations [F, 3, 3], newest-on-the-left.
    (reference get_accum_R_seq, geometry_utils.py:171-186)"""
    return jax.lax.associative_scan(lambda a, b: b @ a, R_seq, axis=0)
