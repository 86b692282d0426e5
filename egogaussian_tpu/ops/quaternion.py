"""Quaternion math (wxyz convention), pure jnp.

Functional twin of the reference's quaternion helpers
(`utils/general_utils.py:124-145` build_rotation, `scene/colmap_loader.py:43-66`
qvec2rotmat/rotmat2qvec), written for batched TPU execution: every function
vmaps/broadcasts over a leading batch axis without python loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions [..., 4] (wxyz) to unit norm.

    Uses rsqrt(|q|^2 + eps^2) rather than /max(|q|, eps): the latter has a
    NaN gradient at q = 0 (d|q|/dq = q/|q|), and dead/padding rows with
    zero loss gradients still poison arrays through 0 * NaN."""
    sq = jnp.sum(q * q, axis=-1, keepdims=True)
    return q * jax.lax.rsqrt(sq + eps * eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize then convert quaternion(s) [..., 4] wxyz to rotation
    matrices [..., 3, 3]."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> unit quaternions [..., 4] wxyz.

    Branch-free (jnp.where over the four Shepperd cases) so it is jit/vmap
    friendly, unlike the eigenvalue method in the reference's rotmat2qvec.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Case 0: trace positive
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    # Case 1: m00 largest diagonal
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    # Case 2: m11 largest
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    # Case 3: m22 largest
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    # Canonicalize sign (w >= 0) and normalize.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions [..., 4] wxyz."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )
