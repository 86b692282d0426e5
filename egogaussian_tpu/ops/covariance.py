"""3D covariance construction for Gaussian splats, pure jnp.

Functional twin of the reference's covariance path
(`utils/general_utils.py:110-156` strip_symmetric/build_scaling_rotation,
`scene/gaussian_model.py:28-63` covariance activations, incl. the
"rotated covariance" used during object-pose optimization where the object
Gaussians' L factors are left-multiplied by the accumulated object rotation
and optionally the trainable per-frame rotation).

Covariance is packed as 6 upper-triangular elements
(xx, xy, xz, yy, yz, zz) to match the reference rasterizer ABI.
"""
from __future__ import annotations

import jax.numpy as jnp

from egogaussian_tpu.ops.quaternion import quat_to_rotmat


def build_scaling_rotation(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """L = R(q) @ diag(s). scales [..., 3], quats [..., 4] wxyz -> [..., 3, 3]."""
    R = quat_to_rotmat(quats)
    return R * scales[..., None, :]


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """Pack symmetric [..., 3, 3] into 6 upper-triangular elements [..., 6]."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def unpack_symmetric(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of strip_symmetric: [..., 6] -> full symmetric [..., 3, 3]."""
    xx, xy, xz, yy, yz, zz = (packed[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def _rotmat_entries(quats: jnp.ndarray):
    """The 9 rotation-matrix entries as separate [...] arrays (wxyz quat).

    TPU note: keeping everything as [N]-vector channels (structure-of-arrays)
    instead of materializing [N, 3, 3] avoids tiny-minor-dim layouts that XLA
    pads to 128 lanes — batched 3x3 matmul chains cost ~7 ms at N=100k on
    v5e; this form fuses into a couple of VPU passes (<1 ms)."""
    from egogaussian_tpu.ops.quaternion import quat_normalize

    q = quat_normalize(quats)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    )


def covariance_from_scaling_rotation(
    scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float = 1.0
) -> jnp.ndarray:
    """Sigma = L L^T, packed [..., 6]. (reference gaussian_model.py:46-51)

    Computed channel-wise: Sigma_ij = sum_k s_k^2 R_ik R_jk."""
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = _rotmat_entries(quats)
    s = scales * scale_modifier
    s0, s1, s2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    xx = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    xy = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    xz = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    yy = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    yz = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    zz = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


def covariance_from_scaling_rotation_rotated(
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    extra_rot: jnp.ndarray,
    apply_mask: jnp.ndarray,
    scale_modifier: float = 1.0,
) -> jnp.ndarray:
    """Covariance with an extra left rotation applied to a subset of Gaussians.

    For object Gaussians rendered at a frame pose: Sigma = (R_x L)(R_x L)^T
    where R_x = extra_rot (e.g. trainable-frame-R @ accumulated-R).
    (reference gaussian_model.py:53-63 + geometry_utils.py:26-28 rot_L)

    Args:
      scales: [..., 3], quats: [..., 4]
      extra_rot: [3, 3] rotation applied to masked Gaussians
      apply_mask: [...] boolean/float, 1 where the extra rotation applies
    """
    cov = covariance_from_scaling_rotation(scales, quats, scale_modifier)
    rot = congruence_transform(cov, extra_rot)
    mask = apply_mask[..., None].astype(cov.dtype)
    return rot * mask + cov * (1.0 - mask)


def congruence_transform(cov: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """X Sigma X^T on packed [..., 6] covariances, channel-wise (X is [3, 3]).

    Equivalent to (X L)(X L)^T for Sigma = L L^T — the reference rotates the
    L factor (geometry_utils.py:26-28); rotating the covariance is the same
    congruence."""
    xx, xy, xz, yy, yz, zz = (cov[..., i] for i in range(6))
    x00, x01, x02 = X[0, 0], X[0, 1], X[0, 2]
    x10, x11, x12 = X[1, 0], X[1, 1], X[1, 2]
    x20, x21, x22 = X[2, 0], X[2, 1], X[2, 2]
    # T = X @ Sigma (rows of the intermediate as channels)
    t00 = x00 * xx + x01 * xy + x02 * xz
    t01 = x00 * xy + x01 * yy + x02 * yz
    t02 = x00 * xz + x01 * yz + x02 * zz
    t10 = x10 * xx + x11 * xy + x12 * xz
    t11 = x10 * xy + x11 * yy + x12 * yz
    t12 = x10 * xz + x11 * yz + x12 * zz
    t20 = x20 * xx + x21 * xy + x22 * xz
    t21 = x20 * xy + x21 * yy + x22 * yz
    t22 = x20 * xz + x21 * yz + x22 * zz
    # Sigma' = T @ X^T (upper triangle only)
    return jnp.stack(
        [
            t00 * x00 + t01 * x01 + t02 * x02,
            t00 * x10 + t01 * x11 + t02 * x12,
            t00 * x20 + t01 * x21 + t02 * x22,
            t10 * x10 + t11 * x11 + t12 * x12,
            t10 * x20 + t11 * x21 + t12 * x22,
            t20 * x20 + t21 * x21 + t22 * x22,
        ],
        axis=-1,
    )
