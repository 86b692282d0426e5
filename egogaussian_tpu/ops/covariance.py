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


def covariance_from_scaling_rotation(
    scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float = 1.0
) -> jnp.ndarray:
    """Sigma = L L^T, packed [..., 6]. (reference gaussian_model.py:46-51)"""
    L = build_scaling_rotation(scales * scale_modifier, quats)
    cov = L @ jnp.swapaxes(L, -1, -2)
    return strip_symmetric(cov)


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
    L = build_scaling_rotation(scales * scale_modifier, quats)
    L_rot = jnp.einsum("ij,...jk->...ik", extra_rot, L)
    mask = apply_mask[..., None, None].astype(L.dtype)
    L = L_rot * mask + L * (1.0 - mask)
    cov = L @ jnp.swapaxes(L, -1, -2)
    return strip_symmetric(cov)
