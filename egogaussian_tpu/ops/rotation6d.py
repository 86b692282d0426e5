"""6D rotation representation (Zhou et al., CVPR 2019), pure jnp.

Functional twin of reference `utils/geometry_utils.py:55-89`. The trainable
object pose parametrizes rotation as the first two columns of R ("6D"),
orthonormalized by Gram-Schmidt — smooth and unconstrained for gradient
optimization on TPU.
"""
from __future__ import annotations

import jax.numpy as jnp


def rot6d_to_rotmat(d6: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 2] (or [..., 6]) -> rotation matrices [..., 3, 3]."""
    if d6.shape[-1] == 6:
        d6 = d6.reshape(d6.shape[:-1] + (3, 2))
    import jax

    def safe_normalize(v):
        # rsqrt(|v|^2 + eps^2): finite gradient at v = 0 (see quaternion.py)
        return v * jax.lax.rsqrt(
            jnp.sum(v * v, axis=-1, keepdims=True) + 1e-24
        )

    a1 = d6[..., :, 0]
    a2 = d6[..., :, 1]
    b1 = safe_normalize(a1)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = safe_normalize(a2 - a2_proj)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> 6D representation [..., 3, 2]."""
    return R[..., :, :2]


def identity_rot6d() -> jnp.ndarray:
    """The 6D representation of the identity rotation, shape [3, 2]."""
    return jnp.eye(3)[:, :2]
