"""EWA splat projection: 3D Gaussians -> screen-space 2D Gaussians.

TPU-native replacement for the preprocess stage of the CUDA
diff-gaussian-rasterization submodule (interface pinned by reference
`gaussian_renderer/__init__.py:38-98`). Fully vectorized over N Gaussians —
XLA fuses this into a handful of VPU loops; no Pallas needed here.

Outputs feed both the oracle compositor and the tiled/Pallas rasterizer:
  means2d [N,2] pixel coords, conics [N,3] (inverse 2D covariance, packed
  (a,b,c) for [[a,b],[b,c]]), depths [N], radii [N] (3-sigma pixel radius,
  0 = culled), and the det-based validity mask.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from egogaussian_tpu.ops.covariance import unpack_symmetric


class ProjectedGaussians(NamedTuple):
    means2d: jnp.ndarray  # [N, 2] pixel coordinates
    conics: jnp.ndarray  # [N, 3] inverse 2D covariance (a, b, c)
    depths: jnp.ndarray  # [N] camera-space z
    radii: jnp.ndarray  # [N] int32, 0 => culled
    cov2d: jnp.ndarray  # [N, 3] 2D covariance (a, b, c), pre-inversion


def project_gaussians(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    viewmat: jnp.ndarray,
    fx: jnp.ndarray,
    fy: jnp.ndarray,
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    width: int,
    height: int,
    znear: float = 0.01,
    blur: float = 0.3,
    valid_mask: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Project 3D Gaussians into a camera via the EWA approximation.

    Args:
      means3d: [N, 3] world-space means
      cov3d: [N, 6] packed symmetric covariance (xx, xy, xz, yy, yz, zz)
      viewmat: [4, 4] world-to-camera
      valid_mask: optional [N] bool; False rows are force-culled (capacity
        padding from the model pytree)
    """
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    t_cam = means3d @ R.T + t  # [N, 3]
    z = t_cam[..., 2]

    # Frustum cull: behind near plane. (CUDA reference culls z <= 0.2)
    in_front = z > jnp.maximum(znear, 0.2 * znear / 0.01 * 0.0 + 0.2)

    zs = jnp.where(in_front, z, 1.0)  # avoid div by ~0 on culled rows

    # Clamp the tangent-plane coords like the CUDA EWA (1.3 * tan(fov/2))
    # to keep the Jacobian bounded for off-screen splats.
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = jnp.clip(t_cam[..., 0] / zs, -lim_x, lim_x) * zs
    ty = jnp.clip(t_cam[..., 1] / zs, -lim_y, lim_y) * zs

    # Jacobian of perspective projection at the (clamped) point, [N, 2, 3]
    zero = jnp.zeros_like(zs)
    J = jnp.stack(
        [
            jnp.stack([fx / zs, zero, -fx * tx / (zs * zs)], axis=-1),
            jnp.stack([zero, fy / zs, -fy * ty / (zs * zs)], axis=-1),
        ],
        axis=-2,
    )

    V = unpack_symmetric(cov3d)  # [N, 3, 3]
    JW = J @ R  # [N, 2, 3]
    cov2d_full = JW @ V @ jnp.swapaxes(JW, -1, -2)  # [N, 2, 2]
    a = cov2d_full[..., 0, 0] + blur
    b = cov2d_full[..., 0, 1]
    c = cov2d_full[..., 1, 1] + blur

    det = a * c - b * b
    det_valid = det > 0.0
    det_safe = jnp.where(det_valid, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    # 3-sigma screen radius from the larger eigenvalue of cov2d
    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    # Screen-space mean (pixel coordinates)
    u = fx * t_cam[..., 0] / zs + cx
    v = fy * t_cam[..., 1] / zs + cy
    means2d = jnp.stack([u, v], axis=-1)

    # Cull splats whose 3-sigma box misses the image entirely
    on_screen = (
        (u + radius > 0)
        & (u - radius < width)
        & (v + radius > 0)
        & (v - radius < height)
    )
    keep = in_front & det_valid & on_screen
    if valid_mask is not None:
        keep = keep & valid_mask
    radii = jnp.where(keep, radius, 0.0).astype(jnp.int32)

    return ProjectedGaussians(
        means2d=means2d,
        conics=conic,
        depths=z,
        radii=radii,
        cov2d=jnp.stack([a, b, c], axis=-1),
    )
