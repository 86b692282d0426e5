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

    # cov2d = (J R) Sigma (J R)^T expanded channel-wise. J has the sparse
    # EWA structure [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]], so the
    # rows of JW = J @ R are linear combinations of two rows of R with
    # per-Gaussian scalar coefficients — everything stays [N]-vector ops
    # (materializing [N,2,3]/[N,3,3] batched matmuls costs ~7 ms at N=100k
    # on v5e from minor-dim padding; this form fuses into VPU passes).
    inv_z = 1.0 / zs
    k0 = fx * inv_z
    k1 = -fx * tx * inv_z * inv_z
    k2 = fy * inv_z
    k3 = -fy * ty * inv_z * inv_z
    w00 = k0 * R[0, 0] + k1 * R[2, 0]
    w01 = k0 * R[0, 1] + k1 * R[2, 1]
    w02 = k0 * R[0, 2] + k1 * R[2, 2]
    w10 = k2 * R[1, 0] + k3 * R[2, 0]
    w11 = k2 * R[1, 1] + k3 * R[2, 1]
    w12 = k2 * R[1, 2] + k3 * R[2, 2]

    xx, xy, xz, yy, yz, zz = (cov3d[..., i] for i in range(6))
    # v = Sigma @ w0, u = Sigma @ w1 (channels)
    v0 = xx * w00 + xy * w01 + xz * w02
    v1 = xy * w00 + yy * w01 + yz * w02
    v2 = xz * w00 + yz * w01 + zz * w02
    u0 = xx * w10 + xy * w11 + xz * w12
    u1 = xy * w10 + yy * w11 + yz * w12
    u2 = xz * w10 + yz * w11 + zz * w12
    a = w00 * v0 + w01 * v1 + w02 * v2 + blur
    b = w10 * v0 + w11 * v1 + w12 * v2
    c = w10 * u0 + w11 * u1 + w12 * u2 + blur

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
