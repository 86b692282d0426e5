"""k-nearest-neighbor mean squared distance, pure jnp.

TPU-native replacement for the reference's `simple_knn._C.distCUDA2` CUDA
kernel (used once per point-cloud init to seed log-scales,
`scene/gaussian_model.py:301`). Exact O(N^2) computed blockwise so the
pairwise-distance inner product rides the MXU; called once at initialization
so quadratic cost is acceptable up to a few hundred thousand points.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block_size"))
def mean_sq_dist_to_knn(
    points: jnp.ndarray, k: int = 3, block_size: int = 2048
) -> jnp.ndarray:
    """Mean squared distance from each point to its k nearest neighbors.

    Args:
      points: [N, 3] float32
      k: number of neighbors (excluding self), default 3 like distCUDA2
    Returns: [N] mean of the k smallest squared distances (self excluded)
    """
    n = points.shape[0]
    pad = (-n) % block_size
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=jnp.inf)
    n_pad = n + pad
    sq = jnp.sum(jnp.where(jnp.isfinite(pts), pts, 0.0) ** 2, axis=-1)
    valid = jnp.arange(n_pad) < n

    num_blocks = n_pad // block_size
    blocks = pts.reshape(num_blocks, block_size, 3)
    block_valid = valid.reshape(num_blocks, block_size)

    def per_block(block_pts, block_ok, block_idx):
        # squared distances from this block to ALL points via MXU matmul
        b = jnp.where(block_ok[:, None], block_pts, 0.0)
        d2 = (
            jnp.sum(b * b, axis=-1)[:, None]
            - 2.0 * (b @ jnp.where(valid[:, None], pts, 0.0).T)
            + sq[None, :]
        )
        big = jnp.float32(1e30)  # inf breaks approx_min_k's reduction
        d2 = jnp.where(valid[None, :], d2, big)
        # exclude self-distance
        rows = block_idx * block_size + jnp.arange(block_size)
        self_mask = rows[:, None] == jnp.arange(n_pad)[None, :]
        d2 = jnp.where(self_mask, big, d2)
        # k smallest: lax.approx_min_k is the TPU-native fast path (exact
        # top_k lowers to a full sort of the N-wide rows — minutes at 100k);
        # recall>=0.99 is far more accuracy than a scale seed needs.
        smallest, _ = jax.lax.approx_min_k(d2, k, recall_target=0.99)
        return jnp.mean(smallest, axis=-1)

    out = jax.lax.map(
        lambda args: per_block(*args),
        (blocks, block_valid, jnp.arange(num_blocks)),
    )
    return out.reshape(n_pad)[:n]
