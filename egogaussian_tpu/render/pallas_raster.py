"""Pallas TPU kernels for the per-tile compositing hot loop.

This is the TPU-native replacement for the CUDA forward/backward kernels of
diff-gaussian-rasterization (SURVEY.md §2.2 row 1, §7 step 3/hard-part 1).
Projection, binning and per-tile gathering stay in XLA (render/tiled.py —
gathers/scatters differentiate automatically and XLA does them well); the
Pallas pair fuses the quadratic-form evaluation, transmittance scan, and
color/depth accumulation that dominate the fwd+bwd cost:

  forward (per tile, grid over tiles):
    alpha[M, P] = min(op * exp(-0.5 d^T Conic d), 0.99), zeroed < 1/255
    logT = cumsum(log1p(-alpha))            # associative scan, VPU
    w = alpha * exp(logT_excl)
    img = w^T col  (MXU), depth = w^T z, alpha_out = sum w,
    out_img += exp(logT_total) * bg

  backward: recompute alpha/w/T (cheaper than storing [M, P] residuals in
  HBM), then
    dL/dw_i   = g_img . col_i + g_depth z_i + g_alpha
    S_i       = sum_{j>i} w_j dL/dw_j + T_final * (g_img . bg)   # suffix
    dL/dalpha = T_i dL/dw_i - S_i / (1 - alpha_i)
    chain to (mu, conic, opacity, color, z) with MXU matmuls for the
    color/depth terms and P-reductions for the geometry terms.

The 1/255 and 0.99 gates match render/oracle.py exactly, so tiled-XLA,
oracle, and Pallas paths are interchangeable (tests assert equivalence).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from egogaussian_tpu.render.oracle import ALPHA_EPS, ALPHA_MAX


def _cumsum_rows(x: jnp.ndarray, chunk: int = 256) -> jnp.ndarray:
    """Inclusive cumsum along axis 0 of [M, P] inside a Pallas kernel.

    Mosaic has no cumsum lowering; a chunked lower-triangular matmul runs the
    prefix sum on the MXU instead: incl_chunk = tril(1) @ chunk + carry.
    """
    m = x.shape[0]
    chunk = min(chunk, m)
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    L = (rows >= cols).astype(x.dtype)
    outs = []
    carry = jnp.zeros((1, x.shape[1]), x.dtype)
    for i in range(0, m, chunk):
        blk = x[i : i + chunk]
        incl = (
            jax.lax.dot_general(
                L, blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + carry
        )
        outs.append(incl)
        carry = incl[-1:, :]
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _pixel_coords(tile_id, ts: int, n_tx: int, dtype):
    """Pixel-center coordinates of a tile's P = ts*ts pixels (row-major)."""
    tx = (tile_id % n_tx).astype(dtype)
    ty = (tile_id // n_tx).astype(dtype)
    # build directly in (1, P) layout — Mosaic cannot shape-cast (ts, ts)
    # vectors into (1, ts*ts)
    i = jax.lax.broadcasted_iota(jnp.int32, (1, ts * ts), 1)
    cols = (i % ts).astype(dtype)
    rows = (i // ts).astype(dtype)
    px = tx * ts + cols + 0.5
    py = ty * ts + rows + 0.5
    return px, py


def _alphas(mu_ref, con_ref, op_ref, px, py):
    """alpha [M, P] with the oracle's gates. Returns (alpha, raw_in_range)."""
    dx = px - mu_ref[0, :, 0:1]  # [M, P]
    dy = py - mu_ref[0, :, 1:2]
    a = con_ref[0, :, 0:1]
    b = con_ref[0, :, 1:2]
    c = con_ref[0, :, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    power = jnp.minimum(power, 0.0)
    raw = op_ref[0, :, :] * jnp.exp(power)  # op [M, 1] broadcast
    alpha = jnp.minimum(raw, ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)
    return alpha, (raw, power, dx, dy)


def _fwd_kernel(n_tx: int, ts: int, mu_ref, con_ref, op_ref, col_ref, z_ref,
                bg_ref, img_ref, alpha_ref, depth_ref):
    tile_id = pl.program_id(0)
    dtype = mu_ref.dtype
    px, py = _pixel_coords(tile_id, ts, n_tx, dtype)
    alpha, _ = _alphas(mu_ref, con_ref, op_ref, px, py)

    log1m = jnp.log1p(-alpha)  # [M, P]
    incl = _cumsum_rows(log1m)
    excl = incl - log1m
    w = alpha * jnp.exp(excl)  # [M, P]

    img = jax.lax.dot_general(
        w, col_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [P, D]
    t_final = jnp.exp(incl[-1:, :])  # [1, P]
    img = img + t_final.T * bg_ref[0, :][None, :]
    img_ref[0, :, :] = img
    alpha_ref[0, :, :] = jnp.sum(w, axis=0, keepdims=True).T  # [P, 1]
    depth_ref[0, :, :] = jax.lax.dot_general(
        w, z_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(n_tx: int, ts: int, mu_ref, con_ref, op_ref, col_ref, z_ref,
                bg_ref, gimg_ref, galpha_ref, gdepth_ref,
                dmu_ref, dcon_ref, dop_ref, dcol_ref, dz_ref):
    tile_id = pl.program_id(0)
    dtype = mu_ref.dtype
    px, py = _pixel_coords(tile_id, ts, n_tx, dtype)
    alpha, (raw, power, dx, dy) = _alphas(mu_ref, con_ref, op_ref, px, py)

    log1m = jnp.log1p(-alpha)
    incl = _cumsum_rows(log1m)
    excl = incl - log1m
    T_excl = jnp.exp(excl)
    w = alpha * T_excl
    t_final = jnp.exp(incl[-1:, :])  # [1, P]

    gimg = gimg_ref[0]  # [P, D]
    galpha = galpha_ref[0][:, 0]  # [P]
    gdepth = gdepth_ref[0][:, 0]  # [P]
    bg = bg_ref[0, :]  # [D]

    # dL/dw [M, P]
    dLdw = jax.lax.dot_general(
        col_ref[0], gimg, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dLdw = dLdw + z_ref[0][:, 0:1] * gdepth[None, :] + galpha[None, :]

    # suffix S_i = sum_{j>i} w_j dLdw_j + T_final * (g_img . bg)
    wd = w * dLdw
    incl_wd = _cumsum_rows(wd)
    total_wd = incl_wd[-1:, :]
    g_tfinal = jnp.sum(gimg * bg[None, :], axis=-1)[None, :]  # [1, P]
    S = (total_wd - incl_wd) + t_final * g_tfinal

    one_minus = jnp.maximum(1.0 - alpha, 1e-6)
    dalpha = T_excl * dLdw - S / one_minus
    # gates: gradient only where ALPHA_EPS <= raw < ALPHA_MAX
    gate = (raw >= ALPHA_EPS) & (raw < ALPHA_MAX)
    dalpha = jnp.where(gate, dalpha, 0.0)

    # chain: alpha = op * exp(power)
    dpower = raw * dalpha  # [M, P]
    dpower = jnp.where(power < 0.0, dpower, dpower)  # clamp at 0 is inactive boundary
    a = con_ref[0, :, 0:1]
    b = con_ref[0, :, 1:2]
    c = con_ref[0, :, 2:3]
    ddx = (-(a * dx + b * dy)) * dpower
    ddy = (-(c * dy + b * dx)) * dpower
    dmu_x = -jnp.sum(ddx, axis=1)  # d/dmu = -d/ddx
    dmu_y = -jnp.sum(ddy, axis=1)
    dmu_ref[0, :, :] = jnp.stack([dmu_x, dmu_y], axis=-1)

    da = jnp.sum(-0.5 * dx * dx * dpower, axis=1)
    db = jnp.sum(-dx * dy * dpower, axis=1)
    dc = jnp.sum(-0.5 * dy * dy * dpower, axis=1)
    dcon_ref[0, :, :] = jnp.stack([da, db, dc], axis=-1)

    dop = jnp.sum(jnp.exp(power) * dalpha, axis=1, keepdims=True)  # [M, 1]
    dop_ref[0, :, :] = dop

    dcol_ref[0, :, :] = jax.lax.dot_general(
        w, gimg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [M, D]
    dz_ref[0, :, :] = jax.lax.dot_general(
        w, gdepth[:, None], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.lru_cache(maxsize=None)
def make_tile_compositor(n_tiles: int, m: int, d: int, ts: int, n_tx: int,
                         interpret: bool = False):
    """Build the custom-VJP per-tile compositor for a (tiles, capacity,
    channels, tile-size) configuration. Cached per config.

    Args (of the returned fn):
      mu [T, M, 2], con [T, M, 3], op [T, M, 1] (0 for masked rows),
      col [T, M, D], z [T, M, 1], bg [1, D]
    Returns: img [T, P, D], alpha [T, P, 1], depth [T, P, 1]
    """
    p = ts * ts

    def tile_spec(ch):
        return pl.BlockSpec((1, m, ch), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    def out_spec(ch):
        return pl.BlockSpec((1, p, ch), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    bg_spec = pl.BlockSpec((1, d), lambda t: (0, 0), memory_space=pltpu.VMEM)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, n_tx, ts),
        grid=(n_tiles,),
        in_specs=[tile_spec(2), tile_spec(3), tile_spec(1), tile_spec(d),
                  tile_spec(1), bg_spec],
        out_specs=(out_spec(d), out_spec(1), out_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, p, d), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.float32),
        ),
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, n_tx, ts),
        grid=(n_tiles,),
        in_specs=[tile_spec(2), tile_spec(3), tile_spec(1), tile_spec(d),
                  tile_spec(1), bg_spec,
                  out_spec(d), out_spec(1), out_spec(1)],
        out_specs=(tile_spec(2), tile_spec(3), tile_spec(1), tile_spec(d),
                   tile_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, m, 2), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, m, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, m, d), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, m, 1), jnp.float32),
        ),
        interpret=interpret,
    )

    @jax.custom_vjp
    def compositor(mu, con, op, col, z, bg):
        return fwd_call(mu, con, op, col, z, bg)

    def fwd(mu, con, op, col, z, bg):
        out = fwd_call(mu, con, op, col, z, bg)
        return out, (mu, con, op, col, z, bg)

    def bwd(res, g):
        mu, con, op, col, z, bg = res
        gimg, galpha, gdepth = g
        dmu, dcon, dop, dcol, dz = bwd_call(
            mu, con, op, col, z, bg, gimg, galpha, gdepth
        )
        # bg gradient: sum over pixels of T_final * g_img. T_final is not
        # saved; recover it as (1 - sum w) per pixel from the alpha output…
        # cheaper: bg is a constant background color in this framework —
        # return zeros (bg is never trained; matches the CUDA kernel which
        # exposes no bg gradient either).
        dbg = jnp.zeros_like(bg)
        return dmu, dcon, dop, dcol, dz, dbg

    compositor.defvjp(fwd, bwd)
    return compositor
