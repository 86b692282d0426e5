"""Pallas TPU kernels for the per-tile compositing hot loop.

This is the TPU-native replacement for the CUDA forward/backward kernels of
diff-gaussian-rasterization (SURVEY.md §2.2 row 1, §7 step 3/hard-part 1).
Projection, binning and pair gathering stay in XLA (render/tiled.py —
gathers/scatters differentiate automatically and XLA does them well); the
Pallas custom-VJP pairs fuse the quadratic-form evaluation, transmittance
scan, and color/depth accumulation that dominate the fwd+bwd cost.

Three kernel generations live here, newest first:

  * TILE-GRID (make_tilegrid_compositor, the default via
    TileConfig.compositor="tilegrid"): grid over tiles; each grid step
    streams its tile's chunk run from the flat chunk-padded pair array in
    HBM through an inner emit_pipeline (double-buffered DMA). Pair data is
    stored TRANSPOSED per chunk ([n_slots, ch16, 128]) to satisfy Mosaic's
    tile-aligned DMA minors; compute runs pixels-on-sublanes x
    pairs-on-lanes. Transmittance is LINEAR-space (prefix products,
    underflow == genuine saturation), and the backward is a single FORWARD
    sweep: S(r) = total_wd - prefix_wd(r), with the per-pixel total
    recovered from the saved outputs — no residual, no suffix scans, no
    log/exp in the scan path.
  * STREAM (make_stream_compositor): one grid step per 128-pair chunk of
    the same flat layout; log-space transmittance carried in scratch
    across steps of the same tile, single reverse-sweep backward.
  * WINDOWED (make_tile_compositor / _chunked): per-tile [T, M] gather
    windows; kept as the simplest reference kernels.

Shared math: alpha = min(op * exp(-0.5 d^T Conic d), 0.99), zeroed below
1/255;  w_i = alpha_i * prod_{j<i}(1-alpha_j);  dL/dalpha_i =
T_i dL/dw_i - S_i/(1-alpha_i) with S_i the weighted suffix. The gates
match render/oracle.py exactly, so tiled-XLA, oracle, and all Pallas
flavors are interchangeable (tests assert equivalence).
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
                precision=jax.lax.Precision.HIGHEST,
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
        precision=jax.lax.Precision.HIGHEST,
    )  # [P, D]
    t_final = jnp.exp(incl[-1:, :])  # [1, P]
    img = img + t_final.T * bg_ref[0, :][None, :]
    img_ref[0, :, :] = img
    alpha_ref[0, :, :] = jnp.sum(w, axis=0, keepdims=True).T  # [P, 1]
    depth_ref[0, :, :] = jax.lax.dot_general(
        w, z_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
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
        precision=jax.lax.Precision.HIGHEST,
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
        precision=jax.lax.Precision.HIGHEST,
    )  # [M, D]
    dz_ref[0, :, :] = jax.lax.dot_general(
        w, gdepth[:, None], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# ---------------------------------------------------------------------------
# Chunked kernels: per-tile work proportional to the tile's ACTUAL occupancy
# (scalar-prefetched counts bound a fori_loop over CH-row chunks), so padded
# capacity costs nothing — the TPU analog of the CUDA kernel's per-tile
# range loop. Scratch accumulators keep everything in VMEM.
# ---------------------------------------------------------------------------

_CHUNK = 128


def _tril(ch: int, dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    return (rows >= cols).astype(dtype)


def _chunk_alphas(mu, con, op, px, py):
    """alpha [CH, P] for one chunk of per-tile data (rows with op=0 inert)."""
    dx = px - mu[:, 0:1]
    dy = py - mu[:, 1:2]
    a, b, c = con[:, 0:1], con[:, 1:2], con[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    power = jnp.minimum(power, 0.0)
    raw = op * jnp.exp(power)
    alpha = jnp.minimum(raw, ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)
    return alpha, raw, power, dx, dy


def _fwd_kernel_chunked(n_tx: int, ts: int, m: int, d: int, cnt_ref,
                        data_ref, bg_ref,
                        img_ref, alpha_ref, depth_ref, logt_ref,
                        acc_img, acc_a, acc_d, logT):
    """Packed input data_ref [1, M, 7+D]: mu(2) con(3) op(1) col(D) z(1).
    Rows beyond the tile's count are masked in-kernel (their slots hold the
    next tile's pairs — the gather matrix is built from a flat sorted pair
    array, so no host-side op masking is needed)."""
    tile_id = pl.program_id(0)
    p = ts * ts
    dtype = jnp.float32
    px, py = _pixel_coords(tile_id, ts, n_tx, dtype)
    cnt = cnt_ref[tile_id]
    L = _tril(_CHUNK, dtype)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1), 0)

    acc_img[...] = jnp.zeros_like(acc_img)
    acc_a[...] = jnp.zeros_like(acc_a)
    acc_d[...] = jnp.zeros_like(acc_d)
    logT[...] = jnp.zeros_like(logT)

    def body(i, _):
        off = i * _CHUNK
        blk = data_ref[0, pl.ds(off, _CHUNK), :]
        mu = blk[:, 0:2]
        con = blk[:, 2:5]
        op = jnp.where(row_iota + off < cnt, blk[:, 5:6], 0.0)
        col = blk[:, 6:6 + d]
        z = blk[:, 6 + d:7 + d]
        alpha, _, _, _, _ = _chunk_alphas(mu, con, op, px, py)
        log1m = jnp.log1p(-alpha)
        incl = jax.lax.dot_general(
            L, log1m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) + logT[...]
        w = alpha * jnp.exp(incl - log1m)
        acc_img[...] += jax.lax.dot_general(
            w, col, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc_a[...] += jnp.sum(w, axis=0, keepdims=True).T
        acc_d[...] += jax.lax.dot_general(
            w, z, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        logT[...] = incl[_CHUNK - 1:, :]
        return 0

    n_chunks = (cnt + _CHUNK - 1) // _CHUNK
    jax.lax.fori_loop(0, n_chunks, body, 0)
    t_final = jnp.exp(logT[...])  # [1, P]
    img_ref[0, :, :] = acc_img[...] + t_final.T * bg_ref[0, :][None, :]
    alpha_ref[0, :, :] = acc_a[...]
    depth_ref[0, :, :] = acc_d[...]
    logt_ref[0, :, :] = logT[...]  # residual for the single-sweep backward


def _bwd_kernel_chunked(n_tx: int, ts: int, m: int, d_ch: int, cnt_ref,
                        data_ref, bg_ref, logt_ref,
                        gimg_ref, galpha_ref, gdepth_ref,
                        ddata_ref,
                        suf_log, suf_S):
    """SINGLE reverse sweep (the CUDA backward's back-to-front structure,
    suffix-accumulated in log space). The forward saves logT_total per pixel;
    for row r of chunk i (processed last-to-first):

      U(r)        = sum_{r' >= r, same chunk} log(1-alpha_r') + suffix_log
      logT_excl(r) = logT_total - U(r)                  # prefix, exactly
      S(r)        = strict-suffix(w*dLdw) + suffix_S + T_final*(g_img.bg)
      dL/dalpha   = T_excl dLdw - S / (1-alpha)

    vs the previous two-forward-pass scheme this halves the alpha/dLdw
    recomputation and triangular matmuls (one suffix matmul pair per chunk
    instead of three prefix matmuls across both passes)."""
    tile_id = pl.program_id(0)
    dtype = jnp.float32
    px, py = _pixel_coords(tile_id, ts, n_tx, dtype)
    cnt = cnt_ref[tile_id]
    n_chunks = (cnt + _CHUNK - 1) // _CHUNK
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1), 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, _CHUNK), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, _CHUNK), 1)
    U_mat = (cols >= rows).astype(dtype)  # suffix-inclusive
    V_mat = (cols > rows).astype(dtype)  # suffix-strict

    gimg = gimg_ref[0]  # [P, D]
    galpha = galpha_ref[0][:, 0]
    gdepth = gdepth_ref[0][:, 0]
    bg = bg_ref[0, :]
    logT_total = logt_ref[0]  # [1, P]
    base_S = jnp.exp(logT_total) * jnp.sum(gimg * bg[None, :], axis=-1)[None, :]

    def chunk_data(i):
        off = i * _CHUNK
        blk = data_ref[0, pl.ds(off, _CHUNK), :]
        return (
            blk[:, 0:2],
            blk[:, 2:5],
            jnp.where(row_iota + off < cnt, blk[:, 5:6], 0.0),
            blk[:, 6:6 + d_ch],
            blk[:, 6 + d_ch:7 + d_ch],
        )

    # zero all gradient outputs (rows beyond n_chunks*_CHUNK are never written)
    ddata_ref[0, :, :] = jnp.zeros_like(ddata_ref[0])
    suf_log[...] = jnp.zeros_like(suf_log)
    suf_S[...] = jnp.zeros_like(suf_S)

    def body(j, _):
        i = n_chunks - 1 - j
        off = i * _CHUNK
        mu, con, op, col, z = chunk_data(i)
        alpha, raw, power, dx, dy = _chunk_alphas(mu, con, op, px, py)
        log1m = jnp.log1p(-alpha)
        U = jax.lax.dot_general(
            U_mat, log1m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) + suf_log[...]
        T_excl = jnp.exp(logT_total - U)
        w = alpha * T_excl
        d = jax.lax.dot_general(
            col, gimg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) + z[:, 0:1] * gdepth[None, :] + galpha[None, :]
        wd = w * d
        S = jax.lax.dot_general(
            V_mat, wd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) + suf_S[...] + base_S
        one_minus = jnp.maximum(1.0 - alpha, 1e-6)
        dalpha = T_excl * d - S / one_minus
        gate = (raw >= ALPHA_EPS) & (raw < ALPHA_MAX)
        dalpha = jnp.where(gate, dalpha, 0.0)
        dpower = raw * dalpha
        a, b, c = con[:, 0:1], con[:, 1:2], con[:, 2:3]
        ddx = (-(a * dx + b * dy)) * dpower
        ddy = (-(c * dy + b * dx)) * dpower
        dmu = jnp.stack([-jnp.sum(ddx, axis=1), -jnp.sum(ddy, axis=1)], axis=-1)
        dcon = jnp.stack(
            [
                jnp.sum(-0.5 * dx * dx * dpower, axis=1),
                jnp.sum(-dx * dy * dpower, axis=1),
                jnp.sum(-0.5 * dy * dy * dpower, axis=1),
            ],
            axis=-1,
        )
        dop = jnp.sum(jnp.exp(power) * dalpha, axis=1, keepdims=True)
        dop = jnp.where(row_iota + off < cnt, dop, 0.0)
        dcol = jax.lax.dot_general(
            w, gimg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dz = jax.lax.dot_general(
            w, gdepth[:, None], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        ddata_ref[0, pl.ds(off, _CHUNK), :] = jnp.concatenate(
            [dmu, dcon, dop, dcol, dz], axis=-1
        )
        suf_log[...] += jnp.sum(log1m, axis=0, keepdims=True)
        suf_S[...] += jnp.sum(wd, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.lru_cache(maxsize=None)
def make_tile_compositor_chunked(n_tiles: int, m: int, d: int, ts: int,
                                 n_tx: int, interpret: bool = False):
    """Occupancy-proportional compositor with scalar-prefetched tile counts
    and a single packed data tensor (mu|con|op|col|z = 7+D channels — one
    big gather on the host side instead of five; gathers cost ~9 ns/row on
    v5e regardless of width).
    Args of the returned fn: (counts [T] i32, data [T, M, 7+D], bg [1, D])."""
    p = ts * ts
    ch = 7 + d
    assert m % _CHUNK == 0, f"max_per_tile {m} must be a multiple of {_CHUNK}"

    data_spec = pl.BlockSpec((1, m, ch), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM)

    def out_spec(c):
        return pl.BlockSpec((1, p, c), lambda t, *_: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    bg_spec = pl.BlockSpec((1, d), lambda t, *_: (0, 0),
                           memory_space=pltpu.VMEM)
    logt_spec = pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel_chunked, n_tx, ts, m, d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[data_spec, bg_spec],
            out_specs=(out_spec(d), out_spec(1), out_spec(1), logt_spec),
            scratch_shapes=[
                pltpu.VMEM((p, d), jnp.float32),
                pltpu.VMEM((p, 1), jnp.float32),
                pltpu.VMEM((p, 1), jnp.float32),
                pltpu.VMEM((1, p), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, p, d), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.float32),
        ),
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel_chunked, n_tx, ts, m, d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[data_spec, bg_spec, logt_spec,
                      out_spec(d), out_spec(1), out_spec(1)],
            out_specs=data_spec,
            scratch_shapes=[
                pltpu.VMEM((1, p), jnp.float32),
                pltpu.VMEM((1, p), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, m, ch), jnp.float32),
        interpret=interpret,
    )

    @jax.custom_vjp
    def compositor(counts, data, bg):
        return fwd_call(counts, data, bg)[:3]

    def fwd(counts, data, bg):
        img, alpha, depth, logt = fwd_call(counts, data, bg)
        return (img, alpha, depth), (counts, data, bg, logt)

    def bwd(res, g):
        counts, data, bg, logt = res
        gimg, galpha, gdepth = g
        ddata = bwd_call(counts, data, bg, logt, gimg, galpha, gdepth)
        return None, ddata, jnp.zeros_like(bg)

    compositor.defvjp(fwd, bwd)
    return compositor


# ---------------------------------------------------------------------------
# Stream compositor: ONE flat grid over chunk-aligned pair slots instead of a
# [tiles, max_per_tile] window matrix. Each tile's (depth-ordered) pair run is
# padded to a _CHUNK multiple in a flat [PC, ch] array; grid step c composites
# chunk c into its owning tile's output block (output BlockSpec indexed by the
# scalar-prefetched chunk->tile map — the flash-attention revisiting pattern,
# with transmittance/suffix state carried in scratch between steps of the same
# tile). vs the window design this removes the [T, M, ch] gather (~24 MB
# written+read per frame at 480p plus its scatter-add VJP, ~12 ms of a 33 ms
# train step) and makes per-tile work exactly occupancy-proportional.
# ---------------------------------------------------------------------------


def _prefix_scan(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum over axis 0 (sublanes) by shift-add doubling.

    7 shifted adds on a [128, P] f32 block run entirely on the VPU — vs the
    triangular MXU matmul this is both faster (no 6-pass HIGHEST padding)
    and MORE accurate (tree-summation f32 instead of bf16-limb dot)."""
    n = x.shape[0]
    k = 1
    while k < n:
        zero = jnp.zeros((k, x.shape[1]), x.dtype)
        x = x + jnp.concatenate([zero, x[:-k]], axis=0)
        k *= 2
    return x


def _suffix_scan(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive suffix sum over axis 0 (shift-add doubling, VPU)."""
    n = x.shape[0]
    k = 1
    while k < n:
        zero = jnp.zeros((k, x.shape[1]), x.dtype)
        x = x + jnp.concatenate([x[k:], zero], axis=0)
        k *= 2
    return x


def _stream_fwd_kernel(n_tx: int, ts: int, n_slots: int, d: int, meta_ref,
                       vals_ref, bg_ref,
                       img_ref, alpha_ref, depth_ref, logt_ref,
                       acc_img, acc_a, acc_d, logT):
    c = pl.program_id(0)
    t = meta_ref[0, c]
    rank_off = meta_ref[1, c]
    cnt = meta_ref[2, c]
    first = jnp.logical_or(c == 0, meta_ref[0, jnp.maximum(c - 1, 0)] != t)
    last = jnp.logical_or(
        c == n_slots - 1, meta_ref[0, jnp.minimum(c + 1, n_slots - 1)] != t
    )
    dtype = jnp.float32
    px, py = _pixel_coords(t, ts, n_tx, dtype)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1), 0)

    @pl.when(first)
    def _():
        acc_img[...] = jnp.zeros_like(acc_img)
        acc_a[...] = jnp.zeros_like(acc_a)
        acc_d[...] = jnp.zeros_like(acc_d)
        logT[...] = jnp.zeros_like(logT)

    @pl.when(rank_off < cnt)  # skip pure-padding chunks
    def _():
        blk = vals_ref[...]  # [CHUNK, ch]
        mu = blk[:, 0:2]
        con = blk[:, 2:5]
        op = jnp.where(row_iota + rank_off < cnt, blk[:, 5:6], 0.0)
        col = blk[:, 6:6 + d]
        z = blk[:, 6 + d:7 + d]
        alpha, _, _, _, _ = _chunk_alphas(mu, con, op, px, py)
        log1m = jnp.log1p(-alpha)
        incl = _prefix_scan(log1m) + logT[...]
        w = alpha * jnp.exp(incl - log1m)  # [CHUNK, P]
        # D is tiny (3-4): per-channel broadcast-FMA lane reductions beat a
        # lane-padded MXU matmul by ~40x utilization
        acc_img[...] += jnp.stack(
            [jnp.sum(w * col[:, j:j + 1], axis=0) for j in range(d)], axis=-1
        )
        acc_a[...] += jnp.sum(w, axis=0, keepdims=True).T
        acc_d[...] += jnp.sum(w * z, axis=0, keepdims=True).T
        logT[...] = incl[_CHUNK - 1:, :]

    @pl.when(last)
    def _():
        t_final = jnp.exp(logT[...])  # [1, P]
        img_ref[0, :, :] = acc_img[...] + t_final.T * bg_ref[0, :][None, :]
        alpha_ref[0, :, :] = acc_a[...]
        depth_ref[0, :, :] = acc_d[...]
        logt_ref[0, :, :] = logT[...]


def _stream_bwd_kernel(n_tx: int, ts: int, n_slots: int, d: int, meta_ref,
                       vals_ref, bg_ref, logt_ref,
                       gimg_ref, galpha_ref, gdepth_ref,
                       dvals_ref,
                       suf_log, suf_S):
    """Reverse-order single sweep over the chunk stream (see
    _bwd_kernel_chunked's docstring for the suffix algebra)."""
    s = pl.program_id(0)
    c = n_slots - 1 - s
    t = meta_ref[0, c]
    rank_off = meta_ref[1, c]
    cnt = meta_ref[2, c]
    # first chunk processed for this tile == the tile's LAST chunk
    first = jnp.logical_or(
        s == 0, meta_ref[0, jnp.minimum(c + 1, n_slots - 1)] != t
    )
    dtype = jnp.float32
    px, py = _pixel_coords(t, ts, n_tx, dtype)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1), 0)

    @pl.when(first)
    def _():
        suf_log[...] = jnp.zeros_like(suf_log)
        suf_S[...] = jnp.zeros_like(suf_S)

    dvals_ref[...] = jnp.zeros_like(dvals_ref)

    @pl.when(rank_off < cnt)
    def _():
        gimg = gimg_ref[0]  # [P, D]
        galpha = galpha_ref[0][:, 0]
        gdepth = gdepth_ref[0][:, 0]
        bg = bg_ref[0, :]
        logT_total = logt_ref[0]  # [1, P]
        base_S = jnp.exp(logT_total) * jnp.sum(
            gimg * bg[None, :], axis=-1
        )[None, :]

        blk = vals_ref[...]
        mu = blk[:, 0:2]
        con = blk[:, 2:5]
        op = jnp.where(row_iota + rank_off < cnt, blk[:, 5:6], 0.0)
        col = blk[:, 6:6 + d]
        z = blk[:, 6 + d:7 + d]
        alpha, raw, power, dx, dy = _chunk_alphas(mu, con, op, px, py)
        log1m = jnp.log1p(-alpha)
        U = _suffix_scan(log1m) + suf_log[...]
        T_excl = jnp.exp(logT_total - U)
        w = alpha * T_excl
        # dld[c, p] = sum_d col[c, d] * gimg[p, d] (+ depth/alpha terms):
        # broadcast-FMA per channel on the VPU (D tiny)
        dld = z * gdepth[None, :] + galpha[None, :]
        for j in range(d):
            dld = dld + col[:, j:j + 1] * gimg[:, j][None, :]
        wd = w * dld
        S = (_suffix_scan(wd) - wd) + suf_S[...] + base_S
        one_minus = jnp.maximum(1.0 - alpha, 1e-6)
        dalpha = T_excl * dld - S / one_minus
        gate = (raw >= ALPHA_EPS) & (raw < ALPHA_MAX)
        dalpha = jnp.where(gate, dalpha, 0.0)
        dpower = raw * dalpha
        a, b, cc = con[:, 0:1], con[:, 1:2], con[:, 2:3]
        ddx = (-(a * dx + b * dy)) * dpower
        ddy = (-(cc * dy + b * dx)) * dpower
        dmu = jnp.stack(
            [-jnp.sum(ddx, axis=1), -jnp.sum(ddy, axis=1)], axis=-1
        )
        dcon = jnp.stack(
            [
                jnp.sum(-0.5 * dx * dx * dpower, axis=1),
                jnp.sum(-dx * dy * dpower, axis=1),
                jnp.sum(-0.5 * dy * dy * dpower, axis=1),
            ],
            axis=-1,
        )
        dop = jnp.sum(jnp.exp(power) * dalpha, axis=1, keepdims=True)
        dop = jnp.where(row_iota + rank_off < cnt, dop, 0.0)
        dcol = jnp.stack(
            [jnp.sum(w * gimg[:, j][None, :], axis=1) for j in range(d)],
            axis=-1,
        )
        dz = jnp.sum(w * gdepth[None, :], axis=1, keepdims=True)
        dvals_ref[...] = jnp.concatenate([dmu, dcon, dop, dcol, dz], axis=-1)
        suf_log[...] += jnp.sum(log1m, axis=0, keepdims=True)
        suf_S[...] += jnp.sum(wd, axis=0, keepdims=True)


@functools.lru_cache(maxsize=None)
def make_stream_compositor(n_slots: int, n_tiles: int, d: int, ts: int,
                           n_tx: int, interpret: bool = False):
    """Build the stream compositor for (chunk-slot count, tiles, channels,
    tile size) — cached per config.

    Args of the returned fn:
      meta [3, n_slots] i32: rows = (owning tile, rank offset of the chunk's
        first row within the tile, tile's pair count)
      vals [n_slots*_CHUNK, 7+D] packed pair data (mu|con|op|col|z)
      bg [1, D]
    Returns: img [T, P, D], alpha [T, P, 1], depth [T, P, 1]. Output blocks
    of tiles that own no chunk are UNWRITTEN (caller masks empty tiles).
    """
    p = ts * ts
    ch = 7 + d

    # clamp to the last occupied slot (meta row 3): the padding tail of the
    # grid then revisits one block, which Pallas doesn't re-fetch
    vals_spec = pl.BlockSpec(
        (_CHUNK, ch), lambda s, meta: (jnp.minimum(s, meta[3, 0]), 0),
        memory_space=pltpu.VMEM,
    )
    vals_spec_rev = pl.BlockSpec(
        (_CHUNK, ch),
        lambda s, meta: (jnp.minimum(n_slots - 1 - s, meta[3, 0]), 0),
        memory_space=pltpu.VMEM,
    )
    bg_spec = pl.BlockSpec((1, d), lambda s, *_: (0, 0),
                           memory_space=pltpu.VMEM)

    def tile_out_spec(c_):
        return pl.BlockSpec((1, p, c_), lambda s, meta: (meta[0, s], 0, 0),
                            memory_space=pltpu.VMEM)

    def tile_out_spec_rev(c_):
        return pl.BlockSpec(
            (1, p, c_), lambda s, meta: (meta[0, n_slots - 1 - s], 0, 0),
            memory_space=pltpu.VMEM,
        )

    logt_spec = pl.BlockSpec((1, 1, p), lambda s, meta: (meta[0, s], 0, 0),
                             memory_space=pltpu.VMEM)
    logt_spec_rev = pl.BlockSpec(
        (1, 1, p), lambda s, meta: (meta[0, n_slots - 1 - s], 0, 0),
        memory_space=pltpu.VMEM,
    )

    fwd_call = pl.pallas_call(
        functools.partial(_stream_fwd_kernel, n_tx, ts, n_slots, d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_slots,),
            in_specs=[vals_spec, bg_spec],
            out_specs=(tile_out_spec(d), tile_out_spec(1), tile_out_spec(1),
                       logt_spec),
            scratch_shapes=[
                pltpu.VMEM((p, d), jnp.float32),
                pltpu.VMEM((p, 1), jnp.float32),
                pltpu.VMEM((p, 1), jnp.float32),
                pltpu.VMEM((1, p), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, p, d), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.float32),
        ),
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_stream_bwd_kernel, n_tx, ts, n_slots, d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_slots,),
            in_specs=[vals_spec_rev, bg_spec, logt_spec_rev,
                      tile_out_spec_rev(d), tile_out_spec_rev(1),
                      tile_out_spec_rev(1)],
            out_specs=pl.BlockSpec((_CHUNK, ch),
                                   lambda s, *_: (n_slots - 1 - s, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((1, p), jnp.float32),
                pltpu.VMEM((1, p), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_slots * _CHUNK, ch), jnp.float32),
        interpret=interpret,
    )

    @jax.custom_vjp
    def compositor(meta, vals, bg):
        return fwd_call(meta, vals, bg)[:3]

    def fwd(meta, vals, bg):
        img, alpha, depth, logt = fwd_call(meta, vals, bg)
        return (img, alpha, depth), (meta, vals, bg, logt)

    def bwd(res, g):
        meta, vals, bg, logt = res
        gimg, galpha, gdepth = g
        dvals = bwd_call(meta, vals, bg, logt, gimg, galpha, gdepth)
        return None, dvals, jnp.zeros_like(bg)

    compositor.defvjp(fwd, bwd)
    return compositor


# ---------------------------------------------------------------------------
# Tile-grid compositor: grid = TILES (not chunk slots), each grid step runs
# an inner emit_pipeline over its tile's chunk run in the flat chunk-padded
# pair array (double-buffered DMA handled by the pipeline machinery). vs the
# stream compositor (one grid step per 128-pair chunk) this roughly halves
# grid steps at trained-scene occupancy AND hides per-chunk DMA latency
# behind compute — the per-grid-step overhead (~1.6 us) that dominated the
# stream kernels is paid once per TILE, not per chunk.
#
# Mosaic requires DMA block slices to be tile-aligned in the minor two dims
# (lanes % 128, sublanes % 8), so the pair data is stored TRANSPOSED per
# chunk: vals [n_slots, ch16, 128] where ch16 = (7+D) rounded up to 8 —
# block (1, ch16, 128) is fully aligned. The kernel math runs with PIXELS on
# sublanes and PAIRS on lanes ([P, 128] blocks; transmittance scans become
# lane-shift prefix/suffix sums), which needs no in-kernel transpose.
# Backward writes each tile's gradient blocks back out through the same
# pipeline (chunk-padded layout makes every tile's blocks exclusive).
# ---------------------------------------------------------------------------


def _ch16(d: int) -> int:
    return ((7 + d) + 7) // 8 * 8


def _pixel_coords_col(tile_id, ts: int, n_tx: int, dtype):
    """Pixel-center coordinates of a tile's pixels as [P, 1] columns."""
    tx = (tile_id % n_tx).astype(dtype)
    ty = (tile_id // n_tx).astype(dtype)
    i = jax.lax.broadcasted_iota(jnp.int32, (ts * ts, 1), 0)
    cols = (i % ts).astype(dtype)
    rows = (i // ts).astype(dtype)
    px = tx * ts + cols + 0.5
    py = ty * ts + rows + 0.5
    return px, py


def _prefix_scan_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along axis 1 (lanes) by shift-add doubling."""
    n = x.shape[1]
    k = 1
    while k < n:
        zero = jnp.zeros((x.shape[0], k), x.dtype)
        x = x + jnp.concatenate([zero, x[:, :-k]], axis=1)
        k *= 2
    return x


def _suffix_scan_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive suffix sum along axis 1 (lanes) by shift-add doubling."""
    n = x.shape[1]
    k = 1
    while k < n:
        zero = jnp.zeros((x.shape[0], k), x.dtype)
        x = x + jnp.concatenate([x[:, k:], zero], axis=1)
        k *= 2
    return x


# Saturation early-skip threshold: once every pixel of a tile has
# transmittance below this, remaining (deeper) chunks are skipped. The
# reference CUDA rasterizer terminates at T < 1e-4
# (diff-gaussian-rasterization forward.cu); we use 1e-7 so the output
# perturbation stays below the cross-backend invariants (image <= 1e-7,
# depth <= 1e-7 * zfar ~ 1e-5) and skipped pairs' true gradients
# (<= T * dL/dout) are below every grad gate. The skip is applied
# identically in the forward, the backward and the exact-total pre-sweep,
# so saved outputs and replayed sweeps always agree.
_SAT_SKIP_EPS = 1e-7


def _chunk_alphas_T(blk, px, py, lane_ok):
    """alpha [P, 128] from a TRANSPOSED chunk blk [ch16, 128].
    px, py: [P, 1]; lane_ok: [1, 128] bool validity of each pair lane."""
    dx = px - blk[0:1]  # [P, 128]
    dy = py - blk[1:2]
    a, b, c = blk[2:3], blk[3:4], blk[4:5]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    power = jnp.minimum(power, 0.0)
    op = jnp.where(lane_ok, blk[5:6], 0.0)
    raw = op * jnp.exp(power)
    alpha = jnp.minimum(raw, ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)
    return alpha, raw, power, dx, dy


def _prefix_prod_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix PRODUCT along axis 1 (lanes) by shift-mult doubling.

    Linear-space transmittance: underflow flushes to 0 exactly where the
    tile is fully saturated (T < 1e-38 -> contributions below f32 anyway),
    which removes every log1p/exp from the scan path. 1-alpha >= 0.01 so
    no element is ever 0 until genuine saturation."""
    n = x.shape[1]
    k = 1
    while k < n:
        one = jnp.ones((x.shape[0], k), x.dtype)
        x = x * jnp.concatenate([one, x[:, :-k]], axis=1)
        k *= 2
    return x


def _mxu_v(blk, d: int):
    """[d+2, 128] value matrix of one transposed chunk: rows = colors,
    ones, depth. One MXU matmul against it accumulates image/alpha/depth
    (forward) or forms dL/dw (backward) in a single pass instead of d+2
    cross-lane reductions / broadcast-FMAs on the VPU."""
    ones = jnp.ones((1, _CHUNK), blk.dtype)
    return jnp.concatenate([blk[6:6 + d], ones, blk[6 + d:7 + d]], axis=0)


def _tilegrid_fwd_kernel(n_tx: int, ts: int, d: int, use_pipeline: bool,
                         mxu_accum: bool,
                         meta_ref,
                         vals_ref, bg_ref,
                         img_ref, alpha_ref, depth_ref,
                         acc_img, acc_a, acc_d, T_carry, cidx):
    """meta [3, T] i32: (chunk-start slot, pair count, n-fit-slots bcast).
    vals [n_slots, ch16, 128] stays in HBM; the tile's chunk run is
    streamed through an inner emit_pipeline. Transmittance is carried in
    LINEAR space (see _prefix_prod_lanes). mxu_accum=True accumulates
    img/alpha/depth with one [P,128]x[128,d+2] MXU matmul per chunk
    (HIGHEST precision) instead of d+2 VPU lane reductions — identical
    math up to f32 reassociation."""
    t = pl.program_id(0)
    ch16 = vals_ref.shape[1]
    start_slot = meta_ref[0, t]
    cnt = meta_ref[1, t]
    n_chunks = (cnt + _CHUNK - 1) // _CHUNK
    dtype = jnp.float32
    px, py = _pixel_coords_col(t, ts, n_tx, dtype)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _CHUNK), 1)

    acc_img[...] = jnp.zeros_like(acc_img)
    acc_a[...] = jnp.zeros_like(acc_a)
    acc_d[...] = jnp.zeros_like(acc_d)
    T_carry[...] = jnp.ones_like(T_carry)
    cidx[0] = 0

    def process(blk, i):
        # blk [ch16, 128]: rows mu_x|mu_y|a|b|c|op|col*d|z|pad
        lane_ok = lane_iota + i * _CHUNK < cnt
        alpha, _, _, _, _ = _chunk_alphas_T(blk, px, py, lane_ok)
        one_minus = 1.0 - alpha  # >= 0.01 (ALPHA_MAX gate)
        incl = _prefix_prod_lanes(one_minus)  # [P, 128]
        excl = jnp.concatenate(
            [jnp.ones((incl.shape[0], 1), incl.dtype), incl[:, :-1]], axis=1
        )
        w = alpha * (T_carry[...] * excl)  # [P, 128]
        if mxu_accum:
            acc = jax.lax.dot_general(
                w, _mxu_v(blk, d), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [P, d+2] = (img | alpha | depth)
            acc_img[...] += acc[:, :d]
            acc_a[...] += acc[:, d:d + 1]
            acc_d[...] += acc[:, d + 1:d + 2]
        else:
            acc_img[...] += jnp.concatenate(
                [
                    jnp.sum(w * blk[6 + j:7 + j], axis=1, keepdims=True)
                    for j in range(d)
                ],
                axis=1,
            )
            acc_a[...] += jnp.sum(w, axis=1, keepdims=True)
            acc_d[...] += jnp.sum(w * blk[6 + d:7 + d], axis=1, keepdims=True)
        T_carry[...] = T_carry[...] * incl[:, _CHUNK - 1:]

    if use_pipeline:
        def chunk_body(blk_ref):
            i = cidx[0]

            @pl.when(jnp.max(T_carry[...]) >= _SAT_SKIP_EPS)
            def _():
                process(blk_ref[0], i)

            cidx[0] = i + 1

        pipeline = pltpu.emit_pipeline(
            chunk_body,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((1, ch16, _CHUNK),
                                   lambda i: (start_slot + i, 0, 0))],
        )

        @pl.when(n_chunks > 0)
        def _():
            pipeline(vals_ref)
    else:  # interpret mode: plain dynamic-index loads (no Mosaic, no DMA)
        def body(i, _):
            @pl.when(jnp.max(T_carry[...]) >= _SAT_SKIP_EPS)
            def _():
                process(vals_ref[start_slot + i], i)

            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    img_ref[0, :, :] = acc_img[...] + T_carry[...] * bg_ref[0, :][None, :]
    alpha_ref[0, :, :] = acc_a[...]
    depth_ref[0, :, :] = acc_d[...]


def _tilegrid_bwd_kernel(n_tx: int, ts: int, d: int, use_pipeline: bool,
                         exact_total: bool, mxu_accum: bool,
                         meta_ref,
                         vals_ref, bg_ref,
                         img_ref, alpha_ref, depth_ref,
                         gimg_ref, galpha_ref, gdepth_ref,
                         dvals_ref,
                         T_carry, carry_wd, cidx):
    """FORWARD-sweep backward. The usual back-to-front suffix
    S(r) = sum_{j>r} w_j dLdw_j is rewritten as total_wd - prefix(r),
    where the per-pixel total is either (exact_total=False, default)
    recovered from the SAVED outputs:

      total_wd = (img - T_total*bg).gimg + depth*gdepth + alpha*galpha
      T_total  = 1 - alpha_out

    or (exact_total=True) recomputed by an extra value-only pre-sweep in
    the SAME accumulation order as the gradient sweep's prefix — the
    suffix subtraction then telescopes to ~0 at the saturated tail
    instead of leaving a reconstruction-rounding residue amplified by
    the 1/(1-alpha) factor (up to 100x at ALPHA_MAX).

    Either way the backward needs no residual and no log/exp —
    transmittance is carried forward in linear space exactly like the
    forward kernel.

    Pixels are processed in STATIC blocks of <= 256 rows: the backward
    holds ~15 [P, 128] f32 temporaries live per chunk, which at
    tile_size=32 (P=1024) is an 18+ MB VMEM stack — past the 16 MB
    scoped limit (the r4-measured ts=32 blocker). Each pixel row is
    independent (transmittance runs along the LANE axis), so blocking
    only reassociates the per-pair f32 reductions; at tile_size<=16 a
    single block keeps the original op order bit-exactly."""
    t = pl.program_id(0)
    ch16 = vals_ref.shape[1]
    start_slot = meta_ref[0, t]
    cnt = meta_ref[1, t]
    n_chunks = (cnt + _CHUNK - 1) // _CHUNK
    dtype = jnp.float32
    p = ts * ts
    pb_rows = min(p, 256)
    n_pb = p // pb_rows
    px, py = _pixel_coords_col(t, ts, n_tx, dtype)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _CHUNK), 1)

    T_carry[...] = jnp.ones_like(T_carry)
    carry_wd[...] = jnp.zeros_like(carry_wd)
    cidx[0] = 0

    gimg = gimg_ref[0]  # [P, D]
    galpha = galpha_ref[0]  # [P, 1]
    gdepth = gdepth_ref[0]  # [P, 1]
    bg = bg_ref[0, :]  # [D]
    g_dot_bg = jnp.sum(gimg * bg[None, :], axis=-1, keepdims=True)  # [P,1]
    # cotangent matrix for the MXU dld/dcol path (chunk-independent):
    # columns ordered like _mxu_v's rows (colors | ones->alpha | depth)
    G = jnp.concatenate([gimg, galpha, gdepth], axis=1)  # [P, d+2]

    def block_value(blk, i, lo):
        """Shared value-path of both sweeps on pixel rows [lo, lo+pb_rows):
        advance (T_carry, carry_wd) and return the block intermediates."""
        sl = slice(lo, lo + pb_rows)
        lane_ok = lane_iota + i * _CHUNK < cnt
        alpha, raw, power, dx, dy = _chunk_alphas_T(
            blk, px[sl], py[sl], lane_ok)
        one_minus = 1.0 - alpha
        incl = _prefix_prod_lanes(one_minus)
        excl = jnp.concatenate(
            [jnp.ones((incl.shape[0], 1), incl.dtype), incl[:, :-1]], axis=1
        )
        T_excl = T_carry[sl] * excl
        w = alpha * T_excl
        if mxu_accum:
            dld = jax.lax.dot_general(
                G[sl], _mxu_v(blk, d), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [PB, 128]
        else:
            dld = blk[6 + d:7 + d] * gdepth[sl] + galpha[sl]  # [PB, 128]
            for jj in range(d):
                dld = dld + blk[6 + jj:7 + jj] * gimg[sl, jj:jj + 1]
        wd = w * dld
        pre_wd = _prefix_scan_lanes(wd) + carry_wd[sl]  # inclusive prefix
        T_carry[sl] = T_carry[sl] * incl[:, _CHUNK - 1:]
        carry_wd[sl] = pre_wd[:, _CHUNK - 1:]
        return (lane_ok, alpha, raw, power, dx, dy, one_minus, T_excl, w,
                dld, pre_wd)

    if exact_total:
        # ---- sweep 1: values only, same op order as sweep 2 ----
        def pre_process(blk, i):
            for pb in range(n_pb):
                block_value(blk, i, pb * pb_rows)

        if use_pipeline:
            def pre_body(blk_ref):
                i = cidx[0]

                @pl.when(jnp.max(T_carry[...]) >= _SAT_SKIP_EPS)
                def _():
                    pre_process(blk_ref[0], i)

                cidx[0] = i + 1

            pre_pipeline = pltpu.emit_pipeline(
                pre_body,
                grid=(n_chunks,),
                in_specs=[pl.BlockSpec((1, ch16, _CHUNK),
                                       lambda i: (start_slot + i, 0, 0))],
            )

            @pl.when(n_chunks > 0)
            def _():
                pre_pipeline(vals_ref)
        else:
            def pre_loop(i, _):
                @pl.when(jnp.max(T_carry[...]) >= _SAT_SKIP_EPS)
                def _():
                    pre_process(vals_ref[start_slot + i], i)

                return 0

            jax.lax.fori_loop(0, n_chunks, pre_loop, 0)

        total_wd = carry_wd[...] * 1.0  # snapshot before reset
        base_S = (T_carry[...] * 1.0) * g_dot_bg
        T_carry[...] = jnp.ones_like(T_carry)
        carry_wd[...] = jnp.zeros_like(carry_wd)
        cidx[0] = 0
    else:
        img_out = img_ref[0]  # [P, D]
        alpha_out = alpha_ref[0]  # [P, 1]
        depth_out = depth_ref[0]  # [P, 1]
        T_total = 1.0 - alpha_out  # [P, 1]
        total_wd = (
            jnp.sum((img_out - T_total * bg[None, :]) * gimg, axis=-1,
                    keepdims=True)
            + depth_out * gdepth
            + alpha_out * galpha
        )  # [P, 1]
        base_S = T_total * g_dot_bg

    def process(blk, i):
        a, b, cc = blk[2:3], blk[3:4], blk[4:5]
        zrow = jnp.zeros((1, _CHUNK), dtype)
        dmu_x = dmu_y = da = db = dc = dop = zrow
        lane_ok = None
        if mxu_accum:
            wg = jnp.zeros((d + 2, _CHUNK), dtype)
        else:
            dcols = [zrow] * d
            dz = zrow
        for pb in range(n_pb):
            lo = pb * pb_rows
            sl = slice(lo, lo + pb_rows)
            (lane_ok, alpha, raw, power, dx, dy, one_minus, T_excl, w, dld,
             pre_wd) = block_value(blk, i, lo)
            S = (total_wd[sl] - pre_wd) + base_S[sl]
            dalpha = T_excl * dld - S / one_minus
            gate = (raw >= ALPHA_EPS) & (raw < ALPHA_MAX)
            dalpha = jnp.where(gate, dalpha, 0.0)
            dpower = raw * dalpha
            ddx = (-(a * dx + b * dy)) * dpower
            ddy = (-(cc * dy + b * dx)) * dpower
            # per-pair rows [1,128]: reductions over pixels (sublanes, ax 0)
            dmu_x = dmu_x - jnp.sum(ddx, axis=0, keepdims=True)
            dmu_y = dmu_y - jnp.sum(ddy, axis=0, keepdims=True)
            da = da + jnp.sum(-0.5 * dx * dx * dpower, axis=0, keepdims=True)
            db = db + jnp.sum(-dx * dy * dpower, axis=0, keepdims=True)
            dc = dc + jnp.sum(-0.5 * dy * dy * dpower, axis=0, keepdims=True)
            dop = dop + jnp.sum(jnp.exp(power) * dalpha, axis=0,
                                keepdims=True)
            if mxu_accum:
                wg = wg + jax.lax.dot_general(
                    G[sl], w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [d+2, 128]: rows = dcol_0..dcol_{d-1}, (unused), dz
            else:
                dcols = [
                    dcols[jj] + jnp.sum(w * gimg[sl, jj:jj + 1], axis=0,
                                        keepdims=True)
                    for jj in range(d)
                ]
                dz = dz + jnp.sum(w * gdepth[sl], axis=0, keepdims=True)
        dop = jnp.where(lane_ok, dop, 0.0)
        if mxu_accum:
            dcols = [wg[jj:jj + 1] for jj in range(d)]
            dz = wg[d + 1:d + 2]
        rows = [dmu_x, dmu_y, da, db, dc, dop] + dcols + [dz]
        n_pad = ch16 - (7 + d)
        # d=1 (label render) has ch16 == 7+d: Mosaic rejects zero-sized
        # vector types, so only append a pad block when it is non-empty
        if n_pad:
            rows.append(jnp.zeros((n_pad, _CHUNK), dtype))
        return jnp.concatenate(rows, axis=0)  # [ch16, 128]

    if use_pipeline:
        def chunk_body(blk_ref, dblk_ref):
            i = cidx[0]
            sat = jnp.max(T_carry[...]) >= _SAT_SKIP_EPS

            @pl.when(sat)
            def _():
                dblk_ref[0] = process(blk_ref[0], i)

            # dvals blocks live in HBM and are only ever written by this
            # pipeline — a skipped chunk must still write ZEROS or
            # uninitialized memory reaches the upstream scatter-add
            @pl.when(jnp.logical_not(sat))
            def _():
                dblk_ref[0] = jnp.zeros((ch16, _CHUNK), dtype)

            cidx[0] = i + 1

        def fwd_index(i):
            return (start_slot + i, 0, 0)

        pipeline = pltpu.emit_pipeline(
            chunk_body,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((1, ch16, _CHUNK), fwd_index)],
            out_specs=[pl.BlockSpec((1, ch16, _CHUNK), fwd_index)],
        )

        @pl.when(n_chunks > 0)
        def _():
            pipeline(vals_ref, dvals_ref)
    else:  # interpret mode: direct dynamic-index loads/stores
        def body(i, _):
            sat = jnp.max(T_carry[...]) >= _SAT_SKIP_EPS

            @pl.when(sat)
            def _():
                dvals_ref[start_slot + i] = process(
                    vals_ref[start_slot + i], i)

            @pl.when(jnp.logical_not(sat))
            def _():
                dvals_ref[start_slot + i] = jnp.zeros(
                    (ch16, _CHUNK), dtype)

            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.lru_cache(maxsize=None)
def make_tilegrid_compositor(n_slots: int, n_tiles: int, d: int, ts: int,
                             n_tx: int, interpret: bool = False,
                             exact_total: bool = False,
                             mxu_accum: bool = False):
    """Build the tile-grid compositor (grid over tiles, inner emit_pipeline
    over each tile's chunk run). `exact_total` selects the two-sweep
    backward (see _tilegrid_bwd_kernel). Interface:

      meta [3, n_tiles] i32: (chunk-start slot, pair count, fit-slot count
        broadcast — slots >= meta[2,0] belong to no fitting tile and their
        gradient blocks are masked to zero in the vjp)
      vals [n_slots, ch16, 128] packed pair data, chunk-padded AND
        transposed per chunk (rows = mu_x|mu_y|a|b|c|op|col*D|z|pad)
      bg [1, D]
    Returns: img [T, P, D], alpha [T, P, 1], depth [T, P, 1]. Tiles with
    count 0 write bg / 0 outputs directly."""
    p = ts * ts
    ch16 = _ch16(d)

    # Pin the flat pair array to HBM explicitly: with memory_space=ANY,
    # Mosaic places it in VMEM whenever it fits (<16 MB) and then
    # DOUBLE-BUFFERS it per grid step — at tile_size=32 the [n_slots,16,128]
    # array is ~9.4 MB, x2 = 18.2 MB > scoped VMEM, which was the r3
    # "ts=32 infeasible" blocker (val_runs/tile_ab_r3 note in STATUS).
    # The kernels stream chunks through emit_pipeline themselves, so HBM
    # residency is always what we want. (interpret mode has no HBM notion.)
    vals_space = pl.ANY if interpret else pltpu.MemorySpace.HBM
    vals_spec = pl.BlockSpec(memory_space=vals_space)
    bg_spec = pl.BlockSpec((1, d), lambda t, meta: (0, 0),
                           memory_space=pltpu.VMEM)

    def out_spec(c_):
        return pl.BlockSpec((1, p, c_), lambda t, meta: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    fwd_call = pl.pallas_call(
        functools.partial(_tilegrid_fwd_kernel, n_tx, ts, d, not interpret,
                          mxu_accum),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[vals_spec, bg_spec],
            out_specs=(out_spec(d), out_spec(1), out_spec(1)),
            scratch_shapes=[
                pltpu.VMEM((p, d), jnp.float32),
                pltpu.VMEM((p, 1), jnp.float32),
                pltpu.VMEM((p, 1), jnp.float32),
                pltpu.VMEM((p, 1), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, p, d), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.float32),
        ),
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_tilegrid_bwd_kernel, n_tx, ts, d, not interpret,
                          exact_total, mxu_accum),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[vals_spec, bg_spec,
                      out_spec(d), out_spec(1), out_spec(1),
                      out_spec(d), out_spec(1), out_spec(1)],
            out_specs=pl.BlockSpec(memory_space=vals_space),
            scratch_shapes=[
                pltpu.VMEM((p, 1), jnp.float32),
                pltpu.VMEM((p, 1), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_slots, ch16, _CHUNK), jnp.float32),
        interpret=interpret,
    )

    @jax.custom_vjp
    def compositor(meta, vals, bg):
        return fwd_call(meta, vals, bg)

    def fwd(meta, vals, bg):
        img, alpha, depth = fwd_call(meta, vals, bg)
        return (img, alpha, depth), (meta, vals, bg, img, alpha, depth)

    def bwd(res, g):
        meta, vals, bg, img, alpha, depth = res
        gimg, galpha, gdepth = g
        dvals = bwd_call(meta, vals, bg, img, alpha, depth,
                         gimg, galpha, gdepth)
        # blocks beyond the fitting tiles' chunk runs were never written by
        # any grid step (empty tiles own no slots; overflowed tiles are
        # zero-count) — zero them so the upstream gather-VJP scatter-add
        # doesn't inject uninitialized memory into real gradients
        s = jax.lax.broadcasted_iota(jnp.int32, (dvals.shape[0], 1, 1), 0)
        dvals = jnp.where(s < meta[2, 0], dvals, 0.0)
        return None, dvals, jnp.zeros_like(bg)

    compositor.defvjp(fwd, bwd)
    return compositor


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
