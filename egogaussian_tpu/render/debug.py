"""Rasterizer self-diagnosis utilities.

Packages the round-2 investigation tooling as framework infrastructure:
given a scene + camera + TileConfig, these check

  1. the chunk-padded layout (``composite_pallas``'s per-slot ``p_q``
     reconstruction) against the straightforward per-tile gather of
     ``bin_gaussians`` — pair for pair, exact;
  2. the tilegrid compositor's forward and input gradients against a
     dense HIGHEST-precision jnp reference per tile.

No reference twin: the upstream CUDA rasterizer has no runtime
self-check. Used from ``bench.py`` and ad-hoc debugging; runs on CPU
(interpret kernels) or TPU (compiled Mosaic kernels).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.render.pallas_raster import (
    ALPHA_EPS,
    ALPHA_MAX,
    _CHUNK,
    make_tilegrid_compositor,
)
from egogaussian_tpu.render.project import ProjectedGaussians
from egogaussian_tpu.render.tiled import TileConfig, bin_gaussians, bin_pairs


class LayoutReport(NamedTuple):
    n_tiles: int
    mismatched_tiles: int
    max_tile_cnt: int
    multi_chunk_tiles: int
    dropped_pairs: int
    overflowed_tiles: int     # slot-capacity overflow: zero-count in meta


class KernelReport(NamedTuple):
    bad_tiles: int            # tiles whose grads disagree with the reference
    max_fwd_err: float
    max_grad_err_rel: float   # worst per-tile grad err / that tile's scale
    skipped_tiles: int        # deeper than the reference's static padding


def _build_layout(proj: ProjectedGaussians, colors, opacities, width, height,
                  config: TileConfig):
    """Replicates composite_pallas's chunk-padded transposed layout and
    returns (meta, vals, aux dict). Kept in sync with
    render/tiled.py:composite_pallas — intentionally a second copy so the
    production path and the checker cannot share a bug silently."""
    order, g_sorted, tile_sorted, starts, tile_cnt, dropped, (n_tx, n_ty) = \
        bin_pairs(proj, width, height, config, opacities=opacities)
    n_tiles = n_tx * n_ty
    sc = config.max_slots or config.max_pairs
    sc = -(-sc // _CHUNK) * _CHUNK
    n_slots = sc // _CHUNK
    padded_cnt = ((tile_cnt + _CHUNK - 1) // _CHUNK) * _CHUNK
    starts2 = jnp.cumsum(padded_cnt) - padded_cnt
    overflowed = starts2 + padded_cnt > sc
    packed = jnp.concatenate(
        [proj.means2d, proj.conics, opacities[:, None], colors,
         proj.depths[:, None]], axis=1,
    )[order]

    fit_slots = jnp.sum(jnp.where(overflowed, 0, padded_cnt)) // _CHUNK
    meta = jnp.stack([
        jnp.where(overflowed, 0, starts2 // _CHUNK),
        jnp.where(overflowed, 0, tile_cnt),
        jnp.broadcast_to(fit_slots, (n_tiles,)),
    ])
    # scatter layout: each pair's padded slot q_p = starts2[t] + rank, via
    # one tiny scatter + [MP, 3] cummax (start / padded start / clamped run
    # END — the end, unlike the count, is nondecreasing in tile id); padding
    # slots stay zero rows. Mirrors composite_pallas exactly.
    ch = packed.shape[-1]
    ch16 = (ch + 7) // 8 * 8
    if config.scatter_layout:
        rows = jnp.pad(packed, ((0, 0), (0, ch16 - ch)))[g_sorted]
        cols3 = jnp.stack([starts, starts2, starts + tile_cnt], axis=1)
        st3 = jax.lax.cummax(
            jnp.zeros((config.max_pairs, 3), jnp.int32).at[starts].max(
                cols3, mode="drop"),
            axis=0,
        )
        p_idx = jnp.arange(config.max_pairs, dtype=jnp.int32)
        pair_ok = (tile_sorted < n_tiles) & (p_idx < st3[:, 2])
        q_p = jnp.where(pair_ok, st3[:, 1] + (p_idx - st3[:, 0]), sc + p_idx)
        vals = (
            jnp.zeros((sc, ch16), packed.dtype)
            .at[q_p].set(rows, mode="drop", unique_indices=True)
            .reshape(n_slots, _CHUNK, ch16)
            .transpose(0, 2, 1)
        )
    else:
        def stream(vals_t):
            buf = jnp.zeros((sc,), jnp.int32).at[starts2].max(
                vals_t, mode="drop")
            return jax.lax.cummax(buf)

        q = jnp.arange(sc, dtype=jnp.int32)
        a_q = stream(starts)
        b_q = stream(starts2)
        p_q = jnp.clip(a_q + (q - b_q), 0, config.max_pairs - 1)
        vals = jnp.pad(
            packed[g_sorted[p_q]], ((0, 0), (0, ch16 - ch))
        ).reshape(n_slots, _CHUNK, ch16).transpose(0, 2, 1)
    aux = dict(order=order, g_sorted=g_sorted, starts=starts,
               tile_cnt=tile_cnt, dropped=dropped, n_tx=n_tx, n_ty=n_ty,
               packed=packed, ch=ch, ch16=ch16, n_slots=n_slots,
               n_tiles=n_tiles)
    return meta, vals, aux


def check_layout(proj: ProjectedGaussians, colors, opacities, width, height,
                 config: TileConfig) -> LayoutReport:
    """Pair-for-pair comparison of the pallas layout against
    bin_gaussians' per-tile gather."""
    meta, vals, aux = _build_layout(proj, colors, opacities, width, height,
                                    config)
    _, tile_gather, _, _, _ = bin_gaussians(proj, width, height, config,
                                            opacities=opacities)
    tile_gather = np.asarray(tile_gather)
    meta_n = np.asarray(meta)
    vals_n = np.asarray(vals)
    packed_n = np.asarray(aux["packed"])
    raw_cnts = np.asarray(aux["tile_cnt"])
    # production zeroes slot-overflowed tiles in meta (their chunks were
    # never laid out) — compare those against meta's view, not raw counts,
    # and surface them separately so a capacity overflow doesn't read as a
    # layout bug
    cnts = meta_n[1]
    overflowed = int(((raw_cnts > 0) & (cnts == 0)).sum())
    ch, ch16 = aux["ch"], aux["ch16"]
    mismatched = 0
    for t in range(aux["n_tiles"]):
        cnt = int(cnts[t])
        if cnt == 0:
            continue
        start = int(meta_n[0, t])
        n_chunks = (cnt + _CHUNK - 1) // _CHUNK
        run = vals_n[start:start + n_chunks].transpose(0, 2, 1).reshape(
            -1, ch16)[:cnt, :ch]
        ref = packed_n[tile_gather[t, :cnt]]
        if not np.array_equal(run, ref):
            mismatched += 1
    return LayoutReport(
        n_tiles=aux["n_tiles"],
        mismatched_tiles=mismatched,
        max_tile_cnt=int(raw_cnts.max()) if len(raw_cnts) else 0,
        multi_chunk_tiles=int((raw_cnts > _CHUNK).sum()),
        dropped_pairs=int(aux["dropped"]),
        overflowed_tiles=overflowed,
    )


def check_tilegrid_kernel(proj: ProjectedGaussians, colors, opacities,
                          width, height, config: TileConfig,
                          max_chunks: Optional[int] = None,
                          grad_rtol: float = 1e-2,
                          fwd_atol: float = 1e-4,
                          seed: int = 0) -> KernelReport:
    """Forward + input-gradient check of the tilegrid compositor against a
    dense HIGHEST-precision per-tile jnp reference, on this scene's OWN
    layout data (so layout and kernel errors are separable — run
    check_layout first).

    max_chunks sizes the reference's static per-tile padding; by default
    it covers the scene's DEEPEST tile (deep tiles are the prime suspects
    of the divergence this tool exists for), capped at 32 chunks = 4096
    pairs for memory. Deeper tiles are skipped and COUNTED in the report —
    a nonzero skipped_tiles means bad_tiles=0 is not a clean bill."""
    d = colors.shape[-1]
    ts = config.tile_size
    meta, vals, aux = _build_layout(proj, colors, opacities, width, height,
                                    config)
    n_slots, n_tiles, n_tx = aux["n_slots"], aux["n_tiles"], aux["n_tx"]
    ch16 = aux["ch16"]
    meta_n = np.asarray(meta)
    vals_n = np.asarray(vals)
    if max_chunks is None:
        deepest = int(np.asarray(meta_n[1]).max()) if n_tiles else 0
        max_chunks = min(max(-(-deepest // _CHUNK), 1), 32)
    comp = make_tilegrid_compositor(
        n_slots, n_tiles, d, ts, n_tx,
        interpret=jax.default_backend() != "tpu")
    bg = jnp.zeros((1, d), jnp.float32)
    key = jax.random.PRNGKey(seed)
    gi = jax.random.normal(key, (n_tiles, ts * ts, d)) * 1e-3
    ga = jax.random.normal(jax.random.PRNGKey(seed + 1),
                           (n_tiles, ts * ts, 1)) * 1e-3

    def f_k(v):
        img, alpha, _ = comp(meta, v, bg)
        return jnp.sum(img * gi) + jnp.sum(alpha * ga)

    _, gk = jax.jit(jax.value_and_grad(f_k))(vals)
    gk = np.asarray(gk)
    img_k = np.asarray(jax.jit(lambda v: comp(meta, v, bg))(vals)[0])

    px0 = jnp.arange(ts * ts) % ts + 0.5
    py0 = jnp.arange(ts * ts) // ts + 0.5

    @jax.jit
    def ref_tile(run, cnt, tx, ty, gi_t, ga_t):
        def f(run):
            r = jnp.transpose(run, (0, 2, 1)).reshape(-1, ch16)
            ok = jnp.arange(max_chunks * _CHUNK) < cnt
            px = (tx * ts + px0).astype(jnp.float32)
            py = (ty * ts + py0).astype(jnp.float32)
            a, b, c_ = r[:, 2], r[:, 3], r[:, 4]
            op = jnp.where(ok, r[:, 5], 0.0)
            cols = r[:, 6:6 + d]
            dx = px[:, None] - r[:, 0][None, :]
            dy = py[:, None] - r[:, 1][None, :]
            power = jnp.minimum(
                -0.5 * (a * dx**2 + c_ * dy**2) - b * dx * dy, 0.0)
            alpha = jnp.minimum(op * jnp.exp(power), ALPHA_MAX)
            alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)
            om = 1.0 - alpha
            excl = jnp.cumprod(jnp.concatenate(
                [jnp.ones((ts * ts, 1)), om[:, :-1]], axis=1), axis=1)
            w = alpha * excl
            img = jnp.einsum("pn,nd->pd", w, cols,
                             precision=jax.lax.Precision.HIGHEST)
            return (jnp.sum(img * gi_t)
                    + jnp.sum(w.sum(1, keepdims=True) * ga_t), img)

        (val, img), grad = jax.value_and_grad(f, has_aux=True)(run)
        return val, img, grad

    bad = 0
    skipped = 0
    max_ferr = 0.0
    max_gerr = 0.0
    cnts = meta_n[1]  # overflow-zeroed view (matches what the kernel ran)
    for t in range(n_tiles):
        cnt = int(cnts[t])
        if cnt == 0:
            continue
        start = int(meta_n[0, t])
        n_chunks = (cnt + _CHUNK - 1) // _CHUNK
        if n_chunks > max_chunks:
            skipped += 1  # beyond the reference's static padding
            continue
        run = np.zeros((max_chunks, ch16, _CHUNK), np.float32)
        run[:n_chunks] = vals_n[start:start + n_chunks]
        _, img_r, gr = ref_tile(jnp.asarray(run), cnt, t % n_tx, t // n_tx,
                                gi[t], ga[t])
        gr = np.asarray(gr)[:n_chunks]
        gerr = float(np.abs(gk[start:start + n_chunks] - gr).max())
        ferr = float(np.abs(img_k[t] - np.asarray(img_r)).max())
        gsc = float(np.abs(gr).max()) + 1e-20
        max_ferr = max(max_ferr, ferr)
        max_gerr = max(max_gerr, gerr / gsc)
        if gerr > grad_rtol * gsc or ferr > fwd_atol:
            bad += 1
    return KernelReport(bad_tiles=bad, max_fwd_err=max_ferr,
                        max_grad_err_rel=max_gerr, skipped_tiles=skipped)
