"""Tiled differentiable rasterizer — the fast XLA path.

TPU-native replacement for the CUDA tile rasterizer in
submodules/diff-gaussian-rasterization (interface pinned by reference
`gaussian_renderer/__init__.py:90-98`). The CUDA design (atomic per-tile
lists, warp-synchronous compositing, early termination) is replaced by a
sort-based, statically-shaped design that XLA maps onto the TPU:

  1. depth-sort Gaussians (stable order within tiles == depth order)
  2. exact pair expansion: each Gaussian emits one pair per overlapped tile;
     pair slots are assigned by exclusive-cumsum offsets into a static
     capacity `max_pairs` (no atomics, no dynamic shapes)
  3. stable sort pairs by tile id; per-tile ranges via searchsorted
  4. per-tile compositing with log-space transmittance: weights
     w_i = alpha_i * exp(cumsum_{j<i} log(1-alpha_j)) — an associative scan
     instead of the CUDA serial loop — and color accumulation as a
     (pixels x M) @ (M x D) matmul on the MXU.

Everything is differentiable by jax.grad (sort/gather indices are integer
side computations), so no hand-written VJP is needed on this path; the
Pallas kernels (render/pallas_raster.py) add a fused custom-VJP fast path.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from egogaussian_tpu.render.oracle import ALPHA_EPS, ALPHA_MAX, RenderOutput
from egogaussian_tpu.render.project import ProjectedGaussians


@dataclasses.dataclass(frozen=True)
class TileConfig:
    tile_size: int = 16
    max_pairs: Optional[int] = None  # default 16 * N
    max_per_tile: int = 1024
    map_batch: int = 64  # tiles composited per lax.map batch
    # Pallas kernel flavor: "tilegrid" (grid over tiles, double-buffered
    # manual chunk DMA) or "stream" (grid over 128-pair chunk slots)
    compositor: str = "tilegrid"
    # Chunk-SLOT capacity (rows of the chunk-padded pair layout the pallas
    # kernels iterate over). Defaults to max_pairs, but the padded total
    # (sum of per-tile 128-rounded counts) and the raw pair total are
    # different quantities — sizing them separately keeps the gather,
    # transpose and kernel-grid costs proportional to the padded ESTIMATE
    # instead of the (larger) sort capacity. Rounded up to 128.
    max_slots: Optional[int] = None
    # tilegrid backward flavor: False = single forward sweep using the
    # per-pixel weighted-gradient total RECONSTRUCTED from the saved
    # outputs; True = an extra pre-sweep recomputes that total in the
    # exact accumulation order of the gradient sweep, so the suffix
    # subtraction telescopes to 0 at the tail (no reconstruction
    # rounding amplified by the 1/(1-alpha) factor). ~+40% bwd kernel
    # time; independent implementation used for cross-verification.
    bwd_exact_total: bool = False
    # tilegrid accumulation flavor: True routes the per-chunk
    # image/alpha/depth accumulation (fwd) and dL/dw + dcol/dz formation
    # (bwd) through single HIGHEST-precision MXU matmuls instead of d+2
    # VPU lane reductions / broadcast-FMAs. Same math up to f32
    # reassociation (equivalence-tested). Default ON since the r5 on-chip
    # A/B (evidence/onchip_r5/mxu_ab.jsonl): 50.2 vs 48.6 it/s @480p/100k with
    # identical forward error vs tiled.
    mxu_accum: bool = True
    # tilegrid layout construction: True scatters each pair's row straight
    # into its padded slot (unique-indices scatter); False reconstructs a
    # per-slot pair index and double-gathers (vals = packed[g_sorted[p_q]]).
    # Same layout bit-for-bit; cost profile differs. On-chip 2x2 A/B
    # (evidence/onchip_r5/layout_ts_ab.jsonl) has the gather chain ahead at both
    # tile sizes (44.6 vs 41.2 it/s at ts16, 48.3 vs 47.4 at ts32), so
    # gather stays the default; the scatter path is kept as a tested
    # fallback (it wins when max_pairs is much larger than max_slots).
    scatter_layout: bool = False


def _default_config(
    n: int, config: Optional[TileConfig], n_tiles: int
) -> TileConfig:
    config = config or TileConfig()
    if config.max_pairs is None:
        mp = max(16 * n, 4096)
        # Chunk-padding floor: the stream compositor lays every nonempty
        # tile out as >= one 128-slot chunk in the same capacity array, so
        # a sparse scene (few pairs, many touched tiles) can need up to
        # 128 * n_tiles slots even when 16N is tiny.
        mp = max(mp, 128 * n_tiles)
        mp = -(-mp // 128) * 128  # stream compositor needs a _CHUNK multiple
        config = dataclasses.replace(config, max_pairs=mp)
    elif config.max_pairs % 128 != 0:
        # User-built configs with a non-_CHUNK-multiple capacity would
        # silently truncate the last partial chunk in composite_pallas's
        # n_slots = max_pairs // 128; round up instead.
        config = dataclasses.replace(
            config, max_pairs=-(-config.max_pairs // 128) * 128
        )
    return config


def _next_pow2(x: int) -> int:
    p = 128
    while p < x:
        p *= 2
    return p


def opacity_aabb_radius(radii, opacities, q_margin: float = 1e-3):
    """Opacity-aware reach radius (pixels) + log-opacity threshold.

    The single definition of "how far can this splat produce alpha >=
    ALPHA_EPS" — used by bin_pairs' pair cull AND render.crop's window
    coverage check, so the two can never disagree. radii = ceil(3*sqrt(
    lambda_max)) from projection, so radii/3 >= sigma_max; the disk that
    can reach alpha >= eps has radius sigma*sqrt(2*ln(op/eps)).

    Returns (r_aabb [N] f32, thr [N] f32). Splats with op < ALPHA_EPS
    (thr < 0) reach nowhere — callers must mask them out separately (the
    clamp only bounds the sqrt argument)."""
    thr = jnp.log(jnp.maximum(opacities, 1e-30) * (1.0 / ALPHA_EPS))
    sigma = radii * (1.0 / 3.0)
    r_aabb = jnp.minimum(
        radii, sigma * jnp.sqrt(jnp.maximum(2.0 * thr + q_margin, 0.0))
    )
    return r_aabb, thr


def estimate_tile_config(
    means2d,
    radii,
    depths,
    width: int,
    height: int,
    tile_size: int = 16,
    headroom: float = 1.5,
    opacities=None,
) -> TileConfig:
    """Host-side auto-tuning of the binning capacities from one projection.

    Every cost in the tiled path (pair sort, per-tile gathers, compositing,
    backward) scales with `max_pairs` and `max_per_tile`; the static 16N /
    1024 defaults are safe but waste 4-8x compute on typical trained scenes
    where splats are small. Call once per training phase (capacities are
    static jit args, so changing them recompiles — rare by design).

    With `opacities`, the estimate uses the same opacity-aware AABB radius
    as bin_pairs' cull, so the capacities track the CULLED pair stream (the
    shrunk AABB is a superset of the exact ellipse-tested pairs, so this
    stays a safe upper bound).
    """
    import numpy as np

    ts = tile_size
    n_tx = -(-width // ts)
    n_ty = -(-height // ts)
    mu = np.asarray(means2d)
    r = np.asarray(radii, np.float32)
    ok = r > 0
    if opacities is not None:
        op = np.asarray(opacities, np.float32).reshape(-1)
        thr = np.log(np.maximum(op, 1e-30) / ALPHA_EPS)
        ok = ok & (op >= ALPHA_EPS)
        r = np.minimum(
            r, (r / 3.0) * np.sqrt(np.maximum(2.0 * thr + 1e-3, 0.0))
        )
    x0 = np.clip(np.floor((mu[:, 0] - r) / ts), 0, n_tx - 1)
    x1 = np.clip(np.floor((mu[:, 0] + r) / ts), 0, n_tx - 1)
    y0 = np.clip(np.floor((mu[:, 1] - r) / ts), 0, n_ty - 1)
    y1 = np.clip(np.floor((mu[:, 1] + r) / ts), 0, n_ty - 1)
    cnt = np.where(ok, (x1 - x0 + 1) * (y1 - y0 + 1), 0).astype(np.int64)
    total = int(cnt.sum())

    # per-tile occupancy via 2D inclusion-exclusion + prefix sums (one
    # np.add.at pass instead of a python loop over gaussians)
    delta = np.zeros((n_ty + 1, n_tx + 1), np.int64)
    xs0, xs1 = x0[ok].astype(int), x1[ok].astype(int)
    ys0, ys1 = y0[ok].astype(int), y1[ok].astype(int)
    np.add.at(delta, (ys0, xs0), 1)
    np.add.at(delta, (ys0, xs1 + 1), -1)
    np.add.at(delta, (ys1 + 1, xs0), -1)
    np.add.at(delta, (ys1 + 1, xs1 + 1), 1)
    tile_cnt = delta.cumsum(0).cumsum(1)[:n_ty, :n_tx]
    # 99.5th-percentile occupancy, not the max: a single pathological tile
    # (whole cluster behind one pixel) would otherwise blow HBM, while
    # truncation only drops the DEEPEST splats of saturated tiles — their
    # transmittance-weighted contribution is negligible past ~1k splats.
    occ = tile_cnt[tile_cnt > 0]
    p_occ = float(np.percentile(occ, 99.5)) if occ.size else 0.0
    max_per_tile = min(_next_pow2(max(int(p_occ * headroom), 128)), 4096)
    # The stream compositor lays tiles out chunk-padded in the same
    # max_pairs-capacity array: size for the padded total too.
    from egogaussian_tpu.render.pallas_raster import _CHUNK as ch  # chunk size
    padded_total = int((-(-np.minimum(tile_cnt, max_per_tile) // ch) * ch).sum())
    # Round capacities to 16k multiples, NOT pow2: binning sort, the pair
    # gather and the kernel grid all scale with these capacities, and pow2
    # rounding on top of the headroom wastes up to 2x of each (measured
    # 5.8 ms gather + 5.6 ms kernel at 53% padding on v5e).
    # max_pairs bounds what pair EXPANSION can emit (raw total);
    # max_slots bounds the chunk-padded layout (padded total) — the two
    # differ by ~50% at trained-scene occupancy, and every downstream cost
    # scales with its own bound.
    max_pairs = max(int(total * headroom), 4096)
    max_pairs = -(-max_pairs // 16384) * 16384
    # Padding (128-rounding per nonempty tile) does NOT scale with pair
    # growth — denser scenes fill their tiles — so budget it additively:
    # future padded total ~= future raw total + today's padding.
    max_slots = max(int(total * headroom) + (padded_total - total), 4096)
    max_slots = -(-max_slots // 16384) * 16384
    return TileConfig(
        tile_size=ts, max_pairs=max_pairs, max_per_tile=max_per_tile,
        max_slots=max_slots,
    )


def bin_pairs(
    proj: ProjectedGaussians, width: int, height: int, config: TileConfig,
    opacities: Optional[jnp.ndarray] = None,
):
    """Exact tile binning at the pair level.

    When `opacities` is given, pairs that provably contribute NOTHING are
    culled with output-identical semantics: every compositor (oracle, tiled,
    pallas) zeroes alpha = op*exp(-Q) < ALPHA_EPS, so a (gaussian, tile)
    pair whose minimum Q over the tile's pixel-center rectangle exceeds
    ln(op/ALPHA_EPS) can never produce a nonzero alpha — or gradient — at
    any pixel of that tile. Two stages (the reference CUDA bins the plain
    3-sigma AABB, submodule row §2.2 — no twin for this cull):
      1. opacity-aware AABB radius min(radii, sigma*sqrt(2 ln(op/eps))):
         shrinks pair EXPANSION (low-opacity splats, e.g. right after an
         opacity reset, span far fewer tiles than their 3-sigma box);
      2. exact conic-vs-tile-rectangle min-Q test per emitted pair: culls
         AABB corner tiles the anisotropic ellipse never touches.
    Both carry a Q-margin of 1e-3 so f32 rounding differences against the
    compositors' own alpha evaluation cannot cull a contributing pair.

    Returns:
      order: [N] depth-sort permutation
      g_sorted: [max_pairs] gaussian index (into depth-sorted arrays) of each
        pair, sorted by tile id (depth order preserved within tiles)
      tile_of_pair: [max_pairs] tile id (n_tiles for invalid pairs)
      starts: [n_tiles] first pair index of each tile
      tile_cnt: [n_tiles] pairs per tile (clamped to max_per_tile)
      dropped: scalar i32, pairs silently lost to static capacities
        (expansion past max_pairs + per-tile clamp past max_per_tile);
        SURVEY §7 hard-part 1 — a dropped Gaussian biases training, so
        the count is surfaced for the trainers to log
      (n_tx, n_ty)
    """
    ts = config.tile_size
    n_tx = -(-width // ts)
    n_ty = -(-height // ts)
    n_tiles = n_tx * n_ty
    n = proj.depths.shape[0]
    dt = proj.means2d.dtype
    Q_MARGIN = 1e-3

    valid = proj.radii > 0
    order = jnp.argsort(jnp.where(valid, proj.depths, jnp.inf))
    # One packed gather instead of two: random-row gathers cost ~9 ns/row on
    # TPU regardless of width, so every extra [N]-gather is ~1 ms at 100k.
    per_g = [proj.means2d, proj.radii.astype(dt)[:, None]]
    if opacities is not None:
        # binning structure is non-differentiable (indices/bools) — make
        # that explicit so no backward graph hangs off the cull math
        opacities = jax.lax.stop_gradient(opacities)
        per_g += [proj.conics, opacities.astype(dt)[:, None]]
    mu_r = jnp.concatenate(per_g, axis=1)[order]
    means2d = mu_r[:, 0:2]
    radii = mu_r[:, 2]
    valid_s = radii > 0

    if opacities is not None:
        op_s = mu_r[:, 6]
        # ln(op/eps): pairs need Q <= thr somewhere in the tile to matter.
        # op < eps contributes nowhere (alpha = op*exp(<=0) <= op < eps).
        r_aabb, thr = opacity_aabb_radius(radii, op_s, q_margin=Q_MARGIN)
        valid_s = valid_s & (op_s >= ALPHA_EPS)
    else:
        r_aabb = radii

    # Tile-space bounding boxes (clamped to the grid)
    x0 = jnp.clip(jnp.floor((means2d[:, 0] - r_aabb) / ts), 0, n_tx - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((means2d[:, 0] + r_aabb) / ts), 0, n_tx - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - r_aabb) / ts), 0, n_ty - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((means2d[:, 1] + r_aabb) / ts), 0, n_ty - 1).astype(jnp.int32)
    tw = jnp.where(valid_s, x1 - x0 + 1, 0)
    th = jnp.where(valid_s, y1 - y0 + 1, 0)
    counts = tw * th  # pairs emitted per Gaussian

    offsets = jnp.cumsum(counts) - counts  # exclusive
    total = offsets[-1] + counts[-1] if n > 0 else jnp.int32(0)

    # Assign pair slot p -> owning Gaussian g. Equivalent to
    # searchsorted(offsets, p, 'right')-1, but jnp.searchsorted's default
    # lowering is a 17-step sequential scan (~250 ms at 1.6M pairs on TPU).
    # Since p = arange is sorted, scatter each (nonzero-count) Gaussian's
    # index at its start slot and take a running max — one scatter + cummax.
    p_idx = jnp.arange(config.max_pairs, dtype=jnp.int32)
    start_slots = jnp.where(counts > 0, offsets, config.max_pairs)
    marks = jnp.zeros((config.max_pairs,), jnp.int32).at[start_slots].max(
        jnp.arange(1, n + 1, dtype=jnp.int32), mode="drop"
    )
    g = jnp.clip(jax.lax.cummax(marks) - 1, 0, n - 1)
    # Per-pair fields via ONE packed [max_pairs]-row gather (offsets/x0/y0/tw
    # separately would be 4 gathers = ~10 ms at 1M pairs). With the ellipse
    # cull the per-gaussian floats ride the same gather; the int columns
    # travel as f32 (exact for values < 2^24 — max_pairs is far below).
    if opacities is not None:
        # int columns travel as floats: exactness needs f32 (23-bit
        # mantissa) and values < 2^24 — a bf16/f16 projection dtype would
        # silently corrupt tile assignments
        assert dt == jnp.float32, f"int-in-f32 pair fields need f32, got {dt}"
        assert config.max_pairs < (1 << 24), "int-in-f32 pair fields"
        gf = jnp.stack(
            [
                offsets.astype(dt), x0.astype(dt), y0.astype(dt),
                tw.astype(dt),
                means2d[:, 0], means2d[:, 1],
                mu_r[:, 3], mu_r[:, 4], mu_r[:, 5],  # conic A, B, C
                thr,
            ],
            axis=1,
        )
        pf = gf[g]  # [MP, 10]
        pair_fields = pf[:, 0:4].astype(jnp.int32)
    else:
        pair_fields = jnp.stack([offsets, x0, y0, tw], axis=1)[g]  # [MP, 4]
    local = p_idx - pair_fields[:, 0]
    pair_ok = p_idx < total
    tw_g = jnp.maximum(pair_fields[:, 3], 1)
    tx = pair_fields[:, 1] + local % tw_g
    ty = pair_fields[:, 2] + local // tw_g
    tile_id = jnp.where(pair_ok, ty * n_tx + tx, n_tiles)  # invalid -> end

    if opacities is not None:
        # Exact min of Q(d) = 0.5*A*dx^2 + B*dx*dy + 0.5*C*dy^2 over this
        # tile's pixel-center rectangle. 0 if the mean is inside; otherwise
        # attained on one of the 4 edges, each a 1D quadratic with a
        # closed-form clamped minimizer (A, C > 0: blur-regularized conic).
        mx, my = pf[:, 4], pf[:, 5]
        A, B, C = pf[:, 6], pf[:, 7], pf[:, 8]
        thr_p = pf[:, 9]
        txf = tx.astype(dt) * ts
        tyf = ty.astype(dt) * ts
        lox, hix = txf + 0.5 - mx, txf + (ts - 0.5) - mx
        loy, hiy = tyf + 0.5 - my, tyf + (ts - 0.5) - my

        def edge_x(X):
            dy = jnp.clip(-B * X / C, loy, hiy)
            return 0.5 * A * X * X + B * X * dy + 0.5 * C * dy * dy

        def edge_y(Y):
            dx = jnp.clip(-B * Y / A, lox, hix)
            return 0.5 * C * Y * Y + B * Y * dx + 0.5 * A * dx * dx

        min_q = jnp.minimum(
            jnp.minimum(edge_x(lox), edge_x(hix)),
            jnp.minimum(edge_y(loy), edge_y(hiy)),
        )
        inside = (lox <= 0) & (hix >= 0) & (loy <= 0) & (hiy >= 0)
        min_q = jnp.where(inside, 0.0, min_q)
        keep = min_q <= thr_p + Q_MARGIN
        tile_id = jnp.where(keep, tile_id, n_tiles)

    # Sort by tile id keeping depth order within each tile. g is already the
    # depth rank, so when (tile_id, g) fits in 31 bits a single packed key
    # sorts both at once (unique keys — no stability needed) with half the
    # data movement of the two-operand stable sort; otherwise fall back.
    g_bits = max(1, (max(n - 1, 1)).bit_length())
    if (n_tiles + 1).bit_length() + g_bits <= 31:
        packed_key = (tile_id << g_bits) | g
        packed_sorted = jax.lax.sort(packed_key)
        tile_sorted = packed_sorted >> g_bits
        g_sorted = packed_sorted & ((1 << g_bits) - 1)
    else:
        tile_sorted, g_sorted = jax.lax.sort(
            (tile_id, g), num_keys=1, is_stable=True
        )

    # Per-tile ranges: tile_sorted is sorted, so starts[t] is a vectorized
    # binary search (lower bound) — a histogram scatter-add over the pair
    # array costs ~3 ms at 262k pairs; this is ~0.1 ms.
    t_keys = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    lo = jnp.zeros_like(t_keys)
    hi = jnp.full_like(t_keys, config.max_pairs)
    n_steps = max(1, (config.max_pairs + 1).bit_length())
    for _ in range(n_steps):
        mid = (lo + hi) // 2
        active = lo < hi  # converged lanes stay put (clipped mid reads)
        go = (tile_sorted[mid] < t_keys) & active
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(active & ~go, mid, hi)
    starts = lo[:n_tiles]
    raw_cnt = lo[1:] - starts
    tile_cnt = jnp.minimum(raw_cnt, config.max_per_tile)
    dropped = jnp.maximum(total - config.max_pairs, 0) + jnp.sum(
        jnp.maximum(raw_cnt - config.max_per_tile, 0)
    )
    return order, g_sorted, tile_sorted, starts, tile_cnt, dropped, (n_tx, n_ty)


def bin_gaussians(
    proj: ProjectedGaussians, width: int, height: int, config: TileConfig,
    opacities: Optional[jnp.ndarray] = None,
):
    """Per-tile gather-matrix view of bin_pairs (used by the XLA tiled
    compositor).

    Returns:
      order: [N] depth-sort permutation
      tile_gather: [n_tiles, max_per_tile] indices into depth-sorted arrays
      tile_mask: [n_tiles, max_per_tile] bool validity
    """
    order, g_sorted, _, starts, tile_cnt, dropped, dims = bin_pairs(
        proj, width, height, config, opacities=opacities
    )
    m_idx = jnp.arange(config.max_per_tile, dtype=jnp.int32)
    gather_pos = jnp.clip(starts[:, None] + m_idx[None, :], 0, config.max_pairs - 1)
    tile_gather = g_sorted[gather_pos]  # [n_tiles, M]
    tile_mask = m_idx[None, :] < tile_cnt[:, None]
    return order, tile_gather, tile_mask, dropped, dims


def composite_tiled(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    bg: jnp.ndarray,
    width: int,
    height: int,
    config: Optional[TileConfig] = None,
) -> RenderOutput:
    """Tiled front-to-back compositing. Same semantics as the oracle."""
    n = proj.depths.shape[0]
    d = colors.shape[-1]
    ts = (config or TileConfig()).tile_size
    n_tiles0 = (-(-width // ts)) * (-(-height // ts))
    config = _default_config(n, config, n_tiles0)

    order, tile_gather, tile_mask, dropped, (n_tx, n_ty) = bin_gaussians(
        proj, width, height, config, opacities=opacities
    )
    # Depth-sorted per-Gaussian data (binning indexes into the sorted arrays)
    means2d = proj.means2d[order]
    conics = proj.conics[order]
    depths = proj.depths[order]
    cols = colors[order]
    ops = opacities[order]

    # In-tile pixel coordinate offsets (row-major within the tile)
    py_off, px_off = jnp.meshgrid(
        jnp.arange(ts, dtype=means2d.dtype) + 0.5,
        jnp.arange(ts, dtype=means2d.dtype) + 0.5,
        indexing="ij",
    )
    px_off = px_off.reshape(-1)  # [ts*ts]
    py_off = py_off.reshape(-1)

    tile_ids = jnp.arange(n_tx * n_ty, dtype=jnp.int32)

    # remat: without it, autodiff through lax.map stacks every tile's [M, P]
    # intermediates (alpha, transmittance, weights) as residuals —
    # O(tiles * M * P) HBM (27 GB at 480p/M=4096) and the bwd pass becomes
    # bandwidth-bound. Recomputing the tile forward is far cheaper.
    @jax.checkpoint
    def composite_one(args):
        tid, idx, mask = args
        tx = (tid % n_tx).astype(means2d.dtype)
        ty = (tid // n_tx).astype(means2d.dtype)
        px = tx * ts + px_off  # [P]
        py = ty * ts + py_off

        mu = means2d[idx]  # [M, 2]
        co = conics[idx]  # [M, 3]
        op = jnp.where(mask, ops[idx], 0.0)  # [M]
        zs = depths[idx]  # [M]
        cl = cols[idx]  # [M, D]

        dx = px[None, :] - mu[:, 0:1]  # [M, P]
        dy = py[None, :] - mu[:, 1:2]
        power = (
            -0.5 * (co[:, 0:1] * dx * dx + co[:, 2:3] * dy * dy)
            - co[:, 1:2] * dx * dy
        )
        power = jnp.minimum(power, 0.0)
        alpha = jnp.minimum(op[:, None] * jnp.exp(power), ALPHA_MAX)
        alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)

        log1m = jnp.log1p(-alpha)  # [M, P]
        excl = jnp.cumsum(log1m, axis=0) - log1m
        w = alpha * jnp.exp(excl)  # [M, P]

        img = jnp.einsum("mp,md->pd", w, cl)  # MXU matmul
        acc_alpha = jnp.sum(w, axis=0)  # [P]
        acc_depth = jnp.einsum("mp,m->p", w, zs)
        t_final = jnp.exp(jnp.sum(log1m, axis=0))  # [P]
        img = img + t_final[:, None] * bg[None, :]
        return img, acc_alpha, acc_depth

    imgs, alphas, depths_img = jax.lax.map(
        composite_one,
        (tile_ids, tile_gather, tile_mask),
        batch_size=min(config.map_batch, n_tx * n_ty),
    )

    image = _untile(imgs, n_tx, n_ty, ts, width, height)
    alpha = _untile(alphas[..., None], n_tx, n_ty, ts, width, height)
    depth = _untile(depths_img[..., None], n_tx, n_ty, ts, width, height)
    return RenderOutput(
        image=image, alpha=alpha, depth=depth, radii=proj.radii,
        dropped_pairs=dropped,
    )


def _untile(x, n_tx, n_ty, ts, width, height):
    """[n_tiles, P, C] (or [n_tiles, P]) -> [C, H, W], cropping tile padding."""
    if x.ndim == 2:
        x = x[..., None]
    c = x.shape[-1]
    x = x.reshape(n_ty, n_tx, ts, ts, c)
    x = x.transpose(0, 2, 1, 3, 4).reshape(n_ty * ts, n_tx * ts, c)
    return x[:height, :width].transpose(2, 0, 1)


def composite_pallas(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    bg: jnp.ndarray,
    width: int,
    height: int,
    config: Optional[TileConfig] = None,
    interpret: Optional[bool] = None,
) -> RenderOutput:
    """Same semantics as composite_tiled, but compositing runs in the fused
    Pallas stream-compositor pair (render/pallas_raster.py). The flat sorted
    pair array is laid out with each tile's run padded to a _CHUNK multiple;
    one grid step composites one chunk into its owning tile's output block.

    Binning and the (single) pair gather stay in XLA so their VJPs
    (scatter-adds back to the N-Gaussian arrays) come for free; per-slot
    tile/rank/start streams are built scatter-free with the same
    tiny-scatter + cummax trick as pair expansion (every scattered stream —
    starts, padded starts, tile index — is nondecreasing in tile id, and the
    owner of a padded slot run is the max colliding tile id)."""
    from egogaussian_tpu.render.pallas_raster import (
        make_stream_compositor,
        make_tilegrid_compositor,
        _CHUNK,
    )

    n = proj.depths.shape[0]
    d = colors.shape[-1]
    ts = (config or TileConfig()).tile_size
    n_tiles0 = (-(-width // ts)) * (-(-height // ts))
    config = _default_config(n, config, n_tiles0)

    order, g_sorted, tile_sorted, starts, tile_cnt, dropped, (n_tx, n_ty) = \
        bin_pairs(proj, width, height, config, opacities=opacities)
    n_tiles = n_tx * n_ty
    # Two independent static capacities: max_pairs bounds the sorted pair
    # array; sc (= n_slots * _CHUNK) bounds the chunk-PADDED layout the
    # kernels iterate over. At trained-scene occupancy the padded total is
    # ~1.5x the raw total, so sharing one capacity would oversize the pair
    # sort by the padding factor (or the layout by the inverse).
    sc = config.max_slots or config.max_pairs
    sc = -(-sc // _CHUNK) * _CHUNK
    n_slots = sc // _CHUNK

    padded_cnt = ((tile_cnt + _CHUNK - 1) // _CHUNK) * _CHUNK
    starts2 = jnp.cumsum(padded_cnt) - padded_cnt  # padded-layout starts
    # Chunk padding rounds every nonempty tile up to a 128-slot multiple;
    # when the padded total exceeds sc the trailing tiles' chunks are never
    # laid out (the scatter below drops them) and their output blocks would
    # come back as uninitialized memory. Detect those tiles, treat them
    # like empty ones (masked to bg below), and count their pairs as
    # dropped so trainers can see it.
    overflowed = starts2 + padded_cnt > sc  # [n_tiles]
    dropped = dropped + jnp.sum(jnp.where(overflowed, tile_cnt, 0))

    packed = jnp.concatenate(
        [
            proj.means2d,
            proj.conics,
            opacities[:, None],
            colors,
            proj.depths[:, None],
        ],
        axis=1,
    )[order]

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def stream(vals_t):
        # per-slot value of the owning tile: scatter at the tile's padded
        # start, take running max (all streams nondecreasing in tile id)
        buf = jnp.zeros((sc,), jnp.int32).at[starts2].max(vals_t, mode="drop")
        return jax.lax.cummax(buf)

    if config.compositor == "tilegrid":
        # Per-TILE meta; overflowed tiles are zero-count so the kernel never
        # DMAs out of bounds, and their (unwritten) gradient slots are
        # masked by the vjp via the fit-slot count in row 2.
        fit_slots = jnp.sum(jnp.where(overflowed, 0, padded_cnt)) // _CHUNK
        meta = jnp.stack([
            jnp.where(overflowed, 0, starts2 // _CHUNK),
            jnp.where(overflowed, 0, tile_cnt),
            jnp.broadcast_to(fit_slots, (n_tiles,)),
        ])
        # SCATTER layout: the former slot->pair double gather
        # (vals = packed[g_sorted[p_q]]) paid ~9 ns/row TWICE per slot —
        # and the inner 1D int32 gather is the single most expensive op of
        # the whole step (2.9 ms of a 22 ms step at 480p/100k; see
        # val_runs/layout_decomp_r4*.json). Instead, compute each PAIR's
        # padded slot directly and scatter rows into the layout once:
        #   q_p = starts2[t] + (p - starts[t])   for pairs inside the
        #         clamped run of a fitting tile, else dropped.
        # The three per-tile values needed (start, padded start, clamped
        # run END — the end, unlike the count, is nondecreasing in tile
        # id) ride one tiny scatter + one [MP, 3] cummax, the same trick
        # bin_pairs uses for pair expansion. Padding slots keep ZERO rows
        # (op 0 => alpha 0): exact no-ops in every kernel flavor.
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
            # invalid pairs get DISTINCT out-of-bounds slots (sc + p) so
            # the scatter can promise unique_indices — without it XLA
            # lowers to the conservative scatter path (~3x slower on TPU)
            q_p = jnp.where(
                pair_ok, st3[:, 1] + (p_idx - st3[:, 0]), sc + p_idx)
            vals = (
                jnp.zeros((sc, ch16), packed.dtype)
                .at[q_p].set(rows, mode="drop", unique_indices=True)
                .reshape(n_slots, _CHUNK, ch16)
                .transpose(0, 2, 1)
            )
        else:
            q = jnp.arange(sc, dtype=jnp.int32)
            a_q = stream(starts)  # starts[owner(q)]
            b_q = stream(starts2)  # starts2[owner(q)]
            p_q = jnp.clip(a_q + (q - b_q), 0, config.max_pairs - 1)
            vals = jnp.pad(
                packed[g_sorted[p_q]], ((0, 0), (0, ch16 - ch))
            ).reshape(n_slots, _CHUNK, ch16).transpose(0, 2, 1)
        compositor = make_tilegrid_compositor(
            n_slots, n_tiles, d, ts, n_tx, interpret=interpret,
            exact_total=config.bwd_exact_total,
            mxu_accum=config.mxu_accum,
        )
    else:
        # stream flavor keeps the original slot->pair gather layout (it
        # needs the per-slot tile/rank streams for its meta anyway)
        q = jnp.arange(sc, dtype=jnp.int32)
        a_q = stream(starts)  # starts[owner(q)]
        b_q = stream(starts2)  # starts2[owner(q)]
        p_q = jnp.clip(a_q + (q - b_q), 0, config.max_pairs - 1)
        vals = packed[g_sorted[p_q]]  # [SC, 7+D]
        t_q = stream(jnp.arange(n_tiles, dtype=jnp.int32))
        t_chunk = t_q[::_CHUNK]
        rank_off = q[::_CHUNK] - b_q[::_CHUNK]
        # row 3: index of the last OCCUPIED chunk slot, broadcast — the
        # kernels clamp their vals-block index map to it so the (up to
        # headroom x) pure-padding tail of the grid re-fetches one block
        # instead of issuing a fresh ~5 KB DMA per step (per-step DMA
        # latency dominates kernel time)
        last_used = jnp.clip(jnp.sum(padded_cnt) // _CHUNK - 1, 0, n_slots - 1)
        meta = jnp.stack([
            t_chunk, rank_off, tile_cnt[t_chunk],
            jnp.full((n_slots,), last_used, jnp.int32),
        ])
        compositor = make_stream_compositor(
            n_slots, n_tiles, d, ts, n_tx, interpret=interpret
        )
    img_t, alpha_t, depth_t = compositor(meta, vals, bg[None, :])
    # Tiles owning no chunk are never written by the kernel: empty tiles
    # and (capacity-overflowed) tiles whose chunk run didn't fit in pc.
    empty = ((tile_cnt == 0) | overflowed)[:, None, None]
    img_t = jnp.where(empty, bg[None, None, :], img_t)
    alpha_t = jnp.where(empty, 0.0, alpha_t)
    depth_t = jnp.where(empty, 0.0, depth_t)
    image = _untile(img_t, n_tx, n_ty, ts, width, height)
    alpha = _untile(alpha_t, n_tx, n_ty, ts, width, height)
    depth = _untile(depth_t, n_tx, n_ty, ts, width, height)
    return RenderOutput(
        image=image, alpha=alpha, depth=depth, radii=proj.radii,
        dropped_pairs=dropped,
    )
