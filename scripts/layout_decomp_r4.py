"""Sub-phase decomposition of the tilegrid LAYOUT + BIN costs (the top two
non-kernel items in val_runs/profile_r4.json: gather/transpose 3.5 ms fwd
+ 3.8 ms bwd, bin/sort 4.4 ms of a 22.3 ms step).

Times each sub-op of composite_pallas's prelude as its own jitted function
on the same annealed 480p/100k scene the step profiler uses:

  sort_only           jax.lax.sort of the packed (tile<<g_bits)|g key
  streams_only        the 3 scatter+cummax slot streams over SC
  gather_int          g_sorted[p_q]                    [SC]   i32
  gather_rows         packed[idx]                      [SC, 10] f32
  pad_reshape         jnp.pad to ch16 + reshape        (no transpose)
  transpose           ... + .transpose(0, 2, 1)        (current layout)
  gather_rows_bwd     VJP of gather_rows (scatter-add to [MP, 10])
  full/tight          the whole layout at the auto capacity vs a
                      capacity tightened to the measured pair count
                      (how much of every cost is headroom slack)

Run on TPU:  python scripts/layout_decomp_r4.py
Writes val_runs/layout_decomp_r4.json (one JSON object, also printed).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--warmup_train", type=int, default=300)
    ap.add_argument("--out", default="val_runs/layout_decomp_r4.json")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _scene
    from egogaussian_tpu.config import Config
    from egogaussian_tpu.data import make_synthetic_video, stack_cameras
    from egogaussian_tpu.models import adam_init
    from egogaussian_tpu.models.optim import adam_update, gaussian_lr_tree
    from egogaussian_tpu.render.project import project_gaussians
    from egogaussian_tpu.render.tiled import TileConfig, bin_pairs
    from egogaussian_tpu.render.pallas_raster import _CHUNK
    from egogaussian_tpu.train.common import (
        auto_tile_config, image_loss, mask_grad, model_colors, pick_backend,
        render_gaussians,
    )

    model = _scene(a.n)
    vid = make_synthetic_video(
        width=a.width, height=a.height, n_bg=128, n_obj=32,
        frames_static=2, frames_dynamic=1,
    )
    batch = stack_cameras(vid.cameras[:4])
    cfg = Config()
    opt_state = adam_init(model.params)
    lr_tree = gaussian_lr_tree(
        model.params, jnp.int32(100), cfg.opt, 1.0, label_lr=0.0
    )
    tile_cfg = auto_tile_config(model, batch.camera(0), headroom=1.5)
    backend = pick_backend(tile_cfg, "auto")
    cam = batch.camera(0)
    _, gt, hand, _ = batch.frame(0)
    bg = jnp.zeros(3)

    @jax.jit
    def train_step(model, opt_state, fidx):
        cam_i, gt_i, hand_i, _ = batch.frame(fidx)

        def loss_fn(params):
            m = dataclasses.replace(model, params=params)
            res = render_gaussians(m, cam_i, bg, tile_config=tile_cfg,
                                   backend=backend)
            return image_loss(mask_grad(res.image, hand_i), gt_i, 0.2)

        loss, grads = jax.value_and_grad(loss_fn)(model.params)
        new_params, new_opt = adam_update(model.params, grads, opt_state,
                                          lr_tree)
        return dataclasses.replace(model, params=new_params), new_opt, loss

    model, opt_state, loss = train_step(model, opt_state, jnp.int32(0))
    jax.block_until_ready(loss)
    for i in range(a.warmup_train):
        model, opt_state, loss = train_step(model, opt_state,
                                            jnp.int32(i % 4))
    jax.block_until_ready(loss)

    def timed(fn, *args, n_iter=a.iters):
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / n_iter * 1e3  # ms

    params = model.params
    alive = model.aux.alive
    opac = model.opacity

    def proj_of(p):
        return project_gaussians(
            p.xyz, dataclasses.replace(model, params=p).covariance(),
            cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height, valid_mask=alive,
        )

    # ---- materialize the binning inputs/outputs ONCE (device-resident
    # constants for the sub-op timings, so each timing excludes upstream) --
    pr = jax.jit(proj_of)(params)
    o_masked = jnp.where(alive, opac, 0.0)
    order_c, g_sorted_c, tile_sorted_c, starts_c, tile_cnt_c, dropped_c, \
        (n_tx, n_ty) = jax.jit(
            lambda pr, o: bin_pairs(pr, cam.width, cam.height, tile_cfg,
                                    opacities=o))(pr, o_masked)
    n_tiles = int(n_tx) * int(n_ty)  # host ints: arange stop must be concrete
    pairs_total = int(jnp.sum(tile_cnt_c))
    packed_c = jax.jit(lambda p, pr, o: jnp.concatenate(
        [pr.means2d, pr.conics, o[:, None],
         model_colors(dataclasses.replace(model, params=p)),
         pr.depths[:, None]], axis=1)[order_c])(params, pr, o_masked)

    ms = {}

    # ---- the sort alone (tile_id/g key reconstruction is free: use the
    # already-sorted keys re-shuffled — sort cost is data-independent) ----
    g_bits = max(1, (a.n - 1).bit_length())
    perm = np.random.RandomState(0).permutation(tile_cfg.max_pairs)
    key_shuffled = jnp.asarray(
        (np.asarray(tile_sorted_c, np.int64)[perm] << g_bits)
        | np.asarray(g_sorted_c, np.int64)[perm]).astype(jnp.int32)
    ms["sort_only"] = timed(jax.jit(jax.lax.sort), key_shuffled)

    # ---- binary-search range finder alone ----
    def ranges_of(tile_sorted):
        t_keys = jnp.arange(n_tiles + 1, dtype=jnp.int32)
        lo = jnp.zeros_like(t_keys)
        hi = jnp.full_like(t_keys, tile_cfg.max_pairs)
        for _ in range(max(1, (tile_cfg.max_pairs + 1).bit_length())):
            mid = (lo + hi) // 2
            active = lo < hi
            go = (tile_sorted[mid] < t_keys) & active
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(active & ~go, mid, hi)
        return lo

    ms["ranges_only"] = timed(jax.jit(ranges_of), tile_sorted_c)

    # ---- slot streams + index chain (scatter + cummax x3) ----
    sc = tile_cfg.max_slots or tile_cfg.max_pairs
    sc = -(-sc // _CHUNK) * _CHUNK
    n_slots = sc // _CHUNK
    padded_cnt_c = ((tile_cnt_c + _CHUNK - 1) // _CHUNK) * _CHUNK
    starts2_c = jnp.cumsum(padded_cnt_c) - padded_cnt_c

    def p_q_of(starts, starts2):
        def stream(vals_t):
            buf = jnp.zeros((sc,), jnp.int32).at[starts2].max(
                vals_t, mode="drop")
            return jax.lax.cummax(buf)

        q = jnp.arange(sc, dtype=jnp.int32)
        a_q = stream(starts)
        b_q = stream(starts2)
        return jnp.clip(a_q + (q - b_q), 0, tile_cfg.max_pairs - 1)

    ms["streams_only"] = timed(jax.jit(p_q_of), starts_c, starts2_c)
    p_q_c = jax.jit(p_q_of)(starts_c, starts2_c)

    # ---- the two gathers, separately and chained ----
    ms["gather_int"] = timed(jax.jit(lambda g, p: g[p]), g_sorted_c, p_q_c)
    idx_c = jax.jit(lambda g, p: g[p])(g_sorted_c, p_q_c)
    ms["gather_rows"] = timed(jax.jit(lambda pk, i: pk[i]), packed_c, idx_c)
    vals_flat_c = jax.jit(lambda pk, i: pk[i])(packed_c, idx_c)

    # ---- pad+reshape with and without the chunk transpose ----
    ch = vals_flat_c.shape[-1]
    ch16 = (ch + 7) // 8 * 8

    def pad_reshape(v):
        return jnp.pad(v, ((0, 0), (0, ch16 - ch))).reshape(
            n_slots, _CHUNK, ch16)

    ms["pad_reshape"] = timed(jax.jit(pad_reshape), vals_flat_c)
    ms["pad_reshape_transpose"] = timed(
        jax.jit(lambda v: pad_reshape(v).transpose(0, 2, 1)), vals_flat_c)

    # ---- gather straight from a PRE-PADDED packed16 (the pairs-on-
    # sublanes candidate: no transpose, pad cost moves to [N]-sized) ----
    packed16_c = jnp.pad(packed_c, ((0, 0), (0, ch16 - ch)))
    ms["gather_rows16_reshape"] = timed(
        jax.jit(lambda pk, i: pk[i].reshape(n_slots, _CHUNK, ch16)),
        packed16_c, idx_c)

    # ---- backward costs: scatter-add VJPs ----
    cot_rows = jnp.asarray(
        np.random.RandomState(1).randn(*vals_flat_c.shape), jnp.float32)
    ms["gather_rows_bwd"] = timed(
        jax.jit(jax.grad(lambda pk: jnp.vdot(pk[idx_c], cot_rows))),
        packed_c)
    cot_t = jnp.asarray(np.random.RandomState(2).randn(
        n_slots, ch16, _CHUNK), jnp.float32)
    ms["transpose_bwd_extra"] = timed(
        jax.jit(jax.grad(lambda pk: jnp.vdot(
            jnp.pad(pk[idx_c], ((0, 0), (0, ch16 - ch))).reshape(
                n_slots, _CHUNK, ch16).transpose(0, 2, 1), cot_t))),
        packed_c) - ms["gather_rows_bwd"]
    # unsort scatter (packed = concat(...)[order] VJP back to N rows)
    cot_n = jnp.asarray(
        np.random.RandomState(3).randn(*packed_c.shape), jnp.float32)
    ms["unsort_bwd"] = timed(
        jax.jit(jax.grad(lambda x: jnp.vdot(x[order_c], cot_n))),
        jnp.asarray(np.random.RandomState(4).randn(a.n, ch), jnp.float32))

    # ---- capacity sensitivity: the same ops at a capacity tightened to
    # the measured pair count (how much is pure headroom slack) ----
    mp_t = max(4096, -(-int(pairs_total * 1.15) // 16384) * 16384)
    padded_total = int(jnp.sum(padded_cnt_c))
    sc_t = max(4096, -(-int(padded_total * 1.15) // 16384) * 16384)
    sc_t = -(-sc_t // _CHUNK) * _CHUNK
    tight = {"max_pairs": mp_t, "max_slots": sc_t}
    key_t = key_shuffled[:mp_t]
    ms["sort_only_tight"] = timed(jax.jit(jax.lax.sort), key_t)
    idx_t = idx_c[:sc_t]
    ms["gather_rows_tight"] = timed(
        jax.jit(lambda pk, i: pk[i]), packed_c, idx_t)
    cot_rows_t = cot_rows[:sc_t]
    ms["gather_rows_bwd_tight"] = timed(
        jax.jit(jax.grad(lambda pk: jnp.vdot(pk[idx_t], cot_rows_t))),
        packed_c)

    # ---- CANDIDATE REPLACEMENTS for vals = packed[g_sorted[p_q]] ----
    # (a) two-stage ROW gather: packed[g_sorted] then [p_q] — swaps the
    # pathological 1D int32 gather for a row gather of the same length
    ms["two_stage_rows"] = timed(
        jax.jit(lambda pk, g, p: pk[g][p]), packed16_c[: a.n], g_sorted_c,
        p_q_c)
    # (b) SCATTER layout: per-pair padded slot q_p = p + shift(tile(p)),
    # shift built with the tiny-scatter+cummax trick on the PAIR axis;
    # rows scattered straight into the padded [SC, ch] layout (padding
    # slots stay zero rows = op 0 = exact no-ops in every kernel)
    mp = tile_cfg.max_pairs

    def pair_slots():
        """Per-pair padded slot (or mp -> dropped): three NONDECREASING
        per-tile values (start, padded start, clamped run END = start+cnt
        — cnt itself is not monotone) scattered at each tile's first pair
        index, one [MP, 3] cummax."""
        cols = jnp.stack(
            [starts_c, starts2_c, starts_c + tile_cnt_c], axis=1)
        marks = jnp.zeros((mp, 3), jnp.int32).at[starts_c].max(
            cols, mode="drop")
        st = jax.lax.cummax(marks, axis=0)
        p_idx2 = jnp.arange(mp, dtype=jnp.int32)
        rank = p_idx2 - st[:, 0]
        ok = (tile_sorted_c < n_tiles) & (p_idx2 < st[:, 2])
        # distinct OOB slots for invalid pairs -> unique_indices scatter
        return jnp.where(ok, st[:, 1] + rank, sc + p_idx2)

    def scatter_layout(pk_pairs, q_p):
        return jnp.zeros((sc, pk_pairs.shape[1]), pk_pairs.dtype).at[
            q_p].set(pk_pairs, mode="drop", unique_indices=True)

    def scatter_layout_dup(pk_pairs, q_p):
        return jnp.zeros((sc, pk_pairs.shape[1]), pk_pairs.dtype).at[
            q_p].set(pk_pairs, mode="drop")

    ms["pair_slots_only"] = timed(jax.jit(pair_slots))
    q_p_c = jax.jit(pair_slots)()
    pk_pairs_c = jax.jit(lambda pk, g: pk[g])(packed16_c[: a.n], g_sorted_c)
    ms["shift_plus_scatter"] = timed(
        jax.jit(lambda pk: scatter_layout(pk, pair_slots())), pk_pairs_c)
    ms["shift_plus_scatter_dup"] = timed(
        jax.jit(lambda pk: scatter_layout_dup(pk, pair_slots())), pk_pairs_c)
    ms["scatter_full_chain"] = timed(
        jax.jit(lambda pk, g: scatter_layout(pk[g], pair_slots()).reshape(
            n_slots, _CHUNK, ch16).transpose(0, 2, 1)),
        packed16_c[: a.n], g_sorted_c)
    # current full chain for apples-to-apples
    ms["gather_full_chain"] = timed(
        jax.jit(lambda pk, g, p: jnp.pad(pk[g[p]], (
            (0, 0), (0, ch16 - ch))).reshape(
            n_slots, _CHUNK, ch16).transpose(0, 2, 1)),
        packed_c[: a.n], g_sorted_c, p_q_c)
    # equivalence of the scatter layout vs the gather layout on REAL slots
    v_gather = jax.jit(lambda pk, g, p: pk[g[p]])(
        packed16_c[: a.n], g_sorted_c, p_q_c)
    v_scatter = jax.jit(
        lambda pk, g: scatter_layout(pk[g], q_p_c))(
            packed16_c[: a.n], g_sorted_c)
    # real slots: q < starts2(owner) + cnt(owner); the run-END stream is
    # nondecreasing (cnt alone is not)
    lane_q = jnp.arange(sc, dtype=jnp.int32)
    end_q = jax.lax.cummax(jnp.zeros((sc,), jnp.int32).at[starts2_c].max(
        starts2_c + tile_cnt_c, mode="drop"))
    real = lane_q < end_q
    diff = float(jnp.max(jnp.where(real[:, None], jnp.abs(
        v_gather - v_scatter), 0.0)))
    ms["scatter_vs_gather_maxdiff"] = diff
    # backward of the scatter chain (gather back to [MP] rows)
    cot_sc = jnp.asarray(np.random.RandomState(5).randn(sc, ch16), jnp.float32)
    ms["scatter_bwd"] = timed(
        jax.jit(jax.grad(
            lambda pk: jnp.vdot(scatter_layout(pk, q_p_c), cot_sc))),
        pk_pairs_c)

    out = {
        "shape": f"{a.width}x{a.height}",
        "n_gaussians": a.n,
        "pairs_total": pairs_total,
        "padded_total": padded_total,
        "tile_cfg": {
            "max_pairs": tile_cfg.max_pairs,
            "max_slots": tile_cfg.max_slots,
        },
        "tight_cfg": tight,
        "phase_ms": {k: round(v, 3) for k, v in ms.items()},
    }
    print(json.dumps(out), flush=True)
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
