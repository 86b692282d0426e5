"""Multi-scene STAGE DRIVER: the full static-stage training loop for S
videos in lockstep on a (scene, data) mesh.

The reference parallelizes across videos with one SLURM job per video
(train.sh:13-19); `parallel/multi_scene.py` provides the per-iteration
step; this module provides the stage loop around it — frame scheduling,
densify/prune/opacity-reset cadence, capacity growth, the entropy-end
prune + label-phase rewind, per-phase model re-init and per-scene artifact
saving (train_static semantics, trainers/train_static.py:16-207) — so S
videos' static stages cost one video's wall-clock on an SxD mesh.

Lockstep semantics: every scene shares the schedule (Config), iteration
counter and capacity; per-scene degrees of freedom are the frame sets,
RNG streams, nerf++ extents (via the exact xyz_lr_mult factor + traced
densify extents) and the resulting models. Scenes with different numbers
of static phases are handled per phase: each phase stacks only the scenes
that have it (phases re-init from COLMAP points, so stacking is per-phase
by construction).

Equivalence: with matching seeds the lockstep run reproduces S individual
`train_static` runs (tests/test_multi_scene_real.py::TestSceneTrainer).
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.config import Config
from egogaussian_tpu.data.readers import stack_cameras
from egogaussian_tpu.models import adam_init, from_points
from egogaussian_tpu.models.densify import (
    densify_and_prune,
    prune_by_opacity,
    reset_opacity,
)
from egogaussian_tpu.models.gaussians import (
    GaussianAux,
    GaussianParams,
    _empty_params,
    save_ply,
)
from egogaussian_tpu.parallel.multi_scene import (
    multi_scene_coarse_step,
    multi_scene_fine_all_step,
    multi_scene_fine_step,
    multi_scene_static_step,
    stack_scenes,
    unstack_scenes,
)
from egogaussian_tpu.train.common import (
    auto_tile_config,
    pick_backend,
    render_label_image,
)
from egogaussian_tpu.train.static import (
    StaticPhaseResult,
    _label_stack,
    _log_dropped_pairs,
    _split_by_is_object,
)
from egogaussian_tpu.utils.console import CONSOLE


@dataclasses.dataclass
class SceneInput:
    """One video's static-stage inputs (the per-scene arguments of
    train_static)."""
    cameras: Sequence
    points: np.ndarray
    colors: np.ndarray
    static_phase_frames: List[List[int]]
    cameras_extent: float
    save_dir: Optional[str] = None
    seed: int = 0


# ---------------------------------------------------------------------------
# vmapped maintenance ops (densify / reset / prune) over the scene axis.
# extent is TRACED here (static in the single-scene _densify_jit) so scenes
# with different nerf++ radii share one compilation.
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=(
        "max_grad", "min_opacity", "max_screen_size", "percent_dense",
        "which_object",
    ),
)
def _densify_scenes(models, opt_states, keys, extents, *, max_grad,
                    min_opacity, max_screen_size, percent_dense,
                    which_object=None):
    def one(m, o, k, e):
        return densify_and_prune(
            m, o, k, max_grad=max_grad, min_opacity=min_opacity, extent=e,
            max_screen_size=max_screen_size, percent_dense=percent_dense,
            which_object=which_object,
        )

    return jax.vmap(one)(models, opt_states, keys, extents)


_reset_opacity_scenes = jax.jit(
    jax.vmap(reset_opacity, in_axes=(0, 0)), static_argnames=()
)
_reset_opacity_scenes_obj = jax.jit(
    jax.vmap(lambda m, o: reset_opacity(m, o, which_object=1),
             in_axes=(0, 0))
)


def _select_scenes(active, new, old):
    """Per-scene select over stacked pytrees: scene i keeps `old` where
    active[i] is False (used to freeze scenes whose frame sequence is
    shorter than the lockstep's — their step/densify results are computed
    but discarded)."""
    act = jnp.asarray(active)
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            act.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
        ),
        new, old,
    )
_prune_opacity_scenes = jax.jit(
    lambda ms, os_, min_opacity: jax.vmap(
        lambda m, o: prune_by_opacity(m, o, min_opacity=min_opacity)
    )(ms, os_),
    static_argnames=("min_opacity",),
)


def ensure_capacity_scenes(models, opt_states, min_free: Optional[int] = None):
    """Stacked twin of models.gaussians.ensure_capacity: grows the SHARED
    capacity (axis 1 of every [S, C, ...] leaf) when any scene runs low on
    dead slots. Padding uses the same NaN-safe per-field defaults."""
    alive = np.asarray(models.aux.alive)  # [S, C]
    S, C = alive.shape
    n_max = int(alive.sum(axis=1).max())
    if min_free is None:
        min_free = max(C // 8, 256)
    if C - n_max >= min_free:
        return models, opt_states, False

    fresh = _empty_params(C, models.sh_degree)  # safe defaults, [C, ...]

    def pad_params(name, x):
        f = jnp.broadcast_to(
            getattr(fresh, name)[None], (S,) + getattr(fresh, name).shape
        )
        return jnp.concatenate([x, f], axis=1)

    params = GaussianParams(**{
        f.name: pad_params(f.name, getattr(models.params, f.name))
        for f in dataclasses.fields(models.params)
    })

    def pad0(x):
        return jnp.concatenate(
            [x, jnp.zeros((S, C) + x.shape[2:], x.dtype)], axis=1
        )

    aux = GaussianAux(
        alive=pad0(models.aux.alive),
        generation=pad0(models.aux.generation),
        is_object=pad0(models.aux.is_object),
        max_radii2d=pad0(models.aux.max_radii2d),
        xyz_gradient_accum=pad0(models.aux.xyz_gradient_accum),
        denom=pad0(models.aux.denom),
    )
    new_models = dataclasses.replace(models, params=params, aux=aux)
    new_opts = dataclasses.replace(
        opt_states,
        mu=jax.tree_util.tree_map(pad0, opt_states.mu),
        nu=jax.tree_util.tree_map(pad0, opt_states.nu),
    )
    return new_models, new_opts, True


def _pad_batch(batch, f_max: int):
    """Pad a FrameBatch to f_max frames by repeating frame 0 (padded
    indices are never sampled — per-scene frame stacks hold real indices
    only)."""
    f = batch.num_frames
    if f == f_max:
        return batch

    def pad(x):
        if not hasattr(x, "shape") or x.ndim == 0 or x.shape[0] != f:
            return x
        reps = jnp.repeat(x[:1], f_max - f, axis=0)
        return jnp.concatenate([x, reps], axis=0)

    return jax.tree_util.tree_map(pad, batch)


def train_background_scenes(
    scene_inputs: Sequence[SceneInput],
    cfg: Config,
    mesh,
    train_frame_idxs: Sequence[List[int]],
    backend: str = "auto",
    dilate_size: int = 5,
):
    """Stage 1.2 for S scenes in lockstep (train_background twin,
    trainers/train_static_bg.py:23-173): interaction mask =
    dilate(hand | obj), std + entropy schedule, final 0.5-opacity prune.
    Returns the per-scene background models."""
    assert not cfg.opt.random_background
    from egogaussian_tpu.data.readers import dilate_mask
    from egogaussian_tpu.models.gaussians import ensure_capacity

    S = len(scene_inputs)
    bp = cfg.static_bg
    opt_cfg = cfg.opt
    total_iters = bp.std_train_iter + bp.entropy_reg_iter
    n_data = mesh.shape["data"]
    fb = max(bp.frame_batch, 1)
    if fb % n_data:
        fb = ((fb + n_data - 1) // n_data) * n_data
    if S % mesh.shape["scene"]:
        raise ValueError(
            f"{S} scenes not divisible by scene axis {mesh.shape['scene']}"
        )

    rngs = [np.random.RandomState(s.seed) for s in scene_inputs]
    keys = [jax.random.PRNGKey(s.seed) for s in scene_inputs]

    per_scene = []
    for s in scene_inputs:
        cams = [s.cameras[j] for j in train_frame_idxs[len(per_scene)]]
        b = stack_cameras(cams)
        int_masks = np.stack([
            dilate_mask(
                np.maximum(np.asarray(c.hand_mask), np.asarray(c.obj_mask)),
                iterations=dilate_size,
            )
            for c in cams
        ]).astype(np.uint8)
        per_scene.append((cams, b, int_masks))
    f_max = max(b.num_frames for _, b, _ in per_scene)
    batches = stack_scenes([_pad_batch(b, f_max) for _, b, _ in per_scene])
    gmasks = stack_scenes([
        jnp.asarray(np.concatenate(
            [m, np.repeat(m[:1], f_max - m.shape[0], axis=0)]
        ) if m.shape[0] < f_max else m)
        for _, _, m in per_scene
    ])

    grown = []
    cap = 0
    for s in scene_inputs:
        m = from_points(
            s.points, s.colors, sh_degree=cfg.model.sh_degree,
            spatial_lr_scale=1.0, seed=s.seed,
        )
        cap = max(cap, m.capacity)
        grown.append(m)
    models_l = []
    for m in grown:
        o = adam_init(m.params)
        while m.capacity < cap:
            m, o, _ = ensure_capacity(m, o, min_free=m.capacity + 1)
        models_l.append((m, o))
    models = stack_scenes([m for m, _ in models_l])
    opts = stack_scenes([o for _, o in models_l])
    extents = jnp.asarray(
        [s.cameras_extent for s in scene_inputs], jnp.float32
    )
    tile_cfg = max(
        (auto_tile_config(m, b.camera(0))
         for (m, _), (_, b, _) in zip(models_l, per_scene)),
        key=lambda t: t.max_pairs,
    )
    backend_r = pick_backend(tile_cfg, backend)
    CONSOLE.log(
        f"[bg-scenes] {S} scenes x {f_max} frames, {total_iters} iters, "
        f"capacity {cap}, frame batch {fb}"
    )

    drop = jnp.zeros(S, jnp.int32)
    last_drop = 0
    for it in range(1, total_iters + 1):
        fidxs = np.stack([
            rngs[i].randint(per_scene[i][1].num_frames, size=fb)
            .astype(np.int32)
            for i in range(S)
        ])
        mode = "std" if it <= bp.std_train_iter else "entropy"
        models, opts, loss, radii, drop = multi_scene_static_step(
            models, opts, batches, jnp.asarray(fidxs), gmasks,
            jnp.int32(it), drop, xyz_lr_mult=extents, mesh=mesh, mode=mode,
            lambda_dssim=opt_cfg.lambda_dssim, backend=backend_r,
            tile_config=tile_cfg, opt_cfg=opt_cfg,
        )
        if it % opt_cfg.densification_interval == 0:
            worst = int(jnp.max(drop))
            if worst > last_drop:
                from egogaussian_tpu.train.common import (
                    maybe_regrow_tile_config,
                )
                ms = unstack_scenes(models, S)
                merged = tile_cfg
                for m, (_, b, _) in zip(ms, per_scene):
                    c2, _, ch = maybe_regrow_tile_config(
                        m, b.camera(0), merged, worst, last_drop,
                        "bg-scenes",
                    )
                    if ch:
                        merged = c2
                if merged != tile_cfg:
                    tile_cfg = merged
                    drop = jnp.zeros_like(drop)
                    last_drop = 0
                else:
                    last_drop = worst
        if it <= bp.densify_until_iter:
            if (it > bp.densify_from_iter
                    and it % opt_cfg.densification_interval == 0):
                size_threshold = (
                    20.0 if it > opt_cfg.opacity_reset_interval else None
                )
                subs = []
                for i in range(S):
                    keys[i], sub = jax.random.split(keys[i])
                    subs.append(sub)
                res = _densify_scenes(
                    models, opts, jnp.stack(subs), extents,
                    max_grad=opt_cfg.densify_grad_threshold,
                    min_opacity=0.005,
                    max_screen_size=size_threshold,
                    percent_dense=opt_cfg.percent_dense,
                )
                models, opts = res.model, res.opt_state
                overflow = np.asarray(res.overflow)
                if overflow.any():
                    CONSOLE.log(
                        f"[bg-scenes] it {it}: densify overflow "
                        f"{overflow.tolist()}"
                    )
                models, opts, grew = ensure_capacity_scenes(models, opts)
                if grew:
                    ms = unstack_scenes(models, S)
                    tile_cfg = max(
                        (auto_tile_config(m, b.camera(0))
                         for m, (_, b, _) in zip(ms, per_scene)),
                        key=lambda t: t.max_pairs,
                    )
            if it % opt_cfg.opacity_reset_interval == 0:
                models, opts = _reset_opacity_scenes(models, opts)
        if it == total_iters:
            models, opts, n_pruned = _prune_opacity_scenes(
                models, opts, min_opacity=0.5
            )
            CONSOLE.log(
                f"[bg-scenes] final prune: "
                f"{np.asarray(n_pruned).tolist()} removed"
            )

    _log_dropped_pairs("bg-scenes", None, int(jnp.max(drop)))
    out = []
    for i, m in enumerate(unstack_scenes(models, S)):
        m = dataclasses.replace(
            m, spatial_lr_scale=float(scene_inputs[i].cameras_extent)
        )
        if scene_inputs[i].save_dir:
            save_ply(m, os.path.join(
                scene_inputs[i].save_dir, "static_bg.ply"))
        out.append(m)
    return out


@dataclasses.dataclass
class CoarseSceneInput:
    """One video's coarse-stage inputs (the per-scene arguments of
    estimate_coarse_obj_pose)."""
    cameras: Sequence
    obj_model: object  # GaussianModel: the stage-1 object split
    static_phase_frames: List[List[int]]
    dynamic_phase_frames: List[List[int]]
    cameras_extent: float
    save_dir: Optional[str] = None
    seed: int = 0


def train_coarse_scenes(
    scene_inputs: Sequence[CoarseSceneInput],
    cfg: Config,
    mesh,
    backend: str = "auto",
):
    """Stage 2 for S scenes in lockstep on the `scene` mesh axis
    (estimate_coarse_obj_pose twin, trainers/coarse_obj_pose.py:88-369).

    The coarse stage is sequential in FRAMES within a video (each frame's
    pose chains off the accumulated previous poses), so the reference
    cannot parallelize inside a video — but S videos' frame solves are
    independent, and this driver runs all scenes' k-th frame slot
    simultaneously: per-iteration flags the single-scene driver bakes in
    statically (train_pose / first_frame / grad_params) become per-scene
    traced scalars of `multi_scene_coarse_step`, per-scene RNG streams
    reproduce each scene's own frame-selection sequence, and scenes whose
    videos have fewer frame slots are frozen (results computed but
    discarded via where-select) for the lockstep's tail.

    Per-scene nerf++ extents are exact: models train at
    spatial_lr_scale=1 with the extent folded into xyz_lr_mult (the LR is
    linear in it); densify extents are traced. Capacities and binning
    configs are shared (max over scenes, like the other lockstep
    drivers). With matching seeds this reproduces S individual
    estimate_coarse_obj_pose runs (tests/test_multi_scene_coarse.py).

    Resume granularity is the stage (pose sequences are saved after every
    solved slot, but mid-stage model state is not checkpointed — the
    single-scene driver remains the choice for frame-granular resume).

    Returns per-scene (pose_seq, refined object model, solved_names).
    """
    from egogaussian_tpu.models.gaussians import ensure_capacity
    from egogaussian_tpu.models.optim import AdamState
    from egogaussian_tpu.models.pose import (
        empty_pose_sequence,
        identity_pose,
        save_pose_sequence,
    )
    from egogaussian_tpu.train.coarse_pose import _accum_tables

    S = len(scene_inputs)
    cp = cfg.coarse
    if S % mesh.shape["scene"]:
        raise ValueError(
            f"{S} scenes not divisible by scene axis {mesh.shape['scene']}"
        )

    # per-scene slot schedule: one slot per frame solve, phases flattened
    slots: List[List[dict]] = []
    for s in scene_inputs:
        sl = []
        for phase, dyn in enumerate(s.dynamic_phase_frames):
            # append first frame of the next static phase
            # (coarse_obj_pose.py:137)
            frames = list(dyn) + [s.static_phase_frames[phase + 1][0]]
            for k, f_cur in enumerate(frames):
                sl.append(dict(
                    phase=phase, f_cur=f_cur, dyn=list(dyn), k=k,
                    first=(k == 0), last=(k == len(frames) - 1),
                ))
        slots.append(sl)
    n_slots = max(len(sl) for sl in slots)

    batches_l = [stack_cameras(list(s.cameras)) for s in scene_inputs]
    f_max = max(b.num_frames for b in batches_l)
    batches = stack_scenes([_pad_batch(b, f_max) for b in batches_l])
    mask_nonempty = [
        np.asarray(
            jnp.sum(b.obj_masks.astype(jnp.int32), axis=(1, 2, 3)) > 0
        )
        for b in batches_l
    ]

    # shared capacity; per-scene spatial_lr_scale folded into xyz_lr_mult
    cap = max(s.obj_model.capacity for s in scene_inputs)
    grown = []
    for s in scene_inputs:
        m = dataclasses.replace(s.obj_model, spatial_lr_scale=1.0)
        o = adam_init(m.params)
        while m.capacity < cap:
            m, o, _ = ensure_capacity(m, o, min_free=m.capacity + 1)
        grown.append(m)
    models = stack_scenes(grown)
    xyz_mult = jnp.asarray(
        [s.obj_model.spatial_lr_scale for s in scene_inputs], jnp.float32
    )
    extents = jnp.asarray(
        [s.cameras_extent for s in scene_inputs], jnp.float32
    )
    tile_cfg = max(
        (auto_tile_config(m, b.camera(0))
         for m, b in zip(grown, batches_l)),
        key=lambda t: t.max_pairs,
    )
    backend_r = pick_backend(tile_cfg, backend)

    pose_seqs = [empty_pose_sequence(b.num_frames) for b in batches_l]
    solved: List[Dict[int, str]] = [dict() for _ in scene_inputs]
    rngs = [np.random.RandomState(s.seed) for s in scene_inputs]
    drop = jnp.zeros(S, jnp.int32)
    last_drop = 0
    eyeT = jnp.eye(4, dtype=jnp.float32)
    eyeR = jnp.eye(3, dtype=jnp.float32)
    CONSOLE.log(
        f"[coarse-scenes] {S} scenes, {n_slots} frame slots x "
        f"{cp.total_num_iter} iters, capacity {cap}"
    )

    for slot in range(n_slots):
        active = np.array([slot < len(sl) for sl in slots])
        info = [sl[slot] if a else None for sl, a in zip(slots, active)]

        # identity-prefixed accumulated-transform tables, padded to f_max+1
        tT_l, tR_l = [], []
        for i in range(S):
            T, R = _accum_tables(pose_seqs[i])
            pad = f_max + 1 - T.shape[0]
            if pad:
                T = jnp.concatenate([T, jnp.tile(eyeT[None], (pad, 1, 1))])
                R = jnp.concatenate([R, jnp.tile(eyeR[None], (pad, 1, 1))])
            tT_l.append(T)
            tR_l.append(R)
        tTs, tRs = jnp.stack(tT_l), jnp.stack(tR_l)

        # previous-frame sampling pools (static 1x, solved dynamic 2x,
        # nonempty object mask only — coarse_obj_pose.py:196-222)
        pools, weights = [], []
        for i in range(S):
            if not active[i]:
                pools.append([0])
                weights.append(np.array([1.0]))
                continue
            d, s = info[i], scene_inputs[i]
            pool = list(s.static_phase_frames[d["phase"]])
            w = [1.0] * len(pool)
            for g in d["dyn"]:
                if g < d["f_cur"] and g in solved[i]:
                    pool.append(g)
                    w.append(2.0)
            ok = mask_nonempty[i]
            pool2 = [p for p in pool if ok[p]]
            w2 = np.array(
                [wi for p, wi in zip(pool, w) if ok[p]], np.float64
            )
            pools.append(pool2)
            weights.append(w2 / w2.sum())

        # fresh per-slot optimizer states (single-scene: fresh per frame)
        poses = stack_scenes([identity_pose() for _ in range(S)])
        pose_opts = stack_scenes(
            [adam_init(identity_pose()) for _ in range(S)]
        )
        zeros = jax.tree_util.tree_map(jnp.zeros_like, models.params)
        opts = AdamState(mu=zeros, nu=zeros, count=jnp.zeros(S, jnp.int32))
        keys = [
            jax.random.PRNGKey(
                scene_inputs[i].seed * 1000
                + (info[i]["f_cur"] if active[i] else 0)
            )
            for i in range(S)
        ]
        ff = np.array(
            [bool(active[i] and info[i]["first"]) for i in range(S)]
        )

        for it in range(1, cp.total_num_iter + 1):
            cams = np.zeros(S, np.int32)
            tps = np.zeros(S, bool)
            fixed = np.full(S, -1, np.int32)  # -1 -> identity table row
            for i in range(S):
                if not active[i]:
                    continue
                d, s, rng = info[i], scene_inputs[i], rngs[i]
                if it == 1:
                    c, tp = s.static_phase_frames[0][0], False
                elif rng.rand() <= cp.curr_vpt_prob:
                    nxt = s.static_phase_frames[d["phase"] + 1]
                    c = nxt[rng.randint(len(nxt))] if d["last"] else d["f_cur"]
                    tp = True
                else:
                    c = pools[i][rng.choice(len(pools[i]), p=weights[i])]
                    tp = False
                cams[i], tps[i] = c, tp
                fixed[i] = (d["f_cur"] - 1) if tp else c

            nm, no, nps, npo, loss, radii, ndrop = multi_scene_coarse_step(
                models, opts, poses, pose_opts, batches,
                jnp.asarray(cams), tTs, tRs, jnp.asarray(fixed),
                jnp.int32(it), drop, jnp.asarray(tps), jnp.asarray(ff),
                grad_params=bool(ff.any()) or it >= cp.warm_up_iter,
                xyz_lr_mult=xyz_mult, mesh=mesh, opt_cfg=cfg.opt,
                coarse_cfg=cp, backend=backend_r, tile_config=tile_cfg,
            )
            models = _select_scenes(active, nm, models)
            opts = _select_scenes(active, no, opts)
            poses = _select_scenes(active, nps, poses)
            pose_opts = _select_scenes(active, npo, pose_opts)
            drop = jnp.where(jnp.asarray(active), ndrop, drop)

            if it % cp.densification_interval == 0:
                worst = int(jnp.max(drop))
                if worst > last_drop:
                    from egogaussian_tpu.train.common import (
                        maybe_regrow_tile_config,
                    )
                    ms = unstack_scenes(models, S)
                    merged = tile_cfg
                    for m, b in zip(ms, batches_l):
                        c2, _, ch = maybe_regrow_tile_config(
                            m, b.camera(0), merged, worst, last_drop,
                            "coarse-scenes",
                        )
                        if ch:
                            merged = c2
                    if merged != tile_cfg:
                        tile_cfg = merged
                        drop = jnp.zeros_like(drop)
                        last_drop = 0
                    else:
                        last_drop = worst

            # densification window (coarse_obj_pose.py:324-337)
            if it < cp.densify_until_iter and it > cp.densify_from_iter:
                if it % cp.densification_interval == 0:
                    size_threshold = (
                        20.0 if it > cp.opacity_reset_interval else None
                    )
                    subs = []
                    for i in range(S):
                        if active[i]:
                            keys[i], sub = jax.random.split(keys[i])
                        else:
                            sub = keys[i]
                        subs.append(sub)
                    res = _densify_scenes(
                        models, opts, jnp.stack(subs), extents,
                        max_grad=cp.densify_grad_threshold,
                        min_opacity=cp.min_opacity,
                        max_screen_size=size_threshold,
                        percent_dense=cfg.opt.percent_dense,
                        which_object=1,
                    )
                    models = _select_scenes(active, res.model, models)
                    opts = _select_scenes(active, res.opt_state, opts)
                    overflow = np.asarray(res.overflow) * active
                    if overflow.any():
                        CONSOLE.log(
                            f"[coarse-scenes] it {it}: densify overflow "
                            f"{overflow.tolist()}"
                        )
                    models, opts, grew = ensure_capacity_scenes(models, opts)
                    if grew:
                        ms = unstack_scenes(models, S)
                        tile_cfg = max(
                            (auto_tile_config(m, b.camera(0))
                             for m, b in zip(ms, batches_l)),
                            key=lambda t: t.max_pairs,
                        )
                if it % cp.opacity_reset_interval == 0:
                    nm, no = _reset_opacity_scenes_obj(models, opts)
                    models = _select_scenes(active, nm, models)
                    opts = _select_scenes(active, no, opts)

        # write solved deltas back; save artifacts per scene
        poses_l = unstack_scenes(poses, S)
        loss_np = np.asarray(loss)
        for i in range(S):
            if not active[i]:
                continue
            d, s = info[i], scene_inputs[i]
            pose_seqs[i] = pose_seqs[i].update_frame(d["f_cur"], poses_l[i])
            solved[i][d["f_cur"]] = s.cameras[d["f_cur"]].image_name
            CONSOLE.log(
                f"[coarse-scenes] scene {i}: solved frame "
                f"{s.cameras[d['f_cur']].image_name} (slot {slot + 1}), "
                f"loss {loss_np[i]:.4f}"
            )
            if s.save_dir:
                save_pose_sequence(
                    os.path.join(s.save_dir, "obj_pose_sequence.npz"),
                    pose_seqs[i],
                    [c.image_name for c in s.cameras],
                )
                if (d["k"] + 1) % cp.save_ply_every == 0:
                    m = unstack_scenes(models, S)[i]
                    m = dataclasses.replace(
                        m,
                        spatial_lr_scale=s.obj_model.spatial_lr_scale,
                    )
                    save_ply(m, os.path.join(
                        s.save_dir, "ply",
                        f"gaussians_frame{d['f_cur']}.ply",
                    ))

    _log_dropped_pairs("coarse-scenes", None, int(jnp.max(drop)))
    out = []
    for i, m in enumerate(unstack_scenes(models, S)):
        s = scene_inputs[i]
        m = dataclasses.replace(
            m, spatial_lr_scale=s.obj_model.spatial_lr_scale
        )
        if s.save_dir:
            save_ply(m, os.path.join(s.save_dir, "ply", "gaussians_final.ply"))
            save_pose_sequence(
                os.path.join(s.save_dir, "obj_pose_sequence.npz"),
                pose_seqs[i],
                [c.image_name for c in s.cameras],
            )
        out.append((pose_seqs[i], m, solved[i]))
    return out


@dataclasses.dataclass
class FineSceneInput:
    """One LANE's fine_obj-stage inputs (the per-scene arguments of
    fine_tune_obj). A lane is one (video, variant) pair — the pipeline
    runs stage 3 twice per video (from-static / from-coarse,
    fine_obj.py:49-61), and the runs are independent, so both variants of
    every video go into one lockstep."""
    cameras: Sequence
    obj_model: object       # GaussianModel: the lane's base object PLY
    pose_seq: object        # PoseSequence from the coarse stage
    static_phase_frames: List[List[int]]
    dynamic_phase_frames: List[List[int]]
    cameras_extent: float
    save_dir: Optional[str] = None
    seed: int = 0


def _pad_pose_seq(seq, f_max: int):
    """Pad a PoseSequence to f_max frames with identity/unsolved rows
    (padded indices are never sampled)."""
    from egogaussian_tpu.models.pose import PoseSequence

    f = seq.num_frames
    if f == f_max:
        return seq
    pad = f_max - f
    eye = jnp.eye(3, dtype=seq.rotations.dtype)
    return PoseSequence(
        translations=jnp.concatenate(
            [seq.translations, jnp.zeros((pad, 3), seq.translations.dtype)]
        ),
        rotations=jnp.concatenate(
            [seq.rotations, jnp.tile(eye[None], (pad, 1, 1))]
        ),
        solved=jnp.concatenate([seq.solved, jnp.zeros(pad, bool)]),
    )


def train_fine_scenes(
    scene_inputs: Sequence[FineSceneInput],
    cfg: Config,
    mesh,
    backend: str = "auto",
):
    """Stage 3 for S lanes in lockstep on the `scene` mesh axis
    (fine_tune_obj twin, trainers/fine_obj.py:27-237).

    Every lane runs the same fp.total_num_iter schedule, so unlike the
    coarse driver there is no per-scene slot freezing: each iteration
    samples one frame per lane from the lane's own 1:5-weighted pool with
    the lane's own host RNG, and the per-iteration train_pose flag becomes
    a per-lane traced scalar of multi_scene_fine_step. Densify/prune
    (which_object=1), opacity resets, shared capacity growth and
    drop-triggered binning regrowth follow the single-lane cadence. With
    matching seeds this reproduces S individual fine_tune_obj runs
    (tests/test_multi_scene_fine.py).

    Resume granularity is the stage. Returns per-lane
    (pose_seq, fine model)."""
    from egogaussian_tpu.models.gaussians import ensure_capacity
    from egogaussian_tpu.models.pose import (
        ObjectPose,
        save_pose_sequence,
    )

    S = len(scene_inputs)
    fp = cfg.fine
    if S % mesh.shape["scene"]:
        raise ValueError(
            f"{S} lanes not divisible by scene axis {mesh.shape['scene']}"
        )

    batches_l = [stack_cameras(list(s.cameras)) for s in scene_inputs]
    f_max = max(b.num_frames for b in batches_l)
    batches = stack_scenes([_pad_batch(b, f_max) for b in batches_l])

    # per-lane frame pools (static 1x, solved dynamic 5x, fine_obj.py:68-76)
    frames_l, weights_l, dyn_sets = [], [], []
    for s in scene_inputs:
        static_list = [f for ph in s.static_phase_frames for f in ph]
        solved = np.asarray(s.pose_seq.solved)
        dynamic_list = [
            f for ph in s.dynamic_phase_frames for f in ph if solved[f]
        ]
        frames = static_list + dynamic_list
        w = np.array([1.0] * len(static_list) + [5.0] * len(dynamic_list))
        frames_l.append(np.asarray(frames, np.int64))
        weights_l.append(w / w.sum())
        dyn_sets.append(set(dynamic_list))

    # shared capacity; per-lane spatial_lr_scale folded into xyz_lr_mult
    cap = max(s.obj_model.capacity for s in scene_inputs)
    grown = []
    for s in scene_inputs:
        m = dataclasses.replace(s.obj_model, spatial_lr_scale=1.0)
        o = adam_init(m.params)
        while m.capacity < cap:
            m, o, _ = ensure_capacity(m, o, min_free=m.capacity + 1)
        grown.append(m)
    models = stack_scenes(grown)
    opts = stack_scenes([adam_init(m.params) for m in grown])
    xyz_mult = jnp.asarray(
        [s.obj_model.spatial_lr_scale for s in scene_inputs], jnp.float32
    )
    extents = jnp.asarray(
        [s.cameras_extent for s in scene_inputs], jnp.float32
    )
    pose_seqs = stack_scenes(
        [_pad_pose_seq(s.pose_seq, f_max) for s in scene_inputs]
    )
    pose_opts = stack_scenes([
        adam_init(ObjectPose(jnp.zeros(3), jnp.eye(3)[:, :2]))
        for _ in scene_inputs
    ])
    tile_cfg = max(
        (auto_tile_config(m, b.camera(0)) for m, b in zip(grown, batches_l)),
        key=lambda t: t.max_pairs,
    )
    backend_r = pick_backend(tile_cfg, backend)

    rngs = [np.random.RandomState(s.seed) for s in scene_inputs]
    keys = [jax.random.PRNGKey(s.seed) for s in scene_inputs]
    drop = jnp.zeros(S, jnp.int32)
    last_drop = 0
    CONSOLE.log(
        f"[fine-scenes] {S} lanes, {fp.total_num_iter} iters, "
        f"capacity {cap}"
    )

    for it in range(1, fp.total_num_iter + 1):
        cams = np.zeros(S, np.int32)
        tps = np.zeros(S, bool)
        for i in range(S):
            if it == 1:
                cams[i], tps[i] = scene_inputs[i].static_phase_frames[0][0], False
            else:
                c = int(frames_l[i][
                    rngs[i].choice(len(frames_l[i]), p=weights_l[i])
                ])
                cams[i], tps[i] = c, c in dyn_sets[i]

        models, opts, pose_seqs, pose_opts, loss, radii, drop = (
            multi_scene_fine_step(
                models, opts, pose_seqs, pose_opts, batches,
                jnp.asarray(cams), jnp.int32(it), drop, jnp.asarray(tps),
                xyz_lr_mult=xyz_mult, mesh=mesh, opt_cfg=cfg.opt,
                fine_cfg=fp, backend=backend_r, tile_config=tile_cfg,
            )
        )

        if it % fp.densification_interval == 0:
            worst = int(jnp.max(drop))
            if worst > last_drop:
                from egogaussian_tpu.train.common import (
                    maybe_regrow_tile_config,
                )
                ms = unstack_scenes(models, S)
                merged = tile_cfg
                for m, b in zip(ms, batches_l):
                    c2, _, ch = maybe_regrow_tile_config(
                        m, b.camera(0), merged, worst, last_drop,
                        "fine-scenes",
                    )
                    if ch:
                        merged = c2
                if merged != tile_cfg:
                    tile_cfg = merged
                    drop = jnp.zeros_like(drop)
                    last_drop = 0
                else:
                    last_drop = worst

        if it < fp.densify_until_iter and it > fp.densify_from_iter:
            if it % fp.densification_interval == 0:
                size_threshold = (
                    20.0 if it > fp.opacity_reset_interval else None
                )
                subs = []
                for i in range(S):
                    keys[i], sub = jax.random.split(keys[i])
                    subs.append(sub)
                res = _densify_scenes(
                    models, opts, jnp.stack(subs), extents,
                    max_grad=fp.densify_grad_threshold,
                    min_opacity=fp.min_opacity,
                    max_screen_size=size_threshold,
                    percent_dense=cfg.opt.percent_dense,
                    which_object=1,
                )
                models, opts = res.model, res.opt_state
                overflow = np.asarray(res.overflow)
                if overflow.any():
                    CONSOLE.log(
                        f"[fine-scenes] it {it}: densify overflow "
                        f"{overflow.tolist()}"
                    )
                models, opts, grew = ensure_capacity_scenes(models, opts)
                if grew:
                    ms = unstack_scenes(models, S)
                    tile_cfg = max(
                        (auto_tile_config(m, b.camera(0))
                         for m, b in zip(ms, batches_l)),
                        key=lambda t: t.max_pairs,
                    )
            if it % fp.opacity_reset_interval == 0:
                models, opts = _reset_opacity_scenes_obj(models, opts)

    _log_dropped_pairs("fine-scenes", None, int(jnp.max(drop)))
    out = []
    models_l = unstack_scenes(models, S)
    pose_seqs_l = unstack_scenes(pose_seqs, S)
    for i, s in enumerate(scene_inputs):
        m = dataclasses.replace(
            models_l[i], spatial_lr_scale=s.obj_model.spatial_lr_scale
        )
        seq = jax.tree_util.tree_map(
            lambda x: x[: batches_l[i].num_frames], pose_seqs_l[i]
        )
        if s.save_dir:
            save_pose_sequence(
                os.path.join(s.save_dir, "obj_pose_sequence.npz"),
                seq, [c.image_name for c in s.cameras],
            )
            save_ply(m, os.path.join(s.save_dir, "gaussians_fine.ply"))
        out.append((seq, m))
    return out


@dataclasses.dataclass
class FineAllSceneInput:
    """One video's fine_all-stage inputs (the per-scene arguments of
    fine_tune_all)."""
    cameras: Sequence
    obj_model: object       # GaussianModel: the chosen fine_obj variant
    bg_model: object        # GaussianModel: the stage-1.2 background
    pose_seq: object        # interpolated PoseSequence (stage 4 output)
    static_phase_frames: List[List[int]]
    dynamic_phase_frames: List[List[int]]
    save_dir: Optional[str] = None
    seed: int = 0


def train_fine_all_scenes(
    scene_inputs: Sequence[FineAllSceneInput],
    cfg: Config,
    mesh,
    backend: str = "auto",
):
    """Stage 5 for S videos in lockstep on the `scene` mesh axis
    (fine_tune_all twin, trainers/fine_all.py:27-151): object + background
    combined per scene, poses frozen (accumulated tables precomputed),
    1:4-weighted frame sampling per scene, the reference's stray opacity
    clamp applied in-step under the shared schedule flag. No
    densification in this stage, so capacities are fixed by the combine.
    With matching seeds this reproduces S individual fine_tune_all runs
    (tests/test_multi_scene_fine.py). Returns the per-scene final models."""
    from egogaussian_tpu.models.gaussians import combine_models, ensure_capacity

    S = len(scene_inputs)
    ap = cfg.fine_all
    if S % mesh.shape["scene"]:
        raise ValueError(
            f"{S} scenes not divisible by scene axis {mesh.shape['scene']}"
        )

    batches_l = [stack_cameras(list(s.cameras)) for s in scene_inputs]
    f_max = max(b.num_frames for b in batches_l)
    batches = stack_scenes([_pad_batch(b, f_max) for b in batches_l])

    frames_l, weights_l = [], []
    for s in scene_inputs:
        static_list = [f for ph in s.static_phase_frames for f in ph]
        dynamic_list = [f for ph in s.dynamic_phase_frames for f in ph]
        frames = static_list + dynamic_list
        w = np.array([1.0] * len(static_list) + [4.0] * len(dynamic_list))
        frames_l.append(np.asarray(frames, np.int64))
        weights_l.append(w / w.sum())

    combined = [
        combine_models(s.obj_model, s.bg_model) for s in scene_inputs
    ]
    cap = max(m.capacity for m in combined)
    grown = []
    for m in combined:
        m = dataclasses.replace(m, spatial_lr_scale=1.0)
        o = adam_init(m.params)
        while m.capacity < cap:
            m, o, _ = ensure_capacity(m, o, min_free=m.capacity + 1)
        grown.append(m)
    models = stack_scenes(grown)
    opts = stack_scenes([adam_init(m.params) for m in grown])
    xyz_mult = jnp.asarray(
        [s.obj_model.spatial_lr_scale for s in scene_inputs], jnp.float32
    )

    # poses frozen all stage: accumulate once per scene (fine_all.py:151-153)
    def pad_tbl(t, eye):
        pad = f_max - t.shape[0]
        if pad:
            t = jnp.concatenate([t, jnp.tile(eye[None], (pad, 1, 1))])
        return t

    eye4 = jnp.eye(4, dtype=jnp.float32)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    accum_Ts = jnp.stack(
        [pad_tbl(s.pose_seq.accum_T(), eye4) for s in scene_inputs]
    )
    accum_Rs = jnp.stack(
        [pad_tbl(s.pose_seq.accum_R(), eye3) for s in scene_inputs]
    )

    tile_cfg = max(
        (auto_tile_config(m, b.camera(0)) for m, b in zip(grown, batches_l)),
        key=lambda t: t.max_pairs,
    )
    backend_r = pick_backend(tile_cfg, backend)

    rngs = [np.random.RandomState(s.seed) for s in scene_inputs]
    drop = jnp.zeros(S, jnp.int32)
    last_drop = 0
    CONSOLE.log(
        f"[fine_all-scenes] {S} scenes, {ap.total_num_iter} iters, "
        f"capacity {cap}"
    )

    for it in range(1, ap.total_num_iter + 1):
        cams = np.zeros(S, np.int32)
        for i in range(S):
            if it == 1:
                cams[i] = scene_inputs[i].static_phase_frames[0][0]
            else:
                cams[i] = int(frames_l[i][
                    rngs[i].choice(len(frames_l[i]), p=weights_l[i])
                ])
        clamp = (
            ap.densify_from_iter < it < ap.densify_until_iter
            and bool(it % ap.opacity_reset_interval)
        )
        models, opts, loss, drop = multi_scene_fine_all_step(
            models, opts, batches, jnp.asarray(cams), accum_Ts, accum_Rs,
            jnp.int32(it), jnp.asarray(clamp), drop,
            xyz_lr_mult=xyz_mult, mesh=mesh,
            lambda_dssim=ap.lambda_dssim, backend=backend_r,
            tile_config=tile_cfg, opt_cfg=cfg.opt,
        )
        if it % ap.opacity_reset_interval == 0:
            worst = int(jnp.max(drop))
            if worst > last_drop:
                from egogaussian_tpu.train.common import (
                    maybe_regrow_tile_config,
                )
                ms = unstack_scenes(models, S)
                merged = tile_cfg
                for m, b in zip(ms, batches_l):
                    c2, _, ch = maybe_regrow_tile_config(
                        m, b.camera(0), merged, worst, last_drop,
                        "fine_all-scenes",
                    )
                    if ch:
                        merged = c2
                if merged != tile_cfg:
                    tile_cfg = merged
                    drop = jnp.zeros_like(drop)
                    last_drop = 0
                else:
                    last_drop = worst

    _log_dropped_pairs("fine_all-scenes", None, int(jnp.max(drop)))
    out = []
    for i, m in enumerate(unstack_scenes(models, S)):
        s = scene_inputs[i]
        m = dataclasses.replace(
            m, spatial_lr_scale=s.obj_model.spatial_lr_scale
        )
        if s.save_dir:
            save_ply(m, os.path.join(s.save_dir, "gaussians_all.ply"))
        out.append(m)
    return out


def train_static_scenes(
    scene_inputs: Sequence[SceneInput],
    cfg: Config,
    mesh,
    backend: str = "auto",
    first_phase_only: bool = True,
) -> List[List[StaticPhaseResult]]:
    """Stage 1.0 for S scenes in lockstep on `mesh` (axes scene, data; the
    scene axis size must divide S). Returns per-scene lists of
    StaticPhaseResult (train_static twin).

    Notes vs the single-scene driver:
      * the frame batch per scene is max(frame_batch, n_data) — one frame
        per data-axis device minimum;
      * random_background is not supported (assert);
      * mid-stage checkpointing is per-phase-restart granularity (the
        single-scene driver checkpoints every N iterations).
    """
    assert not cfg.opt.random_background, (
        "train_static_scenes: random_background unsupported"
    )
    S = len(scene_inputs)
    sp = cfg.static
    opt_cfg = cfg.opt
    total_iters = sp.std_train_iter + sp.entropy_reg_iter + sp.label_train_iter
    n_data = mesh.shape["data"]
    fb = max(sp.frame_batch, 1)
    if fb % n_data:
        fb = ((fb + n_data - 1) // n_data) * n_data

    n_phases_max = max(len(s.static_phase_frames) for s in scene_inputs)
    if first_phase_only:
        n_phases_max = 1
    results: List[List[StaticPhaseResult]] = [[] for _ in scene_inputs]

    for phase in range(n_phases_max):
        active = [i for i, s in enumerate(scene_inputs)
                  if phase < len(s.static_phase_frames)]
        if len(active) % mesh.shape["scene"]:
            raise ValueError(
                f"phase {phase}: {len(active)} active scenes not divisible "
                f"by scene axis {mesh.shape['scene']} — pad the scene list"
            )
        rngs = {i: np.random.RandomState(scene_inputs[i].seed)
                for i in active}
        keys = {i: jax.random.PRNGKey(scene_inputs[i].seed + phase)
                for i in active}

        # per-scene phase camera stacks, padded to a shared frame count
        per_scene = []
        for i in active:
            s = scene_inputs[i]
            idxs = s.static_phase_frames[phase]
            cams = [s.cameras[j] for j in idxs]
            per_scene.append((i, cams, stack_cameras(cams)))
        f_max = max(b.num_frames for _, _, b in per_scene)
        batches = stack_scenes([_pad_batch(b, f_max) for _, _, b in per_scene])
        gmasks = stack_scenes([
            _pad_batch(b, f_max).hand_masks for _, _, b in per_scene
        ])

        # shared capacity: every scene's init model padded to the max
        models_l, caps = [], []
        for i in active:
            s = scene_inputs[i]
            m = from_points(
                s.points, s.colors, sh_degree=cfg.model.sh_degree,
                spatial_lr_scale=1.0, seed=s.seed,
            )
            models_l.append(m)
            caps.append(m.capacity)
        cap = max(caps)
        from egogaussian_tpu.models.gaussians import ensure_capacity

        grown = []
        for m in models_l:
            o = adam_init(m.params)
            while m.capacity < cap:
                m, o, _ = ensure_capacity(m, o, min_free=m.capacity + 1)
            grown.append((m, o))
        models = stack_scenes([m for m, _ in grown])
        opts = stack_scenes([o for _, o in grown])
        extents = jnp.asarray(
            [scene_inputs[i].cameras_extent for i in active], jnp.float32
        )

        # shared binning capacities: sized for the busiest scene
        tile_cfg = max(
            (auto_tile_config(m, b.camera(0))
             for (m, _), (_, _, b) in zip(grown, per_scene)),
            key=lambda t: t.max_pairs,
        )
        backend_r = pick_backend(tile_cfg, backend)

        stacks = {i: list(range(len(cams))) for i, cams, _ in per_scene}
        mask_valid = {
            i: np.asarray(b.obj_mask_valid) for i, _, b in per_scene
        }
        CONSOLE.log(
            f"[static-scenes] phase {phase}: {len(active)} scenes x "
            f"{f_max} frames, {total_iters} iters, capacity {cap}, "
            f"frame batch {fb}"
        )

        drop = jnp.zeros(len(active), jnp.int32)
        last_drop = 0
        for it in range(1, total_iters + 1):
            fidxs = np.stack([
                np.array([stacks[i][j] for j in
                          rngs[i].randint(len(stacks[i]), size=fb)], np.int32)
                for i in active
            ])
            if it <= sp.std_train_iter:
                mode = "std"
            elif it <= sp.std_train_iter + sp.entropy_reg_iter:
                mode = "entropy"
            else:
                mode = "label"

            models, opts, loss, radii, drop = multi_scene_static_step(
                models, opts, batches, jnp.asarray(fidxs), gmasks,
                jnp.int32(it), drop, xyz_lr_mult=extents, mesh=mesh,
                mode=mode, lambda_dssim=opt_cfg.lambda_dssim,
                backend=backend_r, tile_config=tile_cfg, opt_cfg=opt_cfg,
                label_lr=sp.label_lr,
            )

            if it % opt_cfg.densification_interval == 0:
                worst = int(jnp.max(drop))
                if worst > last_drop:
                    # drop-triggered regrowth of the SHARED binning
                    # capacities: merge each scene's re-estimate (merge only
                    # grows, so chaining configs through the scenes is the
                    # max over scenes)
                    from egogaussian_tpu.train.common import (
                        maybe_regrow_tile_config,
                    )
                    ms = unstack_scenes(models, len(active))
                    merged = tile_cfg
                    for m, (_, _, b) in zip(ms, per_scene):
                        c2, _, ch = maybe_regrow_tile_config(
                            m, b.camera(0), merged, worst, last_drop,
                            "static-scenes",
                        )
                        if ch:
                            merged = c2
                    if merged != tile_cfg:
                        tile_cfg = merged
                        drop = jnp.zeros_like(drop)
                        last_drop = 0
                    else:
                        last_drop = worst

            if it <= sp.densify_until_iter:
                if (it > sp.densify_from_iter
                        and it % opt_cfg.densification_interval == 0):
                    size_threshold = (
                        20.0 if it > opt_cfg.opacity_reset_interval else None
                    )
                    subs = []
                    for i in active:
                        keys[i], sub = jax.random.split(keys[i])
                        subs.append(sub)
                    res = _densify_scenes(
                        models, opts, jnp.stack(subs), extents,
                        max_grad=opt_cfg.densify_grad_threshold,
                        min_opacity=0.005,
                        max_screen_size=size_threshold,
                        percent_dense=opt_cfg.percent_dense,
                    )
                    models, opts = res.model, res.opt_state
                    overflow = np.asarray(res.overflow)
                    if overflow.any():
                        CONSOLE.log(
                            f"[static-scenes] it {it}: densify overflow "
                            f"{overflow.tolist()} (capacity grows next "
                            "interval)"
                        )
                    models, opts, grew = ensure_capacity_scenes(models, opts)
                    if grew:
                        ms = unstack_scenes(models, len(active))
                        tile_cfg = max(
                            (auto_tile_config(m, b.camera(0))
                             for m, (_, _, b) in zip(ms, per_scene)),
                            key=lambda t: t.max_pairs,
                        )
                if it % opt_cfg.opacity_reset_interval == 0:
                    models, opts = _reset_opacity_scenes(models, opts)

            if it == sp.std_train_iter + sp.entropy_reg_iter:
                models, opts, n_pruned = _prune_opacity_scenes(
                    models, opts, min_opacity=0.5
                )
                CONSOLE.log(
                    f"[static-scenes] pruned "
                    f"{np.asarray(n_pruned).tolist()} low-opacity"
                )
                for i in active:
                    s = scene_inputs[i]
                    stacks[i] = _label_stack(
                        stacks[i], phase, len(s.static_phase_frames),
                        sp.rewind_frames, mask_valid[i],
                    )

        _log_dropped_pairs("static-scenes", phase, int(jnp.max(drop)))

        # per-scene post-phase: segmentation split, predicted masks, saves
        for k, (i, cams, b) in enumerate(per_scene):
            s = scene_inputs[i]
            model = unstack_scenes(models, len(active))[k]
            model = dataclasses.replace(
                model, spatial_lr_scale=float(s.cameras_extent)
            )
            model = model.infer_is_object_from_label()
            obj_model, bg_model = _split_by_is_object(model)
            pred_masks: Dict[str, np.ndarray] = {}
            for j, cam_obj in enumerate(cams):
                lbl = render_label_image(
                    model, b.camera(j), backend=backend_r,
                    tile_config=tile_cfg,
                )
                pred_masks[cam_obj.image_name] = (
                    np.asarray(lbl[0]) > 0.5
                ).astype(np.float32)
            if s.save_dir:
                ply_dir = os.path.join(s.save_dir, "ply")
                save_ply(model, os.path.join(
                    ply_dir, f"static_phase{phase}.ply"))
                save_ply(obj_model, os.path.join(
                    ply_dir, f"static_phase{phase}_obj.ply"))
                save_ply(bg_model, os.path.join(
                    ply_dir, f"static_phase{phase}_bg.ply"))
                # predicted-mask PNGs: pipeline resume + stage 1.1 read
                # these (same layout as the single-scene driver)
                mask_dir = os.path.join(s.save_dir, "obj_masks")
                os.makedirs(mask_dir, exist_ok=True)
                try:
                    from PIL import Image

                    for name, msk in pred_masks.items():
                        Image.fromarray(
                            (msk * 255).astype(np.uint8)
                        ).save(os.path.join(mask_dir, f"{name}.png"))
                except ImportError:
                    pass
            results[i].append(StaticPhaseResult(
                model=model, obj_model=obj_model, bg_model=bg_model,
                pred_masks=pred_masks,
            ))
    return results
