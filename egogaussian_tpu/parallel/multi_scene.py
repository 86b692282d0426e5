"""Multi-scene batched training: several videos in one process, one mesh
row per scene.

The reference parallelizes across videos by launching separate SLURM jobs
(train.sh:13-19, one GPU each); here the same work is a single pjit program
over a (scene, data) mesh: models carry a leading scene axis sharded over
`scene`, each scene's frame batch is data-parallel over `data`, and XLA
keeps all collectives inside the mesh rows (BASELINE.json config 5,
SURVEY.md §2.3 consequence table).

All scenes must share static shapes (Gaussian capacity, image size, frame
count) — pad to the max like any batched workload.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from egogaussian_tpu.data.readers import FrameBatch
from egogaussian_tpu.models.gaussians import GaussianModel
from egogaussian_tpu.models.optim import adam_update
from egogaussian_tpu.parallel.data_parallel import _per_frame_loss
from egogaussian_tpu.train.static import (
    _apply_probe_stats,
    _frames_loss_grads,
    _probe_stats,
    _static_lr_tree,
)


def stack_scenes(items: Sequence):
    """Stack identically-shaped pytrees (models / opt states / FrameBatches)
    along a new leading scene axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *items)


def unstack_scenes(tree, n: int):
    return [
        jax.tree_util.tree_map(lambda x, i=i: x[i], tree) for i in range(n)
    ]


def multi_scene_train_step(
    models: GaussianModel,  # leading scene axis on every leaf
    opt_states,
    batches: FrameBatch,  # [S, F, ...]
    frame_idxs: jnp.ndarray,  # [S, B]
    lr_trees,  # leading scene axis (or replicated scalars broadcast)
    lambda_dssim: float = 0.2,
    backend: str = "tiled",
):
    """One step for S scenes x B frames each. vmapped over scenes; inside,
    each scene averages its loss over B frames (data-parallel when the B
    axis is sharded)."""

    def one_scene(model, opt_state, batch, fidx, lr_tree):
        def loss_fn(params):
            m = dataclasses.replace(model, params=params)
            losses = jax.vmap(
                lambda f: _per_frame_loss(m, batch, f, lambda_dssim, backend)
            )(fidx)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(loss_fn)(model.params)
        new_params, new_opt = adam_update(model.params, grads, opt_state, lr_tree)
        return dataclasses.replace(model, params=new_params), new_opt, loss

    return jax.vmap(one_scene)(models, opt_states, batches, frame_idxs, lr_trees)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "mode", "lambda_dssim", "backend", "tile_config", "opt_cfg",
        "label_lr",
    ),
)
def multi_scene_static_step(
    models: GaussianModel,      # scene-stacked: every leaf [S, ...]
    opt_states,                 # scene-stacked
    batches: FrameBatch,        # scene-stacked: [S, F, ...]
    frame_idxs: jnp.ndarray,    # [S, K], K % mesh.shape["data"] == 0
    grad_masks: jnp.ndarray,    # scene-stacked [S, F, 1, H, W]
    it: jnp.ndarray,            # scalar, shared schedule position
    drop_max=None,              # [S] running worst dropped-pair count
    xyz_lr_mult: jnp.ndarray | None = None,  # [S] per-scene extent factor
    mesh: Mesh = None,
    mode: str = "std",
    lambda_dssim: float = 0.2,
    backend: str = "tiled",
    tile_config=None,
    opt_cfg=None,
    label_lr: float = 0.0,
):
    """The REAL static-stage step (`train.static._static_step` body) for S
    scenes at once on a (scene, data) mesh — the reference's
    one-SLURM-job-per-video (train.sh:13-19) as a single pjit program.

    Scene-stacked state is sharded over the `scene` axis (no cross-scene
    collectives: scenes are independent); each scene's [K] frame batch is
    additionally sharded over `data`, with parameter grads pmean'd and
    densify statistics psum/pmax'd inside the scene's mesh row exactly like
    `_dp_static_step`. Per-scene results match S independent single-device
    `_static_step` calls to float tolerance (tests/test_multi_scene_real.py).

    Static model fields (capacity, sh_degree, spatial_lr_scale) must be
    equal across the stack — pad capacities to the max. Differing nerf++
    extents are expressed via `xyz_lr_mult`: the xyz LR is linear in
    spatial_lr_scale, so scene i trains exactly as if its
    spatial_lr_scale were `shared * xyz_lr_mult[i]`.
    """
    S = frame_idxs.shape[0]
    n_data = mesh.shape["data"]
    assert frame_idxs.shape[1] % n_data == 0, (
        f"frame batch {frame_idxs.shape[1]} not divisible by data={n_data}"
    )
    if drop_max is None:
        drop_max = jnp.zeros(S, jnp.int32)
    if xyz_lr_mult is None:
        xyz_lr_mult = jnp.ones(S, jnp.float32)

    def one_scene(model, opt_state, batch, fidxs_local, gmasks, mult, drop):
        k_local = fidxs_local.shape[0]
        lr_tree = _static_lr_tree(model, it, opt_cfg, mode, label_lr)
        lr_tree = dataclasses.replace(lr_tree, xyz=lr_tree.xyz * mult)
        bg = jnp.zeros(3, model.params.xyz.dtype)
        param_g, probe_g, losses, radii, dropped = _frames_loss_grads(
            model, batch, fidxs_local, gmasks, mode, lambda_dssim,
            backend, tile_config, bg,
        )
        param_g = jax.lax.pmean(param_g, "data")
        loss = jax.lax.pmean(jnp.mean(losses), "data")
        gn, den, rmax = _probe_stats(batch, probe_g, radii, k_local)
        gn = jax.lax.psum(gn, "data")
        den = jax.lax.psum(den, "data")
        rmax = jax.lax.pmax(rmax, "data")
        m = _apply_probe_stats(model, gn, den, rmax)
        new_params, new_opt = adam_update(m.params, param_g, opt_state, lr_tree)
        m = dataclasses.replace(m, params=new_params)
        drop = jnp.maximum(drop, jax.lax.pmax(jnp.max(dropped), "data"))
        return m, new_opt, loss, radii, drop

    def body(models, opt_states, batches, fidxs, gmasks, mults, drops):
        # local shard: leading scene axis of size S / mesh.shape["scene"]
        return jax.vmap(one_scene)(
            models, opt_states, batches, fidxs, gmasks, mults, drops
        )

    scene = P("scene")
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(scene, scene, scene, P("scene", "data"), scene, scene,
                  scene),
        out_specs=(scene, scene, scene, P("scene", "data"), scene),
        check_vma=False,
    )
    return mapped(models, opt_states, batches, frame_idxs, grad_masks,
                  xyz_lr_mult, jnp.asarray(drop_max, jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=(
        "grad_params", "mesh", "opt_cfg", "coarse_cfg", "backend",
        "tile_config",
    ),
)
def multi_scene_coarse_step(
    models: GaussianModel,        # scene-stacked: every leaf [S, ...]
    opt_states,                   # scene-stacked
    poses,                        # scene-stacked ObjectPose
    pose_opt_states,              # scene-stacked
    batches: FrameBatch,          # scene-stacked [S, F, ...]
    cam_idxs: jnp.ndarray,        # [S] this iteration's frame per scene
    table_Ts: jnp.ndarray,        # [S, F+1, 4, 4] identity-prefixed accums
    table_Rs: jnp.ndarray,        # [S, F+1, 3, 3]
    fixed_idxs: jnp.ndarray,      # [S] accumulated-prefix frame per scene
    it: jnp.ndarray,              # scalar, shared schedule position
    drop_maxes: jnp.ndarray,      # [S] running worst dropped-pair count
    train_poses: jnp.ndarray,     # [S] bool — per-scene pose-trainable flag
    first_frames: jnp.ndarray,    # [S] bool — per-scene first-frame flag
    grad_params: bool = True,
    xyz_lr_mult: jnp.ndarray | None = None,  # [S] per-scene extent factor
    mesh: Mesh = None,
    opt_cfg=None,
    coarse_cfg=None,
    backend: str = "tiled",
    tile_config=None,
):
    """The REAL coarse-stage step (`train.coarse_pose.coarse_step` body) for
    S scenes in lockstep on the `scene` mesh axis — the reference's
    one-SLURM-job-per-video (train.sh:13-19) applied to stage 2
    (coarse_obj_pose.py:88-369).

    Each scene renders ONE frame per iteration (the coarse stage is
    sequential in frames by pose chaining, so there is no data axis to
    shard within a scene — the `data` rows replicate). The per-iteration
    flags that the single-scene driver bakes in statically (train_pose,
    first_frame, and grad_params' first_frame term) become per-scene traced
    scalars; `grad_params` is passed as the OR over scenes and each scene
    whose own flag would have been False gets its parameter grads zeroed
    IN the adam_update (param_grad_gate) so moments and step counts match
    the scene's independent run bit-for-bit
    (tests/test_multi_scene_coarse.py).

    Static model fields must match across the stack (pad capacities to the
    max); tile_config is shared — take the max over scenes.
    """
    from egogaussian_tpu.train.coarse_pose import _coarse_body

    cp = coarse_cfg
    S = cam_idxs.shape[0]
    if xyz_lr_mult is None:
        xyz_lr_mult = jnp.ones(S, jnp.float32)

    def one_scene(model, opt, pose, popt, batch, cidx, tT, tR, fidx, drop,
                  tp, ff, mult):
        # the single-scene driver's static formula, per scene and traced:
        # grad_params = first_frame or it >= warm_up_iter
        gate = (ff | (it >= cp.warm_up_iter)).astype(model.params.xyz.dtype)
        # (crop windows stay off in the lockstep — the static size would be
        # shared across scenes; the trailing escape count is discarded)
        *out, _crop = _coarse_body(
            model, opt, pose, popt, batch, cidx, tT, tR, fidx, it, drop,
            tp, ff, grad_params, opt_cfg, cp, backend, tile_config,
            param_grad_gate=gate if grad_params else None,
            xyz_lr_mult=mult,
        )
        return tuple(out)

    def body(models, opts, poses, popts, batches, cidxs, tTs, tRs, fidxs,
             drops, tps, ffs, mults):
        return jax.vmap(one_scene)(
            models, opts, poses, popts, batches, cidxs, tTs, tRs, fidxs,
            drops, tps, ffs, mults,
        )

    scene = P("scene")
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(scene,) * 13,
        out_specs=(scene,) * 7,
        check_vma=False,
    )
    return mapped(
        models, opt_states, poses, pose_opt_states, batches,
        jnp.asarray(cam_idxs, jnp.int32), table_Ts, table_Rs,
        jnp.asarray(fixed_idxs, jnp.int32),
        jnp.asarray(drop_maxes, jnp.int32),
        jnp.asarray(train_poses, bool), jnp.asarray(first_frames, bool),
        jnp.asarray(xyz_lr_mult, jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "opt_cfg", "fine_cfg", "backend", "tile_config",
    ),
)
def multi_scene_fine_step(
    models: GaussianModel,        # scene-stacked: every leaf [S, ...]
    opt_states,                   # scene-stacked
    pose_seqs,                    # scene-stacked PoseSequence [S, F, ...]
    pose_opt_states,              # scene-stacked
    batches: FrameBatch,          # scene-stacked [S, F, ...]
    cam_idxs: jnp.ndarray,        # [S] this iteration's frame per scene
    it: jnp.ndarray,              # scalar, shared schedule position
    drop_maxes: jnp.ndarray,      # [S] running worst dropped-pair count
    train_poses: jnp.ndarray,     # [S] bool — per-lane dynamic-frame flag
    xyz_lr_mult: jnp.ndarray | None = None,  # [S] per-scene extent factor
    mesh: Mesh = None,
    opt_cfg=None,
    fine_cfg=None,
    backend: str = "tiled",
    tile_config=None,
):
    """The REAL fine_obj step (`train.fine_obj._fine_obj_step` body) for S
    lanes in lockstep on the `scene` mesh axis — the reference's
    one-SLURM-job-per-video (train.sh:13-19) applied to stage 3
    (fine_obj.py:27-237). A "lane" is one (video, variant) pair: the
    pipeline runs fine_obj twice per video (from-static / from-coarse,
    train.py:104-118), and both variants are independent runs, so 2
    videos fill 4 lanes.

    Each lane renders ONE frame per iteration; the per-iteration
    `train_pose` flag the single-scene driver bakes in statically becomes
    a per-lane traced scalar (`_pose_core` where-gates the pose and its
    Adam moments so a False lane stays bit-identical to its independent
    run). The pose sequence is device-resident per lane; the frame's
    stored delta is loaded in-jit, accumulated transforms are recomputed
    in-jit, and the trained delta is written back gated on
    (train_pose & pose-LR live), matching fine_obj.py:216-224.

    Static model fields must match across the stack (pad capacities to
    the max); tile_config is shared — take the max over lanes.
    """
    from egogaussian_tpu.models.pose import ObjectPose, pose_from_rt
    from egogaussian_tpu.train.coarse_pose import _pose_core
    from egogaussian_tpu.train.fine_obj import _fine_lr_tree

    fp = fine_cfg
    S = cam_idxs.shape[0]
    if xyz_lr_mult is None:
        xyz_lr_mult = jnp.ones(S, jnp.float32)

    def one_lane(model, opt, pseq, popt, batch, cidx, drop, tp, mult):
        accum_T = pseq.accum_T()
        accum_R = pseq.accum_R()
        eye4 = jnp.eye(4, dtype=accum_T.dtype)
        eye3 = jnp.eye(3, dtype=accum_R.dtype)
        # train_pose lane: load the frame's stored delta, fixed prefix is
        # the accumulation through cidx-1 (identity at frame 0); otherwise
        # identity pose against the full accumulation (fine_obj.py:113-119)
        pose_tp = pose_from_rt(pseq.rotations[cidx], pseq.translations[cidx])
        pose_no = ObjectPose(jnp.zeros(3, eye4.dtype), eye3[:, :2])
        pose = jax.tree_util.tree_map(
            lambda a, b: jnp.where(tp, a, b), pose_tp, pose_no
        )
        prev = jnp.maximum(cidx - 1, 0)
        prefix_T = jnp.where(cidx > 0, accum_T[prev], eye4)
        prefix_R = jnp.where(cidx > 0, accum_R[prev], eye3)
        fixed_T = jnp.where(tp, prefix_T, accum_T[cidx])
        fixed_R = jnp.where(tp, prefix_R, accum_R[cidx])

        lr_tree = _fine_lr_tree(model, it, opt_cfg)
        lr_tree = dataclasses.replace(lr_tree, xyz=lr_tree.xyz * mult)
        pose_live = it >= fp.densify_until_iter
        plr_t = jnp.where(pose_live, opt_cfg.obj_translation_lr, 0.0)
        plr_r = jnp.where(pose_live, opt_cfg.obj_rotation_lr, 0.0)

        # (no crop window in the lockstep path: the static size would have
        # to be shared across scenes — the 8th returned value is discarded)
        model, opt, pose, popt, loss, radii, drop, _ = _pose_core(
            model, opt, pose, popt, batch, cidx,
            fixed_T, fixed_R, lr_tree, plr_t, plr_r,
            jnp.asarray(True), drop,
            train_pose=tp,
            lambda_image=fp.lambda_Ll1_image,
            lambda_dssim=fp.lambda_dssim,
            lambda_l1_alpha=fp.lambda_Ll1_alpha,
            lambda_l2_alpha=fp.lambda_Ll2_alpha,
            backend=backend,
            tile_config=tile_config,
        )
        if opt_cfg.obj_translation_lr > 0:
            upd = pseq.update_frame(cidx, pose)
            gate = tp & pose_live
            pseq = jax.tree_util.tree_map(
                lambda a, b: jnp.where(gate, b, a), pseq, upd
            )
        return model, opt, pseq, popt, loss, radii, drop

    def body(models, opts, pseqs, popts, batches, cidxs, drops, tps, mults):
        return jax.vmap(one_lane)(
            models, opts, pseqs, popts, batches, cidxs, drops, tps, mults
        )

    scene = P("scene")
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(scene,) * 9,
        out_specs=(scene,) * 7,
        check_vma=False,
    )
    return mapped(
        models, opt_states, pose_seqs, pose_opt_states, batches,
        jnp.asarray(cam_idxs, jnp.int32),
        jnp.asarray(drop_maxes, jnp.int32),
        jnp.asarray(train_poses, bool),
        jnp.asarray(xyz_lr_mult, jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "lambda_dssim", "backend", "tile_config", "opt_cfg",
    ),
)
def multi_scene_fine_all_step(
    models: GaussianModel,        # scene-stacked: every leaf [S, ...]
    opt_states,                   # scene-stacked
    batches: FrameBatch,          # scene-stacked [S, F, ...]
    cam_idxs: jnp.ndarray,        # [S]
    accum_Ts: jnp.ndarray,        # [S, F, 4, 4] frozen accumulated poses
    accum_Rs: jnp.ndarray,        # [S, F, 3, 3]
    it: jnp.ndarray,              # scalar, shared schedule position
    clamp_opacity: jnp.ndarray,   # scalar bool, shared (schedule-derived)
    drop_maxes: jnp.ndarray,      # [S]
    xyz_lr_mult: jnp.ndarray | None = None,  # [S]
    mesh: Mesh = None,
    lambda_dssim: float = 0.2,
    backend: str = "tiled",
    tile_config=None,
    opt_cfg=None,
):
    """The REAL fine_all step (`train.fine_all._fine_all_body`) for S
    scenes in lockstep on the `scene` mesh axis (stage 5,
    fine_all.py:27-151). Poses are frozen all stage, so the accumulated
    tables are precomputed per scene and gathered in-jit."""
    from egogaussian_tpu.train.fine_all import _fine_all_body

    S = cam_idxs.shape[0]
    if xyz_lr_mult is None:
        xyz_lr_mult = jnp.ones(S, jnp.float32)

    def one_scene(model, opt, batch, cidx, tT, tR, drop, mult):
        return _fine_all_body(
            model, opt, batch, cidx, tT, tR, it, clamp_opacity, drop,
            lambda_dssim=lambda_dssim, backend=backend,
            tile_config=tile_config, opt_cfg=opt_cfg, xyz_lr_mult=mult,
        )

    def body(models, opts, batches, cidxs, tTs, tRs, drops, mults):
        return jax.vmap(one_scene)(
            models, opts, batches, cidxs, tTs, tRs, drops, mults
        )

    scene = P("scene")
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(scene,) * 8,
        out_specs=(scene,) * 4,
        check_vma=False,
    )
    return mapped(
        models, opt_states, batches, jnp.asarray(cam_idxs, jnp.int32),
        accum_Ts, accum_Rs, jnp.asarray(drop_maxes, jnp.int32),
        jnp.asarray(xyz_lr_mult, jnp.float32),
    )


def make_multi_scene_step(
    mesh: Mesh, lambda_dssim: float = 0.2, backend: str = "tiled"
):
    """Jitted multi-scene step with explicit shardings: every scene-stacked
    input sharded over the `scene` mesh axis."""
    scene_sharded = NamedSharding(mesh, P("scene"))

    step = functools.partial(
        multi_scene_train_step, lambda_dssim=lambda_dssim, backend=backend
    )
    return jax.jit(
        step,
        in_shardings=(
            scene_sharded, scene_sharded, scene_sharded, scene_sharded,
            scene_sharded,
        ),
        out_shardings=(scene_sharded, scene_sharded, scene_sharded),
    )
