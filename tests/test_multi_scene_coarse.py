"""Traced-flag coarse step + multi-scene coarse step tests.

The single-scene `coarse_step` bakes train_pose/first_frame into the
compilation (static flags). Cross-VIDEO lockstep of the coarse stage needs
them per-scene per-iteration, i.e. traced: `coarse_step_traced` must equal
the static-flag step bit-for-bit in ALL flag combinations — including the
Adam-moment side effects (a pose update that "doesn't happen" must leave
pose moments untouched, not decay them with zero grads). Then the vmapped
`multi_scene_coarse_step` must reproduce S independent coarse_step calls
with per-scene flags.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egogaussian_tpu.config import Config
from egogaussian_tpu.data import make_synthetic_video, stack_cameras
from egogaussian_tpu.models import adam_init, from_points
from egogaussian_tpu.models.pose import identity_pose
from egogaussian_tpu.parallel import make_mesh
from egogaussian_tpu.train.common import auto_tile_config


def problem(seed=0, n=60):
    vid = make_synthetic_video(width=32, height=24, n_bg=40, n_obj=12,
                               frames_static=2, frames_dynamic=2, seed=seed)
    batch = stack_cameras(vid.cameras[:6])
    rng = np.random.RandomState(seed)
    model = from_points(rng.randn(n, 3).astype(np.float32),
                        rng.rand(n, 3).astype(np.float32), capacity=128)
    # mark half as object so pose transforms act
    aux = dataclasses.replace(
        model.aux,
        is_object=jnp.asarray((np.arange(model.capacity) % 2 == 0), jnp.int32),
    )
    model = dataclasses.replace(model, aux=aux)
    # a non-identity trainable pose so train_pose on/off actually differs
    pose = identity_pose()
    pose = dataclasses.replace(
        pose, translation=jnp.asarray([0.05, -0.02, 0.01], jnp.float32)
    )
    F = batch.num_frames
    table_T = jnp.tile(jnp.eye(4)[None], (F + 1, 1, 1))
    table_R = jnp.tile(jnp.eye(3)[None], (F + 1, 1, 1))
    return model, batch, pose, table_T, table_R


FIELDS = ("xyz", "log_scales", "quats", "opacity_logit", "features_dc")


class TestTracedFlagCoarseStep:
    @pytest.mark.parametrize("train_pose", [True, False])
    @pytest.mark.parametrize("first_frame", [True, False])
    @pytest.mark.parametrize("it", [50, 25_600])
    def test_matches_static_flag_step(self, train_pose, first_frame, it):
        from egogaussian_tpu.train.coarse_pose import (
            coarse_step, coarse_step_traced,
        )

        model, batch, pose, table_T, table_R = problem()
        cfg = Config()
        tile_cfg = auto_tile_config(model, batch.camera(0))
        grad_params = first_frame or it >= cfg.coarse.warm_up_iter
        # nonzero pose moments so a skipped update is distinguishable from
        # a zero-grad update (the moment-decay trap)
        pose_opt = adam_init(pose)
        pose_opt = dataclasses.replace(
            pose_opt,
            mu=jax.tree_util.tree_map(lambda x: x + 0.01, pose_opt.mu),
            nu=jax.tree_util.tree_map(lambda x: x + 0.02, pose_opt.nu),
        )
        kw = dict(opt_cfg=cfg.opt, coarse_cfg=cfg.coarse, backend="tiled",
                  tile_config=tile_cfg)
        args = (model, adam_init(model.params), pose, pose_opt, batch,
                jnp.int32(1), table_T, table_R, jnp.int32(0),
                jnp.int32(it), jnp.int32(0))

        m1, o1, p1, po1, loss1, radii1, drop1, _ = coarse_step(
            *args, train_pose=train_pose, first_frame=first_frame,
            grad_params=grad_params, **kw
        )
        m2, o2, p2, po2, loss2, radii2, drop2, _ = coarse_step_traced(
            *args,
            train_pose=jnp.asarray(train_pose),
            first_frame=jnp.asarray(first_frame),
            grad_params=grad_params, **kw
        )
        np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-6)
        for name in FIELDS:
            np.testing.assert_allclose(
                np.asarray(getattr(m2.params, name)),
                np.asarray(getattr(m1.params, name)),
                atol=1e-6, err_msg=name,
            )
        # pose AND its Adam moments must match exactly
        for tree2, tree1, tag in ((p2, p1, "pose"), (po2, po1, "pose_opt")):
            for a, b in zip(jax.tree_util.tree_leaves(tree2),
                            jax.tree_util.tree_leaves(tree1)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-7, err_msg=tag
                )
        np.testing.assert_allclose(
            np.asarray(m2.aux.xyz_gradient_accum),
            np.asarray(m1.aux.xyz_gradient_accum), atol=1e-6,
        )


def _coarse_cfg():
    import dataclasses as dc

    cfg = Config()
    cfg = dc.replace(
        cfg,
        coarse=dc.replace(
            cfg.coarse,
            warm_up_iter=12, total_num_iter=20,
            densify_from_iter=13, densify_until_iter=18,
            densification_interval=2, opacity_reset_interval=4,
        ),
    )
    return cfg


def _gt_obj_model(vid, capacity, spatial):
    pts = vid.gt_means[vid.gt_is_object]
    cols = vid.colors[vid.gt_is_object]
    m = from_points(pts, cols, capacity=capacity,
                    spatial_lr_scale=spatial)
    n = len(pts)
    aux = dataclasses.replace(
        m.aux, is_object=jnp.where(jnp.arange(capacity) < n, 1, 0)
    )
    return dataclasses.replace(m, aux=aux)


@pytest.mark.slow
class TestCoarseStageDriver:
    def test_matches_individual_runs(self, tmp_path):
        """train_coarse_scenes (lockstep slots: per-scene RNG frame
        selection, traced flags, densify window, scene-1 finishing one
        slot early) reproduces per-scene estimate_coarse_obj_pose runs
        with matching seeds — pose sequences AND refined models."""
        from egogaussian_tpu.data.readers import split_viewpoints_by_phase
        from egogaussian_tpu.parallel.scene_trainer import (
            CoarseSceneInput, train_coarse_scenes,
        )
        from egogaussian_tpu.train.coarse_pose import (
            estimate_coarse_obj_pose,
        )

        cfg = _coarse_cfg()
        # different dynamic-frame counts: scene 1 runs one slot fewer and
        # must freeze exactly for the lockstep tail
        vids = [
            make_synthetic_video(width=32, height=24, n_bg=40, n_obj=12,
                                 frames_static=3, frames_dynamic=d, seed=s)
            for d, s in ((3, 0), (2, 3))
        ]
        spatials = [1.0, 1.4]
        extents = [1.0, 1.4]
        seeds = [0, 3]

        singles = []
        groups = []
        for vid, sp, ext, seed in zip(vids, spatials, extents, seeds):
            sg = split_viewpoints_by_phase(vid.cameras, vid.static_phases)
            dg = split_viewpoints_by_phase(vid.cameras, vid.dynamic_phases)
            groups.append((sg, dg))
            obj = _gt_obj_model(vid, capacity=64, spatial=sp)
            singles.append(estimate_coarse_obj_pose(
                vid.cameras, obj, cfg, sg, dg, ext, seed=seed,
                backend="tiled",
            ))

        mesh = make_mesh(n_scene=2, n_data=4)
        inputs = [
            CoarseSceneInput(
                cameras=vid.cameras,
                obj_model=_gt_obj_model(vid, capacity=64, spatial=sp),
                static_phase_frames=sg, dynamic_phase_frames=dg,
                cameras_extent=ext, seed=seed,
            )
            for vid, sp, ext, seed, (sg, dg) in zip(
                vids, spatials, extents, seeds, groups
            )
        ]
        multi = train_coarse_scenes(inputs, cfg, mesh, backend="tiled")

        for i in range(2):
            seq1, m1, solved1 = singles[i]
            seq2, m2, solved2 = multi[i]
            assert solved2 == solved1, f"scene{i} solved sets differ"
            np.testing.assert_allclose(
                np.asarray(seq2.translations), np.asarray(seq1.translations),
                atol=2e-5, err_msg=f"scene{i}.translations",
            )
            np.testing.assert_allclose(
                np.asarray(seq2.rotations), np.asarray(seq1.rotations),
                atol=2e-5, err_msg=f"scene{i}.rotations",
            )
            assert int(m2.num_alive) == int(m1.num_alive), f"scene{i} alive"
            a1 = np.asarray(m1.aux.alive)
            a2 = np.asarray(m2.aux.alive)
            for name in FIELDS:
                np.testing.assert_allclose(
                    np.asarray(getattr(m2.params, name))[a2],
                    np.asarray(getattr(m1.params, name))[a1],
                    atol=1e-4, err_msg=f"scene{i}.{name}",
                )


class TestMultiSceneCoarseStep:
    # post-warm-up (both scenes grad_params=True), and mid-warm-up where
    # scene 1 is NOT its phase's first frame: its single-scene run uses
    # grad_params=False (zero grads through adam_update), which the
    # lockstep must reproduce via the traced param-grad gate — zero LRs
    # alone would let Adam moments accumulate and diverge later.
    @pytest.mark.parametrize("it_val", [25_600, 50])
    def test_matches_individual_scenes(self, it_val):
        from egogaussian_tpu.parallel.multi_scene import (
            multi_scene_coarse_step, stack_scenes, unstack_scenes,
        )
        from egogaussian_tpu.train.coarse_pose import coarse_step

        cfg = Config()
        probs = [problem(seed=s) for s in (0, 3)]
        tile_cfg = max(
            (auto_tile_config(m, b.camera(0)) for m, b, _, _, _ in probs),
            key=lambda t: t.max_pairs,
        )
        it = jnp.int32(it_val)
        # scene 0: training its pose on frame 2 and is its phase's first
        # frame; scene 1: replaying a fixed previous frame (train_pose
        # False), not first frame -> grad_params False during warm-up
        flags_tp = [True, False]
        flags_ff = [True, False]
        cams = [2, 1]
        fixed = [1, 1]
        kw = dict(opt_cfg=cfg.opt, coarse_cfg=cfg.coarse, backend="tiled",
                  tile_config=tile_cfg)

        singles = []
        for (m, b, p, tT, tR), tp, ff, c, fx in zip(
            probs, flags_tp, flags_ff, cams, fixed
        ):
            gp = ff or it_val >= cfg.coarse.warm_up_iter
            singles.append(coarse_step(
                m, adam_init(m.params), p, adam_init(p), b, jnp.int32(c),
                tT, tR, jnp.int32(fx), it, jnp.int32(0),
                train_pose=tp, first_frame=ff, grad_params=gp, **kw
            ))

        mesh = make_mesh(n_scene=2, n_data=4)
        models = stack_scenes([m for m, _, _, _, _ in probs])
        opts = stack_scenes([adam_init(m.params) for m, _, _, _, _ in probs])
        poses = stack_scenes([p for _, _, p, _, _ in probs])
        pose_opts = stack_scenes([adam_init(p) for _, _, p, _, _ in probs])
        batches = stack_scenes([b for _, b, _, _, _ in probs])
        tTs = stack_scenes([tT for _, _, _, tT, _ in probs])
        tRs = stack_scenes([tR for _, _, _, _, tR in probs])

        out = multi_scene_coarse_step(
            models, opts, poses, pose_opts, batches,
            jnp.asarray(cams, jnp.int32), tTs, tRs,
            jnp.asarray(fixed, jnp.int32), it,
            jnp.zeros(2, jnp.int32),
            jnp.asarray(flags_tp), jnp.asarray(flags_ff),
            grad_params=True, mesh=mesh, **kw
        )
        m2, o2, p2, po2, loss2, radii2, drop2 = out
        for i in range(2):
            m1, o1, p1, po1, loss1, radii1, drop1, _ = singles[i]
            np.testing.assert_allclose(float(loss2[i]), float(loss1),
                                       rtol=1e-5)
            mi = unstack_scenes(m2, 2)[i]
            for name in FIELDS:
                np.testing.assert_allclose(
                    np.asarray(getattr(mi.params, name)),
                    np.asarray(getattr(m1.params, name)),
                    atol=2e-5, err_msg=f"scene{i}.{name}",
                )
            pi = unstack_scenes(p2, 2)[i]
            for a, b in zip(jax.tree_util.tree_leaves(pi),
                            jax.tree_util.tree_leaves(p1)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-6,
                    err_msg=f"scene{i}.pose",
                )
            # param Adam state (moments + step count) must track the
            # scene's own grad_params path, not the lockstep OR
            oi = unstack_scenes(o2, 2)[i]
            for a, b in zip(jax.tree_util.tree_leaves(oi),
                            jax.tree_util.tree_leaves(o1)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-5,
                    err_msg=f"scene{i}.opt",
                )
            poi = unstack_scenes(po2, 2)[i]
            for a, b in zip(jax.tree_util.tree_leaves(poi),
                            jax.tree_util.tree_leaves(po1)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-6,
                    err_msg=f"scene{i}.pose_opt",
                )
