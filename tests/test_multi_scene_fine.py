"""Fine-stage lockstep tests (stages 3 and 5 over the scene mesh axis).

`multi_scene_fine_step` must reproduce per-lane `_fine_obj_step` calls with
the per-iteration `train_pose` flag traced instead of baked in — including
the pose-sequence write-back gate and the pose Adam moments (a lane whose
flag is False must keep them bit-identical to its independent run). Then the
stage drivers `train_fine_scenes` / `train_fine_all_scenes` must reproduce S
individual fine_tune_obj / fine_tune_all runs with matching seeds
(reference: trainers/fine_obj.py:27-237 / trainers/fine_all.py:25-138 run as
one SLURM job per video, train.sh:13-19).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egogaussian_tpu.config import Config
from egogaussian_tpu.data import make_synthetic_video, stack_cameras
from egogaussian_tpu.data.readers import split_viewpoints_by_phase
from egogaussian_tpu.models import adam_init, from_points
from egogaussian_tpu.models.pose import PoseSequence
from egogaussian_tpu.parallel import make_mesh
from egogaussian_tpu.train.common import auto_tile_config

FIELDS = ("xyz", "log_scales", "quats", "opacity_logit", "features_dc")


def problem(seed=0, n=60, spatial=1.0):
    vid = make_synthetic_video(width=32, height=24, n_bg=40, n_obj=12,
                               frames_static=2, frames_dynamic=2, seed=seed)
    batch = stack_cameras(vid.cameras[:6])
    rng = np.random.RandomState(seed)
    model = from_points(rng.randn(n, 3).astype(np.float32),
                        rng.rand(n, 3).astype(np.float32), capacity=128,
                        spatial_lr_scale=spatial)
    aux = dataclasses.replace(
        model.aux,
        is_object=jnp.asarray((np.arange(model.capacity) % 2 == 0),
                              jnp.int32),
    )
    model = dataclasses.replace(model, aux=aux)
    # a pose sequence with non-identity solved deltas so the train_pose
    # lane genuinely loads a stored delta and the accumulations act
    F = batch.num_frames
    t = (rng.randn(F, 3) * 0.02).astype(np.float32)
    seq = PoseSequence(
        translations=jnp.asarray(t),
        rotations=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (F, 1, 1)),
        solved=jnp.asarray(np.arange(F) >= 2),
    )
    return model, batch, seq


def _fine_cfg():
    cfg = Config()
    return dataclasses.replace(
        cfg,
        fine=dataclasses.replace(
            cfg.fine,
            total_num_iter=24, densify_from_iter=5, densify_until_iter=16,
            densification_interval=4, opacity_reset_interval=8,
        ),
    )


class TestMultiSceneFineStep:
    # it=20 >= densify_until (pose LR live: the train_pose lane trains and
    # writes back its delta); it=10 < densify_until (pose LR zero: the
    # sequence must come back untouched even on the train_pose lane)
    @pytest.mark.parametrize("it_val", [20, 10])
    def test_matches_individual_lanes(self, it_val):
        from egogaussian_tpu.parallel.multi_scene import (
            multi_scene_fine_step, stack_scenes, unstack_scenes,
        )
        from egogaussian_tpu.train.fine_obj import _fine_obj_step

        cfg = _fine_cfg()
        spatials = [1.0, 1.4]
        # lane 0 trains its pose on a solved dynamic frame; lane 1 replays
        # a static frame (train_pose False)
        cams = [3, 1]
        tps = [True, False]
        probs = [problem(seed=s, spatial=sp)
                 for s, sp in zip((0, 3), spatials)]
        tile_cfg = max(
            (auto_tile_config(m, b.camera(0)) for m, b, _ in probs),
            key=lambda t: t.max_pairs,
        )
        it = jnp.int32(it_val)
        kw = dict(opt_cfg=cfg.opt, fine_cfg=cfg.fine, backend="tiled",
                  tile_config=tile_cfg)

        def nonzero_pose_opt(seq):
            from egogaussian_tpu.models.pose import ObjectPose
            po = adam_init(ObjectPose(jnp.zeros(3), jnp.eye(3)[:, :2]))
            return dataclasses.replace(
                po,
                mu=jax.tree_util.tree_map(lambda x: x + 0.01, po.mu),
                nu=jax.tree_util.tree_map(lambda x: x + 0.02, po.nu),
            )

        singles = []
        for (m, b, seq), c, tp in zip(probs, cams, tps):
            singles.append(_fine_obj_step(
                m, adam_init(m.params), seq, nonzero_pose_opt(seq), b,
                jnp.int32(c), it, jnp.int32(0), train_pose=tp, **kw
            ))

        mesh = make_mesh(n_scene=2, n_data=4)
        # the lockstep stores scenes at spatial 1.0 and expresses extents
        # via the traced xyz multiplier (LR linear in spatial_lr_scale)
        flat = [dataclasses.replace(m, spatial_lr_scale=1.0)
                for m, _, _ in probs]
        models = stack_scenes(flat)
        opts = stack_scenes([adam_init(m.params) for m in flat])
        seqs = stack_scenes([s for _, _, s in probs])
        pose_opts = stack_scenes([nonzero_pose_opt(s) for _, _, s in probs])
        batches = stack_scenes([b for _, b, _ in probs])

        out = multi_scene_fine_step(
            models, opts, seqs, pose_opts, batches,
            jnp.asarray(cams, jnp.int32), it, jnp.zeros(2, jnp.int32),
            jnp.asarray(tps), xyz_lr_mult=jnp.asarray(spatials, jnp.float32),
            mesh=mesh, **kw
        )
        m2, o2, s2, po2, loss2, radii2, drop2 = out
        for i in range(2):
            m1, o1, s1, po1, loss1, radii1, drop1, _ = singles[i]
            np.testing.assert_allclose(float(loss2[i]), float(loss1),
                                       rtol=1e-5)
            mi = unstack_scenes(m2, 2)[i]
            for name in FIELDS:
                np.testing.assert_allclose(
                    np.asarray(getattr(mi.params, name)),
                    np.asarray(getattr(m1.params, name)),
                    atol=2e-5, err_msg=f"lane{i}.{name}",
                )
            oi = unstack_scenes(o2, 2)[i]
            for a, b in zip(jax.tree_util.tree_leaves(oi),
                            jax.tree_util.tree_leaves(o1)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-5,
                    err_msg=f"lane{i}.opt",
                )
            # pose sequence (incl. write-back gating), pose Adam moments
            si = unstack_scenes(s2, 2)[i]
            for a, b, tag in (
                (si.translations, s1.translations, "seq.t"),
                (si.rotations, s1.rotations, "seq.R"),
                (si.solved, s1.solved, "seq.solved"),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-6,
                    err_msg=f"lane{i}.{tag}",
                )
            poi = unstack_scenes(po2, 2)[i]
            for a, b in zip(jax.tree_util.tree_leaves(poi),
                            jax.tree_util.tree_leaves(po1)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-6,
                    err_msg=f"lane{i}.pose_opt",
                )


def _gt_obj_model(vid, capacity, spatial):
    pts = vid.gt_means[vid.gt_is_object]
    cols = vid.colors[vid.gt_is_object]
    m = from_points(pts, cols, capacity=capacity, spatial_lr_scale=spatial)
    n = len(pts)
    aux = dataclasses.replace(
        m.aux, is_object=jnp.where(jnp.arange(capacity) < n, 1, 0)
    )
    return dataclasses.replace(m, aux=aux)


def _solved_seq(vid, seed):
    """Coarse-like pose sequence: every dynamic frame solved with a small
    non-identity translation delta."""
    rng = np.random.RandomState(100 + seed)
    F = len(vid.cameras)
    dyn = [f for ph in split_viewpoints_by_phase(
        vid.cameras, vid.dynamic_phases) for f in ph]
    t = np.zeros((F, 3), np.float32)
    solved = np.zeros(F, bool)
    for f in dyn:
        t[f] = rng.randn(3).astype(np.float32) * 0.02
        solved[f] = True
    return PoseSequence(
        translations=jnp.asarray(t),
        rotations=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (F, 1, 1)),
        solved=jnp.asarray(solved),
    )


@pytest.mark.slow
class TestFineStageDrivers:
    def test_fine_driver_matches_individual_runs(self, tmp_path):
        """train_fine_scenes (per-lane RNG frame pools, traced train_pose,
        which_object=1 densify/reset, shared capacity, differing frame
        counts padded) reproduces per-lane fine_tune_obj runs — pose
        sequences AND models."""
        from egogaussian_tpu.parallel.scene_trainer import (
            FineSceneInput, train_fine_scenes,
        )
        from egogaussian_tpu.train.fine_obj import fine_tune_obj

        cfg = _fine_cfg()
        # one densify event (at iter 8): enough to exercise the lockstep's
        # shared vmapped densify, small enough that the tiny synthetic's
        # exponential cloning (~3x per event, everything passes the grad
        # threshold at this scale) stays below the test capacities
        cfg = dataclasses.replace(
            cfg, fine=dataclasses.replace(cfg.fine, densify_until_iter=9)
        )
        vids = [
            make_synthetic_video(width=32, height=24, n_bg=40, n_obj=12,
                                 frames_static=3, frames_dynamic=d, seed=s)
            for d, s in ((3, 0), (2, 3))
        ]
        spatials = [1.0, 1.4]
        extents = [1.0, 1.4]
        # UNEQUAL capacities exercise the lockstep pad-to-shared-max path,
        # but both must be NON-BINDING: when capacity binds, an individual
        # run drops densify candidates (counted) and regrows next interval
        # while the roomier shared-capacity lockstep accepts them
        # immediately — legitimately different trajectories, so lockstep ==
        # individual equivalence only holds overflow-free (the original
        # caps=[64,128] overflowed and this test was red from its landing
        # commit — r5 root-cause; no full -m "" record had ever run).
        # The no-growth asserts below verify the precondition held.
        caps = [256, 512]
        seeds = [0, 3]

        groups, seqs, singles = [], [], []
        for vid, sp, ext, cap, seed in zip(vids, spatials, extents, caps,
                                           seeds):
            sg = split_viewpoints_by_phase(vid.cameras, vid.static_phases)
            dg = split_viewpoints_by_phase(vid.cameras, vid.dynamic_phases)
            groups.append((sg, dg))
            seq = _solved_seq(vid, seed)
            seqs.append(seq)
            obj = _gt_obj_model(vid, capacity=cap, spatial=sp)
            singles.append(fine_tune_obj(
                vid.cameras, obj, seq, cfg, sg, dg, ext, seed=seed,
                backend="tiled",
            ))

        mesh = make_mesh(n_scene=2, n_data=4)
        inputs = [
            FineSceneInput(
                cameras=vid.cameras,
                obj_model=_gt_obj_model(vid, capacity=cap, spatial=sp),
                pose_seq=seq, static_phase_frames=sg,
                dynamic_phase_frames=dg, cameras_extent=ext,
                save_dir=str(tmp_path / f"lane{i}"), seed=seed,
            )
            for i, (vid, sp, ext, cap, seed, seq, (sg, dg)) in enumerate(
                zip(vids, spatials, extents, caps, seeds, seqs, groups)
            )
        ]
        for inp in inputs:
            import os
            os.makedirs(inp.save_dir, exist_ok=True)
        multi = train_fine_scenes(inputs, cfg, mesh, backend="tiled")

        for i in range(2):
            seq1, m1 = singles[i]
            seq2, m2 = multi[i]
            # equivalence precondition first: identical alive counts prove
            # neither path dropped densify candidates to a binding capacity
            # (ensure_capacity growth itself is PREEMPTIVE — free <
            # max(C/8, 256) — so capacities may legitimately differ)
            assert int(m2.num_alive) == int(m1.num_alive), \
                f"lane{i} alive mismatch (capacity-bound densify?)"
            # 2e-5: after the r5 capacity-independent split-noise fix
            # (models/densify.py) the two paths produce identical densify
            # candidates, leaving only per-step f32 fusion-order residue.
            np.testing.assert_allclose(
                np.asarray(seq2.translations), np.asarray(seq1.translations),
                atol=2e-5, err_msg=f"lane{i}.translations",
            )
            np.testing.assert_allclose(
                np.asarray(seq2.rotations), np.asarray(seq1.rotations),
                atol=2e-5, err_msg=f"lane{i}.rotations",
            )
            np.testing.assert_array_equal(
                np.asarray(seq2.solved), np.asarray(seq1.solved),
            )
            assert int(m2.num_alive) == int(m1.num_alive), f"lane{i} alive"
            a1 = np.asarray(m1.aux.alive)
            a2 = np.asarray(m2.aux.alive)
            for name in FIELDS:
                np.testing.assert_allclose(
                    np.asarray(getattr(m2.params, name))[a2],
                    np.asarray(getattr(m1.params, name))[a1],
                    atol=1e-4, err_msg=f"lane{i}.{name}",
                )
            assert (tmp_path / f"lane{i}" / "obj_pose_sequence.npz").exists()
            assert (tmp_path / f"lane{i}" / "gaussians_fine.ply").exists()

    def test_fine_all_driver_matches_individual_runs(self, tmp_path):
        """train_fine_all_scenes (combine per scene, frozen accumulated
        pose tables, 1:4 sampling, shared clamp flag) reproduces per-scene
        fine_tune_all runs."""
        import dataclasses as dc

        from egogaussian_tpu.parallel.scene_trainer import (
            FineAllSceneInput, train_fine_all_scenes,
        )
        from egogaussian_tpu.train.fine_all import fine_tune_all

        cfg = Config()
        cfg = dc.replace(
            cfg,
            fine_all=dc.replace(
                cfg.fine_all,
                total_num_iter=20, densify_from_iter=3,
                densify_until_iter=15, opacity_reset_interval=6,
            ),
        )
        vids = [
            make_synthetic_video(width=32, height=24, n_bg=40, n_obj=12,
                                 frames_static=3, frames_dynamic=d, seed=s)
            for d, s in ((3, 0), (2, 3))
        ]
        spatials = [1.0, 1.4]
        seeds = [0, 3]

        groups, seqs, singles = [], [], []
        for vid, sp, seed in zip(vids, spatials, seeds):
            sg = split_viewpoints_by_phase(vid.cameras, vid.static_phases)
            dg = split_viewpoints_by_phase(vid.cameras, vid.dynamic_phases)
            groups.append((sg, dg))
            seq = _solved_seq(vid, seed)
            seqs.append(seq)
            obj = _gt_obj_model(vid, capacity=64, spatial=sp)
            bg_pts = vid.gt_means[~vid.gt_is_object]
            bg_cols = vid.colors[~vid.gt_is_object]
            bg = from_points(bg_pts, bg_cols, capacity=64)
            singles.append(fine_tune_all(
                vid.cameras, obj, bg, seq, cfg, sg, dg, seed=seed,
                backend="tiled",
            ))

        mesh = make_mesh(n_scene=2, n_data=4)
        inputs = []
        for i, (vid, sp, seed, seq, (sg, dg)) in enumerate(
            zip(vids, spatials, seeds, seqs, groups)
        ):
            obj = _gt_obj_model(vid, capacity=64, spatial=sp)
            bg_pts = vid.gt_means[~vid.gt_is_object]
            bg_cols = vid.colors[~vid.gt_is_object]
            bg = from_points(bg_pts, bg_cols, capacity=64)
            import os
            d = str(tmp_path / f"scene{i}")
            os.makedirs(d, exist_ok=True)
            inputs.append(FineAllSceneInput(
                cameras=vid.cameras, obj_model=obj, bg_model=bg,
                pose_seq=seq, static_phase_frames=sg,
                dynamic_phase_frames=dg, save_dir=d, seed=seed,
            ))
        multi = train_fine_all_scenes(inputs, cfg, mesh, backend="tiled")

        for i in range(2):
            m1, m2 = singles[i], multi[i]
            assert int(m2.num_alive) == int(m1.num_alive), f"scene{i} alive"
            a1 = np.asarray(m1.aux.alive)
            a2 = np.asarray(m2.aux.alive)
            for name in FIELDS:
                np.testing.assert_allclose(
                    np.asarray(getattr(m2.params, name))[a2],
                    np.asarray(getattr(m1.params, name))[a1],
                    atol=1e-4, err_msg=f"scene{i}.{name}",
                )
            assert (tmp_path / f"scene{i}" / "gaussians_all.ply").exists()
