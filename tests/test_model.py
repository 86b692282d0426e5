"""Tests for the GaussianModel pytree, Adam surgery, densify/prune, pose
sequences, and PLY round trips."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.models import (
    AdamState,
    ObjectPose,
    PoseSequence,
    adam_init,
    adam_update,
    add_densification_stats,
    combine_models,
    compact,
    densify_and_prune,
    from_points,
    identity_pose,
    load_ply,
    pose_to_se3,
    prune_by_opacity,
    reset_opacity,
    save_ply,
)
from egogaussian_tpu.models.pose import (
    empty_pose_sequence,
    interpolate_pose_sequence,
    se3_nth_root,
    save_pose_sequence,
    load_pose_sequence,
)
from egogaussian_tpu.ops.se3 import make_se3
from egogaussian_tpu.ops.quaternion import quat_to_rotmat, quat_normalize


def small_model(n=50, seed=0, capacity=None):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    return from_points(pts, cols, capacity=capacity)


class TestInit:
    def test_from_points_matches_reference_init(self):
        # reference create_from_pcd (gaussian_model.py:274-338)
        m = small_model(40)
        n = int(m.num_alive)
        assert n == 40
        alive = np.asarray(m.aux.alive)
        # opacity init = 0.1 through sigmoid
        np.testing.assert_allclose(
            np.asarray(m.opacity)[alive], 0.1, atol=1e-5
        )
        # label init 0.01
        np.testing.assert_allclose(
            np.asarray(m.params.label)[alive], 0.01, atol=1e-6
        )
        # quats identity
        np.testing.assert_allclose(
            np.asarray(m.params.quats)[alive], [[1, 0, 0, 0]] * 40, atol=1e-6
        )
        # isotropic scales from knn dists
        ls = np.asarray(m.params.log_scales)[alive]
        assert np.allclose(ls[:, 0], ls[:, 1]) and np.allclose(ls[:, 0], ls[:, 2])

    def test_capacity_padding_dead(self):
        m = small_model(10, capacity=64)
        assert m.capacity == 64
        assert int(m.num_alive) == 10
        assert not np.asarray(m.aux.alive)[10:].any()


class TestAdam:
    def test_adam_step_moves_params(self):
        m = small_model(20)
        state = adam_init(m.params)
        grads = jax.tree_util.tree_map(jnp.ones_like, m.params)
        lr = jax.tree_util.tree_map(lambda x: 0.1, m.params)
        new_params, new_state = adam_update(m.params, grads, state, lr)
        # adam with constant grad: first step ~= -lr
        np.testing.assert_allclose(
            np.asarray(new_params.xyz - m.params.xyz), -0.1, atol=1e-5
        )
        assert int(new_state.count) == 1

    def test_zero_lr_freezes_field(self):
        m = small_model(20)
        state = adam_init(m.params)
        grads = jax.tree_util.tree_map(jnp.ones_like, m.params)
        lr = dataclasses.replace(
            jax.tree_util.tree_map(lambda x: 0.1, m.params),
            xyz=0.0,
        )
        new_params, _ = adam_update(m.params, grads, state, lr)
        np.testing.assert_allclose(np.asarray(new_params.xyz), np.asarray(m.params.xyz))
        assert not np.allclose(
            np.asarray(new_params.log_scales), np.asarray(m.params.log_scales)
        )


class TestDensify:
    def test_stats_accumulation(self):
        m = small_model(20)
        g2d = jnp.ones((m.capacity, 2))
        radii = jnp.where(jnp.arange(m.capacity) < 10, 5, 0).astype(jnp.int32)
        m2 = add_densification_stats(m, g2d, radii)
        acc = np.asarray(m2.aux.xyz_gradient_accum)
        np.testing.assert_allclose(acc[:10], np.sqrt(2.0), atol=1e-5)
        np.testing.assert_allclose(acc[10:], 0.0)
        np.testing.assert_allclose(np.asarray(m2.aux.denom)[:10], 1.0)
        np.testing.assert_allclose(np.asarray(m2.aux.max_radii2d)[:10], 5.0)

    def test_clone_small_gaussians(self):
        m = small_model(20, capacity=128)
        state = adam_init(m.params)
        # mark all alive with high grads; tiny scales => clone path
        aux = dataclasses.replace(
            m.aux,
            xyz_gradient_accum=jnp.where(m.aux.alive, 10.0, 0.0),
            denom=jnp.where(m.aux.alive, 1.0, 0.0),
        )
        m = dataclasses.replace(m, aux=aux)
        params = dataclasses.replace(m.params, log_scales=jnp.full((128, 3), -8.0))
        m = dataclasses.replace(m, params=params)
        res = densify_and_prune(
            m, state, jax.random.PRNGKey(0),
            max_grad=1.0, min_opacity=0.005, extent=10.0, max_screen_size=None,
        )
        assert int(res.num_cloned) == 20
        assert int(res.num_split) == 0
        assert int(res.model.num_alive) == 40
        # stats reset after densification (postfix semantics)
        assert float(jnp.sum(res.model.aux.xyz_gradient_accum)) == 0.0

    def test_split_large_gaussians(self):
        m = small_model(10, capacity=64)
        state = adam_init(m.params)
        aux = dataclasses.replace(
            m.aux,
            xyz_gradient_accum=jnp.where(m.aux.alive, 10.0, 0.0),
            denom=jnp.where(m.aux.alive, 1.0, 0.0),
        )
        params = dataclasses.replace(m.params, log_scales=jnp.full((64, 3), 1.0))
        m = dataclasses.replace(m, aux=aux, params=params)
        res = densify_and_prune(
            m, state, jax.random.PRNGKey(0),
            max_grad=1.0, min_opacity=0.005, extent=1.0, max_screen_size=None,
        )
        # each of 10 selected -> 2 children, parent pruned
        assert int(res.num_split) == 20
        assert int(res.num_pruned) == 10
        assert int(res.model.num_alive) == 20
        # children scales shrunk by 1/(0.8*2)
        alive = np.asarray(res.model.aux.alive)
        child_scales = np.asarray(res.model.params.log_scales)[alive]
        np.testing.assert_allclose(
            child_scales, 1.0 - np.log(1.6), atol=1e-5
        )

    def test_prune_by_low_opacity(self):
        m = small_model(20)
        state = adam_init(m.params)
        logit = np.full((m.capacity, 1), -10.0, np.float32)  # ~0 opacity
        logit[:5] = 3.0  # keep 5
        params = dataclasses.replace(m.params, opacity_logit=jnp.asarray(logit))
        m = dataclasses.replace(m, params=params)
        res = densify_and_prune(
            m, state, jax.random.PRNGKey(0),
            max_grad=1e9, min_opacity=0.005, extent=10.0, max_screen_size=None,
        )
        assert int(res.model.num_alive) == 5

    def test_moments_zeroed_for_new_slots(self):
        m = small_model(10, capacity=64)
        state = adam_init(m.params)
        # put fake moments everywhere
        ones = jax.tree_util.tree_map(jnp.ones_like, m.params)
        state = AdamState(mu=ones, nu=ones, count=state.count)
        aux = dataclasses.replace(
            m.aux,
            xyz_gradient_accum=jnp.where(m.aux.alive, 10.0, 0.0),
            denom=jnp.where(m.aux.alive, 1.0, 0.0),
        )
        params = dataclasses.replace(m.params, log_scales=jnp.full((64, 3), -8.0))
        m = dataclasses.replace(m, aux=aux, params=params)
        res = densify_and_prune(
            m, state, jax.random.PRNGKey(0),
            max_grad=1.0, min_opacity=0.005, extent=10.0, max_screen_size=None,
        )
        mu = np.asarray(res.opt_state.mu.xyz)
        alive = np.asarray(res.model.aux.alive)
        # original 10 keep their moments; new 10 slots zeroed
        assert np.allclose(mu[:10], 1.0)
        new_slots = alive.copy()
        new_slots[:10] = False
        assert np.allclose(mu[new_slots], 0.0)

    def test_object_filter(self):
        m = small_model(20, capacity=128)
        state = adam_init(m.params)
        aux = dataclasses.replace(
            m.aux,
            xyz_gradient_accum=jnp.where(m.aux.alive, 10.0, 0.0),
            denom=jnp.where(m.aux.alive, 1.0, 0.0),
            is_object=jnp.where(jnp.arange(128) < 5, 1, 0),
        )
        params = dataclasses.replace(m.params, log_scales=jnp.full((128, 3), -8.0))
        m = dataclasses.replace(m, aux=aux, params=params)
        res = densify_and_prune(
            m, state, jax.random.PRNGKey(0),
            max_grad=1.0, min_opacity=0.005, extent=10.0, max_screen_size=None,
            which_object=1,
        )
        assert int(res.num_cloned) == 5
        # new points inherit is_object=1
        alive = np.asarray(res.model.aux.alive)
        assert np.asarray(res.model.aux.is_object)[alive].sum() == 10

    def test_opacity_reset(self):
        m = small_model(10)
        state = adam_init(m.params)
        ones = jax.tree_util.tree_map(jnp.ones_like, m.params)
        state = AdamState(mu=ones, nu=ones, count=state.count)
        m2, state2 = reset_opacity(m, state, max_opacity=0.01)
        alive = np.asarray(m2.aux.alive)
        assert (np.asarray(m2.opacity)[alive] <= 0.0101).all()
        assert np.allclose(np.asarray(state2.mu.opacity_logit), 0.0)
        assert np.allclose(np.asarray(state2.mu.xyz), 1.0)  # others untouched

    def test_prune_by_opacity_fn(self):
        m = small_model(10)
        state = adam_init(m.params)
        m2, state2, n = prune_by_opacity(m, state, min_opacity=0.5)
        assert int(n) == 10  # all at 0.1 < 0.5
        assert int(m2.num_alive) == 0


class TestEnsureCapacity:
    def test_padding_is_type_safe(self):
        # regression: zero-padded quats have NaN normalize-gradients which
        # poison training through 0 * NaN (found by the quality run)
        from egogaussian_tpu.models.gaussians import ensure_capacity

        m = small_model(20, capacity=32)
        # fill almost all slots so growth triggers
        m = dataclasses.replace(
            m, aux=dataclasses.replace(m.aux, alive=jnp.ones(32, bool))
        )
        state = adam_init(m.params)
        m2, state2, grew = ensure_capacity(m, state, min_free=16)
        assert grew and m2.capacity == 64
        pad_quats = np.asarray(m2.params.quats)[32:]
        np.testing.assert_allclose(pad_quats, [[1, 0, 0, 0]] * 32)
        assert (np.asarray(m2.params.log_scales)[32:] < -5).all()
        # moments padded with zeros
        assert np.allclose(np.asarray(state2.mu.xyz)[32:], 0.0)

    def test_zero_quat_gradient_finite(self):
        from egogaussian_tpu.ops.quaternion import quat_to_rotmat

        g = jax.grad(lambda q: jnp.sum(quat_to_rotmat(q)))(jnp.zeros(4))
        assert np.isfinite(np.asarray(g)).all()

    def test_full_loss_grad_finite_with_dead_zero_rows(self):
        # end-to-end: a model with zero-ish dead rows must produce finite
        # grads for everything through the render loss
        from egogaussian_tpu.render.api import render
        from egogaussian_tpu.ops.covariance import covariance_from_scaling_rotation
        from tests.test_render import make_camera

        cam = make_camera(width=32, height=24)
        m = small_model(10, capacity=32)
        params = dataclasses.replace(
            m.params, quats=m.params.quats.at[10:].set(0.0)
        )  # simulate the old zero padding

        def loss(quats):
            cov = covariance_from_scaling_rotation(
                jnp.exp(params.log_scales), quats
            )
            res = render(
                cam, params.xyz, cov, jax.nn.sigmoid(params.opacity_logit[:, 0]),
                jnp.zeros(3), colors_precomp=jnp.ones((32, 3)),
                valid_mask=m.aux.alive,
            )
            return jnp.mean(res.image)

        g = jax.grad(loss)(params.quats)
        assert np.isfinite(np.asarray(g)).all()


class TestCombineCompact:
    def test_compact_packs_front(self):
        m = small_model(20, capacity=128)
        alive = np.zeros(128, bool)
        alive[5:15] = True
        m = dataclasses.replace(
            m, aux=dataclasses.replace(m.aux, alive=jnp.asarray(alive))
        )
        c = compact(m)
        assert int(c.num_alive) == 10
        assert np.asarray(c.aux.alive)[:10].all()
        np.testing.assert_allclose(
            np.asarray(c.params.xyz)[:10], np.asarray(m.params.xyz)[5:15]
        )

    def test_combine(self):
        a = small_model(10, seed=0)
        b = small_model(7, seed=1)
        c = combine_models(a, b)
        assert int(c.num_alive) == 17


class TestPlyIO:
    def test_round_trip(self, tmp_path):
        m = small_model(25)
        m = dataclasses.replace(
            m,
            aux=dataclasses.replace(
                m.aux, is_object=jnp.where(jnp.arange(m.capacity) < 5, 1, 0)
            ),
        )
        path = str(tmp_path / "test.ply")
        save_ply(m, path)
        m2 = load_ply(path)
        assert int(m2.num_alive) == 25
        a1 = np.asarray(m.aux.alive)
        a2 = np.asarray(m2.aux.alive)
        np.testing.assert_allclose(
            np.asarray(m2.params.xyz)[a2], np.asarray(m.params.xyz)[a1], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(m2.params.label)[a2], np.asarray(m.params.label)[a1], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(m2.aux.is_object)[a2], np.asarray(m.aux.is_object)[a1]
        )

    def test_load_force_flags(self, tmp_path):
        m = small_model(5)
        path = str(tmp_path / "o.ply")
        save_ply(m, path)
        m_bg = load_ply(path, force_bg=True)
        assert np.asarray(m_bg.aux.is_object).sum() == 0


class TestPose:
    def test_identity_pose_se3(self):
        np.testing.assert_allclose(pose_to_se3(identity_pose()), np.eye(4), atol=1e-6)

    def test_sequence_accum(self):
        seq = empty_pose_sequence(5)
        R = np.asarray(quat_to_rotmat(quat_normalize(jnp.asarray([0.9, 0.1, 0.2, 0.0]))))
        p = ObjectPose(
            translation=jnp.array([1.0, 0, 0]),
            rot6d=jnp.asarray(R[:, :2]),
        )
        seq = seq.update_frame(1, p)
        acc = np.asarray(seq.accum_T())
        np.testing.assert_allclose(acc[0], np.eye(4), atol=1e-6)
        T1 = np.asarray(make_se3(jnp.asarray(R), jnp.array([1.0, 0, 0])))
        np.testing.assert_allclose(acc[1], T1, atol=1e-5)
        np.testing.assert_allclose(acc[4], T1, atol=1e-5)  # identity after

    def test_nth_root(self):
        R = np.asarray(
            quat_to_rotmat(quat_normalize(jnp.asarray([0.9, 0.3, -0.2, 0.1])))
        )
        T = np.asarray(make_se3(jnp.asarray(R), jnp.asarray([0.5, -0.3, 1.0])))
        D = np.asarray(se3_nth_root(jnp.asarray(T), 4))
        P = np.eye(4)
        for _ in range(4):
            P = D @ P
        np.testing.assert_allclose(P, T, atol=1e-5)

    def test_interpolation_fills_gaps(self):
        # frames 0..4 dynamic; frame 3 solved with T; 0-2 unsolved
        seq = empty_pose_sequence(5)
        R = np.asarray(quat_to_rotmat(quat_normalize(jnp.asarray([0.95, 0.2, 0.1, 0.0]))))
        p = ObjectPose(translation=jnp.asarray([0.4, 0.0, -0.2]), rot6d=jnp.asarray(R[:, :2]))
        seq = seq.update_frame(3, p)
        out = interpolate_pose_sequence(seq)
        assert np.asarray(out.solved)[:4].all()
        # product of deltas 0..3 == original T3
        acc = np.asarray(out.accum_T())
        T3 = np.asarray(make_se3(jnp.asarray(R), jnp.asarray([0.4, 0.0, -0.2])))
        np.testing.assert_allclose(acc[3], T3, atol=1e-4)

    def test_sequence_io(self, tmp_path):
        seq = empty_pose_sequence(3).update_frame(
            1, ObjectPose(jnp.array([1.0, 2, 3]), jnp.eye(3)[:, :2])
        )
        path = str(tmp_path / "poses.npz")
        save_pose_sequence(path, seq, ["f0", "f1", "f2"])
        seq2, names = load_pose_sequence(path)
        assert names == ["f0", "f1", "f2"]
        np.testing.assert_allclose(
            np.asarray(seq2.translations), np.asarray(seq.translations)
        )


class TestConfig:
    def test_defaults_and_roundtrip(self, tmp_path):
        from argparse import ArgumentParser
        from egogaussian_tpu.config import (
            Config, add_config_args, extract_config, load_config, save_config,
        )

        cfg = Config()
        # spot-check reference defaults (arguments/__init__.py)
        assert cfg.opt.position_lr_init == 0.00016
        assert cfg.static.std_train_iter == 50_000
        assert cfg.coarse.warm_up_iter == 20_000
        assert cfg.coarse.densify_from_iter == 20_500
        assert cfg.fine.densify_grad_threshold == 0.1 / 100 / 3
        assert cfg.fine_all.total_num_iter == 40_000

        parser = ArgumentParser()
        add_config_args(parser)
        args = parser.parse_args(["--s_std_train_iter", "123", "--iterations", "77"])
        cfg = extract_config(args)
        assert cfg.static.std_train_iter == 123
        assert cfg.opt.iterations == 77

        path = str(tmp_path / "cfg.json")
        save_config(cfg, path)
        cfg2 = load_config(path)
        assert cfg2.static.std_train_iter == 123
