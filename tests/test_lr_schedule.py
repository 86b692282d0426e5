"""LR choreography tests: the per-stage warm-up/densify/restore schedules
must match the reference's optimizer-state games exactly (SURVEY.md §7
hard-part 4; reference coarse_obj_pose.py:178-193, gaussian_model.py:762-878).
Pure host logic — cheap and precise."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.config import Config
from egogaussian_tpu.models import from_points
from egogaussian_tpu.models.optim import expon_lr, gaussian_lr_tree
from egogaussian_tpu.train.coarse_pose import _coarse_lr_tree, _coarse_pose_lrs


def model_():
    rng = np.random.RandomState(0)
    return from_points(rng.randn(10, 3).astype(np.float32),
                       rng.rand(10, 3).astype(np.float32),
                       spatial_lr_scale=2.0, capacity=32)


class TestExponLR:
    def test_endpoints_and_monotonic(self):
        # reference get_expon_lr_func: log-lerp init->final over max_steps
        lr0 = float(expon_lr(jnp.float32(0), 1e-3, 1e-5, max_steps=1000))
        lr_end = float(expon_lr(jnp.float32(1000), 1e-3, 1e-5, max_steps=1000))
        np.testing.assert_allclose(lr0, 1e-3, rtol=1e-3)
        np.testing.assert_allclose(lr_end, 1e-5, rtol=1e-4)

    def test_delay_mult_warmup(self):
        # with lr_delay_steps=0 the delay has no effect (reference default path)
        lr = float(expon_lr(jnp.float32(500), 1e-3, 1e-5, lr_delay_steps=0,
                            lr_delay_mult=0.01, max_steps=1000))
        expected = np.exp(np.log(1e-3) * 0.5 + np.log(1e-5) * 0.5)
        np.testing.assert_allclose(lr, expected, rtol=1e-4)

    def test_negative_step_is_zero(self):
        assert float(expon_lr(jnp.float32(-1), 1e-3, 1e-5)) == 0.0


class TestStaticLRTree:
    def test_label_mode_zeroes_gaussians(self):
        m = model_()
        cfg = Config()
        t = gaussian_lr_tree(m.params, jnp.int32(10), cfg.opt, 2.0,
                             zero_gaussians=True)
        t = dataclasses.replace(t, label=jnp.float32(0.005))
        assert float(t.xyz) == 0 and float(t.log_scales) == 0
        np.testing.assert_allclose(float(t.label), 0.005, rtol=1e-5)

    def test_reference_dividers(self):
        m = model_()
        cfg = Config()
        t = gaussian_lr_tree(m.params, jnp.int32(1), cfg.opt, 2.0, label_lr=0.0)
        np.testing.assert_allclose(float(t.features_dc), cfg.opt.feature_lr)
        np.testing.assert_allclose(float(t.features_rest), cfg.opt.feature_lr / 20)
        np.testing.assert_allclose(float(t.opacity_logit), cfg.opt.opacity_lr)
        np.testing.assert_allclose(float(t.quats), cfg.opt.rotation_lr)


class TestCoarseChoreography:
    """coarse_obj_pose.py:178-193 LR switching, as implemented in
    _coarse_lr_tree/_coarse_pose_lrs (traced-`it` in-jit versions)."""

    def setup_method(self):
        self.cfg = Config()  # warm_up 20k, densify 20.5k-25.5k

    def _xyz(self, it, first_frame=False, spatial=2.0):
        m = dataclasses.replace(model_(), spatial_lr_scale=spatial)
        t = _coarse_lr_tree(m, jnp.int32(it), self.cfg.opt, self.cfg.coarse,
                            first_frame)
        return float(t.xyz)

    def _plr(self, it):
        t, r = _coarse_pose_lrs(jnp.int32(it), self.cfg.opt, self.cfg.coarse)
        return float(t), float(r)

    def test_warmup_pose_only_for_later_frames(self):
        t = _coarse_lr_tree(model_(), jnp.int32(100), self.cfg.opt,
                            self.cfg.coarse, first_frame=False)
        assert float(t.xyz) == 0 and float(t.features_dc) == 0
        np.testing.assert_allclose(
            self._plr(100),
            (self.cfg.opt.obj_translation_lr, self.cfg.opt.obj_rotation_lr),
            rtol=1e-6,
        )

    def test_first_frame_trains_shape_during_warmup(self):
        t = _coarse_lr_tree(model_(), jnp.int32(100), self.cfg.opt,
                            self.cfg.coarse, first_frame=True)
        base = self.cfg.opt.position_lr_init * 2.0 / 10.0
        np.testing.assert_allclose(float(t.xyz), base, rtol=1e-5)
        np.testing.assert_allclose(float(t.features_dc),
                                   self.cfg.opt.feature_lr / 10, rtol=1e-5)
        # opacity NOT divided (train_coarse_obj_setup)
        np.testing.assert_allclose(float(t.opacity_logit),
                                   self.cfg.opt.opacity_lr, rtol=1e-5)

    def test_post_warmup_xyz_tenth(self):
        lr = self._xyz(20_100)
        base = self.cfg.opt.position_lr_init * 2.0 / 10.0
        np.testing.assert_allclose(lr, base / 10.0, rtol=1e-5)

    def test_densify_window_freezes_pose_restores_xyz(self):
        assert self._plr(21_000) == (0.0, 0.0)
        lr = self._xyz(20_501)
        base = self.cfg.opt.position_lr_init * 2.0 / 10.0
        # expon schedule restarted at densify_from (step 1 of the schedule)
        assert base * 0.9 < lr <= base

    def test_pose_restored_after_densify(self):
        np.testing.assert_allclose(
            self._plr(25_500),
            (self.cfg.opt.obj_translation_lr, self.cfg.opt.obj_rotation_lr),
            rtol=1e-6,
        )
