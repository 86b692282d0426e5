"""Crop-window rendering (render/crop.py): the masked-object stages may
render only a window over the object support, with losses sum-normalized to
the full frame — these tests enforce the exactness claims:

  1. the cropped window's pixels match the full-frame render's same window
     (the principal-point shift is affine-exact) on every backend;
  2. `_pose_core` with crop_size produces the SAME loss and the same
     post-step parameters/pose as the full-frame step whenever the escape
     count is 0;
  3. the escape count actually fires when coverage fails;
  4. driver-side window sizing / growth policy.
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
from egogaussian_tpu.render.api import render
from egogaussian_tpu.render.crop import crop_window, mask_rect, mask_rect_table
from egogaussian_tpu.train.coarse_pose import pose_step


@pytest.fixture(scope="module")
def video():
    # large enough that a real sub-window exists around the object
    return make_synthetic_video(
        width=160, height=120, n_bg=100, n_obj=40,
        frames_static=2, frames_dynamic=2,
    )


def object_model(video, capacity=128):
    pts = video.gt_means[video.gt_is_object]
    cols = video.colors[video.gt_is_object]
    m = from_points(pts, cols, capacity=capacity)
    n = len(pts)
    params = dataclasses.replace(
        m.params,
        log_scales=m.params.log_scales.at[:n].set(np.log(0.09)),
        opacity_logit=m.params.opacity_logit.at[:n].set(3.0),
    )
    aux = dataclasses.replace(
        m.aux, is_object=m.aux.is_object.at[:n].set(1)
    )
    return dataclasses.replace(m, params=params, aux=aux)


def _render_kwargs(model, video):
    cam = video.cameras[1]
    return dict(
        camera=cam,
        means3d=model.params.xyz,
        cov3d=model.covariance(),
        opacities=model.opacity,
        bg=jnp.zeros(3),
        colors_precomp=jnp.clip(model.params.features_dc[:, 0, :], 0, None),
        valid_mask=model.aux.alive,
    )


class TestCropWindow:
    @pytest.mark.parametrize("backend", ["oracle", "tiled", "pallas"])
    def test_crop_matches_full_frame_window(self, video, backend):
        model = object_model(video)
        kw = _render_kwargs(model, video)
        full = jax.jit(lambda: render(backend=backend, **kw))()
        cw, ch = 128, 96
        crop = jax.jit(
            lambda: render(backend=backend, crop_size=(cw, ch), **kw)
        )()
        assert int(crop.crop_outside[0]) == 0, "object must fit the window"
        # the tracked per-axis need fits the window that produced 0 escapes
        assert int(crop.crop_outside[1]) <= cw + 2 * 32
        assert int(crop.crop_outside[2]) <= ch + 2 * 32
        ox, oy = int(crop.crop_offset[0]), int(crop.crop_offset[1])
        assert crop.image.shape[1:] == (ch, cw)
        np.testing.assert_allclose(
            np.asarray(crop.image),
            np.asarray(full.image[:, oy:oy + ch, ox:ox + cw]),
            atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(crop.alpha),
            np.asarray(full.alpha[:, oy:oy + ch, ox:ox + cw]),
            atol=2e-5,
        )
        # radii / projection are full-frame-identical by construction
        np.testing.assert_array_equal(
            np.asarray(crop.radii), np.asarray(full.radii)
        )

    def test_escape_count_fires(self, video):
        model = object_model(video)
        kw = _render_kwargs(model, video)
        # demand the window also covers a far-away rect: with the object on
        # one side and the rect on the other, a 48x48 window cannot cover
        # both -> nonzero escape count
        rect = jnp.asarray([0.0, 0.0, 20.0, 20.0])
        out = jax.jit(
            lambda: render(crop_size=(48, 48), crop_rect=rect,
                           backend="tiled", **kw)
        )()
        assert int(out.crop_outside[0]) > 0
        # the need vector names a window size that covers object + rect
        assert int(out.crop_outside[1]) > 48 or int(out.crop_outside[2]) > 48

    def test_crop_window_centers_on_support(self, video):
        model = object_model(video)
        kw = _render_kwargs(model, video)
        from egogaussian_tpu.render.project import project_gaussians

        cam = kw["camera"]
        proj = project_gaussians(
            kw["means3d"], kw["cov3d"], cam.viewmat, cam.fx, cam.fy,
            cam.cx, cam.cy, cam.width, cam.height,
            valid_mask=kw["valid_mask"],
        )
        ox, oy, outside = crop_window(
            proj, kw["opacities"], kw["valid_mask"], None,
            128, 96, cam.width, cam.height,
        )
        assert int(np.asarray(outside)[0]) == 0
        # every in-frame splat reach must be inside the window
        mu = np.asarray(proj.means2d)
        ok = np.asarray(proj.radii) > 0
        assert (mu[ok, 0] >= int(ox)).all() and (mu[ok, 0] <= int(ox) + 128).all()


class TestPoseCoreCrop:
    def _step(self, video, crop_size, train_pose=True, grad_params=True):
        model = object_model(video)
        batch = stack_cameras(video.cameras)
        pose = identity_pose()
        pose_opt = adam_init(pose)
        opt_state = adam_init(model.params)
        lr = jax.tree_util.tree_map(
            lambda x: jnp.float32(1e-3), model.params
        )
        return pose_step(
            model, opt_state, pose, pose_opt, batch, jnp.int32(1),
            jnp.eye(4), jnp.eye(3), lr,
            jnp.float32(1e-2), jnp.float32(1e-2), jnp.asarray(True),
            jnp.int32(0),
            train_pose=train_pose,
            grad_params=grad_params,
            lambda_l1_alpha=0.1,
            backend="tiled",
            crop_size=crop_size,
        )

    @pytest.mark.parametrize("grad_params", [True, False])
    def test_crop_step_matches_full(self, video, grad_params):
        full = self._step(video, None, grad_params=grad_params)
        crop = self._step(video, (128, 96), grad_params=grad_params)
        assert int(np.asarray(crop[7]).ravel()[0]) == 0, \
            "coverage must hold for this scene"
        # same loss (sum-normalized crop == full-frame mean)
        np.testing.assert_allclose(
            float(crop[4]), float(full[4]), rtol=1e-5
        )
        # same post-step pose and parameters
        np.testing.assert_allclose(
            np.asarray(crop[2].translation), np.asarray(full[2].translation),
            atol=1e-6,
        )
        for f in dataclasses.fields(full[0].params):
            np.testing.assert_allclose(
                np.asarray(getattr(crop[0].params, f.name)),
                np.asarray(getattr(full[0].params, f.name)),
                atol=5e-6, err_msg=f.name,
            )

    def test_crop_loss_trajectory_matches(self, video):
        """Several consecutive steps stay equivalent (window re-places
        itself as the pose moves)."""
        model_f = object_model(video)
        model_c = object_model(video)
        batch = stack_cameras(video.cameras)
        states = {}
        for tag, m, cs in (("full", model_f, None), ("crop", model_c, (128, 96))):
            pose = identity_pose()
            pose_opt = adam_init(pose)
            opt = adam_init(m.params)
            lr = jax.tree_util.tree_map(lambda x: jnp.float32(1e-3), m.params)
            losses = []
            crop_out = (jnp.zeros((3,), jnp.int32) if cs is not None
                        else jnp.int32(0))
            for _ in range(5):
                m, opt, pose, pose_opt, loss, _, _, crop_out = pose_step(
                    m, opt, pose, pose_opt, batch, jnp.int32(1),
                    jnp.eye(4), jnp.eye(3), lr,
                    jnp.float32(1e-2), jnp.float32(1e-2), jnp.asarray(True),
                    jnp.int32(0),
                    train_pose=True, backend="tiled", crop_size=cs,
                    crop_max=crop_out,
                )
                losses.append(float(loss))
            states[tag] = losses
            if cs is not None:
                assert int(np.asarray(crop_out)[0]) == 0
        np.testing.assert_allclose(
            states["crop"], states["full"], rtol=2e-5
        )


class TestDriverPolicies:
    def test_pose_crop_size_disabled_on_tiny_frames(self):
        vid = make_synthetic_video(width=48, height=36, n_bg=40, n_obj=16,
                                   frames_static=2, frames_dynamic=1)
        batch = stack_cameras(vid.cameras)
        from egogaussian_tpu.train.common import pose_crop_size

        assert pose_crop_size(batch, Config(), "test") is None

    def test_pose_crop_size_rounds_and_caps(self, video):
        batch = stack_cameras(video.cameras)
        from egogaussian_tpu.train.common import pose_crop_size

        cfg = Config()
        cfg.render = dataclasses.replace(cfg.render, pose_crop_margin=8)
        cs = pose_crop_size(batch, cfg, "test")
        if cs is not None:
            cw, ch = cs
            assert cw % 128 == 0 and ch % 8 == 0
            assert cw <= batch.width and ch <= batch.height
        cfg.render = dataclasses.replace(cfg.render, pose_crop=False)
        assert pose_crop_size(batch, cfg, "test") is None

    def test_maybe_grow_crop(self, video):
        batch = stack_cameras(video.cameras)
        from egogaussian_tpu.train.common import maybe_grow_crop

        stat = lambda c, nw=0, nh=0: np.asarray([c, nw, nh], np.int32)
        # no escapes -> unchanged
        cs, last, changed = maybe_grow_crop((128, 64), stat(0), 0, batch, "t")
        assert cs == (128, 64) and not changed
        # escapes -> grow (and reset baseline)
        cs, last, changed = maybe_grow_crop((16, 16), stat(3), 0, batch, "t")
        assert changed and cs[0] > 16 and last == 0
        # growth lands at ~full frame -> disable
        cs, last, changed = maybe_grow_crop(
            (batch.width - 1, batch.height - 1), stat(5), 0, batch, "t"
        )
        assert cs is None and changed

    def test_maybe_grow_crop_directional(self):
        # The r4 regression: at 640x480 a 512x384 window escaped in HEIGHT
        # only; the old symmetric 128x64 grow reached 640x448 = 93% area
        # and disabled. Directional growth to the tracked need must keep
        # cropping (512x448 = 75% < 80% bound).
        import types
        from egogaussian_tpu.train.common import maybe_grow_crop

        batch = types.SimpleNamespace(width=640, height=480)
        stat = np.asarray([65, 0, 440], np.int32)  # height-only need
        cs, last, changed = maybe_grow_crop((512, 384), stat, 0, batch, "t")
        assert changed and cs is not None
        assert cs[0] == 512 and cs[1] == 440 and last == 0
        assert cs[0] * cs[1] < 0.8 * 640 * 480
        # escape -> grow -> re-enable cycle: a later escape with a need that
        # no window under the 80% bound satisfies finally disables
        cs2, _, changed2 = maybe_grow_crop(
            cs, np.asarray([3, 640, 480], np.int32), 0, batch, "t"
        )
        assert changed2 and cs2 is None
        # width-only growth stays width-only
        cs3, _, _ = maybe_grow_crop(
            (256, 128), np.asarray([2, 300, 0], np.int32), 0, batch, "t"
        )
        assert cs3 == (384, 128)
        # escapes with a stale/fitting need fall back to a symmetric bump
        cs4, _, ch4 = maybe_grow_crop(
            (256, 128), np.asarray([1, 100, 50], np.int32), 0, batch, "t"
        )
        assert ch4 and cs4 == (384, 192)

    def test_mask_rect_table_matches_single(self, video):
        batch = stack_cameras(video.cameras)
        table = np.asarray(mask_rect_table(batch.obj_masks))
        for f in range(batch.num_frames):
            single = np.asarray(
                mask_rect(batch.decode_mask(batch.obj_masks[f]))
            )
            if (single[2] > single[0]):
                np.testing.assert_allclose(table[f], single)
