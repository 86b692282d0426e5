"""Renderer tests: oracle semantics, tiled == oracle, differentiability,
screen-space gradient probe (SURVEY.md §4: golden-value + VJP checks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egogaussian_tpu.ops import covariance_from_scaling_rotation
from egogaussian_tpu.render.camera import Camera, look_at
from egogaussian_tpu.render.project import project_gaussians
from egogaussian_tpu.render.api import render, render_label
from egogaussian_tpu.render.tiled import TileConfig


def make_camera(width=64, height=48, gt=None):
    R, t = look_at(np.array([0.0, 0.0, -4.0]), np.array([0.0, 0.0, 0.0]))
    focal = 60.0
    return Camera.from_colmap(R, t, focal, focal, width, height, gt_image=gt)


def random_scene(key, n=200, spread=1.0):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = spread * jax.random.normal(k1, (n, 3))
    scales = jnp.exp(jax.random.normal(k2, (n, 3)) * 0.3 - 2.5)
    quats = jax.random.normal(k3, (n, 4))
    cov3d = covariance_from_scaling_rotation(scales, quats)
    colors = jax.random.uniform(k4, (n, 3))
    opacities = jax.random.uniform(k5, (n,), minval=0.3, maxval=0.95)
    return means, cov3d, colors, opacities


class TestProjection:
    def test_center_gaussian_projects_to_center(self):
        cam = make_camera()
        means = jnp.array([[0.0, 0.0, 0.0]])
        cov3d = covariance_from_scaling_rotation(
            jnp.full((1, 3), 0.1), jnp.array([[1.0, 0, 0, 0]])
        )
        proj = project_gaussians(
            means, cov3d, cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height,
        )
        np.testing.assert_allclose(
            proj.means2d[0], [cam.width / 2, cam.height / 2], atol=1e-4
        )
        np.testing.assert_allclose(proj.depths[0], 4.0, atol=1e-5)
        assert int(proj.radii[0]) > 0

    def test_behind_camera_culled(self):
        cam = make_camera()
        means = jnp.array([[0.0, 0.0, -10.0]])  # behind camera
        cov3d = covariance_from_scaling_rotation(
            jnp.full((1, 3), 0.1), jnp.array([[1.0, 0, 0, 0]])
        )
        proj = project_gaussians(
            means, cov3d, cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height,
        )
        assert int(proj.radii[0]) == 0

    def test_valid_mask_culls(self):
        cam = make_camera()
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(0), 50)
        proj = project_gaussians(
            means, cov3d, cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height, valid_mask=jnp.zeros(50, bool),
        )
        assert int(proj.radii.sum()) == 0


class TestOracle:
    def test_empty_scene_renders_background(self):
        cam = make_camera()
        bg = jnp.array([0.2, 0.4, 0.6])
        res = render(
            cam,
            jnp.zeros((4, 3)),
            covariance_from_scaling_rotation(
                jnp.full((4, 3), 0.01), jnp.tile(jnp.array([1.0, 0, 0, 0]), (4, 1))
            ),
            jnp.zeros(4),
            bg,
            colors_precomp=jnp.ones((4, 3)),
            valid_mask=jnp.zeros(4, bool),
            backend="oracle",
        )
        np.testing.assert_allclose(
            res.image, jnp.broadcast_to(bg[:, None, None], res.image.shape), atol=1e-5
        )
        np.testing.assert_allclose(res.alpha, 0.0, atol=1e-6)

    def test_single_opaque_gaussian_center_color(self):
        cam = make_camera()
        means = jnp.array([[0.0, 0.0, 0.0]])
        cov3d = covariance_from_scaling_rotation(
            jnp.full((1, 3), 0.3), jnp.array([[1.0, 0, 0, 0]])
        )
        color = jnp.array([[0.9, 0.1, 0.3]])
        res = render(
            cam, means, cov3d, jnp.array([0.99]), jnp.zeros(3),
            colors_precomp=color, backend="oracle",
        )
        center = res.image[:, cam.height // 2, cam.width // 2]
        # alpha capped at 0.99 -> center color ~= 0.99 * color (up to the
        # half-pixel offset between the projected mean and the pixel center)
        np.testing.assert_allclose(center, 0.99 * color[0], atol=0.02)
        # depth at center ~ 0.99 * z
        np.testing.assert_allclose(
            res.depth[0, cam.height // 2, cam.width // 2], 0.99 * 4.0, atol=0.1
        )

    def test_front_to_back_ordering(self):
        cam = make_camera()
        # red gaussian in front of blue, both opaque: front wins
        means = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
        cov3d = covariance_from_scaling_rotation(
            jnp.full((2, 3), 0.5), jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
        )
        colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        res = render(
            cam, means, cov3d, jnp.array([0.99, 0.99]), jnp.zeros(3),
            colors_precomp=colors, backend="oracle",
        )
        center = res.image[:, cam.height // 2, cam.width // 2]
        assert float(center[0]) > 0.9
        assert float(center[2]) < 0.05


class TestTiledMatchesOracle:
    @pytest.mark.parametrize("n", [1, 17, 300])
    def test_equivalence(self, n):
        cam = make_camera(width=80, height=56)
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(42), n)
        kwargs = dict(colors_precomp=colors)
        a = render(cam, means, cov3d, ops, jnp.array([0.1, 0.2, 0.3]),
                   backend="oracle", **kwargs)
        b = render(cam, means, cov3d, ops, jnp.array([0.1, 0.2, 0.3]),
                   backend="tiled", **kwargs)
        np.testing.assert_allclose(b.image, a.image, atol=2e-4)
        np.testing.assert_allclose(b.alpha, a.alpha, atol=2e-4)
        np.testing.assert_allclose(b.depth, a.depth, atol=2e-3)

    def test_equivalence_with_padding_rows(self):
        cam = make_camera()
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(7), 64)
        alive = jnp.arange(64) < 40
        a = render(cam, means, cov3d, ops, jnp.zeros(3), colors_precomp=colors,
                   valid_mask=alive, backend="oracle")
        b = render(cam, means, cov3d, ops, jnp.zeros(3), colors_precomp=colors,
                   valid_mask=alive, backend="tiled")
        np.testing.assert_allclose(b.image, a.image, atol=2e-4)

    def test_gradients_match_oracle(self):
        cam = make_camera(width=32, height=32)
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(3), 40)
        target = jax.random.uniform(jax.random.PRNGKey(9), (3, 32, 32))

        def loss(backend, m, c, o):
            res = render(cam, m, cov3d, o, jnp.zeros(3), colors_precomp=c,
                         backend=backend)
            return jnp.mean((res.image - target) ** 2)

        ga = jax.grad(lambda *a: loss("oracle", *a), argnums=(0, 1, 2))(
            means, colors, ops
        )
        gb = jax.grad(lambda *a: loss("tiled", *a), argnums=(0, 1, 2))(
            means, colors, ops
        )
        for x, y in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=5e-4)
            assert np.isfinite(np.asarray(y)).all()


class TestOpacityAwareCull:
    """bin_pairs' opacity-aware pair cull (no reference twin — the CUDA
    rasterizer bins the plain 3-sigma AABB): culled pairs must be exactly
    the ones every compositor would zero (alpha < ALPHA_EPS over the whole
    tile), so outputs and gradients are unchanged while the pair stream —
    and with it every capacity-scaled cost — shrinks."""

    def _binned(self, cam, means, cov3d, ops, cfg=None, cull=True):
        from egogaussian_tpu.render.tiled import TileConfig, bin_pairs

        proj = project_gaussians(
            means, cov3d, cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height,
        )
        cfg = cfg or TileConfig(max_pairs=16384, max_per_tile=1024)
        *_, cnt, dropped, _ = bin_pairs(
            proj, cam.width, cam.height, cfg,
            opacities=ops if cull else None,
        )
        return int(cnt.sum()), int(dropped)

    def test_low_opacity_scene_culls_and_matches_oracle(self):
        cam = make_camera(width=80, height=56)
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(11), 300)
        ops = jnp.full_like(ops, 0.01)  # post-opacity-reset regime
        culled, d1 = self._binned(cam, means, cov3d, ops, cull=True)
        full, d2 = self._binned(cam, means, cov3d, ops, cull=False)
        assert d1 == 0 and d2 == 0
        assert culled < 0.55 * full, (culled, full)
        a = render(cam, means, cov3d, ops, jnp.array([0.3, 0.1, 0.2]),
                   colors_precomp=colors, backend="oracle")
        for backend in ("tiled", "pallas"):
            b = render(cam, means, cov3d, ops, jnp.array([0.3, 0.1, 0.2]),
                       colors_precomp=colors, backend=backend)
            np.testing.assert_allclose(b.image, a.image, atol=2e-5,
                                       err_msg=backend)
            np.testing.assert_allclose(b.alpha, a.alpha, atol=2e-5)
            np.testing.assert_allclose(b.depth, a.depth, atol=2e-4)

    def test_subthreshold_opacity_culls_everything(self):
        from egogaussian_tpu.render.oracle import ALPHA_EPS

        cam = make_camera()
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(12), 50)
        ops = jnp.full_like(ops, 0.9 * ALPHA_EPS)  # alpha < eps everywhere
        culled, _ = self._binned(cam, means, cov3d, ops, cull=True)
        assert culled == 0
        bgc = jnp.array([0.5, 0.6, 0.7])
        a = render(cam, means, cov3d, ops, bgc, colors_precomp=colors,
                   backend="oracle")
        b = render(cam, means, cov3d, ops, bgc, colors_precomp=colors,
                   backend="tiled")
        np.testing.assert_allclose(np.asarray(a.image),
                                   np.broadcast_to(
                                       np.asarray(bgc)[:, None, None],
                                       a.image.shape), atol=1e-6)
        np.testing.assert_allclose(b.image, a.image, atol=1e-6)

    def test_gradients_unchanged_by_cull(self):
        cam = make_camera(width=48, height=32)
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(13), 80)
        # mix in low opacities so the cull is active
        ops = ops.at[::3].set(0.02)
        target = jax.random.uniform(jax.random.PRNGKey(9), (3, 32, 48))

        def loss(backend, m, c, o):
            res = render(cam, m, cov3d, o, jnp.zeros(3), colors_precomp=c,
                         backend=backend)
            return jnp.mean((res.image - target) ** 2)

        ga = jax.grad(lambda *a: loss("oracle", *a), argnums=(0, 1, 2))(
            means, colors, ops
        )
        for backend in ("tiled", "pallas"):
            gb = jax.grad(lambda *a: loss(backend, *a), argnums=(0, 1, 2))(
                means, colors, ops
            )
            for x, y in zip(ga, gb):
                np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                           atol=5e-5, err_msg=backend)
                assert np.isfinite(np.asarray(y)).all()

    def test_drop_triggered_capacity_regrowth(self):
        """The opacity-reset-then-regrow hazard: capacities estimated from
        a low-opacity scene must regrow via maybe_regrow_tile_config once
        renders report dropped pairs at the higher opacities."""
        from egogaussian_tpu.models import from_points
        from egogaussian_tpu.render.tiled import bin_pairs, estimate_tile_config
        from egogaussian_tpu.train.common import maybe_regrow_tile_config

        import dataclasses

        cam = make_camera(width=80, height=56)
        rng = np.random.RandomState(15)
        pts = rng.randn(400, 3).astype(np.float32)
        cols = rng.rand(400, 3).astype(np.float32)
        model = from_points(pts, cols, capacity=400)
        inv = float(np.log(0.95 / 0.05))  # opacity 0.95, retrained upward
        model = dataclasses.replace(
            model, params=dataclasses.replace(
                model.params,
                opacity_logit=jnp.full_like(model.params.opacity_logit, inv),
            ))
        proj = project_gaussians(
            model.params.xyz, model.covariance(), cam.viewmat, cam.fx,
            cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            valid_mask=model.aux.alive,
        )
        hi = jnp.where(model.aux.alive, model.opacity, 0.0)
        low = jnp.where(model.aux.alive, 0.011, 0.0)  # post-reset estimate
        cfg = estimate_tile_config(
            proj.means2d, proj.radii, proj.depths, cam.width, cam.height,
            opacities=low, headroom=1.05,
        )
        *_, cnt, dropped, _ = bin_pairs(proj, cam.width, cam.height, cfg,
                                        opacities=hi)
        if int(dropped) == 0:
            pytest.skip("scene too sparse to overflow — scenario not hit")
        cfg2, last, changed = maybe_regrow_tile_config(
            model, cam, cfg, dropped, 0, "test"
        )
        assert changed and last == int(dropped)
        assert cfg2.max_pairs >= cfg.max_pairs
        *_, cnt2, dropped2, _ = bin_pairs(proj, cam.width, cam.height, cfg2,
                                          opacities=hi)
        assert int(dropped2) == 0

    def test_regrowth_rearm_semantics(self):
        """After a changed regrowth the caller resets (drop_max, last_drop)
        to 0 — verify the helper then retriggers on drops BELOW the
        historical max (the counter is a running max; without the reset a
        persistent 8k-drop after a one-off 10k-drop would never
        retrigger), and that kernel-selecting fields survive regrowth."""
        import dataclasses

        from egogaussian_tpu.models import from_points
        from egogaussian_tpu.render.tiled import TileConfig
        from egogaussian_tpu.train.common import maybe_regrow_tile_config

        rng = np.random.RandomState(16)
        model = from_points(rng.randn(64, 3).astype(np.float32),
                            rng.rand(64, 3).astype(np.float32), capacity=64)
        cam = make_camera(width=48, height=32)
        cfg = TileConfig(max_pairs=4096, max_per_tile=256, max_slots=4096,
                         bwd_exact_total=True, compositor="stream")
        cfg2, last, changed = maybe_regrow_tile_config(
            model, cam, cfg, jnp.int32(10_000), 0, "test"
        )
        assert changed and last == 10_000
        # kernel-selecting fields preserved (review finding: replace was
        # rebuilding from the fresh estimate's defaults)
        assert cfg2.bwd_exact_total is True
        assert cfg2.compositor == "stream"
        assert cfg2.tile_size == cfg.tile_size
        # caller resets to (0, 0): a drop below the historical max must
        # retrigger
        cfg3, last3, changed3 = maybe_regrow_tile_config(
            model, cam, cfg2, jnp.int32(8_000), 0, "test"
        )
        assert last3 == 8_000  # seen and processed, not short-circuited
        # and without the reset (old bug): it would short-circuit
        cfg4, last4, changed4 = maybe_regrow_tile_config(
            model, cam, cfg2, jnp.int32(8_000), 10_000, "test"
        )
        assert not changed4 and last4 == 10_000

    def test_estimator_tracks_culled_stream(self):
        from egogaussian_tpu.render.tiled import bin_pairs, estimate_tile_config

        cam = make_camera(width=80, height=56)
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(14), 400)
        ops = ops.at[::2].set(0.015)
        proj = project_gaussians(
            means, cov3d, cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height,
        )
        cfg = estimate_tile_config(
            proj.means2d, proj.radii, proj.depths, cam.width, cam.height,
            opacities=ops,
        )
        # capacities sized from the culled stream must hold it: no drops
        *_, cnt, dropped, _ = bin_pairs(
            proj, cam.width, cam.height, cfg, opacities=ops
        )
        assert int(dropped) == 0
        assert int(cnt.sum()) <= cfg.max_pairs


class TestScreenGradProbe:
    def test_probe_gradient_nonzero_for_visible(self):
        # The means2d_probe recovers the reference's viewspace_points.grad
        # used for densification stats (gaussian_renderer/__init__.py:28-32)
        cam = make_camera()
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(5), 30)
        probe = jnp.zeros((30, 2))

        def loss(p):
            res = render(cam, means, cov3d, ops, jnp.zeros(3),
                         colors_precomp=colors, means2d_probe=p, backend="tiled")
            return jnp.mean(res.image)

        g = jax.grad(loss)(probe)
        assert np.isfinite(np.asarray(g)).all()
        res = render(cam, means, cov3d, ops, jnp.zeros(3),
                     colors_precomp=colors, backend="tiled")
        visible = np.asarray(res.radii) > 0
        gn = np.linalg.norm(np.asarray(g), axis=-1)
        assert (gn[visible] > 0).mean() > 0.5  # most visible gaussians get grads
        assert (gn[~visible] == 0).all()


class TestLabelRender:
    def test_label_image_and_detached_geometry(self):
        cam = make_camera()
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(6), 30)
        labels = jax.random.normal(jax.random.PRNGKey(8), (30,))

        out = render_label(cam, means, cov3d, ops, labels)
        assert out.shape == (1, cam.height, cam.width)

        # grads flow to labels but NOT to geometry
        g_lab = jax.grad(lambda l: jnp.sum(render_label(cam, means, cov3d, ops, l)))(
            labels
        )
        assert np.abs(np.asarray(g_lab)).sum() > 0
        g_geo = jax.grad(
            lambda m: jnp.sum(render_label(cam, m, cov3d, ops, labels))
        )(means)
        np.testing.assert_allclose(np.asarray(g_geo), 0.0, atol=1e-7)
