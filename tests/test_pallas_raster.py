"""Pallas rasterizer tests (interpret mode on CPU): forward equivalence with
the oracle and gradient equivalence with the tiled-XLA path, for BOTH
kernel flavors (stream compositor and tile-grid DMA compositor)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egogaussian_tpu.ops import covariance_from_scaling_rotation
from egogaussian_tpu.render.api import render
from egogaussian_tpu.render.tiled import TileConfig
from tests.test_render import make_camera, random_scene


CFG = TileConfig(max_per_tile=256, max_pairs=8192, tile_size=16)


class TestPallasForward:
    @pytest.mark.parametrize("n", [1, 60])
    @pytest.mark.parametrize("comp", ["stream", "tilegrid", "tilegrid-mxu"])
    def test_matches_oracle(self, n, comp):
        cfg = dataclasses.replace(
            CFG, compositor=comp.split("-")[0],
            mxu_accum=comp.endswith("mxu"),
        )
        cam = make_camera(width=48, height=32)
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(11), n)
        a = render(cam, means, cov3d, ops, jnp.array([0.2, 0.1, 0.4]),
                   colors_precomp=colors, backend="oracle")
        b = render(cam, means, cov3d, ops, jnp.array([0.2, 0.1, 0.4]),
                   colors_precomp=colors, backend="pallas", tile_config=cfg)
        np.testing.assert_allclose(np.asarray(b.image), np.asarray(a.image), atol=3e-4)
        np.testing.assert_allclose(np.asarray(b.alpha), np.asarray(a.alpha), atol=3e-4)
        np.testing.assert_allclose(np.asarray(b.depth), np.asarray(a.depth), atol=3e-3)

    def test_label_channel(self):
        cam = make_camera(width=32, height=32)
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(12), 30)
        labels = jax.random.normal(jax.random.PRNGKey(13), (30, 1))
        a = render(cam, means, cov3d, ops, jnp.zeros(1),
                   colors_precomp=labels, backend="oracle")
        b = render(cam, means, cov3d, ops, jnp.zeros(1),
                   colors_precomp=labels, backend="pallas", tile_config=CFG)
        np.testing.assert_allclose(np.asarray(b.image), np.asarray(a.image), atol=3e-4)


class TestPallasBackward:
    @pytest.mark.parametrize("comp", ["stream", "tilegrid", "tilegrid-mxu"])
    def test_grads_match_tiled(self, comp):
        # "tilegrid-mxu": the MXU-matmul accumulation flavor
        # (TileConfig.mxu_accum) must match everything else too — same
        # math, different accumulation engine/order
        cfg = dataclasses.replace(
            CFG, compositor=comp.split("-")[0],
            mxu_accum=comp.endswith("mxu"),
        )
        cam = make_camera(width=32, height=32)
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(14), 40)
        target = jax.random.uniform(jax.random.PRNGKey(15), (3, 32, 32))
        bg = jnp.array([0.3, 0.2, 0.1])

        def loss(backend, m, c, o, cv):
            res = render(cam, m, cv, o, bg, colors_precomp=c,
                         backend=backend, tile_config=cfg)
            return (
                jnp.mean((res.image - target) ** 2)
                + 0.3 * jnp.mean(res.alpha)
                + 0.1 * jnp.mean(res.depth)
            )

        args = (means, colors, ops, cov3d)
        g_tiled = jax.grad(lambda *a: loss("tiled", *a), argnums=(0, 1, 2, 3))(*args)
        g_pallas = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3))(*args)
        for gt, gp, name in zip(g_tiled, g_pallas, "means colors ops cov3d".split()):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gt), atol=2e-4, rtol=1e-3,
                err_msg=f"grad mismatch: {name}",
            )

    @pytest.mark.parametrize("exact_total", [False, True])
    @pytest.mark.parametrize("scatter_layout", [False, True])
    def test_tile_size_32_pixel_blocked_bwd(self, exact_total,
                                            scatter_layout):
        # tile_size=32 runs the backward's pixel-block loop with n_pb=4
        # (1024 px / 256-row blocks) — the path that keeps the kernel's
        # live VMEM under the 16 MB scoped limit on real hardware.
        # scatter_layout covers both layout-construction paths (bit-equal
        # layouts, different op chains).
        cfg = TileConfig(max_per_tile=256, max_pairs=8192, tile_size=32,
                         compositor="tilegrid", bwd_exact_total=exact_total,
                         scatter_layout=scatter_layout)
        cam = make_camera(width=64, height=64)
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(21), 50)
        target = jax.random.uniform(jax.random.PRNGKey(22), (3, 64, 64))
        bg = jnp.array([0.3, 0.2, 0.1])

        def loss(backend, m, c, o, cv):
            res = render(cam, m, cv, o, bg, colors_precomp=c,
                         backend=backend, tile_config=cfg)
            return (
                jnp.mean((res.image - target) ** 2)
                + 0.3 * jnp.mean(res.alpha)
                + 0.1 * jnp.mean(res.depth)
            )

        args = (means, colors, ops, cov3d)
        a = render(cam, means, cov3d, ops, bg, colors_precomp=colors,
                   backend="oracle")
        b = render(cam, means, cov3d, ops, bg, colors_precomp=colors,
                   backend="pallas", tile_config=cfg)
        np.testing.assert_allclose(np.asarray(b.image), np.asarray(a.image),
                                   atol=3e-4)
        g_tiled = jax.grad(lambda *x: loss("tiled", *x),
                           argnums=(0, 1, 2, 3))(*args)
        g_pallas = jax.grad(lambda *x: loss("pallas", *x),
                            argnums=(0, 1, 2, 3))(*args)
        for gt, gp, name in zip(g_tiled, g_pallas,
                                "means colors ops cov3d".split()):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gt), atol=2e-4, rtol=1e-3,
                err_msg=f"grad mismatch: {name}",
            )

    def test_probe_grads_match(self):
        cam = make_camera(width=32, height=32)
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(16), 25)
        probe = jnp.zeros((25, 2))

        def loss(backend, p):
            res = render(cam, means, cov3d, ops, jnp.zeros(3),
                         colors_precomp=colors, means2d_probe=p,
                         backend=backend, tile_config=CFG)
            return jnp.mean(res.image**2)

        g_t = jax.grad(lambda p: loss("tiled", p))(probe)
        g_p = jax.grad(lambda p: loss("pallas", p))(probe)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_t), atol=2e-4)


class TestSaturationEarlySkip:
    """The tilegrid kernels skip a tile's remaining chunks once every
    pixel's transmittance drops below _SAT_SKIP_EPS (pallas_raster.py).
    Build a 140-deep stack of broad alpha~0.2 splats: chunk 2 (pairs
    129..140) sits behind T ~ 1e-9..1e-13 — saturated per the skip
    threshold but NOT yet f32-underflowed, so the skip is observable
    (exact-zero tail gradients) while the true tail contribution is
    ~1e-10 (bounded by the threshold)."""

    def _deep_stack(self, n=140):
        z = jnp.linspace(0.0, 2.0, n)  # camera at -4 -> depths 4..6
        means = jnp.stack([jnp.zeros(n), jnp.zeros(n), z], axis=1)
        cov3d = covariance_from_scaling_rotation(
            jnp.full((n, 3), 2.0), jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
        )
        colors = jax.random.uniform(jax.random.PRNGKey(31), (n, 3))
        ops = jnp.full((n,), 0.2)
        return means, cov3d, colors, ops

    @pytest.mark.parametrize("exact_total", [False, True])
    def test_saturated_tail_skipped_and_bounded(self, exact_total):
        cfg = dataclasses.replace(CFG, compositor="tilegrid",
                                  bwd_exact_total=exact_total)
        cam = make_camera(width=32, height=32)
        means, cov3d, colors, ops = self._deep_stack()
        bg = jnp.array([0.3, 0.2, 0.1])

        a = render(cam, means, cov3d, ops, bg, colors_precomp=colors,
                   backend="oracle")
        b = render(cam, means, cov3d, ops, bg, colors_precomp=colors,
                   backend="pallas", tile_config=cfg)
        assert int(b.dropped_pairs) == 0
        np.testing.assert_allclose(np.asarray(b.image), np.asarray(a.image),
                                   atol=3e-4)
        np.testing.assert_allclose(np.asarray(b.depth), np.asarray(a.depth),
                                   atol=3e-3)

        def loss(backend, c):
            res = render(cam, means, cov3d, ops, bg, colors_precomp=c,
                         backend=backend, tile_config=cfg)
            return jnp.mean((res.image - 0.5) ** 2) + 0.1 * jnp.mean(res.depth)

        g_o = jax.grad(lambda c: loss("oracle", c))(colors)
        g_p = jax.grad(lambda c: loss("pallas", c))(colors)
        # front layer: full-accuracy gradients
        np.testing.assert_allclose(np.asarray(g_p[:64]), np.asarray(g_o[:64]),
                                   atol=2e-5, rtol=1e-3)
        tail_p = np.asarray(g_p[130:])
        tail_o = np.asarray(g_o[130:])
        # the skip engaged: tail grads are EXACT zeros (a full compute would
        # leave ~1e-10 residue, which f32 still represents)
        assert (tail_p == 0.0).all(), "chunk-2 grads nonzero: skip never ran"
        # and it was sound: the oracle's true tail grads are negligible
        assert np.abs(tail_o).max() < 1e-8


class TestCapacityOverflow:
    """ADVICE r1: when the chunk-padded layout exceeds max_pairs, trailing
    tiles' output blocks were uninitialized memory. Now they are masked to
    background and counted in dropped_pairs."""

    @pytest.mark.parametrize("comp", ["stream", "tilegrid"])
    def test_overflow_masked_and_counted(self, comp):
        # 60 gaussians over a 48x32 image -> several nonempty tiles; cap
        # max_pairs to ONE chunk so everything past the first tile overflows
        cfg = TileConfig(max_per_tile=128, max_pairs=128, tile_size=16,
                         compositor=comp)
        cam = make_camera(width=48, height=32)
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(21), 60)
        bg = jnp.array([0.25, 0.5, 0.75])
        res = render(cam, means, cov3d, ops, bg, colors_precomp=colors,
                     backend="pallas", tile_config=cfg)
        img = np.asarray(res.image)
        assert np.isfinite(img).all()
        assert int(res.dropped_pairs) > 0
        # overflowed tiles render exactly background / zero alpha
        alpha = np.asarray(res.alpha)
        # at least one tile beyond the first chunk exists and is masked
        assert (alpha == 0).any()
        # every pixel is either composited or exact bg in each channel
        for c in range(3):
            ch = img[c]
            assert np.isfinite(ch).all()

    def test_non_chunk_multiple_max_pairs_rounded(self):
        # ADVICE r1 (low): user-built configs with max_pairs % 128 != 0
        # previously truncated the last partial chunk; now rounded up
        cfg = TileConfig(max_per_tile=128, max_pairs=1000, tile_size=16)
        cam = make_camera(width=48, height=32)
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(22), 40)
        a = render(cam, means, cov3d, ops, jnp.zeros(3),
                   colors_precomp=colors, backend="oracle")
        b = render(cam, means, cov3d, ops, jnp.zeros(3),
                   colors_precomp=colors, backend="pallas", tile_config=cfg)
        np.testing.assert_allclose(
            np.asarray(b.image), np.asarray(a.image), atol=3e-4
        )


class TestKnnSceneDeepTiles:
    """Regression for the round-2 TPU verify finding: the tiny random-scene
    tests above never exercise the configuration real training hits — a
    kNN-initialized cloud whose broad low-alpha splats make every tile
    deep (multi-chunk runs, many pairs near the ALPHA_EPS threshold).
    Cover forward + training-loss gradients at that shape, for both
    kernel flavors, against the tiled-XLA path."""

    @pytest.mark.slow
    @pytest.mark.parametrize("comp", ["stream", "tilegrid"])
    def test_training_loss_grads_match_tiled(self, comp):
        from egogaussian_tpu.config import Config
        from egogaussian_tpu.data.readers import stack_cameras
        from egogaussian_tpu.data.synthetic import make_synthetic_video
        from egogaussian_tpu.models import from_points
        from egogaussian_tpu.render.project import project_gaussians
        from egogaussian_tpu.render.tiled import bin_pairs
        from egogaussian_tpu.train.common import (
            auto_tile_config, image_loss, mask_grad, render_gaussians,
        )

        vid = make_synthetic_video(width=96, height=72, n_bg=800, n_obj=100,
                                   frames_static=3, frames_dynamic=2, seed=7)
        batch = stack_cameras(vid.cameras[:2])
        model = from_points(vid.points, vid.colors, spatial_lr_scale=1.2,
                            seed=0)
        tile_cfg = dataclasses.replace(
            auto_tile_config(model, batch.camera(0)), compositor=comp)
        cam, gt, hand, _ = batch.frame(0)

        # the scene must actually produce multi-chunk tiles, else this test
        # stops covering what it claims to
        proj = project_gaussians(
            model.params.xyz, model.covariance(), cam.viewmat, cam.fx,
            cam.fy, cam.cx, cam.cy, 96, 72, valid_mask=model.aux.alive)
        *_, tile_cnt, _, _ = jax.jit(
            lambda p: bin_pairs(p, 96, 72, tile_cfg))(proj)
        assert int(jnp.max(tile_cnt)) > 128, "scene no longer multi-chunk"

        def loss_of(params, backend):
            m = dataclasses.replace(model, params=params)
            res = render_gaussians(m, cam, jnp.zeros(3), backend=backend,
                                   tile_config=tile_cfg)
            return image_loss(mask_grad(res.image, hand), gt, 0.2)

        lt, g_t = jax.jit(jax.value_and_grad(
            lambda p: loss_of(p, "tiled")))(model.params)
        lp, g_p = jax.jit(jax.value_and_grad(
            lambda p: loss_of(p, "pallas")))(model.params)
        np.testing.assert_allclose(float(lp), float(lt), rtol=1e-4)
        for f in ["xyz", "log_scales", "quats", "opacity_logit",
                  "features_dc"]:
            a = np.asarray(getattr(g_p, f))
            b = np.asarray(getattr(g_t, f))
            sc = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(
                a, b, atol=2e-3 * sc,
                err_msg=f"kNN-scene grad mismatch: {f}")


class TestExactTotalBackward:
    """TileConfig.bwd_exact_total: the two-sweep backward (total_wd
    recomputed in the gradient sweep's own accumulation order) must match
    both the default forward-sweep backward and the oracle."""

    def test_grads_match_default_and_oracle(self):
        import dataclasses

        from egogaussian_tpu.ops import covariance_from_scaling_rotation
        from egogaussian_tpu.render.api import render
        from egogaussian_tpu.render.camera import Camera, look_at
        from egogaussian_tpu.render.tiled import TileConfig

        R, t = look_at(np.array([0.0, 0.0, -4.0]), np.zeros(3))
        cam = Camera.from_colmap(R, t, 60.0, 60.0, 64, 48)
        k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(0), 5)
        n = 300
        means = jax.random.normal(k1, (n, 3))
        scales = jnp.exp(jax.random.normal(k2, (n, 3)) * 0.3 - 1.6)
        cov3d = covariance_from_scaling_rotation(
            scales, jax.random.normal(k3, (n, 4)))
        colors = jax.random.uniform(k4, (n, 3))
        ops = jax.random.uniform(k5, (n,), minval=0.3, maxval=0.99)
        bg = jnp.array([0.2, 0.1, 0.3])
        target = jax.random.uniform(jax.random.PRNGKey(9), (3, 48, 64))
        cfg = TileConfig(max_pairs=16384, max_per_tile=1024,
                         max_slots=16384)
        cfg_e = dataclasses.replace(cfg, bwd_exact_total=True)

        def loss(backend, c_, m, c, o):
            res = render(cam, m, cov3d, o, bg, colors_precomp=c,
                         backend=backend, tile_config=c_)
            return (jnp.mean((res.image - target) ** 2)
                    + 0.1 * jnp.mean(res.alpha)
                    + 0.01 * jnp.mean(res.depth))

        go = jax.grad(lambda *a: loss("oracle", None, *a),
                      argnums=(0, 1, 2))(means, colors, ops)
        gd = jax.grad(lambda *a: loss("pallas", cfg, *a),
                      argnums=(0, 1, 2))(means, colors, ops)
        ge = jax.grad(lambda *a: loss("pallas", cfg_e, *a),
                      argnums=(0, 1, 2))(means, colors, ops)
        for x, y, z in zip(go, gd, ge):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       atol=5e-6)
            np.testing.assert_allclose(np.asarray(z), np.asarray(x),
                                       atol=5e-6)


class TestRasterizerSelfDiagnosis:
    """render/debug.py: the layout differential and dense-reference kernel
    check must pass on the kNN training-init scene (the configuration the
    round-2 TPU verify drive flagged)."""

    @pytest.mark.slow
    def test_layout_and_kernel_checks_pass(self):
        from egogaussian_tpu.data.readers import stack_cameras
        from egogaussian_tpu.data.synthetic import make_synthetic_video
        from egogaussian_tpu.models import from_points
        from egogaussian_tpu.render.api import _colors_from_sh
        from egogaussian_tpu.render.debug import (
            check_layout, check_tilegrid_kernel,
        )
        from egogaussian_tpu.render.project import project_gaussians
        from egogaussian_tpu.train.common import auto_tile_config

        vid = make_synthetic_video(width=96, height=72, n_bg=800, n_obj=100,
                                   frames_static=3, frames_dynamic=2, seed=7)
        batch = stack_cameras(vid.cameras[:2])
        model = from_points(vid.points, vid.colors, spatial_lr_scale=1.2,
                            seed=0)
        cfg = auto_tile_config(model, batch.camera(0))
        cam = batch.camera(0)
        proj = project_gaussians(
            model.params.xyz, model.covariance(), cam.viewmat, cam.fx,
            cam.fy, cam.cx, cam.cy, 96, 72, valid_mask=model.aux.alive)
        sh = jnp.concatenate(
            [model.params.features_dc, model.params.features_rest], axis=1)
        colors = _colors_from_sh(sh, model.sh_degree, model.params.xyz,
                                 cam.camera_center)
        opac = jnp.where(model.aux.alive, model.opacity, 0.0)

        lay = check_layout(proj, colors, opac, 96, 72, cfg)
        assert lay.mismatched_tiles == 0, lay
        assert lay.overflowed_tiles == 0, lay
        assert lay.multi_chunk_tiles > 0, (
            "scene no longer multi-chunk; diagnosis coverage lost")
        ker = check_tilegrid_kernel(proj, colors, opac, 96, 72, cfg)
        assert ker.bad_tiles == 0, ker
        assert ker.skipped_tiles == 0, (
            "default max_chunks no longer covers the deepest tile", ker)
