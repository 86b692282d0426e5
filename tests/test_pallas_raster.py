"""Pallas rasterizer tests (interpret mode on CPU): forward equivalence with
the oracle and gradient equivalence with the tiled-XLA path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egogaussian_tpu.render.api import render
from egogaussian_tpu.render.tiled import TileConfig
from tests.test_render import make_camera, random_scene


CFG = TileConfig(max_per_tile=256, max_pairs=8192, tile_size=16)


class TestPallasForward:
    @pytest.mark.parametrize("n", [1, 60])
    def test_matches_oracle(self, n):
        cam = make_camera(width=48, height=32)
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(11), n)
        a = render(cam, means, cov3d, ops, jnp.array([0.2, 0.1, 0.4]),
                   colors_precomp=colors, backend="oracle")
        b = render(cam, means, cov3d, ops, jnp.array([0.2, 0.1, 0.4]),
                   colors_precomp=colors, backend="pallas", tile_config=CFG)
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
    def test_grads_match_tiled(self):
        cam = make_camera(width=32, height=32)
        means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(14), 40)
        target = jax.random.uniform(jax.random.PRNGKey(15), (3, 32, 32))
        bg = jnp.array([0.3, 0.2, 0.1])

        def loss(backend, m, c, o, cv):
            res = render(cam, m, cv, o, bg, colors_precomp=c,
                         backend=backend, tile_config=CFG)
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
