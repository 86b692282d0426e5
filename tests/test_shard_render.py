"""Depth-slab Gaussian-sharded rendering == single-device oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.parallel import make_mesh
from egogaussian_tpu.parallel.shard_render import (
    make_memory_sharded_render,
    make_sharded_render,
)
from egogaussian_tpu.render.api import render
from tests.test_render import make_camera, random_scene


def test_sharded_matches_oracle():
    cam = make_camera(width=64, height=48)
    means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(21), 120)
    valid = jnp.ones(120, bool)

    ref = render(cam, means, cov3d, ops, jnp.zeros(3),
                 colors_precomp=colors, backend="oracle")

    mesh = make_mesh(n_data=8)
    fn = make_sharded_render(mesh, cam)
    out = fn(means, cov3d, colors, ops, valid)

    np.testing.assert_allclose(np.asarray(out.image), np.asarray(ref.image),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=5e-3)


def test_memory_sharded_matches_oracle():
    """Params SHARDED over the mesh (each device owns N/8 arbitrary
    Gaussians, so no device ever holds a full replica); the all-to-all
    re-slab must reproduce the single-device oracle, including nonzero bg
    and dead rows."""
    cam = make_camera(width=64, height=48)
    n = 256  # divisible by 8: 32 gaussians resident per device
    means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(23), n)
    alive = jnp.arange(n) < (n - 17)
    bg = jnp.array([0.15, 0.3, 0.45])

    ref = render(cam, means, cov3d, ops, bg,
                 colors_precomp=colors, valid_mask=alive, backend="oracle")

    mesh = make_mesh(n_data=8)
    fn = make_memory_sharded_render(mesh, cam, capacity_factor=3.0)
    out, dropped = fn(means, cov3d, colors, ops, alive, bg=bg)

    assert int(dropped) == 0, int(dropped)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(ref.image),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=5e-3)


def test_memory_sharded_capacity_overflow_counted():
    """A deliberately tiny capacity_factor drops Gaussians — the count must
    be reported nonzero (observability, never silent)."""
    cam = make_camera(width=48, height=32)
    n = 256
    means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(24), n)
    valid = jnp.ones(n, bool)
    mesh = make_mesh(n_data=8)
    fn = make_memory_sharded_render(mesh, cam, capacity_factor=0.25)
    out, dropped = fn(means, cov3d, colors, ops, valid)
    assert int(dropped) > 0
    assert np.isfinite(np.asarray(out.image)).all()


def test_sharded_with_dead_rows():
    cam = make_camera(width=48, height=32)
    means, cov3d, colors, ops = random_scene(jax.random.PRNGKey(22), 64)
    alive = jnp.arange(64) < 40
    ref = render(cam, means, cov3d, ops, jnp.zeros(3),
                 colors_precomp=colors, valid_mask=alive, backend="oracle")
    mesh = make_mesh(n_data=8)
    fn = make_sharded_render(mesh, cam)
    out = fn(means, cov3d, colors, ops, alive)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(ref.image),
                               atol=5e-4)
