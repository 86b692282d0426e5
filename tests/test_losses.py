import jax
import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.ops import (
    bce_with_logits,
    dice_loss,
    iou_loss,
    l1_loss,
    l2_loss,
    psnr,
    ssim,
)


def test_l1_l2():
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([0.0, 2.0, 5.0])
    np.testing.assert_allclose(l1_loss(a, b), 1.0, atol=1e-6)
    np.testing.assert_allclose(l2_loss(a, b), 5.0 / 3.0, atol=1e-6)


def test_psnr_known_value():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    np.testing.assert_allclose(psnr(a, b), 20.0, atol=1e-3)


def test_ssim_self_is_one():
    img = jax.random.uniform(jax.random.PRNGKey(0), (3, 32, 32))
    np.testing.assert_allclose(ssim(img, img), 1.0, atol=1e-4)


def test_ssim_decreases_with_noise():
    img = jax.random.uniform(jax.random.PRNGKey(1), (3, 32, 32))
    noisy = jnp.clip(img + 0.3 * jax.random.normal(jax.random.PRNGKey(2), img.shape), 0, 1)
    assert float(ssim(img, noisy)) < float(ssim(img, img)) - 0.05


def test_ssim_matches_reference_window_protocol():
    # SSIM of a constant vs shifted-constant pair has a closed form via C1.
    # Interior pixels only: the zero-padded SAME window biases the boundary
    # (exactly like the reference's torch conv2d with padding=win//2).
    from egogaussian_tpu.ops.losses import _depthwise_blur

    c = 0.5
    img1 = jnp.full((1, 32, 32), c)
    img2 = jnp.full((1, 32, 32), c + 0.1)
    C1, C2 = 0.01**2, 0.03**2
    mu1 = _depthwise_blur(img1, 11, 1.5)
    mu2 = _depthwise_blur(img2, 11, 1.5)
    s1 = _depthwise_blur(img1 * img1, 11, 1.5) - mu1 * mu1
    s2 = _depthwise_blur(img2 * img2, 11, 1.5) - mu2 * mu2
    s12 = _depthwise_blur(img1 * img2, 11, 1.5) - mu1 * mu2
    ssim_map = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1 * mu1 + mu2 * mu2 + C1) * (s1 + s2 + C2)
    )
    interior = ssim_map[:, 5:-5, 5:-5]
    expected = (2 * c * (c + 0.1) + C1) / (c**2 + (c + 0.1) ** 2 + C1)
    # f32 cancellation in blur(x^2)-mu^2 limits precision to ~1e-4
    np.testing.assert_allclose(interior, expected, atol=5e-4)


def test_bce_with_logits_matches_formula():
    logits = jnp.array([-3.0, -0.5, 0.0, 0.5, 3.0])
    targets = jnp.array([0.0, 1.0, 0.5, 0.0, 1.0])
    p = 1.0 / (1.0 + np.exp(-np.asarray(logits)))
    expected = -(targets * np.log(p) + (1 - targets) * np.log(1 - p)).mean()
    np.testing.assert_allclose(bce_with_logits(logits, targets), expected, atol=1e-5)


def test_dice_iou_bounds():
    p = jnp.array([1.0, 1.0, 0.0, 0.0])
    t = jnp.array([1.0, 1.0, 0.0, 0.0])
    assert float(dice_loss(p, t)) < 0.1
    assert float(iou_loss(p, t)) < 0.1
    t2 = jnp.array([0.0, 0.0, 1.0, 1.0])
    assert float(dice_loss(p, t2)) > 0.5
    assert float(iou_loss(p, t2)) > 0.5


def test_losses_differentiable():
    img = jax.random.uniform(jax.random.PRNGKey(3), (3, 16, 16))
    tgt = jax.random.uniform(jax.random.PRNGKey(4), (3, 16, 16))
    for fn in (l1_loss, l2_loss, ssim):
        g = jax.grad(lambda x: fn(x, tgt))(img)
        assert np.isfinite(np.asarray(g)).all()


def test_blur_matmul_impl_matches_conv():
    """The MXU band-matrix blur (impl="matmul", default on TPU) must match
    the depthwise conv to f32 rounding — values AND gradients — so SSIM
    keeps the reference window protocol on every backend."""
    import jax

    from egogaussian_tpu.ops.losses import _depthwise_blur

    x = jax.random.uniform(jax.random.PRNGKey(3), (15, 97, 131))
    a = _depthwise_blur(x, 11, 1.5, impl="conv")
    b = _depthwise_blur(x, 11, 1.5, impl="matmul")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    ga = jax.grad(
        lambda y: jnp.sum(jnp.sin(_depthwise_blur(y, 11, 1.5, impl="conv")))
    )(x)
    gb = jax.grad(
        lambda y: jnp.sum(jnp.sin(_depthwise_blur(y, 11, 1.5, impl="matmul")))
    )(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)
