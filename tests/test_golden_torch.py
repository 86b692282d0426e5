"""Golden-value tests against torch-CPU implementations of the reference's
exact formulas (SURVEY.md §7 step 1: "golden tests against recorded torch
outputs" — torch is in the image, so we evaluate the reference's own math
live instead of shipping recordings)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


class TestSSIMGolden:
    def test_matches_reference_torch_ssim(self):
        """Reference utils/loss_utils.py:66-106: 11x11 gaussian window
        sigma=1.5, conv2d with padding=window//2, groups=channels."""
        import torch.nn.functional as F

        def torch_ssim(img1, img2, window_size=11):
            def gaussian(ws, sigma):
                g = torch.tensor([
                    math.exp(-((x - ws // 2) ** 2) / float(2 * sigma**2))
                    for x in range(ws)
                ])
                return g / g.sum()

            channel = img1.size(0)
            _1d = gaussian(window_size, 1.5).unsqueeze(1)
            _2d = _1d.mm(_1d.t()).float().unsqueeze(0).unsqueeze(0)
            window = _2d.expand(channel, 1, window_size, window_size).contiguous()
            i1 = img1.unsqueeze(0)
            i2 = img2.unsqueeze(0)
            pad = window_size // 2
            mu1 = F.conv2d(i1, window, padding=pad, groups=channel)
            mu2 = F.conv2d(i2, window, padding=pad, groups=channel)
            mu1_sq, mu2_sq, mu1_mu2 = mu1.pow(2), mu2.pow(2), mu1 * mu2
            s1 = F.conv2d(i1 * i1, window, padding=pad, groups=channel) - mu1_sq
            s2 = F.conv2d(i2 * i2, window, padding=pad, groups=channel) - mu2_sq
            s12 = F.conv2d(i1 * i2, window, padding=pad, groups=channel) - mu1_mu2
            C1, C2 = 0.01**2, 0.03**2
            m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
                (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
            )
            return m.mean().item()

        from egogaussian_tpu.ops.losses import ssim

        rng = np.random.RandomState(0)
        a = rng.rand(3, 40, 56).astype(np.float32)
        b = np.clip(a + 0.1 * rng.randn(3, 40, 56).astype(np.float32), 0, 1)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        theirs = torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
        np.testing.assert_allclose(ours, theirs, atol=2e-5)


class TestBCEGolden:
    def test_matches_torch_bce_with_logits(self):
        from egogaussian_tpu.ops.losses import bce_with_logits

        rng = np.random.RandomState(1)
        logits = rng.randn(1, 24, 32).astype(np.float32) * 5
        targets = (rng.rand(1, 24, 32) > 0.5).astype(np.float32)
        ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
        theirs = torch.nn.BCEWithLogitsLoss()(
            torch.from_numpy(logits), torch.from_numpy(targets)
        ).item()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestBuildRotationGolden:
    def test_matches_reference_build_rotation(self):
        """Reference utils/general_utils.py:124-145 (normalize then rotmat)."""
        from egogaussian_tpu.ops.quaternion import quat_to_rotmat

        def torch_build_rotation(r):
            norm = torch.sqrt(
                r[:, 0] ** 2 + r[:, 1] ** 2 + r[:, 2] ** 2 + r[:, 3] ** 2
            )
            q = r / norm[:, None]
            R = torch.zeros((q.size(0), 3, 3))
            rr, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
            R[:, 0, 0] = 1 - 2 * (y * y + z * z)
            R[:, 0, 1] = 2 * (x * y - rr * z)
            R[:, 0, 2] = 2 * (x * z + rr * y)
            R[:, 1, 0] = 2 * (x * y + rr * z)
            R[:, 1, 1] = 1 - 2 * (x * x + z * z)
            R[:, 1, 2] = 2 * (y * z - rr * x)
            R[:, 2, 0] = 2 * (x * z - rr * y)
            R[:, 2, 1] = 2 * (y * z + rr * x)
            R[:, 2, 2] = 1 - 2 * (x * x + y * y)
            return R

        rng = np.random.RandomState(2)
        q = rng.randn(32, 4).astype(np.float32)
        ours = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        theirs = torch_build_rotation(torch.from_numpy(q)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestAdamGolden:
    def test_matches_torch_adam(self):
        """Hand-rolled Adam == torch.optim.Adam(eps=1e-15) over 20 steps
        (matching the reference's optimizer hyperparameters)."""
        from egogaussian_tpu.models.optim import AdamState, adam_update

        rng = np.random.RandomState(3)
        p0 = rng.randn(50, 3).astype(np.float32)
        grads = [rng.randn(50, 3).astype(np.float32) for _ in range(20)]

        tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        topt = torch.optim.Adam([tp], lr=1e-2, eps=1e-15)
        for g in grads:
            topt.zero_grad()
            tp.grad = torch.from_numpy(g)
            topt.step()

        jp = jnp.asarray(p0)
        state = AdamState(
            mu=jnp.zeros_like(jp), nu=jnp.zeros_like(jp),
            count=jnp.zeros((), jnp.int32),
        )
        for g in grads:
            jp, state = adam_update(jp, jnp.asarray(g), state, jnp.float32(1e-2))
        np.testing.assert_allclose(
            np.asarray(jp), tp.detach().numpy(), atol=2e-5
        )
