"""Unit tests for core math ops (quaternion, 6D rot, SE(3), covariance, SH).

The reference has no tests (SURVEY.md §4); these encode its inline runtime
asserts (pose round-trips, orthonormality) as a proper test pyramid.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egogaussian_tpu.ops import (
    accumulate_rotations,
    accumulate_transforms,
    build_scaling_rotation,
    covariance_from_scaling_rotation,
    covariance_from_scaling_rotation_rotated,
    make_se3,
    mean_sq_dist_to_knn,
    quat_multiply,
    quat_normalize,
    quat_to_rotmat,
    rgb_to_sh,
    rot6d_to_rotmat,
    rotmat_to_quat,
    rotmat_to_rot6d,
    se3_apply,
    se3_compose,
    se3_inverse,
    sh_to_rgb,
    strip_symmetric,
    unpack_symmetric,
    eval_sh,
)


def random_quats(key, n):
    return quat_normalize(jax.random.normal(key, (n, 4)))


class TestQuaternion:
    def test_rotmat_orthonormal(self):
        q = random_quats(jax.random.PRNGKey(0), 64)
        R = quat_to_rotmat(q)
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_round_trip(self):
        q = random_quats(jax.random.PRNGKey(1), 128)
        q = jnp.where(q[:, :1] < 0, -q, q)  # canonical sign
        q2 = rotmat_to_quat(quat_to_rotmat(q))
        np.testing.assert_allclose(q2, q, atol=1e-4)

    def test_multiply_matches_matmul(self):
        ka, kb = jax.random.split(jax.random.PRNGKey(2))
        a, b = random_quats(ka, 32), random_quats(kb, 32)
        R_ab = quat_to_rotmat(quat_multiply(a, b))
        np.testing.assert_allclose(
            R_ab, quat_to_rotmat(a) @ quat_to_rotmat(b), atol=1e-5
        )

    def test_identity(self):
        q = jnp.array([1.0, 0, 0, 0])
        np.testing.assert_allclose(quat_to_rotmat(q), np.eye(3), atol=1e-6)


class TestRot6D:
    def test_round_trip(self):
        q = random_quats(jax.random.PRNGKey(3), 64)
        R = quat_to_rotmat(q)
        R2 = rot6d_to_rotmat(rotmat_to_rot6d(R))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_orthonormal_from_noise(self):
        d6 = jax.random.normal(jax.random.PRNGKey(4), (32, 3, 2))
        R = rot6d_to_rotmat(d6)
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_flat_input(self):
        d6 = jax.random.normal(jax.random.PRNGKey(5), (6,))
        np.testing.assert_allclose(
            rot6d_to_rotmat(d6), rot6d_to_rotmat(d6.reshape(3, 2)), atol=1e-6
        )


class TestSE3:
    def test_inverse(self):
        q = random_quats(jax.random.PRNGKey(6), 16)
        t = jax.random.normal(jax.random.PRNGKey(7), (16, 3))
        T = make_se3(quat_to_rotmat(q), t)
        np.testing.assert_allclose(
            T @ se3_inverse(T), np.tile(np.eye(4), (16, 1, 1)), atol=1e-5
        )

    def test_apply_round_trip(self):
        # Twin of the reference's inline assert: apply then reverse returns
        # the original xyz (coarse_obj_pose.py:317, atol=1e-3; ours is tighter)
        q = random_quats(jax.random.PRNGKey(8), 1)[0]
        t = jnp.array([0.3, -1.2, 2.0])
        T = make_se3(quat_to_rotmat(q), t)
        xyz = jax.random.normal(jax.random.PRNGKey(9), (100, 3))
        back = se3_apply(se3_inverse(T), se3_apply(T, xyz))
        np.testing.assert_allclose(back, xyz, atol=1e-5)

    def test_accumulate_matches_loop(self):
        # accumulate_transforms == reference get_accum_T_seq's python loop
        # (geometry_utils.py:152-169): A_k = T_k @ ... @ T_0
        F = 9
        q = random_quats(jax.random.PRNGKey(10), F)
        t = 0.1 * jax.random.normal(jax.random.PRNGKey(11), (F, 3))
        T = make_se3(quat_to_rotmat(q), t)
        acc = accumulate_transforms(T)
        expected = np.eye(4)
        for k in range(F):
            expected = np.asarray(T[k]) @ expected
            np.testing.assert_allclose(acc[k], expected, atol=1e-4)

    def test_accumulate_rotations(self):
        F = 5
        R = quat_to_rotmat(random_quats(jax.random.PRNGKey(12), F))
        acc = accumulate_rotations(R)
        expected = np.eye(3)
        for k in range(F):
            expected = np.asarray(R[k]) @ expected
            np.testing.assert_allclose(acc[k], expected, atol=1e-5)


class TestCovariance:
    def test_pack_unpack(self):
        x = jax.random.normal(jax.random.PRNGKey(13), (8, 3, 3))
        sym = x @ jnp.swapaxes(x, -1, -2)
        np.testing.assert_allclose(
            unpack_symmetric(strip_symmetric(sym)), sym, atol=1e-6
        )

    def test_covariance_psd_and_matches_manual(self):
        n = 32
        scales = jnp.exp(jax.random.normal(jax.random.PRNGKey(14), (n, 3)) * 0.3)
        quats = random_quats(jax.random.PRNGKey(15), n)
        packed = covariance_from_scaling_rotation(scales, quats)
        full = unpack_symmetric(packed)
        L = build_scaling_rotation(scales, quats)
        np.testing.assert_allclose(full, L @ jnp.swapaxes(L, -1, -2), atol=1e-5)
        eigs = np.linalg.eigvalsh(np.asarray(full))
        assert (eigs > 0).all()

    def test_rotated_covariance(self):
        # Object subset gets Sigma -> R Sigma R^T; others unchanged
        # (reference gaussian_model.py:46-63)
        n = 16
        scales = jnp.exp(jax.random.normal(jax.random.PRNGKey(16), (n, 3)) * 0.3)
        quats = random_quats(jax.random.PRNGKey(17), n)
        R = quat_to_rotmat(random_quats(jax.random.PRNGKey(18), 1)[0])
        mask = jnp.arange(n) < 8
        packed = covariance_from_scaling_rotation_rotated(scales, quats, R, mask)
        base = unpack_symmetric(covariance_from_scaling_rotation(scales, quats))
        got = unpack_symmetric(packed)
        np.testing.assert_allclose(
            got[:8], jnp.einsum("ij,njk,lk->nil", R, base[:8], R), atol=1e-5
        )
        np.testing.assert_allclose(got[8:], base[8:], atol=1e-6)


class TestSH:
    def test_rgb_round_trip(self):
        rgb = jax.random.uniform(jax.random.PRNGKey(19), (10, 3))
        np.testing.assert_allclose(sh_to_rgb(rgb_to_sh(rgb)), rgb, atol=1e-6)

    def test_degree0_is_constant(self):
        sh = jax.random.normal(jax.random.PRNGKey(20), (5, 3, 1))
        dirs = jax.random.normal(jax.random.PRNGKey(21), (5, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = eval_sh(0, sh, dirs)
        np.testing.assert_allclose(out, 0.28209479177387814 * sh[..., 0], atol=1e-6)

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_higher_degrees_finite(self, deg):
        k = (deg + 1) ** 2
        sh = jax.random.normal(jax.random.PRNGKey(22), (7, 3, k))
        dirs = jax.random.normal(jax.random.PRNGKey(23), (7, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = eval_sh(deg, sh, dirs)
        assert out.shape == (7, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_basis_orthonormal_through_degree4(self):
        """Independent golden for every constant in the C0..C4 tables
        (reference utils/sh_utils.py:57-112): the 25 real-SH basis
        functions must satisfy ∫ Y_i Y_j dΩ = δ_ij. Products of two
        degree-≤4 spherical polynomials are degree-8 in cosθ and have
        azimuthal orders ≤ 8, so a 16-node Gauss-Legendre grid in cosθ ×
        32 uniform φ nodes integrates them EXACTLY (up to f64 rounding) —
        any wrong table constant shows up as a diagonal ≠ 1 or a nonzero
        cross term."""
        nodes, weights = np.polynomial.legendre.leggauss(16)
        phi = (np.arange(32) + 0.5) * (2 * np.pi / 32)
        ct, ph = np.meshgrid(nodes, phi, indexing="ij")  # [16, 32]
        st = np.sqrt(1.0 - ct**2)
        dirs = np.stack(
            [st * np.cos(ph), st * np.sin(ph), ct], axis=-1
        ).reshape(-1, 3)
        w = np.broadcast_to(
            weights[:, None] * (2 * np.pi / 32), (16, 32)
        ).reshape(-1)
        # basis_k(dir) = eval_sh with one-hot coefficients; do all 25 at
        # once through the channel axis
        sh = np.broadcast_to(np.eye(25), (len(dirs), 25, 25))
        basis = np.asarray(
            eval_sh(4, jnp.asarray(sh, jnp.float64), jnp.asarray(dirs)),
            np.float64,
        )  # [npts, 25]
        gram = np.einsum("p,pi,pj->ij", w, basis, basis)
        np.testing.assert_allclose(gram, np.eye(25), atol=5e-6)


class TestKNN:
    def test_matches_numpy_bruteforce(self):
        # Twin of simple_knn distCUDA2 (scene/gaussian_model.py:301)
        pts = np.random.RandomState(0).randn(300, 3).astype(np.float32)
        got = np.asarray(mean_sq_dist_to_knn(jnp.asarray(pts), k=3, block_size=128))
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        expected = np.sort(d2, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(got, expected, rtol=1e-4)
