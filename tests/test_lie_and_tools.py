"""Tests for SO(3)/SE(3) maps (`lieutils.py` equivalent), spherical
samplers, and the tiny-nerf example's convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerface_tpu.tools.spherical_sampler import (
    SAMPLINGS,
    SphericalSampler,
    sphere_fibonacci_grid_points,
)
from nerface_tpu.utils.lie import (
    hat,
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
    so3_exponential_map,
    vee,
)


class TestSO3:
    def test_hat_vee_roundtrip(self, rng):
        w = jnp.asarray(rng.randn(5, 3))
        np.testing.assert_allclose(np.asarray(vee(hat(w))), np.asarray(w))

    def test_exp_is_rotation(self, rng):
        w = jnp.asarray(rng.randn(7, 3))
        R = so3_exp(w)
        eye = np.eye(3)
        for r in np.asarray(R):
            np.testing.assert_allclose(r @ r.T, eye, atol=1e-6)
            assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-6)

    def test_exp_log_roundtrip(self, rng):
        w = jnp.asarray(rng.randn(6, 3) * 0.8)
        np.testing.assert_allclose(
            np.asarray(so3_log(so3_exp(w))), np.asarray(w), atol=1e-5
        )

    def test_small_angle_stable(self):
        w = jnp.asarray([[1e-10, 0.0, 0.0], [0.0, 0.0, 0.0]])
        R = so3_exp(w)
        assert np.isfinite(np.asarray(R)).all()
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-12)
        # gradient finite at zero (the double-where guard)
        g = jax.grad(lambda x: jnp.sum(so3_exp(x)))(jnp.zeros(3))
        assert np.isfinite(np.asarray(g)).all()

    def test_known_rotation(self):
        # pi/2 about z
        R = np.asarray(so3_exp(jnp.asarray([0.0, 0.0, np.pi / 2])))
        np.testing.assert_allclose(
            R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6
        )

    def test_pytorch3d_alias(self):
        assert so3_exponential_map is so3_exp


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.randn(5, 6) * 0.5)
        np.testing.assert_allclose(
            np.asarray(se3_log(se3_exp(xi))), np.asarray(xi), atol=1e-5
        )

    def test_exp_is_homogeneous(self, rng):
        T = np.asarray(se3_exp(jnp.asarray(rng.randn(4, 6))))
        np.testing.assert_allclose(T[:, 3, :], [[0, 0, 0, 1]] * 4, atol=1e-12)

    def test_pure_translation(self):
        T = np.asarray(se3_exp(jnp.asarray([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])))
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-12)
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-12)

    def test_composition_consistency(self, rng):
        # exp(xi) applied twice equals exp via matrix product
        xi = jnp.asarray(rng.randn(6) * 0.3)
        T = np.asarray(se3_exp(xi))
        T2 = np.asarray(se3_exp(2 * xi))
        np.testing.assert_allclose(T @ T, T2, atol=1e-5)


class TestSphericalSampler:
    @pytest.mark.parametrize("mode", SAMPLINGS)
    def test_all_modes_shapes(self, mode):
        s = SphericalSampler(24, sampling=mode)
        assert s.points.shape == (24, 3)
        assert np.isfinite(s.points).all()

    def test_lattice_on_unit_sphere(self):
        pts = sphere_fibonacci_grid_points(50)
        np.testing.assert_allclose(
            np.linalg.norm(pts, axis=-1), 1.0, atol=1e-9
        )

    def test_random_upper_hemisphere(self):
        s = SphericalSampler(40, sampling="RANDOM",
                             rng=np.random.RandomState(0))
        assert (s.points[:, 2] >= 0).all()
        np.testing.assert_allclose(
            np.linalg.norm(s.points, axis=-1), 1.0, atol=1e-9
        )

    def test_unknown_mode_raises(self):
        with pytest.raises(NameError, match="not supported"):
            SphericalSampler(4, sampling="BOGUS")


class TestTinyNerf:
    def test_overfit_synthetic(self):
        """The didactic example must converge (mirrors the reference's role
        for `tiny_nerf.py` as the bring-up correctness target)."""
        import optax

        from nerface_tpu.examples.tiny_nerf import (
            init_model,
            make_synthetic_tiny_data,
            run_one_iter_of_tinynerf,
        )

        images, poses, focal = make_synthetic_tiny_data(n=6, H=24, W=24)
        H, W = images.shape[1:3]
        key = jax.random.PRNGKey(0)
        params = init_model(key)
        opt = optax.adam(5e-3)
        opt_state = opt.init(params)

        first_loss = None
        for i in range(60):
            key, k1, k2 = jax.random.split(key, 3)
            idx = int(jax.random.randint(k1, (), 0, len(images)))
            loss, _, grads = run_one_iter_of_tinynerf(
                params, H, W, focal, jnp.asarray(poses[idx]),
                jnp.asarray(images[idx]), k2, near=0.2, far=1.2,
            )
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            if first_loss is None:
                first_loss = float(loss)
        assert float(loss) < 0.5 * first_loss
