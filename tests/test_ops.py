"""Golden-value unit tests for core ops against closed-form/independent
numpy references (SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerface_tpu.ops import (
    cumprod_exclusive,
    get_ray_bundle,
    meshgrid_xy,
    ndc_rays,
    positional_encoding,
    rodrigues,
    sample_pdf,
    stratified_zvals,
    volume_render_radiance_field,
)
from nerface_tpu.ops.encoding import encoding_dim
from nerface_tpu.ops.rays import ray_bundle_numpy
from nerface_tpu.ops.sampling import merge_sorted_zvals


class TestMeshgrid:
    def test_matches_numpy_xy(self):
        ii, jj = meshgrid_xy(jnp.arange(3), jnp.arange(4, 7))
        ii_np, jj_np = np.meshgrid(np.arange(3), np.arange(4, 7), indexing="xy")
        np.testing.assert_array_equal(np.asarray(ii), ii_np)
        np.testing.assert_array_equal(np.asarray(jj), jj_np)


class TestCumprodExclusive:
    def test_closed_form(self):
        x = jnp.asarray([[2.0, 3.0, 4.0]])
        out = cumprod_exclusive(x)
        np.testing.assert_allclose(np.asarray(out), [[1.0, 2.0, 6.0]])

    def test_matches_manual(self, rng):
        x = rng.rand(4, 7).astype(np.float32)
        out = np.asarray(cumprod_exclusive(jnp.asarray(x)))
        expected = np.cumprod(x, axis=-1)
        expected = np.roll(expected, 1, axis=-1)
        expected[..., 0] = 1.0
        np.testing.assert_allclose(out, expected, rtol=1e-6)


class TestPositionalEncoding:
    def test_identity_when_zero_functions(self):
        x = jnp.ones((5, 3))
        out = positional_encoding(x, num_encoding_functions=0, include_input=True)
        np.testing.assert_array_equal(np.asarray(out), np.ones((5, 3)))

    @pytest.mark.parametrize("include_input", [True, False])
    @pytest.mark.parametrize("log_sampling", [True, False])
    def test_matches_reference_formula(self, rng, include_input, log_sampling):
        """Independent numpy implementation of the encoding contract
        (`nerf_helpers.py:195-239`): [x?, sin(f0 x), cos(f0 x), ...]."""
        n = 6
        x = rng.randn(4, 3).astype(np.float32)
        out = np.asarray(
            positional_encoding(
                jnp.asarray(x),
                num_encoding_functions=n,
                include_input=include_input,
                log_sampling=log_sampling,
            )
        )
        if log_sampling:
            bands = 2.0 ** np.linspace(0.0, n - 1, n)
        else:
            bands = np.linspace(1.0, 2.0 ** (n - 1), n)
        parts = [x] if include_input else []
        for f in bands:
            parts.append(np.sin(x * np.float32(f)))
            parts.append(np.cos(x * np.float32(f)))
        expected = np.concatenate(parts, axis=-1)
        assert out.shape[-1] == encoding_dim(3, n, include_input)
        np.testing.assert_allclose(out, expected, atol=2e-5)


class TestRays:
    def test_identity_pose_center_pixel(self):
        H = W = 4
        intr = jnp.asarray([2.0, 2.0, 0.5, 0.5])
        pose = jnp.eye(4)
        ro, rd = get_ray_bundle(H, W, intr, pose)
        assert ro.shape == (H, W, 3)
        np.testing.assert_allclose(np.asarray(ro), 0.0)
        # pixel (i=2, j=1): ((2 - 2)/2, -(1 - 2)/2, -1) = (0, .5, -1)
        np.testing.assert_allclose(np.asarray(rd[1, 2]), [0.0, 0.5, -1.0])

    def test_rotation_applied(self, rng):
        H, W = 3, 5
        intr = np.array([10.0, 12.0, 0.4, 0.6], np.float32)
        pose = np.eye(4, dtype=np.float32)
        # 90-degree rotation about z
        pose[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        pose[:3, 3] = [1.0, 2.0, 3.0]
        ro, rd = get_ray_bundle(H, W, jnp.asarray(intr), jnp.asarray(pose))
        ro_np, rd_np = ray_bundle_numpy(H, W, intr, pose)
        np.testing.assert_allclose(np.asarray(ro), ro_np, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(rd), rd_np, rtol=1e-5, atol=1e-6)

    def test_scalar_focal_fallback(self):
        H = W = 2
        ro, rd = get_ray_bundle(H, W, jnp.asarray(5.0), jnp.eye(4))
        # cx = cy = 0.5 fallback
        np.testing.assert_allclose(np.asarray(rd[0, 0, 0]), (0 - 2 * 0.5) / 5.0)

    def test_rodrigues_ninety_deg(self):
        R = rodrigues(jnp.asarray([0.0, 0.0, np.pi / 2]))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(np.asarray(R), expected, atol=1e-6)

    def test_rodrigues_zero(self):
        R = rodrigues(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)

    def test_ndc_rays_shapes(self, rng):
        ro = jnp.asarray(rng.randn(7, 3).astype(np.float32))
        rd = jnp.asarray(rng.randn(7, 3).astype(np.float32) - [0, 0, 2.0])
        o, d = ndc_rays(8, 8, 5.0, 1.0, ro, rd)
        assert o.shape == (7, 3) and d.shape == (7, 3)
        # After shift, origin z maps to 1 + 2*near/oz with oz = -near => -1
        np.testing.assert_allclose(np.asarray(o[:, 2]), -1.0, rtol=1e-4)


class TestStratified:
    def test_deterministic_linspace(self):
        near = jnp.full((5, 1), 2.0)
        far = jnp.full((5, 1), 6.0)
        z = stratified_zvals(None, near, far, 5, perturb=False)
        np.testing.assert_allclose(
            np.asarray(z[0]), [2.0, 3.0, 4.0, 5.0, 6.0], rtol=1e-6
        )

    def test_lindisp(self):
        near = jnp.full((1, 1), 1.0)
        far = jnp.full((1, 1), 2.0)
        z = stratified_zvals(None, near, far, 3, lindisp=True, perturb=False)
        np.testing.assert_allclose(np.asarray(z[0]), [1.0, 4.0 / 3.0, 2.0], rtol=1e-6)

    def test_perturb_within_strata(self):
        near = jnp.full((16, 1), 0.2)
        far = jnp.full((16, 1), 0.8)
        key = jax.random.PRNGKey(0)
        z = stratified_zvals(key, near, far, 64, perturb=True)
        z = np.asarray(z)
        assert (z >= 0.2 - 1e-6).all() and (z <= 0.8 + 1e-6).all()
        assert (np.diff(z, axis=-1) > -1e-6).all()  # still sorted
        base = np.linspace(0.2, 0.8, 64)
        # jittered samples stay within one stratum of the base grid
        assert np.abs(z - base).max() < (0.6 / 63) + 1e-6


class TestSamplePdf:
    def test_deterministic_uniform_weights(self):
        # Uniform pdf over [0, 1] with det samples = linspace quantiles.
        bins = jnp.linspace(0.0, 1.0, 9)[None, :].repeat(2, axis=0)
        weights = jnp.ones((2, 8))
        samples = sample_pdf(None, bins, weights, 5, det=True)
        np.testing.assert_allclose(
            np.asarray(samples[0]), [0.0, 0.25, 0.5, 0.75, 1.0], atol=1e-5
        )

    def test_concentrated_mass(self):
        # All mass in interval [0.5, 0.625] -> all samples land there.
        bins = jnp.linspace(0.0, 1.0, 9)[None, :]
        weights = jnp.zeros((1, 8)).at[0, 4].set(1.0)
        key = jax.random.PRNGKey(1)
        samples = np.asarray(sample_pdf(key, bins, weights, 64, det=False))
        inside = ((samples >= 0.5 - 1e-3) & (samples <= 0.625 + 1e-3)).mean()
        assert inside > 0.98  # 1e-5 floor leaks negligible mass elsewhere

    def test_cdf_inversion_statistics(self):
        # Empirical CDF of many samples matches the target CDF.
        bins = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])
        weights = jnp.asarray([[1.0, 2.0, 1.0]])
        key = jax.random.PRNGKey(2)
        samples = np.asarray(sample_pdf(key, bins, weights, 4096, det=False))[0]
        # P(sample < 1) = 0.25, P(sample < 2) = 0.75
        assert abs((samples < 1.0).mean() - 0.25) < 0.03
        assert abs((samples < 2.0).mean() - 0.75) < 0.03

    def test_gradient_stopped(self):
        bins = jnp.linspace(0.0, 1.0, 9)[None, :]
        weights = jnp.ones((1, 8))

        def f(w):
            return jnp.sum(sample_pdf(None, bins, w, 4, det=True))

        g = jax.grad(f)(weights)
        np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_merge_sorted(self, rng):
        a = np.sort(rng.rand(3, 8), axis=-1)
        b = rng.rand(3, 4)
        merged = np.asarray(merge_sorted_zvals(jnp.asarray(a), jnp.asarray(b)))
        expected = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
        np.testing.assert_allclose(merged, expected, rtol=1e-6)


class TestVolumeRender:
    def test_opaque_first_sample(self):
        # A very dense first sample occludes everything behind it.
        n_rays, n_samples = 2, 8
        rf = np.zeros((n_rays, n_samples, 4), np.float32)
        rf[:, 0, 3] = 1e6  # huge sigma
        rf[:, 0, :3] = 5.0  # sigmoid(5) ~ 0.9933
        z = np.tile(np.linspace(0.1, 1.0, n_samples), (n_rays, 1)).astype(np.float32)
        rd = np.tile([0.0, 0.0, 1.0], (n_rays, 1)).astype(np.float32)
        rgb, disp, acc, weights, depth = volume_render_radiance_field(
            jnp.asarray(rf), jnp.asarray(z), jnp.asarray(rd)
        )
        np.testing.assert_allclose(np.asarray(acc), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(weights[:, 0]), 1.0, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rgb), 1.0 / (1.0 + np.exp(-5.0)), rtol=1e-5
        )
        assert depth is None

    def test_zero_sigma_transparent(self):
        n_rays, n_samples = 1, 4
        rf = np.zeros((n_rays, n_samples, 4), np.float32)
        rf[..., 3] = -100.0  # relu -> 0 sigma
        z = np.linspace(0.1, 1.0, n_samples)[None].astype(np.float32)
        rd = np.asarray([[0.0, 0.0, 1.0]], np.float32)
        rgb, disp, acc, weights, _ = volume_render_radiance_field(
            jnp.asarray(rf), jnp.asarray(z), jnp.asarray(rd)
        )
        # Only the +1e-6 epsilon on the final sample contributes (times 1e10 dist).
        assert np.asarray(acc)[0] > 0.99  # epsilon * 1e10 -> alpha ~ 1 on last
        np.testing.assert_allclose(np.asarray(weights[0, :-1]), 0.0, atol=1e-6)

    def test_background_prior_last_sample_raw(self):
        """Background semantics: last sample RGB is raw (no sigmoid), sigma
        epsilon routes leftover transmittance to it."""
        n_rays, n_samples = 3, 6
        rf = np.zeros((n_rays, n_samples, 4), np.float32)
        rf[..., 3] = -100.0  # transparent scene
        bg = np.asarray([[1.0, 0.5, 0.25]] * n_rays, np.float32)
        rf[:, -1, :3] = bg  # injected background (raw RGB)
        z = np.tile(np.linspace(0.2, 0.8, n_samples), (n_rays, 1)).astype(np.float32)
        rd = np.tile([0.0, 0.0, 1.0], (n_rays, 1)).astype(np.float32)
        rgb, _, acc, weights, _ = volume_render_radiance_field(
            jnp.asarray(rf),
            jnp.asarray(z),
            jnp.asarray(rd),
            background_prior=jnp.asarray(bg),
        )
        # Fully transparent -> rendered color == background pixel exactly.
        np.testing.assert_allclose(np.asarray(rgb), bg, rtol=1e-4)

    def test_dists_scaled_by_ray_norm(self):
        # Doubling ray length doubles optical depth.
        rf = np.zeros((1, 3, 4), np.float32)
        rf[..., 3] = 1.0
        z = np.asarray([[0.1, 0.2, 0.3]], np.float32)
        rd1 = np.asarray([[0.0, 0.0, 1.0]], np.float32)
        rd2 = np.asarray([[0.0, 0.0, 2.0]], np.float32)
        _, _, _, w1, _ = volume_render_radiance_field(
            jnp.asarray(rf), jnp.asarray(z), jnp.asarray(rd1)
        )
        _, _, _, w2, _ = volume_render_radiance_field(
            jnp.asarray(rf), jnp.asarray(z), jnp.asarray(rd2)
        )
        a1 = 1 - (1 - np.asarray(w1[0, 0])) ** 2  # alpha with doubled dist
        np.testing.assert_allclose(np.asarray(w2[0, 0]), a1, rtol=1e-5)

    def test_white_background(self):
        rf = np.zeros((1, 3, 4), np.float32)
        rf[..., 3] = -100.0
        rf[:, -1, 3] = -100.0
        z = np.asarray([[0.1, 0.2, 0.3]], np.float32)
        rd = np.asarray([[0.0, 0.0, 1.0]], np.float32)
        rgb, _, acc, _, _ = volume_render_radiance_field(
            jnp.asarray(rf), jnp.asarray(z), jnp.asarray(rd), white_background=True
        )
        # acc ~= 1 because of the final-sample epsilon; rgb ~= sigmoid(0) = .5
        assert np.asarray(rgb).min() > 0.49

    def test_noise_changes_sigma(self):
        rf = np.zeros((4, 8, 4), np.float32)
        rf[..., 3] = 1.0
        z = np.tile(np.linspace(0.1, 1.0, 8), (4, 1)).astype(np.float32)
        rd = np.tile([0.0, 0.0, 1.0], (4, 1)).astype(np.float32)
        _, _, _, w0, _ = volume_render_radiance_field(
            jnp.asarray(rf), jnp.asarray(z), jnp.asarray(rd)
        )
        _, _, _, w1, _ = volume_render_radiance_field(
            jnp.asarray(rf),
            jnp.asarray(z),
            jnp.asarray(rd),
            radiance_field_noise_std=0.5,
            noise_key=jax.random.PRNGKey(3),
        )
        assert not np.allclose(np.asarray(w0), np.asarray(w1))
