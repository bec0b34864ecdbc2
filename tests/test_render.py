"""Render-pipeline tests: shapes, jit-ability, background exactness,
gradient flow, and validation-mode restore."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerface_tpu.models import MODELS
from nerface_tpu.render import RenderSettings, render_rays, run_one_iter_of_nerf
from nerface_tpu.render.pipeline import EncodeSpec


def _small_settings(**over):
    base = dict(
        num_coarse=8,
        num_fine=8,
        perturb=False,
        radiance_field_noise_std=0.0,
        white_background=False,
        lindisp=False,
        use_viewdirs=True,
        near=0.2,
        far=0.8,
        encode_xyz=EncodeSpec(4, True, True),
        encode_dir=EncodeSpec(2, False, True),
    )
    base.update(over)
    return RenderSettings(**base)


@pytest.fixture(scope="module")
def flagship():
    model = MODELS["ConditionalBlendshapePaperNeRFModel"](
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2
    )
    pc = model.init(jax.random.PRNGKey(0))
    pf = model.init(jax.random.PRNGKey(1))
    return model, pc, pf


def _rays(n=16, seed=0):
    rng = np.random.RandomState(seed)
    ro = np.zeros((n, 3), np.float32)
    rd = rng.randn(n, 3).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.5
    return jnp.asarray(ro), jnp.asarray(rd)


class TestRenderRays:
    def test_shapes_and_jit(self, flagship):
        model, pc, pf = flagship
        settings = _small_settings()
        ro, rd = _rays(16)
        expr = jnp.zeros(76)
        latent = jnp.zeros(32)

        f = jax.jit(
            functools.partial(render_rays, model, model),
            static_argnames=("dtype",),
        )
        # settings is a frozen dataclass -> hashable; close over it instead.
        out = jax.jit(
            lambda pc_, pf_, ro_, rd_, k, e, l: render_rays(
                model, model, pc_, pf_, ro_, rd_, settings,
                key=k, expressions=e, latent_code=l,
            )
        )(pc, pf, ro, rd, jax.random.PRNGKey(2), expr, latent)
        assert out["rgb_coarse"].shape == (16, 3)
        assert out["rgb_fine"].shape == (16, 3)
        assert out["weights"].shape == (16, 16)  # coarse+fine samples
        assert out["bg_weight"].shape == (16,)
        assert np.isfinite(np.asarray(out["rgb_fine"])).all()

    def test_background_exact_when_transparent(self, flagship):
        """Zero-density field + background prior -> output == background."""
        model, pc, pf = flagship
        # Force sigma to a large negative pre-relu: zero fc_alpha weights,
        # bias = -100.
        for p in (pc, pf):
            p["fc_alpha.weight"] = jnp.zeros_like(p["fc_alpha.weight"])
            p["fc_alpha.bias"] = jnp.full_like(p["fc_alpha.bias"], -100.0)
        settings = _small_settings()
        ro, rd = _rays(8)
        bg = jnp.asarray(np.random.RandomState(1).rand(8, 3).astype(np.float32))
        out = render_rays(
            model, model, pc, pf, ro, rd, settings,
            key=jax.random.PRNGKey(0),
            expressions=jnp.zeros(76), latent_code=jnp.zeros(32),
            background_prior=bg,
        )
        np.testing.assert_allclose(np.asarray(out["rgb_fine"]), np.asarray(bg), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["bg_weight"]), 1.0, atol=1e-4)

    def test_gradients_flow_to_params_and_latent(self, flagship):
        model, pc, pf = flagship
        settings = _small_settings(perturb=True, radiance_field_noise_std=0.1)
        ro, rd = _rays(8)
        target = jnp.ones((8, 3)) * 0.5

        def loss_fn(pc_, pf_, latent):
            out = render_rays(
                model, model, pc_, pf_, ro, rd, settings,
                key=jax.random.PRNGKey(3),
                expressions=jnp.ones(76) * 0.1, latent_code=latent,
            )
            return (
                jnp.mean((out["rgb_coarse"] - target) ** 2)
                + jnp.mean((out["rgb_fine"] - target) ** 2)
            )

        grads = jax.grad(loss_fn, argnums=(0, 1, 2))(pc, pf, jnp.zeros(32))
        gc, gf, gl = grads
        assert float(jnp.abs(gc["layers_xyz.0.weight"]).sum()) > 0
        assert float(jnp.abs(gf["layers_xyz.0.weight"]).sum()) > 0
        assert float(jnp.abs(gl).sum()) > 0
        # All finite
        for g in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(g)).all()

    def test_coarse_only(self):
        model = MODELS["FlexibleNeRFModel"](
            num_encoding_fn_xyz=4, num_encoding_fn_dir=2
        )
        pc = model.init(jax.random.PRNGKey(0))
        settings = _small_settings(num_fine=0)
        ro, rd = _rays(4)
        out = render_rays(model, None, pc, None, ro, rd, settings, key=jax.random.PRNGKey(0))
        assert out["rgb_fine"] is None
        assert out["weights"].shape == (4, 8)

    def test_deterministic_when_no_perturb(self, flagship):
        model, pc, pf = flagship
        settings = _small_settings()
        ro, rd = _rays(4)
        kwargs = dict(expressions=jnp.zeros(76), latent_code=jnp.zeros(32))
        o1 = render_rays(model, model, pc, pf, ro, rd, settings,
                         key=jax.random.PRNGKey(1), **kwargs)
        o2 = render_rays(model, model, pc, pf, ro, rd, settings,
                         key=jax.random.PRNGKey(9), **kwargs)
        np.testing.assert_allclose(
            np.asarray(o1["rgb_fine"]), np.asarray(o2["rgb_fine"]), atol=1e-6
        )

    def test_ablation_ray_dirs_change_output(self, flagship):
        model, pc, pf = flagship
        settings = _small_settings()
        ro, rd = _rays(8, seed=0)
        _, rd_fake = _rays(8, seed=7)
        kwargs = dict(expressions=jnp.zeros(76), latent_code=jnp.zeros(32),
                      key=jax.random.PRNGKey(0))
        o1 = render_rays(model, model, pc, pf, ro, rd, settings, **kwargs)
        o2 = render_rays(model, model, pc, pf, ro, rd, settings,
                         ray_directions_ablation=rd_fake, **kwargs)
        assert not np.allclose(np.asarray(o1["rgb_fine"]), np.asarray(o2["rgb_fine"]))


class TestRunOneIter:
    def test_validation_mode_restores_image_shape(self, flagship):
        model, pc, pf = flagship
        settings = _small_settings()
        H = W = 4
        ro = jnp.zeros((H, W, 3))
        rd = jnp.asarray(
            np.random.RandomState(0).randn(H, W, 3).astype(np.float32)
        ) - jnp.asarray([0.0, 0.0, 2.0])
        out = run_one_iter_of_nerf(
            H, W, model, model, pc, pf, ro, rd, settings,
            key=jax.random.PRNGKey(0),
            expressions=jnp.zeros(76), latent_code=jnp.zeros(32),
            mode="validation",
        )
        rgb_coarse, disp_coarse, acc_coarse, rgb_fine, disp_fine, acc_fine, w = out
        assert rgb_coarse.shape == (H, W, 3)
        assert disp_fine.shape == (H, W)
        assert w.shape == (H, W)

    def test_train_mode_flat(self, flagship):
        model, pc, pf = flagship
        settings = _small_settings()
        ro, rd = _rays(8)
        out = run_one_iter_of_nerf(
            4, 2, model, model, pc, pf, ro, rd, settings,
            key=jax.random.PRNGKey(0),
            expressions=jnp.zeros(76), latent_code=jnp.zeros(32),
            mode="train",
        )
        assert out[0].shape == (8, 3)
        assert out[6].shape == (8,)
