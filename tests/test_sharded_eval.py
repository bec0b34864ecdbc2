"""Multi-chip full-frame rendering on the 8-device virtual CPU mesh:
sharded output must equal the single-device render."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from nerface_tpu.models import MODELS
from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings
from nerface_tpu.eval.renderer import render_full_frame


@pytest.fixture(scope="module")
def setup():
    model = MODELS["ConditionalBlendshapePaperNeRFModel"](
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
    )
    params = model.init(jax.random.PRNGKey(0))
    settings = RenderSettings(
        num_coarse=4, num_fine=4, perturb=False,
        radiance_field_noise_std=0.0, near=0.2, far=0.8,
        encode_xyz=EncodeSpec(4, True, True),
        encode_dir=EncodeSpec(2, False, True),
        chunksize=64,
    )
    H = W = 20  # H*W=400: not divisible by 8 devices -> exercises padding
    intr = np.array([25.0, 25.0, 0.5, 0.5], np.float32)
    pose = np.eye(4, dtype=np.float32)[:3, :4]
    pose[2, 3] = 0.5
    rng = np.random.RandomState(0)
    expr = jnp.asarray(rng.randn(76).astype(np.float32) * 0.1)
    bg = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    return model, params, settings, H, W, intr, pose, expr, bg


class TestShardedRender:
    @pytest.mark.parametrize("n_dev", [8, 4])
    def test_matches_single_device(self, setup, n_dev):
        model, params, settings, H, W, intr, pose, expr, bg = setup
        assert len(jax.devices()) >= n_dev
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))

        kwargs = dict(
            key=jax.random.PRNGKey(3),
            expressions=expr, latent_code=jnp.zeros(32), background=bg,
        )
        single = render_full_frame(
            model, model, params, params, H, W, intr, pose, settings, **kwargs
        )
        sharded = render_full_frame(
            model, model, params, params, H, W, intr, pose, settings,
            mesh=mesh, **kwargs,
        )
        assert set(sharded) == set(single) - set()
        for k in ("rgb_fine", "disp_fine", "acc_fine", "bg_weight"):
            a, b = np.asarray(single[k]), np.asarray(sharded[k])
            assert a.shape == b.shape, k
            # sharding changes the tile partition -> per-tile RNG keys
            # differ; with perturb off and noise 0 the render is
            # deterministic and must match exactly
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=k)

    def test_no_background(self, setup):
        model, params, settings, H, W, intr, pose, expr, _ = setup
        mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
        out = render_full_frame(
            model, model, params, params, H, W, intr, pose, settings,
            key=jax.random.PRNGKey(0), expressions=expr,
            latent_code=jnp.zeros(32), mesh=mesh,
        )
        assert np.isfinite(np.asarray(out["rgb_fine"])).all()
