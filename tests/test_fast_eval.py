"""Opt-in fast eval (`RenderSettings.fast_eval`): bbox ray skipping with a
static active-ray capacity (`eval/renderer.py::_render_frame_fast_jit`).

The parity contract: rays INSIDE the bbox render bit-identically to the
full-frame parity renderer (per-ray draws are keyed by GLOBAL ray index, so
packing active rays into capacity tiles changes nothing), and rays outside
composite straight to the background."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerface_tpu.eval.renderer import render_full_frame
from nerface_tpu.models import MODELS
from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings


H = W = 16
BBOX = np.array([4, 11, 3, 12], np.int32)  # [h0, h1, w0, w1], inclusive


@pytest.fixture(scope="module")
def setup():
    model = MODELS["ConditionalBlendshapePaperNeRFModel"](
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2
    )
    kc, kf = jax.random.split(jax.random.PRNGKey(0))
    params_c, params_f = model.init(kc), model.init(kf)
    rng = np.random.RandomState(0)
    intr = np.array([20.0, 20.0, 0.5, 0.5], np.float32)
    pose = np.eye(4, dtype=np.float32)[:3, :4]
    expr = jnp.asarray(rng.randn(76).astype(np.float32) * 0.1)
    latent = jnp.zeros((32,), jnp.float32)
    bg = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    return model, params_c, params_f, intr, pose, expr, latent, bg


def _settings(**kw):
    kw.setdefault("chunksize", 64)
    return RenderSettings(
        num_coarse=6, num_fine=6, perturb=True,
        radiance_field_noise_std=0.1, near=0.2, far=0.8,
        encode_xyz=EncodeSpec(4, True, True),
        encode_dir=EncodeSpec(2, False, True),
        **kw,
    )


class TestFastEval:
    def test_inside_matches_parity_outside_is_background(self, setup):
        model, pc, pf, intr, pose, expr, latent, bg = setup
        key = jax.random.PRNGKey(3)
        common = dict(
            key=key, expressions=expr, latent_code=latent, background=bg,
        )
        full = render_full_frame(
            model, model, pc, pf, H, W, intr, pose, _settings(), **common
        )
        fast = render_full_frame(
            model, model, pc, pf, H, W, intr, pose,
            _settings(fast_eval=True, fast_eval_capacity=0.45),
            bbox=BBOX, **common,
        )
        ii, jj = np.mgrid[0:H, 0:W]
        inside = (
            (ii >= BBOX[0]) & (ii <= BBOX[1])
            & (jj >= BBOX[2]) & (jj <= BBOX[3])
        )
        for k in ("rgb_fine", "rgb_coarse"):
            a, b = np.asarray(full[k]), np.asarray(fast[k])
            np.testing.assert_allclose(
                b[inside], a[inside], rtol=1e-5, atol=1e-5,
                err_msg=f"{k}: bbox rays must match the parity renderer",
            )
        # Outside rays: skipped slots composite to the background exactly;
        # spare capacity slots hold real renders (== the parity renderer).
        f_out = np.asarray(fast["rgb_fine"])[~inside]
        bg_out = np.asarray(bg)[~inside]
        full_out = np.asarray(full["rgb_fine"])[~inside]
        is_bg = np.all(f_out == bg_out, axis=-1)
        near_full = np.all(np.abs(f_out - full_out) < 1e-4, axis=-1)
        assert np.all(is_bg | near_full)
        # capacity 0.45 of 256 rays = 128 slots, 80 inside -> exactly 48
        # spare slots render extra rays
        assert near_full.sum() >= 48 and is_bg.sum() >= f_out.shape[0] - 48
        assert np.all(np.asarray(fast["bg_weight"])[~inside][is_bg] == 1.0)

    def test_capacity_overflow_falls_back_to_background(self, setup):
        """Rays beyond capacity degrade to background, never garbage."""
        model, pc, pf, intr, pose, expr, latent, bg = setup
        fast = render_full_frame(
            model, model, pc, pf, H, W, intr, pose,
            # capacity far below the bbox area (80 rays for a 90-ray bbox)
            _settings(fast_eval=True, fast_eval_capacity=0.1, chunksize=16),
            bbox=BBOX, key=jax.random.PRNGKey(3),
            expressions=expr, latent_code=latent, background=bg,
        )
        rgb = np.asarray(fast["rgb_fine"])
        assert np.isfinite(rgb).all()
        # overflow rows at the bbox bottom equal the background
        np.testing.assert_allclose(
            rgb[int(BBOX[1])], np.asarray(bg)[int(BBOX[1])], atol=0
        )

    def test_no_background_defaults(self, setup):
        model, pc, pf, intr, pose, expr, latent, _ = setup
        fast = render_full_frame(
            model, model, pc, pf, H, W, intr, pose,
            _settings(fast_eval=True, fast_eval_capacity=0.45),
            bbox=BBOX, key=jax.random.PRNGKey(3),
            expressions=expr, latent_code=latent, background=None,
        )
        rgb = np.asarray(fast["rgb_fine"])
        assert np.isfinite(rgb).all()
        # the last raster pixel is beyond every capacity slot -> skipped:
        # black (no white_background), zero accumulated weight
        assert (rgb[H - 1, W - 1] == 0).all()
        assert np.asarray(fast["acc_fine"])[H - 1, W - 1] == 0.0

    def test_capacity_rounds_past_frame_size(self, setup):
        """Regression: a near-full bbox on a frame whose ray count is not
        tile-aligned rounds the capacity past H*W (round_up(256, 48) =
        288); the packed index list must pad to capacity, not silently
        truncate and break the tile reshape."""
        model, pc, pf, intr, pose, expr, latent, bg = setup
        common = dict(
            key=jax.random.PRNGKey(3), expressions=expr,
            latent_code=latent, background=bg,
        )
        full = render_full_frame(
            model, model, pc, pf, H, W, intr, pose,
            _settings(chunksize=48), **common,
        )
        full_bbox = np.array([0, H - 1, 0, W - 1], np.int32)
        fast = render_full_frame(
            model, model, pc, pf, H, W, intr, pose,
            _settings(fast_eval=True, fast_eval_capacity=1.0, chunksize=48),
            bbox=full_bbox, **common,
        )
        np.testing.assert_allclose(
            np.asarray(fast["rgb_fine"]), np.asarray(full["rgb_fine"]),
            rtol=1e-5, atol=1e-5,
        )

    def test_from_cfg_reads_flags(self):
        from nerface_tpu.config import CfgNode

        cfg = CfgNode({
            "dataset": {"near": 0.2, "far": 0.8, "no_ndc": True},
            "models": {"coarse": {
                "num_encoding_fn_xyz": 4, "include_input_xyz": True,
                "log_sampling_xyz": True, "use_viewdirs": True,
                "num_encoding_fn_dir": 2, "include_input_dir": False,
                "log_sampling_dir": True,
            }},
            "nerf": {
                "use_viewdirs": True,
                "validation": {
                    "num_coarse": 8, "num_fine": 8, "perturb": False,
                    "radiance_field_noise_std": 0.0,
                    "white_background": False, "lindisp": False,
                    "chunksize": 1024, "fast_eval": True,
                    "fast_eval_capacity": 0.33,
                },
            },
        })
        s = RenderSettings.from_cfg(cfg, mode="validation")
        assert s.fast_eval and s.fast_eval_capacity == 0.33
        # and the default stays OFF (the parity path)
        cfg.nerf.validation.pop("fast_eval")
        cfg.nerf.validation.pop("fast_eval_capacity")
        s2 = RenderSettings.from_cfg(cfg, mode="validation")
        assert not s2.fast_eval


class TestFastEvalSharded:
    def test_mesh_matches_single_device(self, setup):
        """Mesh fast eval == single-device fast eval (same capacity
        rounding granularity), every output map."""
        import jax
        from jax.sharding import Mesh

        n_dev = min(4, len(jax.devices()))
        if n_dev < 2:
            pytest.skip("needs >= 2 devices")
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
        model, pc, pf, intr, pose, expr, latent, bg = setup
        # tile * n_dev must divide the capacity identically on both paths:
        # pick tile so cap rounds the same (tile 16, cap 0.5*256=128 ->
        # round_up(128, 16)=128 and round_up(128, 16*4)=128)
        s = _settings(fast_eval=True, fast_eval_capacity=0.5, chunksize=16)
        common = dict(
            key=jax.random.PRNGKey(5), expressions=expr,
            latent_code=latent, background=bg, bbox=BBOX,
        )
        single = render_full_frame(
            model, model, pc, pf, H, W, intr, pose, s, **common
        )
        sharded = render_full_frame(
            model, model, pc, pf, H, W, intr, pose, s, mesh=mesh, **common
        )
        assert set(single) == set(sharded)
        for k in single:
            np.testing.assert_allclose(
                np.asarray(sharded[k]), np.asarray(single[k]),
                rtol=1e-5, atol=1e-5, err_msg=k,
            )

    def test_mesh_capacity_rounds_past_frame_size(self, setup):
        """Regression: per-device tile granularity (tile * n_dev) rounds
        the capacity past H*W at even lower capacities than the
        single-device path; the packed index list must pad, not crash."""
        import jax
        from jax.sharding import Mesh

        n_dev = min(4, len(jax.devices()))
        if n_dev < 2:
            pytest.skip("needs >= 2 devices")
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
        model, pc, pf, intr, pose, expr, latent, bg = setup
        # cap = round_up(0.9*256, 48*n_dev) > 256 for n_dev in {2, 4}
        s = _settings(fast_eval=True, fast_eval_capacity=0.9, chunksize=48)
        out = render_full_frame(
            model, model, pc, pf, H, W, intr, pose, s, mesh=mesh,
            key=jax.random.PRNGKey(5), expressions=expr,
            latent_code=latent, background=bg,
            bbox=np.array([0, H - 1, 0, W - 1], np.int32),
        )
        assert np.isfinite(np.asarray(out["rgb_fine"])).all()
