"""Numerical parity against the ACTUAL reference implementation.

Loads the reference's torch modules from /root/reference (read-only) with
its unavailable CUDA deps (pytorch3d, torchsearchsorted) stubbed out, and
compares our jnp ops and models against them on identical inputs. This is
the strongest form of the SURVEY.md §4 parity requirement — no hand-copied
golden values, the reference itself is the oracle.

Skipped wholesale when the reference checkout or torch is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/nerface_code/nerf-pytorch"

torch = pytest.importorskip("torch")
if not os.path.isdir(REF_DIR):  # pragma: no cover
    pytest.skip("reference checkout unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def ref():
    """Import the reference package with CUDA-only deps stubbed."""
    for name in ("pytorch3d", "pytorch3d.transforms", "torchsearchsorted",
                 "tqdm"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "tqdm":
                mod.tqdm = lambda x, **k: x
            sys.modules[name] = mod
    sys.path.insert(0, REF_DIR)
    try:
        import nerf.nerf_helpers as helpers
        import nerf.models as models
        import nerf.volume_rendering_utils as vru
    finally:
        sys.path.pop(0)
    return types.SimpleNamespace(helpers=helpers, models=models, vru=vru)


@pytest.fixture(scope="module")
def np_rng():
    return np.random.RandomState(7)


class TestOpsParity:
    def test_positional_encoding(self, ref, np_rng):
        from nerface_tpu.ops.encoding import positional_encoding

        x = np_rng.randn(64, 3).astype(np.float32)
        for n, inc, log in [(10, True, True), (4, False, True), (6, True, False)]:
            theirs = ref.helpers.positional_encoding(
                torch.from_numpy(x), num_encoding_functions=n,
                include_input=inc, log_sampling=log,
            ).numpy()
            ours = np.asarray(positional_encoding(x, n, inc, log))
            np.testing.assert_allclose(ours, theirs, atol=1e-5), (n, inc, log)

    def test_cumprod_exclusive(self, ref, np_rng):
        from nerface_tpu.ops.math import cumprod_exclusive

        x = np_rng.rand(16, 33).astype(np.float32) + 0.1
        theirs = ref.helpers.cumprod_exclusive(torch.from_numpy(x)).numpy()
        ours = np.asarray(cumprod_exclusive(x))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_get_ray_bundle(self, ref, np_rng):
        from nerface_tpu.ops.rays import get_ray_bundle

        H = W = 12
        intrinsics = np.array([140.0, 140.0, 0.5, 0.5], np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = np.linalg.qr(np_rng.randn(3, 3))[0].astype(np.float32)
        pose[:3, 3] = [0.1, -0.2, 0.6]
        ro_t, rd_t = ref.helpers.get_ray_bundle(
            H, W, torch.from_numpy(intrinsics), torch.from_numpy(pose[:3, :4])
        )
        ro_j, rd_j = get_ray_bundle(H, W, intrinsics, pose[:3, :4])
        np.testing.assert_allclose(np.asarray(ro_j), ro_t.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rd_j), rd_t.numpy(), atol=1e-5)

    def test_sample_pdf_2_deterministic(self, ref, np_rng):
        from nerface_tpu.ops.sampling import sample_pdf

        R, B = 8, 31
        bins = np.sort(np_rng.rand(R, B).astype(np.float32), axis=-1)
        weights = np_rng.rand(R, B - 1).astype(np.float32)
        theirs = ref.helpers.sample_pdf_2(
            torch.from_numpy(bins), torch.from_numpy(weights), 16, det=True
        ).numpy()
        ours = np.asarray(sample_pdf(None, bins, weights, 16, det=True))
        np.testing.assert_allclose(ours, theirs, atol=2e-6)

    def test_volume_render_with_background(self, ref, np_rng):
        from nerface_tpu.ops.compositing import (
            inject_background,
            volume_render_radiance_field,
        )

        R, S = 10, 17
        radiance = np_rng.randn(R, S, 4).astype(np.float32)
        z = np.sort(np_rng.rand(R, S).astype(np.float32) * 2, axis=-1)
        rd = np_rng.randn(R, 3).astype(np.float32)
        bg = np_rng.rand(R, 3).astype(np.float32)

        # reference overwrites the last sample with raw bg RGB upstream
        # (`train_utils.py:95-96`) then composites with background_prior
        rad_t = torch.from_numpy(radiance.copy())
        rad_t[:, -1, :3] = torch.from_numpy(bg)
        rgb_t, disp_t, acc_t, w_t, d_t = ref.vru.volume_render_radiance_field(
            rad_t, torch.from_numpy(z), torch.from_numpy(rd),
            radiance_field_noise_std=0.0, white_background=False,
            background_prior=torch.from_numpy(bg),
        )

        import jax.numpy as jnp

        rad_j = inject_background(jnp.asarray(radiance), jnp.asarray(bg))
        rgb_j, disp_j, acc_j, w_j, d_j = volume_render_radiance_field(
            rad_j, z, rd, radiance_field_noise_std=0.0,
            background_prior=bg, return_depth=True,
        )
        np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(disp_j), disp_t.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(acc_j), acc_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(), atol=1e-5)

    def test_volume_render_white_background(self, ref, np_rng):
        """white_background applies rgb + (1 - acc)
        (`volume_rendering_utils.py:71-72`)."""
        from nerface_tpu.ops.compositing import volume_render_radiance_field

        R, S = 5, 7
        radiance = np_rng.randn(R, S, 4).astype(np.float32)
        z = np.sort(np_rng.rand(R, S).astype(np.float32), axis=-1)
        rd = np_rng.randn(R, 3).astype(np.float32)
        rgb_t, _, acc_t, _, _ = ref.vru.volume_render_radiance_field(
            torch.from_numpy(radiance), torch.from_numpy(z),
            torch.from_numpy(rd), radiance_field_noise_std=0.0,
            white_background=True,
        )
        rgb_j, _, acc_j, _, _ = volume_render_radiance_field(
            radiance, z, rd, radiance_field_noise_std=0.0,
            white_background=True, return_depth=True,
        )
        np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(), atol=1e-5)

    def test_volume_render_no_background(self, ref, np_rng):
        from nerface_tpu.ops.compositing import volume_render_radiance_field

        R, S = 6, 9
        radiance = np_rng.randn(R, S, 4).astype(np.float32)
        z = np.sort(np_rng.rand(R, S).astype(np.float32), axis=-1)
        rd = np_rng.randn(R, 3).astype(np.float32)
        rgb_t, disp_t, acc_t, w_t, d_t = ref.vru.volume_render_radiance_field(
            torch.from_numpy(radiance), torch.from_numpy(z),
            torch.from_numpy(rd), radiance_field_noise_std=0.0,
        )
        rgb_j, disp_j, acc_j, w_j, d_j = volume_render_radiance_field(
            radiance, z, rd, radiance_field_noise_std=0.0, return_depth=True,
        )
        np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(), atol=1e-5)


class TestModelParity:
    """Forward-pass parity: torch weights imported into our pure-function
    models must produce identical outputs."""

    def _import_weights(self, torch_model):
        return {
            k: np.asarray(v.detach().numpy())
            for k, v in torch_model.state_dict().items()
        }

    def test_conditional_blendshape_paper_model(self, ref, np_rng):
        from nerface_tpu.models import ConditionalBlendshapePaperNeRFModel

        torch.manual_seed(0)
        tm = ref.models.ConditionalBlendshapePaperNeRFModel(
            num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
            include_input_xyz=True, include_input_dir=False,
            use_viewdirs=True, include_expression=True,
        )
        tm.eval()
        params = self._import_weights(tm)

        jm = ConditionalBlendshapePaperNeRFModel(
            num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
            include_input_xyz=True, include_input_dir=False,
            use_viewdirs=True, include_expression=True,
        )

        N = 24
        # reference forward takes x = [pe_xyz (63) | pe_dir (24)] rows plus
        # expr (76,) and latent (32,) (`models.py:236-260`)
        pe_xyz = np_rng.randn(N, 63).astype(np.float32)
        pe_dir = np_rng.randn(N, 24).astype(np.float32)
        expr = np_rng.randn(76).astype(np.float32) * 0.3
        latent = np_rng.randn(32).astype(np.float32) * 0.3

        with torch.no_grad():
            theirs = tm(
                torch.from_numpy(np.concatenate([pe_xyz, pe_dir], -1)),
                expr=torch.from_numpy(expr),
                latent_code=torch.from_numpy(latent),
            ).numpy()

        ours = np.asarray(jm.apply(params, pe_xyz, pe_dir, expr, latent))
        np.testing.assert_allclose(ours, theirs, atol=3e-5)

    def test_flexible_model(self, ref, np_rng):
        from nerface_tpu.models import FlexibleNeRFModel

        torch.manual_seed(1)
        tm = ref.models.FlexibleNeRFModel(
            num_layers=4, hidden_size=64, skip_connect_every=3,
            num_encoding_fn_xyz=6, num_encoding_fn_dir=4,
            include_input_xyz=True, include_input_dir=True,
            use_viewdirs=True,
        )
        tm.eval()
        params = self._import_weights(tm)
        jm = FlexibleNeRFModel(
            num_layers=4, hidden_size=64, skip_connect_every=3,
            num_encoding_fn_xyz=6, num_encoding_fn_dir=4,
            include_input_xyz=True, include_input_dir=True,
            use_viewdirs=True,
        )
        N = 17
        pe_xyz = np_rng.randn(N, 39).astype(np.float32)
        pe_dir = np_rng.randn(N, 27).astype(np.float32)
        with torch.no_grad():
            theirs = tm(
                torch.from_numpy(np.concatenate([pe_xyz, pe_dir], -1))
            ).numpy()
        ours = np.asarray(jm.apply(params, pe_xyz, pe_dir))
        np.testing.assert_allclose(ours, theirs, atol=3e-5)


class TestRayTransformParity:
    def test_ndc_rays(self, ref, np_rng):
        import jax.numpy as jnp

        from nerface_tpu.ops.rays import ndc_rays

        H, W, focal = 24, 32, 40.0
        ro = np_rng.randn(50, 3).astype(np.float32) * 0.2
        rd = np_rng.randn(50, 3).astype(np.float32)
        rd[:, 2] = -np.abs(rd[:, 2]) - 0.5  # forward-facing
        ro_t, rd_t = ref.helpers.ndc_rays(
            H, W, focal, 1.0, torch.from_numpy(ro), torch.from_numpy(rd)
        )
        ro_j, rd_j = ndc_rays(H, W, focal, 1.0, jnp.asarray(ro), jnp.asarray(rd))
        np.testing.assert_allclose(np.asarray(ro_j), ro_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(rd_j), rd_t.numpy(), atol=1e-5)

    def test_rodrigues_vs_lie_exp(self, np_rng):
        """Two independent implementations of axis-angle -> rotation
        (ops.rays.rodrigues and utils.lie.so3_exp, the pytorch3d
        replacement) must agree."""
        import jax.numpy as jnp

        from nerface_tpu.ops.rays import rodrigues
        from nerface_tpu.utils.lie import so3_exp

        for scale in (1.0, 1e-6):
            w = np_rng.randn(3).astype(np.float32) * scale
            np.testing.assert_allclose(
                np.asarray(rodrigues(jnp.asarray(w))),
                np.asarray(so3_exp(jnp.asarray(w))),
                atol=1e-6,
            )
