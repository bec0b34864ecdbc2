"""End-to-end render parity: the reference's full
`run_one_iter_of_nerf` (coarse → hierarchical resample → fine →
composite, with background injection) vs our jitted pipeline, on imported
torch weights and identical rays. Deterministic settings (perturb off,
noise 0) make both pipelines exact; this pins the entire render stack
against the reference as oracle.
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
    for name in ("pytorch3d", "pytorch3d.transforms", "torchsearchsorted",
                 "tqdm"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "tqdm":
                mod.tqdm = lambda x, **k: x
            sys.modules[name] = mod
    sys.path.insert(0, REF_DIR)
    try:
        import nerf.train_utils as train_utils
        import nerf.models as models
        import nerf.nerf_helpers as helpers
        from nerf.cfgnode import CfgNode as RefCfgNode
    finally:
        sys.path.pop(0)
    return types.SimpleNamespace(
        train_utils=train_utils, models=models, helpers=helpers,
        CfgNode=RefCfgNode,
    )


def _ref_options(ref, num_coarse, num_fine, chunksize):
    return ref.CfgNode(
        {
            "dataset": {"no_ndc": True, "near": 0.2, "far": 0.8},
            "nerf": {
                "use_viewdirs": True,
                "train": {
                    "chunksize": chunksize, "perturb": False,
                    "num_coarse": num_coarse, "num_fine": num_fine,
                    "white_background": False,
                    "radiance_field_noise_std": 0.0, "lindisp": False,
                },
                "validation": {
                    "chunksize": chunksize, "perturb": False,
                    "num_coarse": num_coarse, "num_fine": num_fine,
                    "white_background": False,
                    "radiance_field_noise_std": 0.0, "lindisp": False,
                },
            },
        }
    )


class TestEndToEndRenderParity:
    @pytest.mark.parametrize("with_bg", [True, False], ids=["bg", "nobg"])
    def test_full_pipeline_validation_mode(self, ref, with_bg):
        import jax
        import jax.numpy as jnp

        from nerface_tpu.models import ConditionalBlendshapePaperNeRFModel
        from nerface_tpu.ops.rays import get_ray_bundle
        from nerface_tpu.render.pipeline import (
            EncodeSpec,
            RenderSettings,
            run_one_iter_of_nerf,
        )

        rng = np.random.RandomState(3)
        H = W = 8
        num_coarse = num_fine = 6

        torch.manual_seed(0)
        kwargs = dict(
            num_encoding_fn_xyz=6, num_encoding_fn_dir=3,
            include_input_xyz=True, include_input_dir=False,
            use_viewdirs=True, include_expression=True,
        )
        tm_c = ref.models.ConditionalBlendshapePaperNeRFModel(**kwargs).eval()
        tm_f = ref.models.ConditionalBlendshapePaperNeRFModel(**kwargs).eval()
        params_c = {k: np.asarray(v.numpy()) for k, v in tm_c.state_dict().items()}
        params_f = {k: np.asarray(v.numpy()) for k, v in tm_f.state_dict().items()}

        jm = ConditionalBlendshapePaperNeRFModel(**kwargs)

        intrinsics = np.array([9.0, 9.0, 0.5, 0.5], np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.02, -0.03, 0.55]
        expr = (rng.randn(76) * 0.2).astype(np.float32)
        latent = (rng.randn(32) * 0.2).astype(np.float32)
        bg = rng.rand(H * W, 3).astype(np.float32) if with_bg else None

        encode_xyz = ref.helpers.get_embedding_function(6, True, True)
        encode_dir = ref.helpers.get_embedding_function(3, False, True)
        options = _ref_options(ref, num_coarse, num_fine, chunksize=16)

        ro_t, rd_t = ref.helpers.get_ray_bundle(
            H, W, torch.from_numpy(intrinsics), torch.from_numpy(pose[:3, :4])
        )
        with torch.no_grad():
            theirs = ref.train_utils.run_one_iter_of_nerf(
                H, W, torch.from_numpy(intrinsics),
                tm_c, tm_f, ro_t, rd_t, options, mode="validation",
                encode_position_fn=encode_xyz,
                encode_direction_fn=encode_dir,
                expressions=torch.from_numpy(expr),
                background_prior=(
                    torch.from_numpy(bg) if bg is not None else None
                ),
                latent_code=torch.from_numpy(latent),
            )

        settings = RenderSettings(
            num_coarse=num_coarse, num_fine=num_fine, perturb=False,
            radiance_field_noise_std=0.0, near=0.2, far=0.8,
            encode_xyz=EncodeSpec(6, True, True),
            encode_dir=EncodeSpec(3, False, True),
        )
        ro_j, rd_j = get_ray_bundle(H, W, intrinsics, pose[:3, :4])
        ours = run_one_iter_of_nerf(
            H, W, jm, jm, params_c, params_f, ro_j, rd_j, settings,
            key=jax.random.PRNGKey(0),
            expressions=jnp.asarray(expr),
            background_prior=(jnp.asarray(bg) if bg is not None else None),
            latent_code=jnp.asarray(latent),
            mode="validation",
        )

        names = ["rgb_coarse", "disp_coarse", "acc_coarse",
                 "rgb_fine", "disp_fine", "acc_fine", "bg_weight"]
        for name, theirs_v, ours_v in zip(names, theirs, ours):
            if theirs_v is None:
                assert ours_v is None, name
                continue
            t = theirs_v.numpy().reshape(np.asarray(ours_v).shape)
            np.testing.assert_allclose(
                np.asarray(ours_v), t, atol=2e-4, err_msg=name
            )
