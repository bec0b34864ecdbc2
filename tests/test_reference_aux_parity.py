"""Oracle parity for the remaining torch modules: GaussianSmoothing
(`train_utils.py:379-443`), ImageEncoder and DiscriminatorModel
(`models.py:1098-1126,1233-1248`)."""

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
    finally:
        sys.path.pop(0)
    return types.SimpleNamespace(train_utils=train_utils, models=models)


class TestGaussianSmoothing:
    def test_matches_reference_blur(self, ref):
        import jax.numpy as jnp

        from nerface_tpu.utils.smoothing import gaussian_smooth

        rng = np.random.RandomState(0)
        img = rng.rand(32, 32, 3).astype(np.float32)

        # reference: (B, C, H, W) depthwise conv2d with padding=5
        tm = ref.train_utils.GaussianSmoothing(channels=3, kernel_size=11, sigma=11)
        with torch.no_grad():
            theirs = tm(
                torch.from_numpy(img.transpose(2, 0, 1))[None]
            )[0].numpy().transpose(1, 2, 0)

        ours = np.asarray(gaussian_smooth(jnp.asarray(img), 11, 11.0))
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestImageEncoder:
    def test_matches_reference_cnn(self, ref):
        from nerface_tpu.models import ImageEncoder

        torch.manual_seed(0)
        tm = ref.models.ImageEncoder().eval()
        params = {k: np.asarray(v.numpy()) for k, v in tm.state_dict().items()}
        jm = ImageEncoder()

        rng = np.random.RandomState(1)
        img = rng.rand(2, 3, 256, 256).astype(np.float32)
        with torch.no_grad():
            theirs = tm(torch.from_numpy(img)).numpy()
        ours = np.asarray(jm.apply(params, img))
        assert ours.shape == theirs.shape == (2, 128, 1, 1)
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


class TestDiscriminator:
    def test_matches_reference(self, ref):
        from nerface_tpu.models import DiscriminatorModel

        torch.manual_seed(2)
        tm = ref.models.DiscriminatorModel().eval()
        params = {k: np.asarray(v.numpy()) for k, v in tm.state_dict().items()}
        jm = DiscriminatorModel()

        rng = np.random.RandomState(3)
        latent = rng.randn(4, 32).astype(np.float32)
        with torch.no_grad():
            theirs = tm(torch.from_numpy(latent)).numpy()
        ours = np.asarray(jm.apply(params, latent))
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestNormalMapOracle:
    """`eval/normals.py::normal_map_from_depth` vs the reference's
    `torch_normal_map` (`eval_transformed_rays.py:84-119`), extracted by
    AST (the module's top-level imports pull CUDA-era deps)."""

    @pytest.fixture(scope="class")
    def ref_normal_map(self, ref):
        import ast

        path = os.path.join(REF_DIR, "eval_transformed_rays.py")
        tree = ast.parse(open(path).read())
        # the reference function calls nerf_helpers.meshgrid_xy (:91-92)
        sys.path.insert(0, REF_DIR)
        try:
            from nerf.nerf_helpers import meshgrid_xy
        finally:
            sys.path.pop(0)
        ns = {"torch": torch, "meshgrid_xy": meshgrid_xy}
        for node in tree.body:
            if isinstance(node, ast.FunctionDef) and node.name == "torch_normal_map":
                exec(compile(ast.Module(body=[node], type_ignores=[]),
                             path, "exec"), ns)
        return ns["torch_normal_map"]

    @pytest.mark.parametrize("clean", [False, True])
    @pytest.mark.parametrize("central_difference", [False, True])
    def test_matches_reference(self, ref_normal_map, clean,
                               central_difference):
        import jax.numpy as jnp

        from nerface_tpu.eval.normals import normal_map_from_depth

        rng = np.random.RandomState(3)
        H = W = 24
        # smooth positive depth (the reference feeds the disparity map,
        # :469); smoothness keeps normals generically non-degenerate
        base = rng.rand(H, W).astype(np.float32)
        depth = 0.5 + np.cumsum(np.cumsum(base, 0), 1) / (H * W)
        weights = rng.rand(H, W).astype(np.float32)
        # relative-center intrinsics (ours) vs pixel cx,cy scaling inside
        # the reference (:87-88): same [fx, fy, cx_rel, cy_rel] input
        intr = np.array([300.0, 300.0, 0.5, 0.5], np.float32)

        ref_out = ref_normal_map(
            torch.from_numpy(depth), intr,
            weights=torch.from_numpy(weights) if clean else None,
            clean=clean, central_difference=central_difference,
        ).numpy()
        our_out = np.asarray(normal_map_from_depth(
            jnp.asarray(depth), intr,
            weights=jnp.asarray(weights) if clean else None,
            clean=clean, central_difference=central_difference,
        ))
        assert our_out.shape == ref_out.shape
        np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=5e-3)
