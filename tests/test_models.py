"""Model tests: shapes, structured-vs-flat equivalence, and golden parity
against the reference torch modules (imported from the read-only mount and
driven with converted weights — nothing is copied into this repo)."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerface_tpu.models import MODELS, DiscriminatorModel, ImageEncoder, build_model
from nerface_tpu.config import CfgNode

REF_MODELS_PY = "/root/reference/nerface_code/nerf-pytorch/nerf/models.py"

# (name, ctor kwargs, needs_expr, needs_latent, expr_dim)
CASES = [
    ("VeryTinyNeRFModel", {}, False, False, 0),
    ("MultiHeadNeRFModel", {}, False, False, 0),
    ("ReplicateNeRFModel", {}, False, False, 0),
    ("PaperNeRFModel", {}, False, False, 0),
    ("ConditionalBlendshapePaperNeRFModel", {}, True, True, 76),
    ("ConditionalBlendshapePaperSmallerNeRFModel", {}, True, True, 76),
    ("FlexibleNeRFModel", {}, False, False, 0),
    ("ConditionalNeRFModel", {}, True, False, 76),
    ("ConditionalBlendshapeLearnableCodeNeRFModel", {}, True, True, 76),
    ("ConditionalCompressedBlendshapeLearnableCodeNeRFModel", {}, True, True, 76),
    ("ConditionalCompressedBlendshapeNeRFModel", {}, True, False, 76),
    ("ConditionalBlendshapeNeRFModel", {}, True, False, 76),
    ("ConditionalBlendshapeNeRFModel_v2", {}, True, False, 15),
    ("ConditionalAutoEncoderNeRFModel", {}, True, False, 76),
]


def _make_inputs(rng, model, n_rays=4, n_samples=8):
    dx = model.dim_xyz
    dd = getattr(model, "dim_dir", 0)
    pe_xyz = rng.randn(n_rays, n_samples, dx).astype(np.float32)
    pe_dir = rng.randn(n_rays, dd).astype(np.float32) if dd else None
    return pe_xyz, pe_dir


@pytest.mark.parametrize("name,kwargs,needs_expr,needs_latent,expr_dim", CASES)
def test_shapes_and_structured_flat_equivalence(
    rng, name, kwargs, needs_expr, needs_latent, expr_dim
):
    model = MODELS[name](**kwargs)
    params = model.init(jax.random.PRNGKey(0))
    pe_xyz, pe_dir = _make_inputs(rng, model)
    expr = (
        jnp.asarray(rng.randn(expr_dim).astype(np.float32)) if needs_expr else None
    )
    latent = jnp.asarray(rng.randn(32).astype(np.float32)) if needs_latent else None

    out_structured = model.apply(params, jnp.asarray(pe_xyz), jnp.asarray(pe_dir) if pe_dir is not None else None, expr, latent)
    assert out_structured.shape == (4, 8, 4)

    # Flat path: replicate per-ray dirs over samples like the reference.
    n_rays, n_samples, dx = pe_xyz.shape
    flat_xyz = pe_xyz.reshape(-1, dx)
    if pe_dir is not None:
        flat_dir = np.repeat(pe_dir[:, None, :], n_samples, axis=1).reshape(
            n_rays * n_samples, -1
        )
        flat_dir = jnp.asarray(flat_dir)
    else:
        flat_dir = None
    out_flat = model.apply(params, jnp.asarray(flat_xyz), flat_dir, expr, latent)
    np.testing.assert_allclose(
        np.asarray(out_flat).reshape(4, 8, 4),
        np.asarray(out_structured),
        rtol=1e-4,
        atol=1e-5,
    )


@pytest.mark.skipif(not os.path.exists(REF_MODELS_PY), reason="reference not mounted")
@pytest.mark.parametrize("name,kwargs,needs_expr,needs_latent,expr_dim", CASES)
def test_parity_vs_reference_torch(rng, name, kwargs, needs_expr, needs_latent, expr_dim):
    """Bit-level architecture parity: same weights -> same outputs (fp32)."""
    import torch

    spec = importlib.util.spec_from_file_location("ref_models", REF_MODELS_PY)
    ref_models = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_models)

    model = MODELS[name](**kwargs)
    params = model.init(jax.random.PRNGKey(0))

    torch_model = getattr(ref_models, name)(**kwargs)
    state = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in params.items()}
    missing, unexpected = torch_model.load_state_dict(state, strict=False)
    assert not missing, f"param names missing vs torch: {missing}"
    assert not unexpected, f"unexpected params vs torch: {unexpected}"
    torch_model.eval()

    n_rays, n_samples = 3, 5
    pe_xyz, pe_dir = _make_inputs(rng, model, n_rays, n_samples)
    expr_np = rng.randn(expr_dim).astype(np.float32) if needs_expr else None
    latent_np = rng.randn(32).astype(np.float32) if needs_latent else None

    # Reference input packing: x = [PE(xyz) | PE(dir)] flat rows.
    dd = getattr(model, "dim_dir", 0)
    flat_xyz = pe_xyz.reshape(-1, pe_xyz.shape[-1])
    if dd:
        flat_dir = np.repeat(pe_dir[:, None, :], n_samples, axis=1).reshape(
            n_rays * n_samples, dd
        )
        x_torch = np.concatenate([flat_xyz, flat_dir], axis=-1)
    else:
        flat_dir = None
        x_torch = flat_xyz

    with torch.no_grad():
        args = [torch.from_numpy(x_torch)]
        if needs_expr:
            args.append(torch.from_numpy(expr_np))
        if needs_latent:
            args.append(torch.from_numpy(latent_np))
        ref_out = torch_model(*args).numpy()

    ours = model.apply(
        params,
        jnp.asarray(pe_xyz),
        jnp.asarray(pe_dir) if pe_dir is not None else None,
        jnp.asarray(expr_np) if expr_np is not None else None,
        jnp.asarray(latent_np) if latent_np is not None else None,
    )
    np.testing.assert_allclose(
        np.asarray(ours).reshape(ref_out.shape), ref_out, rtol=1e-4, atol=1e-5
    )


def test_build_model_from_cfg():
    cfg = CfgNode(
        {
            "type": "ConditionalBlendshapePaperNeRFModel",
            "num_layers": 4,
            "hidden_size": 256,
            "skip_connect_every": 3,
            "include_input_xyz": True,
            "log_sampling_xyz": True,
            "num_encoding_fn_xyz": 10,
            "use_viewdirs": True,
            "include_input_dir": False,
            "num_encoding_fn_dir": 4,
            "log_sampling_dir": True,
        }
    )
    model = build_model(cfg)
    assert model.dim_xyz == 3 + 2 * 3 * 10
    assert model.dim_dir == 2 * 3 * 4
    params = model.init(jax.random.PRNGKey(0))
    assert params["layers_xyz.0.weight"].shape == (256, 63 + 76 + 32)


def test_image_encoder_shapes():
    enc = ImageEncoder()
    params = enc.init(jax.random.PRNGKey(0))
    out = enc.apply(params, jnp.zeros((2, 3, 256, 256)))
    assert out.shape == (2, 128, 1, 1)
    assert (np.abs(np.asarray(out)) <= 1.0).all()


@pytest.mark.skipif(not os.path.exists(REF_MODELS_PY), reason="reference not mounted")
def test_image_encoder_parity(rng):
    import torch

    spec = importlib.util.spec_from_file_location("ref_models2", REF_MODELS_PY)
    ref_models = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_models)

    enc = ImageEncoder()
    params = enc.init(jax.random.PRNGKey(1))
    tm = ref_models.ImageEncoder()
    state = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in params.items()}
    missing, unexpected = tm.load_state_dict(state, strict=False)
    assert not missing and not unexpected
    tm.eval()
    x = rng.randn(1, 3, 256, 256).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(enc.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_discriminator_shapes():
    d = DiscriminatorModel()
    params = d.init(jax.random.PRNGKey(0))
    out = d.apply(params, jnp.zeros((5, 32)))
    assert out.shape == (5, 76)


@pytest.mark.skipif(not os.path.exists(REF_MODELS_PY), reason="reference not mounted")
def test_discriminator_parity(rng):
    import torch

    spec = importlib.util.spec_from_file_location("ref_models3", REF_MODELS_PY)
    ref_models = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_models)

    d = DiscriminatorModel()
    params = d.init(jax.random.PRNGKey(2))
    tm = ref_models.DiscriminatorModel()
    state = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in params.items()}
    missing, unexpected = tm.load_state_dict(state, strict=False)
    assert not missing and not unexpected
    tm.eval()
    x = rng.randn(4, 32).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(d.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
