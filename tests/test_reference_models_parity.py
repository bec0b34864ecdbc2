"""Forward-pass parity for EVERY reference model variant: torch weights
imported into our pure-function models must reproduce the reference's
outputs on identical inputs (the reference torch code is the oracle;
CUDA-only deps stubbed)."""

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
def ref_models():
    for name in ("pytorch3d", "pytorch3d.transforms", "torchsearchsorted",
                 "tqdm"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "tqdm":
                mod.tqdm = lambda x, **k: x
            sys.modules[name] = mod
    sys.path.insert(0, REF_DIR)
    try:
        import nerf.models as models
    finally:
        sys.path.pop(0)
    return models


def _weights(tm):
    return {k: np.asarray(v.numpy()) for k, v in tm.state_dict().items()}


# (name, ctor kwargs, expr?, latent?)
CASES = [
    ("VeryTinyNeRFModel",
     dict(filter_size=64, num_encoding_functions=6, use_viewdirs=True),
     False, False),
    ("MultiHeadNeRFModel",
     dict(hidden_size=32, num_encoding_functions=6, use_viewdirs=True),
     False, False),
    ("ReplicateNeRFModel",
     dict(hidden_size=32, num_encoding_fn_xyz=6, num_encoding_fn_dir=4),
     False, False),
    ("PaperNeRFModel",
     dict(num_layers=8, hidden_size=64, num_encoding_fn_xyz=10,
          num_encoding_fn_dir=4, include_input_xyz=True,
          include_input_dir=True, use_viewdirs=True),
     False, False),
    ("FlexibleNeRFModel",
     dict(num_layers=4, hidden_size=32, skip_connect_every=3,
          num_encoding_fn_xyz=6, num_encoding_fn_dir=4,
          include_input_xyz=True, include_input_dir=True, use_viewdirs=True),
     False, False),
    ("ConditionalNeRFModel",
     dict(num_layers=4, hidden_size=32, skip_connect_every=3,
          num_encoding_fn_xyz=6, num_encoding_fn_dir=4,
          include_input_xyz=True, include_input_dir=True,
          use_viewdirs=True, include_expression=True),
     True, False),
    ("ConditionalBlendshapeNeRFModel",
     dict(num_layers=4, hidden_size=32, skip_connect_every=3,
          num_encoding_fn_xyz=6, num_encoding_fn_dir=4,
          include_input_xyz=True, include_input_dir=True,
          use_viewdirs=True, include_expression=True),
     True, False),
    ("ConditionalBlendshapeNeRFModel_v2",
     dict(num_layers=4, hidden_size=32, skip_connect_every=3,
          num_encoding_fn_xyz=6, num_encoding_fn_dir=4,
          include_input_xyz=True, include_input_dir=True,
          use_viewdirs=True, include_expression=True),
     True, False),
    ("ConditionalBlendshapeLearnableCodeNeRFModel",
     dict(num_layers=4, hidden_size=32, skip_connect_every=3,
          num_encoding_fn_xyz=6, num_encoding_fn_dir=4,
          include_input_xyz=True, include_input_dir=True,
          use_viewdirs=True, include_expression=True, latent_code_dim=32),
     True, True),
    ("ConditionalCompressedBlendshapeLearnableCodeNeRFModel",
     dict(num_layers=4, hidden_size=32, skip_connect_every=3,
          num_encoding_fn_xyz=6, num_encoding_fn_dir=4,
          include_input_xyz=True, include_input_dir=True,
          use_viewdirs=True, include_expression=True, latent_code_dim=32),
     True, True),
    ("ConditionalCompressedBlendshapeNeRFModel",
     dict(num_layers=4, hidden_size=32, skip_connect_every=3,
          num_encoding_fn_xyz=6, num_encoding_fn_dir=4,
          include_input_xyz=True, include_input_dir=True,
          use_viewdirs=True, include_expression=True),
     True, False),
    ("ConditionalBlendshapePaperSmallerNeRFModel",
     dict(num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
          include_input_xyz=True, include_input_dir=False,
          use_viewdirs=True, include_expression=True),
     True, True),
]


@pytest.mark.parametrize("name,kwargs,takes_expr,takes_latent",
                         CASES, ids=[c[0] for c in CASES])
def test_forward_parity(ref_models, name, kwargs, takes_expr, takes_latent):
    import nerface_tpu.models as our_models

    rng = np.random.RandomState(11)
    torch.manual_seed(5)
    tm = getattr(ref_models, name)(**kwargs).eval()
    params = _weights(tm)
    jm = getattr(our_models, name)(**kwargs)

    N = 13
    dim_xyz = jm.dim_xyz if hasattr(jm, "dim_xyz") else 3 + 3 * 2 * 6
    dim_dir = getattr(jm, "dim_dir", 0)
    pe_xyz = rng.randn(N, dim_xyz).astype(np.float32)
    pe_dir = (
        rng.randn(N, dim_dir).astype(np.float32) if dim_dir else None
    )
    # _v2 is the legacy 15-dim-expression experiment (`models.py:1007`);
    # every other conditional model takes the 76-dim blendshape vector
    expr_dim = 15 if name == "ConditionalBlendshapeNeRFModel_v2" else 76
    expr = (rng.randn(expr_dim) * 0.3).astype(np.float32)
    latent = (rng.randn(32) * 0.3).astype(np.float32)

    x = pe_xyz if pe_dir is None else np.concatenate([pe_xyz, pe_dir], -1)
    t_args = [torch.from_numpy(x)]
    t_kwargs = {}
    if takes_expr:
        t_kwargs["expr"] = torch.from_numpy(expr)
    if takes_latent:
        t_kwargs["latent_code"] = torch.from_numpy(latent)
    with torch.no_grad():
        theirs = tm(*t_args, **t_kwargs).numpy()

    ours = np.asarray(
        jm.apply(
            params, pe_xyz, pe_dir,
            expr if takes_expr else None,
            latent if takes_latent else None,
        )
    )
    assert ours.shape == theirs.shape, name
    np.testing.assert_allclose(ours, theirs, atol=5e-5, err_msg=name)
