"""Adam optimizer-state interop: export to the torch.optim.Adam
state_dict layout and import back (and from a REAL torch.optim.Adam),
preserving the training trajectory across frameworks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nerface_tpu.config import CfgNode, FeatureFlags
from nerface_tpu.models import MODELS
from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings
from nerface_tpu.train import checkpoint as ckpt_lib
from nerface_tpu.train.state import create_train_state
from nerface_tpu.train.step import make_train_step


def _cfg():
    return CfgNode({
        "optimizer": {"type": "Adam", "lr": 5e-3},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
    })


@pytest.fixture(scope="module")
def stepped_state(rng_mod=np.random.RandomState(0)):
    model = MODELS["ConditionalBlendshapePaperNeRFModel"](
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
    )
    flags = FeatureFlags()
    state, opt = create_train_state(
        jax.random.PRNGKey(0), model, model, _cfg(), flags, n_train=4,
        background=jnp.zeros((8, 8, 3)),
    )
    settings = RenderSettings(
        num_coarse=4, num_fine=4, perturb=True, radiance_field_noise_std=0.1,
        near=0.2, far=0.8, encode_xyz=EncodeSpec(4, True, True),
        encode_dir=EncodeSpec(2, False, True),
    )
    step = make_train_step(model, model, settings, flags, opt, donate=False)
    rd = rng_mod.randn(16, 3).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.5
    batch = {
        "ray_origins": jnp.zeros((16, 3)),
        "ray_directions": jnp.asarray(rd),
        "target_rgb": jnp.asarray(rng_mod.rand(16, 3).astype(np.float32)),
        "background_rgb": jnp.asarray(rng_mod.rand(16, 3).astype(np.float32)),
        "expression": jnp.asarray(rng_mod.randn(76).astype(np.float32)),
        "latent_index": jnp.asarray(0, jnp.int32),
    }
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    return state


class TestExportImportRoundtrip:
    def test_moments_roundtrip(self, stepped_state):
        sd = ckpt_lib.export_torch_optimizer_state(stepped_state)
        assert sd["state"], "no optimizer entries exported"
        # wipe moments, reimport, compare
        adam = ckpt_lib._find_adam_state(stepped_state.opt_state)
        zeroed = jax.tree_util.tree_map(jnp.zeros_like, adam)
        wiped = jax.tree_util.tree_map(
            lambda x: zeroed if x is adam else x,
            stepped_state.opt_state,
            is_leaf=lambda x: hasattr(x, "mu") and hasattr(x, "nu"),
        )
        from nerface_tpu.train.state import TrainState

        blank = TrainState(
            step=stepped_state.step, params=stepped_state.params,
            opt_state=wiped, fixed_background=stepped_state.fixed_background,
        )
        restored = ckpt_lib.import_torch_optimizer_state(blank, sd)
        a0 = ckpt_lib._find_adam_state(stepped_state.opt_state)
        a1 = ckpt_lib._find_adam_state(restored.opt_state)
        assert int(np.asarray(a1.count)) == int(np.asarray(a0.count))
        # _moment_trees: layout-agnostic view (per-tensor optax trees or
        # the flat-buffer Adam of train/optim.py)
        mu0, nu0 = ckpt_lib._moment_trees(a0, stepped_state.params)
        mu1, nu1 = ckpt_lib._moment_trees(a1, restored.params)
        for k in mu0["coarse"]:
            np.testing.assert_allclose(
                np.asarray(mu1["coarse"][k]), np.asarray(mu0["coarse"][k])
            )
            np.testing.assert_allclose(
                np.asarray(nu1["coarse"][k]), np.asarray(nu0["coarse"][k])
            )
        np.testing.assert_allclose(
            np.asarray(mu1["latent_codes"]), np.asarray(mu0["latent_codes"])
        )

    def test_full_torch_ckpt_roundtrip(self, stepped_state, tmp_path):
        path = str(tmp_path / "full.ckpt")
        ckpt_lib.export_torch_checkpoint(path, stepped_state, loss=0.1, psnr=20.0)
        raw = torch.load(path, weights_only=False)
        assert raw["optimizer_state_dict"] is not None
        assert raw["optimizer_state_dict"]["state"]
        loaded = ckpt_lib.load_torch_checkpoint(path)
        assert loaded["optimizer"] is not None

        from nerface_tpu.train.state import TrainState

        adam = ckpt_lib._find_adam_state(stepped_state.opt_state)
        wiped = jax.tree_util.tree_map(
            lambda x: jax.tree_util.tree_map(jnp.zeros_like, x)
            if x is adam else x,
            stepped_state.opt_state,
            is_leaf=lambda x: hasattr(x, "mu") and hasattr(x, "nu"),
        )
        blank = TrainState(
            step=jnp.asarray(0, jnp.int32), params=stepped_state.params,
            opt_state=wiped, fixed_background=stepped_state.fixed_background,
        )
        restored = ckpt_lib.import_torch_weights(blank, loaded)
        a1 = ckpt_lib._find_adam_state(restored.opt_state)
        a0 = ckpt_lib._find_adam_state(stepped_state.opt_state)
        _, nu1 = ckpt_lib._moment_trees(a1, restored.params)
        _, nu0 = ckpt_lib._moment_trees(a0, stepped_state.params)
        np.testing.assert_allclose(
            np.asarray(nu1["fine"]["fc_rgb.weight"]),
            np.asarray(nu0["fine"]["fc_rgb.weight"]),
        )
        assert int(restored.step) == int(stepped_state.step)


class TestTorchResumesFromExport:
    def test_real_torch_adam_steps_after_load(self, stepped_state):
        """A torch.optim.Adam constructed the way the reference constructs
        it (two param groups, group 2 = background,
        `train_transformed_rays.py:187-198`) must load our exported
        optimizer state and STEP: torch's load_state_dict replaces every
        group hyperparameter with the saved ones, so the export has to
        carry the full Adam hyperparameter set — a params-only group dies
        with KeyError('betas') inside the resumed optimizer.step()."""
        sd = ckpt_lib.export_torch_optimizer_state(stepped_state, lr=3e-4)
        names = ckpt_lib._ordered_param_names(stepped_state.params)
        tensors = [
            torch.nn.Parameter(
                torch.from_numpy(
                    np.asarray(ckpt_lib._get_entry(
                        stepped_state.params, scope, key)).copy()
                )
            )
            for scope, key in names
        ]
        if stepped_state.params.get("background") is not None:
            main, bg = tensors[:-1], tensors[-1:]
        else:  # untrained background: registered in group 2 regardless
            main = tensors
            bg = [torch.from_numpy(
                np.asarray(stepped_state.fixed_background).copy())]
            bg[0].requires_grad = False
        opt = torch.optim.Adam(
            [{"params": main}, {"params": bg, "lr": 5e-3}], lr=5e-3
        )
        sd_t = {
            "state": {
                i: {
                    "step": ent["step"],
                    "exp_avg": torch.from_numpy(ent["exp_avg"].copy()),
                    "exp_avg_sq": torch.from_numpy(ent["exp_avg_sq"].copy()),
                }
                for i, ent in sd["state"].items()
            },
            "param_groups": sd["param_groups"],
        }
        opt.load_state_dict(sd_t)
        assert opt.param_groups[0]["lr"] == pytest.approx(3e-4)
        before = [t.detach().clone() for t in main]
        for t in main:
            t.grad = torch.ones_like(t)
        opt.step()  # would KeyError on a hyperparameter-less group
        assert all(
            not torch.equal(t.detach(), b) for t, b in zip(main, before)
        )


class TestFromRealTorchAdam:
    def test_import_real_torch_adam_moments(self):
        """Moments produced by an actual torch.optim.Adam import correctly
        (ordering assumption: parameters() order == state_dict order)."""
        torch.manual_seed(0)
        lin = torch.nn.Linear(4, 2)
        opt = torch.optim.Adam(lin.parameters(), lr=1e-2)
        for _ in range(2):
            opt.zero_grad()
            loss = lin(torch.randn(8, 4)).pow(2).mean()
            loss.backward()
            opt.step()
        sd = opt.state_dict()

        # our "params" with matching ordering: weight then bias
        import optax

        params = {
            "coarse": {
                "l.weight": jnp.zeros((2, 4)),
                "l.bias": jnp.zeros((2,)),
            },
            "fine": None, "latent_codes": None, "background": None,
        }
        opt_j = optax.adam(1e-2)
        from nerface_tpu.train.state import TrainState

        state = TrainState(
            step=jnp.asarray(0, jnp.int32), params=params,
            opt_state=opt_j.init(params), fixed_background=None,
        )
        converted = {
            "state": {
                idx: {k: (v.numpy() if hasattr(v, "numpy") else v)
                      for k, v in ent.items()}
                for idx, ent in sd["state"].items()
            },
            "param_groups": sd["param_groups"],
        }
        restored = ckpt_lib.import_torch_optimizer_state(state, converted)
        adam = ckpt_lib._find_adam_state(restored.opt_state)
        np.testing.assert_allclose(
            np.asarray(adam.mu["coarse"]["l.weight"]),
            sd["state"][0]["exp_avg"].numpy(),
        )
        np.testing.assert_allclose(
            np.asarray(adam.nu["coarse"]["l.bias"]),
            sd["state"][1]["exp_avg_sq"].numpy(),
        )
        assert int(np.asarray(adam.count)) == 2
