"""Train-step tests: loss composition, parameter/latent updates, overfit
convergence, LR schedule, and the shard_map data-parallel path on the
8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerface_tpu.config import CfgNode, FeatureFlags
from nerface_tpu.models import MODELS
from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings
from nerface_tpu.train import create_train_state, exponential_lr, make_train_step
from nerface_tpu.train.state import build_optimizer


def _cfg(lr=5e-3):
    return CfgNode(
        {
            "optimizer": {"type": "Adam", "lr": lr},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
        }
    )


def _settings(num_coarse=8, num_fine=8):
    return RenderSettings(
        num_coarse=num_coarse,
        num_fine=num_fine,
        perturb=True,
        radiance_field_noise_std=0.1,
        near=0.2,
        far=0.8,
        encode_xyz=EncodeSpec(4, True, True),
        encode_dir=EncodeSpec(2, False, True),
    )


def _batch(rng, n=32, with_bg=True, with_pixels=False, hw=8):
    rd = rng.randn(n, 3).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.5
    b = {
        "ray_origins": jnp.zeros((n, 3)),
        "ray_directions": jnp.asarray(rd),
        "target_rgb": jnp.asarray(rng.rand(n, 3).astype(np.float32)),
        "expression": jnp.asarray(rng.randn(76).astype(np.float32) * 0.1),
        "latent_index": jnp.asarray(0, jnp.int32),
    }
    if with_bg:
        b["background_rgb"] = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    if with_pixels:
        b["pixel_indices"] = jnp.asarray(
            rng.choice(hw * hw, size=n, replace=False).astype(np.int32)
        )
    return b


@pytest.fixture(scope="module")
def flagship_pair():
    model = MODELS["ConditionalBlendshapePaperNeRFModel"](
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2
    )
    return model, model


class TestTrainStep:
    def test_step_runs_and_updates(self, rng, flagship_pair):
        mc, mf = flagship_pair
        cfg = _cfg()
        flags = FeatureFlags()
        state, opt = create_train_state(
            jax.random.PRNGKey(0), mc, mf, cfg, flags, n_train=4,
            background=jnp.zeros((8, 8, 3)),
        )
        step = make_train_step(mc, mf, _settings(), flags, opt)
        batch = _batch(rng)
        p0 = np.asarray(state.params["coarse"]["layers_xyz.0.weight"]).copy()
        state2, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert int(state2.step) == 1
        assert not np.allclose(
            np.asarray(state2.params["coarse"]["layers_xyz.0.weight"]), p0
        )
        # Latent code row 0 updated, other rows only via Adam moments (zero grad -> no change from zero)
        lc = np.asarray(state2.params["latent_codes"])
        assert np.abs(lc[0]).sum() > 0
        for k in ("loss", "coarse_loss", "fine_loss", "psnr", "latent_code_loss"):
            assert np.isfinite(float(metrics[k]))

    def test_loss_composition(self, rng, flagship_pair):
        mc, mf = flagship_pair
        flags = FeatureFlags()
        state, opt = create_train_state(
            jax.random.PRNGKey(0), mc, mf, _cfg(), flags, n_train=4,
            background=jnp.zeros((8, 8, 3)),
        )
        step = make_train_step(mc, mf, _settings(), flags, opt)
        _, m = step(state, _batch(rng), jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            float(m["total_loss"]),
            float(m["coarse_loss"]) + float(m["fine_loss"])
            + 10.0 * float(m["latent_code_loss"]),
            rtol=1e-5,
        )

    def test_overfit_single_batch(self, rng):
        """End-to-end convergence: the jitted step overfits a fixed ray batch
        (mirrors the tiny-nerf bring-up target, SURVEY.md §4)."""
        model = MODELS["FlexibleNeRFModel"](
            num_layers=4, hidden_size=64, num_encoding_fn_xyz=6, num_encoding_fn_dir=2
        )
        cfg = _cfg(lr=5e-3)
        flags = FeatureFlags(
            train_latent_codes=False, fixed_background=False,
            regularize_latent_codes=False,
        )
        settings = RenderSettings(
            num_coarse=16, num_fine=0, perturb=False,
            radiance_field_noise_std=0.0, near=0.2, far=0.8,
            encode_xyz=EncodeSpec(6, True, True), encode_dir=EncodeSpec(2, False, True),
        )
        state, opt = create_train_state(
            jax.random.PRNGKey(0), model, None, cfg, flags, n_train=1
        )
        step = make_train_step(model, None, settings, flags, opt)
        batch = _batch(rng, n=64, with_bg=False)
        key = jax.random.PRNGKey(0)
        first_loss = None
        for i in range(150):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            if first_loss is None:
                first_loss = float(metrics["loss"])
        final_loss = float(metrics["loss"])
        assert final_loss < first_loss * 0.05, (first_loss, final_loss)

    def test_trainable_background(self, rng, flagship_pair):
        mc, mf = flagship_pair
        flags = FeatureFlags(
            train_background=True, supervised_train_background=True,
            fixed_background=False,
        )
        bg_np = rng.rand(8, 8, 3).astype(np.float32)
        state, opt = create_train_state(
            jax.random.PRNGKey(0), mc, mf, _cfg(), flags, n_train=4,
            background=jnp.asarray(bg_np),
        )
        assert state.params["background"] is not None
        step = make_train_step(mc, mf, _settings(), flags, opt)
        batch = _batch(rng, with_bg=False, with_pixels=True)
        state2, m = step(state, batch, jax.random.PRNGKey(5))
        assert float(m["background_loss"]) >= 0
        assert not np.allclose(np.asarray(state2.params["background"]), bg_np)

    def test_disable_expressions_zeroes_input(self, rng, flagship_pair):
        mc, mf = flagship_pair
        flags = FeatureFlags(disable_expressions=True)
        state, opt = create_train_state(
            jax.random.PRNGKey(0), mc, mf, _cfg(), flags, n_train=4,
            background=jnp.zeros((8, 8, 3)),
        )
        step = make_train_step(mc, mf, _settings(), flags, opt)
        b1 = _batch(rng)
        b2 = dict(b1)
        b2["expression"] = b1["expression"] * 0.0
        _, m1 = step(state, b1, jax.random.PRNGKey(1))
        state, opt = create_train_state(
            jax.random.PRNGKey(0), mc, mf, _cfg(), flags, n_train=4,
            background=jnp.zeros((8, 8, 3)),
        )
        _, m2 = step(state, b2, jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


class TestResumeKeepsTrainingAuxParams:
    def test_latent_codes_still_train_after_torch_resume(self, rng, flagship_pair):
        """The REFERENCE freezes latent codes (and a trainable background)
        forever after any checkpoint resume: its resume path rebinds
        `latent_codes` to a fresh nn.Parameter while the optimizer still
        holds the original tensor (`train_transformed_rays.py:220-224`) —
        verified empirically: four 1500-iter resumed reference runs all end
        with ‖latent_codes‖ == 0 exactly (see PARITY.md). This pins that OUR
        resume keeps optimizing them."""
        from nerface_tpu.train import checkpoint as ckpt_lib

        model_c, model_f = flagship_pair
        cfg, flags = _cfg(), FeatureFlags()
        state, opt = create_train_state(
            jax.random.PRNGKey(0), model_c, model_f, cfg, flags, n_train=4,
            background=jnp.zeros((8, 8, 3)),
        )
        step = make_train_step(model_c, model_f, _settings(), flags, opt,
                               donate=False)
        batch = _batch(rng)
        for _ in range(2):
            state, _ = step(state, batch, jax.random.PRNGKey(1))
        before = np.asarray(state.params["latent_codes"])
        assert np.linalg.norm(before) > 0, "codes did not train pre-resume"

        import pytest as _pytest

        torch = _pytest.importorskip("torch")
        import tempfile, os

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "resume.ckpt")
            ckpt_lib.export_torch_checkpoint(path, state)
            fresh, _ = create_train_state(
                jax.random.PRNGKey(7), model_c, model_f, cfg, flags,
                n_train=4, background=jnp.zeros((8, 8, 3)),
            )
            resumed = ckpt_lib.import_torch_weights(
                fresh, ckpt_lib.load_torch_checkpoint(path)
            )
        np.testing.assert_allclose(
            np.asarray(resumed.params["latent_codes"]), before, atol=1e-6
        )
        resumed, _ = step(resumed, batch, jax.random.PRNGKey(2))
        after = np.asarray(resumed.params["latent_codes"])
        assert np.abs(after - before).max() > 0, (
            "latent codes froze across resume (the reference's bug)"
        )


class TestImportGuards:
    def test_latent_ckpt_into_latentless_template_is_skipped(
        self, rng, flagship_pair
    ):
        """A torch ckpt carrying latent_codes imported into a template
        whose config doesn't train them must NOT add the leaf: the
        optimizer state tree was built without it, and the first update
        would die with an opaque pytree-structure mismatch."""
        from nerface_tpu.train import checkpoint as ckpt_lib

        model_c, model_f = flagship_pair
        cfg = _cfg()
        # The realistic latentless template: the --disable_latent_codes
        # ablation (model consumes zeros, no table is trained) — the
        # flagship model itself always wants a latent segment.
        flags_latentless = FeatureFlags(
            train_latent_codes=False, regularize_latent_codes=False,
            disable_latent_codes=True,
        )
        template, opt = create_train_state(
            jax.random.PRNGKey(0), model_c, model_f, cfg,
            flags_latentless, n_train=4,
            background=jnp.zeros((8, 8, 3)),
        )
        assert template.params.get("latent_codes") is None
        donor, _ = create_train_state(
            jax.random.PRNGKey(1), model_c, model_f, cfg, FeatureFlags(),
            n_train=4, background=jnp.zeros((8, 8, 3)),
        )
        ckpt = {
            "coarse": {k: np.asarray(v) for k, v in donor.params["coarse"].items()},
            "fine": {k: np.asarray(v) for k, v in donor.params["fine"].items()},
            "latent_codes": np.ones((4, 32), np.float32),
            "background": None,
            "optimizer": None,
            "iter": 3,
        }
        resumed = ckpt_lib.import_torch_weights(template, ckpt)
        assert resumed.params.get("latent_codes") is None
        # and the optimizer still accepts the tree — the crash this guards
        step = make_train_step(
            model_c, model_f, _settings(), flags_latentless, opt,
            donate=False,
        )
        step(resumed, _batch(rng), jax.random.PRNGKey(2))


class TestSchedule:
    def test_reference_curve(self):
        # the reference sets the new LR after each step
        # (`train_transformed_rays.py:393-400`): iter k uses f^((k-1)/N)
        sched = exponential_lr(5e-4, 250, 0.1)
        assert float(sched(0)) == pytest.approx(5e-4)
        assert float(sched(1)) == pytest.approx(5e-4)
        assert float(sched(250_001)) == pytest.approx(5e-5, rel=1e-4)
        assert float(sched(500_001)) == pytest.approx(5e-6, rel=1e-4)

    def test_optimizer_builder_rejects_unknown(self):
        cfg = CfgNode(
            {"optimizer": {"type": "Nope", "lr": 1e-3},
             "scheduler": {"lr_decay": 1, "lr_decay_factor": 0.1}}
        )
        with pytest.raises(ValueError):
            build_optimizer(cfg)


class TestDataParallel:
    def test_shard_map_matches_single_device(self, rng, flagship_pair):
        mc, mf = flagship_pair
        flags = FeatureFlags()
        devices = jax.devices()
        assert len(devices) == 8, "conftest must provide 8 virtual devices"
        mesh = jax.sharding.Mesh(np.array(devices), ("data",))

        def fresh_state():
            return create_train_state(
                jax.random.PRNGKey(0), mc, mf, _cfg(), flags, n_train=4,
                background=jnp.zeros((8, 8, 3)),
            )

        batch = _batch(rng, n=64)
        key = jax.random.PRNGKey(7)

        state_a, opt = fresh_state()
        step_single = make_train_step(mc, mf, _settings(), flags, opt, donate=False)
        state_a2, m_single = step_single(state_a, batch, key)

        state_b, opt_b = fresh_state()
        step_dp = make_train_step(
            mc, mf, _settings(), flags, opt_b, mesh=mesh, donate=False
        )
        state_b2, m_dp = step_dp(state_b, batch, key)

        # Per-ray RNG (draws keyed by global ray index) makes the 8-device
        # step reproduce the single-device step exactly up to reduction
        # order: pmean-of-shard-means vs one global mean reassociates the
        # fp32 sums, so allow only fp32-epsilon-level slack.
        np.testing.assert_allclose(
            float(m_dp["loss"]), float(m_single["loss"]), rtol=1e-6
        )
        for leaf_a, leaf_b in zip(
            jax.tree_util.tree_leaves(state_a2.params),
            jax.tree_util.tree_leaves(state_b2.params),
        ):
            np.testing.assert_allclose(
                np.asarray(leaf_a), np.asarray(leaf_b), rtol=5e-5, atol=1e-6
            )

    def test_dp_step_decreases_loss(self, rng, flagship_pair):
        mc, mf = flagship_pair
        flags = FeatureFlags()
        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
        state, opt = create_train_state(
            jax.random.PRNGKey(0), mc, mf, _cfg(lr=1e-3), flags, n_train=4,
            background=jnp.zeros((8, 8, 3)),
        )
        step = make_train_step(mc, mf, _settings(), flags, opt, mesh=mesh)
        batch = _batch(rng, n=64)
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(30):
            key, sub = jax.random.split(key)
            state, m = step(state, batch, sub)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
