"""LOOP-level training parity against the reference.

The ops and models are oracle-tested element-wise elsewhere; this test
pins the *training loop* itself — loss composition, latent regularizer,
backward, torch-Adam stepping, and the reference's post-step LR update
point (`train_transformed_rays.py:336-400`) — by running N full
iterations of the reference's own components (run_one_iter_of_nerf +
torch.optim.Adam + the :393-400 LR assignment) and of our jitted
`make_train_step` from IDENTICAL initial weights on an IDENTICAL feed,
then comparing per-iteration losses and final parameters.

Deterministic settings (perturb off, sigma noise 0) make both loops exact
up to f32 op-ordering. Two horizons: a short one under an LR that decays
3.16× per step (tight loss+param comparison — a wrong schedule
application point fails instantly), and a longer one that tolerates the
chaotic divergence inherent to iterating two f32 implementations (a
discrete resample-bin flip amplifies op-ordering noise once; trajectories
re-converge and must keep tracking).
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

R = 24          # rays per batch
NC = NF = 8     # coarse/fine samples
N_TRAIN = 4     # latent table rows
LR = 5e-3
LR_FACTOR = 0.1


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


def _feed(rng, n_batches):
    batches = []
    for b in range(n_batches):
        rd = rng.randn(R, 3).astype(np.float32)
        rd[:, 2] = -np.abs(rd[:, 2]) - 0.5
        batches.append({
            "ray_origins": np.zeros((R, 3), np.float32),
            "ray_directions": rd,
            "target_rgb": rng.rand(R, 3).astype(np.float32),
            "background_rgb": rng.rand(R, 3).astype(np.float32),
            "expression": (rng.randn(76) * 0.1).astype(np.float32),
            "latent_index": b % N_TRAIN,
        })
    return batches


def _ref_options(ref):
    node = {
        "chunksize": 4096, "perturb": False,
        "num_coarse": NC, "num_fine": NF,
        "white_background": False,
        "radiance_field_noise_std": 0.0, "lindisp": False,
    }
    return ref.CfgNode({
        "dataset": {"no_ndc": True, "near": 0.2, "far": 0.8},
        "nerf": {"use_viewdirs": True, "train": dict(node),
                 "validation": dict(node)},
    })


def _reference_training_loop(ref, params_c, params_f, batches, n_iters, lr_decay):
    """N_ITERS of the reference training iteration, verbatim semantics
    from `train_transformed_rays.py`: loss block :355-390, optimizer
    step :391-393, post-step LR update :394-400."""
    kwargs = dict(
        num_encoding_fn_xyz=6, num_encoding_fn_dir=3,
        include_input_xyz=True, include_input_dir=False,
        use_viewdirs=True, include_expression=True,
    )
    tm_c = ref.models.ConditionalBlendshapePaperNeRFModel(**kwargs)
    tm_f = ref.models.ConditionalBlendshapePaperNeRFModel(**kwargs)
    tm_c.load_state_dict({k: torch.from_numpy(v) for k, v in params_c.items()})
    tm_f.load_state_dict({k: torch.from_numpy(v) for k, v in params_f.items()})
    latent_codes = torch.zeros(N_TRAIN, 32)
    latent_codes.requires_grad = True

    trainable = list(tm_c.parameters()) + list(tm_f.parameters())
    trainable.append(latent_codes)  # `train_transformed_rays.py:183-186`
    optimizer = torch.optim.Adam(
        [{"params": trainable}], lr=LR
    )  # :189-200 (the obsolete empty background group is dropped)

    encode_position_fn = ref.helpers.get_embedding_function(6, True, True)
    encode_direction_fn = ref.helpers.get_embedding_function(3, False, True)
    options = _ref_options(ref)

    # The reference's `sigma_a[:,-1] += 1e-6`
    # (`volume_rendering_utils.py:53`) is an in-place edit of a relu
    # OUTPUT — legal on the torch 1.5 the reference shipped with
    # (environment.yml), an autograd version-counter error on modern
    # torch because ReluBackward saves the output. clamp(min=0) is
    # forward- and backward-identical (ClampBackward saves the input),
    # so substituting it reproduces the 2021 behavior exactly.
    real_relu = torch.nn.functional.relu

    def _relu_via_clamp(x, inplace=False):
        return torch.clamp(x, min=0)

    torch.nn.functional.relu = _relu_via_clamp

    losses = []
    for i in range(n_iters):
        b = batches[i % len(batches)]
        latent_code = latent_codes[b["latent_index"]]
        rgb_coarse, _, _, rgb_fine, _, _, weights = (
            ref.train_utils.run_one_iter_of_nerf(
                8, 8, torch.tensor([8.0, 8.0, 0.5, 0.5]),
                tm_c, tm_f,
                torch.from_numpy(b["ray_origins"]),
                torch.from_numpy(b["ray_directions"]),
                options, mode="train",
                encode_position_fn=encode_position_fn,
                encode_direction_fn=encode_direction_fn,
                expressions=torch.from_numpy(b["expression"]),
                background_prior=torch.from_numpy(b["background_rgb"]),
                latent_code=latent_code,
            )
        )
        target = torch.from_numpy(b["target_rgb"])
        coarse_loss = torch.nn.functional.mse_loss(
            rgb_coarse[..., :3], target[..., :3]
        )
        fine_loss = torch.nn.functional.mse_loss(
            rgb_fine[..., :3], target[..., :3]
        )
        latent_code_loss = torch.norm(latent_code) * 0.0005
        loss = coarse_loss + fine_loss
        loss = loss + latent_code_loss * 10
        loss_total = loss
        loss_total.backward()
        optimizer.step()
        optimizer.zero_grad()
        # post-step LR update (`train_transformed_rays.py:394-400`)
        num_decay_steps = lr_decay * 1000
        lr_new = LR * (LR_FACTOR ** (i / num_decay_steps))
        for group in optimizer.param_groups:
            group["lr"] = lr_new
        losses.append(float(loss_total.item()))

    torch.nn.functional.relu = real_relu
    final = {
        "coarse": {k: v.detach().numpy() for k, v in tm_c.state_dict().items()},
        "fine": {k: v.detach().numpy() for k, v in tm_f.state_dict().items()},
        "latent_codes": latent_codes.detach().numpy(),
    }
    return losses, final


def _our_training_loop(params_c, params_f, batches, n_iters, lr_decay,
                       fused_bf16=False):
    import jax
    import jax.numpy as jnp

    from nerface_tpu.config import CfgNode, FeatureFlags
    from nerface_tpu.models import ConditionalBlendshapePaperNeRFModel
    from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings
    from nerface_tpu.train.state import TrainState, build_optimizer
    from nerface_tpu.train.step import make_train_step

    model = ConditionalBlendshapePaperNeRFModel(
        num_encoding_fn_xyz=6, num_encoding_fn_dir=3,
        include_input_xyz=True, include_input_dir=False,
        use_viewdirs=True, include_expression=True,
    )
    cfg = CfgNode({
        "optimizer": {"type": "Adam", "lr": LR},
        "scheduler": {"lr_decay": lr_decay, "lr_decay_factor": LR_FACTOR},
    })
    flags = FeatureFlags()
    settings = RenderSettings(
        num_coarse=NC, num_fine=NF, perturb=False,
        radiance_field_noise_std=0.0, near=0.2, far=0.8,
        encode_xyz=EncodeSpec(6, True, True),
        encode_dir=EncodeSpec(3, False, True),
        fused="on" if fused_bf16 else "off",
    )
    params = {
        "coarse": {k: jnp.asarray(v) for k, v in params_c.items()},
        "fine": {k: jnp.asarray(v) for k, v in params_f.items()},
        "latent_codes": jnp.zeros((N_TRAIN, 32), jnp.float32),
        "background": None,
    }
    opt = build_optimizer(cfg)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=params,
        opt_state=opt.init(params), fixed_background=None,
    )
    step = make_train_step(
        model, model, settings, flags, opt, donate=False,
        dtype=jnp.bfloat16 if fused_bf16 else None,
    )

    losses = []
    for i in range(n_iters):
        b = batches[i % len(batches)]
        batch = {
            "ray_origins": jnp.asarray(b["ray_origins"]),
            "ray_directions": jnp.asarray(b["ray_directions"]),
            "target_rgb": jnp.asarray(b["target_rgb"]),
            "background_rgb": jnp.asarray(b["background_rgb"]),
            "expression": jnp.asarray(b["expression"]),
            "latent_index": jnp.asarray(b["latent_index"], jnp.int32),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        # reference total printed per iter = mse + 10·latent reg (:386-390)
        losses.append(float(metrics["total_loss"]))
    final = {
        "coarse": {k: np.asarray(v) for k, v in state.params["coarse"].items()},
        "fine": {k: np.asarray(v) for k, v in state.params["fine"].items()},
        "latent_codes": np.asarray(state.params["latent_codes"]),
    }
    return losses, final


def _init_weights(ref):
    torch.manual_seed(0)
    kwargs = dict(
        num_encoding_fn_xyz=6, num_encoding_fn_dir=3,
        include_input_xyz=True, include_input_dir=False,
        use_viewdirs=True, include_expression=True,
    )
    init_c = {
        k: np.asarray(v.numpy()) for k, v in
        ref.models.ConditionalBlendshapePaperNeRFModel(**kwargs)
        .state_dict().items()
    }
    init_f = {
        k: np.asarray(v.numpy()) for k, v in
        ref.models.ConditionalBlendshapePaperNeRFModel(**kwargs)
        .state_dict().items()
    }
    return init_c, init_f


class TestFusedBf16LoopParity:
    def test_fused_bf16_tracks_reference_coupled_feed(self, ref, monkeypatch):
        """Rehearsal-scale regression for the PRODUCTION path (round-3
        verdict item 5): 200 coupled-feed iterations of the reference
        loop vs our loop through the one-pass fused bf16 kernel
        (interpret mode on CPU — precision semantics identical to the
        TPU kernel's f32-accumulate; only speed differs).

        Per-step fused-vs-XLA gradient exactness is pinned by
        tests/test_fused_train.py and f32-loop-vs-reference by the tests
        below; what can still rot silently is bf16 QUALITY DRIFT over a
        trajectory — caught here by an EMA loss-gap budget against the
        reference's own run on the identical feed (PARITY.md recorded
        4.6% at rehearsal scale; the budget tolerates the extra noise of
        this shorter, 64-ray workload)."""
        from nerface_tpu.ops.pallas import fused_mlp as fm

        monkeypatch.setattr(
            fm, "fused_paper_mlp_available", lambda n, tr: n % tr == 0
        )
        n_iters = 200
        rng = np.random.RandomState(11)
        init_c, init_f = _init_weights(ref)
        batches = _feed(rng, 8)

        ref_losses, _ = _reference_training_loop(
            ref, init_c, init_f, batches, n_iters=n_iters, lr_decay=250,
        )
        our_losses, _ = _our_training_loop(
            init_c, init_f, batches, n_iters=n_iters, lr_decay=250,
            fused_bf16=True,
        )

        def ema(xs):
            m = xs[0]
            out = []
            for x in xs:
                m = 0.95 * m + 0.05 * x
                out.append(m)
            return np.asarray(out)

        e_ref, e_ours = ema(ref_losses), ema(our_losses)
        tail = slice(n_iters // 2, None)
        gap = np.abs(e_ours[tail] - e_ref[tail]) / e_ref[tail]
        # measured 1.8% mean / 4.2% max on this workload; budget 10%
        # (2x the PARITY.md rehearsal budget) so tunnel-free CI noise
        # can't flake it while a real grad-path regression (>2x loss)
        # still fails loudly
        assert float(np.mean(gap)) < 0.10, (
            f"fused bf16 EMA tail gap {np.mean(gap):.1%} "
            f"(ref tail {e_ref[-1]:.2e}, ours tail {e_ours[-1]:.2e})"
        )
        # both sides learn the feed (random targets: plateau, not
        # order-of-magnitude decay — measured 0.26 -> 0.126 either side)
        assert e_ref[-1] < 0.6 * e_ref[0]
        assert e_ours[-1] < 0.6 * e_ours[0]


class TestReferenceLoopParity:
    def test_tight_short_horizon(self, ref):
        """4 coupled iterations under an LR that decays 10^(1/2) ≈ 3.16×
        PER STEP (lr_decay=0.002): a schedule application-point off-by-one
        would change every post-first update by >3× and fail instantly.
        Pre-chaos horizon — both loops are exact up to f32 ordering, so
        losses AND parameters are compared tightly."""
        rng = np.random.RandomState(7)
        init_c, init_f = _init_weights(ref)
        batches = _feed(rng, 4)

        ref_losses, ref_final = _reference_training_loop(
            ref, init_c, init_f, batches, n_iters=4, lr_decay=0.002
        )
        our_losses, our_final = _our_training_loop(
            init_c, init_f, batches, n_iters=4, lr_decay=0.002
        )
        # drift compounds through Adam: escalate per iteration
        for i, tol in enumerate((1e-4, 1e-3, 3e-3, 1e-2)):
            np.testing.assert_allclose(
                our_losses[i], ref_losses[i], rtol=tol,
                err_msg=f"iter {i}: ref={ref_losses} ours={our_losses}",
            )
        for scope in ("coarse", "fine"):
            for k, v_ref in ref_final[scope].items():
                v = our_final[scope][k]
                scale = np.max(np.abs(v_ref)) + 1e-12
                diff = np.abs(v - v_ref)
                # Adam normalizes by sqrt(nu): elements with near-zero
                # second moment amplify f32 op-ordering noise to O(lr) —
                # a handful of outliers is expected, bulk must be tight.
                frac_bad = float(np.mean(diff > 0.02 * scale))
                assert frac_bad < 1e-3, (
                    f"param {scope}/{k}: {frac_bad:.2%} elements off"
                )
                assert float(np.mean(diff)) < 2e-3 * scale, (
                    f"param {scope}/{k}: mean drift too large"
                )
        np.testing.assert_allclose(
            our_final["latent_codes"], ref_final["latent_codes"], atol=1e-4,
        )

    def test_trajectory_tracks_long_horizon(self, ref):
        """12 iterations cycling 3 batches. Two exact-in-f32 loops still
        diverge chaotically once a discrete event flips (an inverse-CDF
        bin at a resample boundary) — observed at ~iter 3 as a one-off 5%
        loss delta that re-converges. Assert the trajectory TRACKS: every
        iter within 15%, median relative delta under 1%, and both loops
        end below their start."""
        rng = np.random.RandomState(7)
        init_c, init_f = _init_weights(ref)
        batches = _feed(rng, 3)

        ref_losses, _ = _reference_training_loop(
            ref, init_c, init_f, batches, n_iters=12, lr_decay=0.01
        )
        our_losses, _ = _our_training_loop(
            init_c, init_f, batches, n_iters=12, lr_decay=0.01
        )
        rel = np.abs(np.asarray(our_losses) - np.asarray(ref_losses)) / (
            np.asarray(ref_losses)
        )
        assert float(np.max(rel)) < 0.15, (ref_losses, our_losses)
        assert float(np.median(rel)) < 0.01, (ref_losses, our_losses)
        assert ref_losses[-1] < ref_losses[0], "reference loop did not learn"
        assert our_losses[-1] < our_losses[0], "our loop did not learn"
