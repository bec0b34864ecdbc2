"""Fused Pallas MLP kernel tests (interpret mode on the CPU test platform):
forward/gradient parity against the pure-JAX model apply, conditioning-fold
correctness, and tile selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerface_tpu.models import MODELS
from nerface_tpu.models.mlp import linear_cols
from nerface_tpu.ops.encoding import positional_encoding
from nerface_tpu.ops.pallas.fused_mlp import (
    _pick_rays_per_tile,
    fused_paper_mlp,
    fused_paper_mlp_available,
)


@pytest.fixture(scope="module")
def setup():
    model = MODELS["ConditionalBlendshapePaperNeRFModel"](
        num_encoding_fn_xyz=10, num_encoding_fn_dir=4
    )
    params = model.init(jax.random.PRNGKey(0))
    R, S = 8, 16
    rng = np.random.RandomState(0)
    ro = jnp.asarray(rng.randn(R, 3).astype(np.float32) * 0.1)
    rd = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    z = jnp.asarray(np.cumsum(rng.rand(R, S).astype(np.float32) * 0.05, -1))
    rays = (ro, rd, z)
    dirs = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    pe_dir = positional_encoding(dirs, 4, False, True)
    expr = jnp.asarray(rng.randn(76).astype(np.float32) * 0.1)
    latent = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
    return model, params, rays, pe_dir, expr, latent


def _pts(rays):
    ro, rd, z = rays
    return ro[:, None, :] + rd[:, None, :] * z[:, :, None]


def _fused_out(model, params, rays, pe_dir, expr, latent, tr=4):
    cond = jnp.concatenate([expr / 3.0, latent])
    dd = pe_dir.shape[-1]
    dir_contrib = linear_cols(params, "layers_dir.0", pe_dir, 256, 256 + dd)
    ro, rd, z = rays
    return fused_paper_mlp(
        params, ro, rd, z, dir_contrib, cond, num_encoding_fn_xyz=10,
        rays_per_tile=tr,
    )


class TestForwardParity:
    def test_matches_reference_apply(self, setup):
        model, params, rays, pe_dir, expr, latent = setup
        pe = positional_encoding(_pts(rays), 10, True, True)
        ref = model.apply(params, pe, pe_dir, expr, latent)
        out = _fused_out(model, params, rays, pe_dir, expr, latent)
        assert out.shape == ref.shape == (8, 16, 4)
        # bf16 matmuls vs f32 reference: relative tolerance ~1%
        scale = float(jnp.abs(ref).max())
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=0.01 * scale
        )

    def test_matches_bf16_apply_closely(self, setup):
        model, params, rays, pe_dir, expr, latent = setup
        pe = positional_encoding(_pts(rays), 10, True, True)
        ref = model.apply(params, pe, pe_dir, expr, latent, dtype=jnp.bfloat16)
        out = _fused_out(model, params, rays, pe_dir, expr, latent)
        scale = float(jnp.abs(ref).max())
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=0.005 * scale
        )

    def test_tile_size_invariance(self, setup):
        model, params, rays, pe_dir, expr, latent = setup
        o1 = _fused_out(model, params, rays, pe_dir, expr, latent, tr=2)
        o2 = _fused_out(model, params, rays, pe_dir, expr, latent, tr=8)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


class TestGradientParity:
    def test_weight_and_latent_grads(self, setup):
        model, params, rays, pe_dir, expr, latent = setup
        pe = positional_encoding(_pts(rays), 10, True, True)

        def loss_fused(params, latent):
            return jnp.sum(_fused_out(model, params, rays, pe_dir, expr, latent) ** 2)

        def loss_ref(params, latent):
            return jnp.sum(
                model.apply(params, pe, pe_dir, expr, latent, dtype=jnp.bfloat16) ** 2
            )

        g1 = jax.grad(loss_fused, argnums=(0, 1))(params, latent)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(params, latent)
        for k in g2[0]:
            a, b = np.asarray(g1[0][k]), np.asarray(g2[0][k])
            assert a.shape == b.shape, k
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-8)
            assert rel < 0.05, (k, rel)  # bf16 recompute noise
        rel = np.abs(np.asarray(g1[1]) - np.asarray(g2[1])).max() / (
            np.abs(np.asarray(g2[1])).max() + 1e-8
        )
        assert rel < 0.05

    def test_grads_are_nonzero_everywhere(self, setup):
        model, params, rays, pe_dir, expr, latent = setup
        g = jax.grad(
            lambda p: jnp.sum(_fused_out(model, p, rays, pe_dir, expr, latent) ** 2)
        )(params)
        for k, v in g.items():
            if k.startswith("layers_dir.3"):
                # the reference's 4th dir layer is created but never used
                # by forward (`models.py` paper model quirk) — zero grad.
                continue
            assert np.abs(np.asarray(v)).max() > 0, f"zero grad for {k}"


class TestAvailability:
    def test_pick_rays_per_tile_multiple_of_8(self):
        assert _pick_rays_per_tile(2048, 64) % 8 == 0
        assert _pick_rays_per_tile(2048, 128) % 8 == 0
        assert 2048 % _pick_rays_per_tile(2048, 64) == 0
        assert _pick_rays_per_tile(65536, 64) % 8 == 0

    def test_unavailable_on_cpu_backend(self):
        # test platform is CPU — the production gate must refuse so the
        # pipeline falls back to pure JAX (interpret mode is only for tests)
        assert not fused_paper_mlp_available(2048, 8)


class TestEncodingEquivalence:
    def test_matmul_form_matches_naive(self):
        """sin(x@C+phi) equals the stack/interleave reference within 1 ulp."""
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(64, 3).astype(np.float32) * 2.0)
        got = positional_encoding(x, 6, True, True)
        # naive reference
        bands = 2.0 ** np.linspace(0.0, 5.0, 6, dtype=np.float32)
        scaled = np.asarray(x)[..., None, :] * bands[:, None]
        naive = [np.asarray(x)]
        for k in range(6):
            naive.append(np.sin(scaled[:, k]))
            naive.append(np.cos(scaled[:, k]))
        naive = np.concatenate(naive, axis=-1)
        np.testing.assert_allclose(np.asarray(got), naive, atol=1e-5)


class TestFusedRender:
    """Forward-only fused render (MLP + compositing in one kernel)."""

    def _inputs(self, R=8, S=16):
        rng = np.random.RandomState(0)
        ro = jnp.asarray(rng.randn(R, 3).astype(np.float32) * 0.1)
        rd = jnp.asarray(rng.randn(R, 3).astype(np.float32))
        z = jnp.asarray(np.cumsum(rng.rand(R, S).astype(np.float32) * 0.05, -1))
        dc = jnp.asarray(rng.randn(R, 128).astype(np.float32) * 0.1)
        cond = jnp.asarray(rng.randn(108).astype(np.float32) * 0.1)
        bg = jnp.asarray(rng.rand(R, 3).astype(np.float32))
        return ro, rd, z, dc, cond, bg

    @pytest.mark.parametrize("with_bg,wbg", [(True, False), (False, False),
                                             (True, True)],
                             ids=["bg", "nobg", "whitebg"])
    def test_matches_unfused_composite(self, setup, with_bg, wbg):
        from nerface_tpu.ops.compositing import (
            inject_background,
            volume_render_radiance_field,
        )
        from nerface_tpu.ops.pallas.fused_mlp import fused_paper_render

        model, params, _, _, _, _ = setup
        ro, rd, z, dc, cond, bg = self._inputs()
        bgx = bg if with_bg else None
        rad = inject_background(
            fused_paper_mlp(params, ro, rd, z, dc, cond, rays_per_tile=8), bgx
        )
        rgb, disp, acc, w, depth = volume_render_radiance_field(
            rad, z, rd, radiance_field_noise_std=0.0, background_prior=bgx,
            white_background=wbg, return_depth=True,
        )
        out = fused_paper_render(
            params, ro, rd, z, dc, cond, background=bgx, white_background=wbg
        )
        np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(rgb), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["disp"]), np.asarray(disp), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["acc"]), np.asarray(acc), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["depth"]), np.asarray(depth), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out["bg_weight"]), np.asarray(w[:, -1]), atol=1e-6
        )

    def test_opaque_ray_no_nan(self, setup):
        """alpha == 1.0 exactly (huge sigma) must not produce NaN — guards
        the (1 - alpha + eps) reassociation bug the kernel works around."""
        from nerface_tpu.ops.pallas.fused_mlp import fused_paper_render

        model, params, _, _, _, _ = setup
        ro, rd, z, dc, cond, bg = self._inputs()
        out = fused_paper_render(params, ro, rd, z, dc, cond, background=bg)
        for k, v in out.items():
            assert np.isfinite(np.asarray(v)).all(), k


class TestFusedRenderIntegration:
    def test_full_frame_render_parity(self, setup, monkeypatch):
        """render_full_frame with the fused-render branch forced on (CPU
        interpret) equals the unfused render."""
        import dataclasses

        from nerface_tpu.eval.renderer import render_full_frame

        def dataclasses_replace_chunk(s):
            # new static identity -> fresh trace under the patch
            return dataclasses.replace(s, chunksize=s.chunksize + 1)
        from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings

        model, params, _, _, expr, latent = setup
        H = W = 12
        intr = np.array([15.0, 15.0, 0.5, 0.5], np.float32)
        pose = np.eye(4, dtype=np.float32)[:3, :4]
        pose[2, 3] = 0.5
        rng = np.random.RandomState(0)
        bg = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
        settings = RenderSettings(
            num_coarse=4, num_fine=4, perturb=False,
            radiance_field_noise_std=0.0, near=0.2, far=0.8,
            encode_xyz=EncodeSpec(10, True, True),
            encode_dir=EncodeSpec(4, False, True), chunksize=48, fused="on",
        )
        kwargs = dict(
            key=jax.random.PRNGKey(1), expressions=expr, latent_code=latent,
            background=bg,
        )
        # tile=72 on both sides; the unfused baseline is traced BEFORE the
        # eligibility patch, the fused render after (different-trace
        # guarantee: _render_frame_jit caches on static args, so the same
        # tile+settings would silently reuse the unfused trace)
        base = render_full_frame(
            model, model, params, params, H, W, intr, pose, settings,
            tile=72, **kwargs
        )
        # force eligibility (the gate requires a TPU backend; the kernel
        # itself runs in interpret mode on CPU)
        from nerface_tpu.ops.pallas import fused_mlp as fm

        monkeypatch.setattr(
            fm, "fused_paper_mlp_available", lambda n, tr: n % tr == 0
        )
        engaged = []
        orig = fm.fused_paper_render

        def spy(*a, **k):
            engaged.append(True)
            return orig(*a, **k)

        monkeypatch.setattr(fm, "fused_paper_render", spy)
        import nerface_tpu.render.pipeline as _pm
        fused = render_full_frame(
            model, model, params, params, H, W, intr, pose,
            dataclasses_replace_chunk(settings), tile=72, **kwargs
        )
        assert engaged, "fused render branch did not engage"
        for k in ("rgb_fine", "disp_fine", "acc_fine", "bg_weight"):
            np.testing.assert_allclose(
                np.asarray(fused[k]), np.asarray(base[k]), atol=2e-3,
                err_msg=k,
            )


class TestFusedResample:
    def test_matches_sample_pdf_and_merge(self):
        from nerface_tpu.ops.pallas.fused_mlp import fused_resample
        from nerface_tpu.ops.sampling import merge_sorted_zvals, sample_pdf

        R, Sc, Sf = 16, 64, 64
        rng = np.random.RandomState(0)
        z = jnp.asarray(
            np.cumsum(rng.rand(R, Sc).astype(np.float32) * 0.01 + 0.002, -1)
        )
        w = jnp.asarray(rng.rand(R, Sc).astype(np.float32))
        key = jax.random.PRNGKey(5)
        # same key/shape as sample_pdf draws internally -> identical u's
        u = jax.random.uniform(key, (R, Sf), dtype=jnp.float32)
        zs = sample_pdf(key, 0.5 * (z[:, 1:] + z[:, :-1]), w[:, 1:-1], Sf,
                        det=False)
        ref = merge_sorted_zvals(z, zs)
        out = fused_resample(z, w, u)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        # output is sorted
        assert (np.diff(np.asarray(out), axis=-1) >= 0).all()

    def test_det_case(self):
        from nerface_tpu.ops.pallas.fused_mlp import fused_resample
        from nerface_tpu.ops.sampling import merge_sorted_zvals, sample_pdf

        R, Sc, Sf = 8, 32, 16
        rng = np.random.RandomState(1)
        z = jnp.asarray(
            np.cumsum(rng.rand(R, Sc).astype(np.float32) * 0.02 + 0.01, -1)
        )
        w = jnp.asarray(rng.rand(R, Sc).astype(np.float32))
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, Sf), (R, Sf))
        zs = sample_pdf(None, 0.5 * (z[:, 1:] + z[:, :-1]), w[:, 1:-1], Sf,
                        det=True)
        ref = merge_sorted_zvals(z, zs)
        out = fused_resample(z, w, u)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_sorted_u_rank_merge(self):
        """det fast path: shared (Sf,) linspace u + one-sided rank merge
        must equal the general counting merge AND the XLA reference."""
        from nerface_tpu.ops.pallas.fused_mlp import fused_resample
        from nerface_tpu.ops.sampling import merge_sorted_zvals, sample_pdf

        R, Sc, Sf = 16, 64, 64
        rng = np.random.RandomState(2)
        z = jnp.asarray(
            np.cumsum(rng.rand(R, Sc).astype(np.float32) * 0.01 + 0.002, -1)
        )
        w = jnp.asarray(rng.rand(R, Sc).astype(np.float32))
        u1 = jnp.linspace(0.0, 1.0, Sf, dtype=jnp.float32)  # (Sf,) shared
        zs = sample_pdf(None, 0.5 * (z[:, 1:] + z[:, :-1]), w[:, 1:-1], Sf,
                        det=True)
        ref = merge_sorted_zvals(z, zs)
        out = fused_resample(z, w, u1, sorted_u=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        assert (np.diff(np.asarray(out), axis=-1) >= 0).all()
        # ties between coarse z and drawn samples keep a full permutation
        # of ranks: duplicate a weight spike so samples collide with bins
        w_spike = w.at[:, 7].set(1e3)
        zs2 = sample_pdf(None, 0.5 * (z[:, 1:] + z[:, :-1]),
                         w_spike[:, 1:-1], Sf, det=True)
        ref2 = merge_sorted_zvals(z, zs2)
        out2 = fused_resample(z, w_spike, u1, sorted_u=True)
        np.testing.assert_allclose(
            np.asarray(out2), np.asarray(ref2), atol=1e-5
        )


class TestSmallerVariant:
    """ConditionalBlendshapePaperSmallerNeRFModel through the same kernel
    (`small=True`): 5-layer trunk, dir branch consumes [feat; dirs; expr/3]
    (`models.py:266-338`) — the expression folds into dir_contrib."""

    @pytest.fixture(scope="class")
    def ssetup(self):
        model = MODELS["ConditionalBlendshapePaperSmallerNeRFModel"](
            num_encoding_fn_xyz=10, num_encoding_fn_dir=4
        )
        params = model.init(jax.random.PRNGKey(1))
        R, S = 8, 16
        rng = np.random.RandomState(1)
        ro = jnp.asarray(rng.randn(R, 3).astype(np.float32) * 0.1)
        rd = jnp.asarray(rng.randn(R, 3).astype(np.float32))
        z = jnp.asarray(np.cumsum(rng.rand(R, S).astype(np.float32) * 0.05, -1))
        dirs = jnp.asarray(rng.randn(R, 3).astype(np.float32))
        pe_dir = positional_encoding(dirs, 4, False, True)
        expr = jnp.asarray(rng.randn(76).astype(np.float32) * 0.1)
        latent = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
        return model, params, (ro, rd, z), pe_dir, expr, latent

    def _fused(self, model, params, rays, pe_dir, expr, latent, tr=4):
        from nerface_tpu.render.pipeline import _fused_conditioning

        cond, dir_contrib, small = _fused_conditioning(
            model, params, pe_dir, expr, latent
        )
        assert small is True
        ro, rd, z = rays
        return fused_paper_mlp(
            params, ro, rd, z, dir_contrib, cond, num_encoding_fn_xyz=10,
            rays_per_tile=tr, small=True,
        )

    def test_forward_matches_apply(self, ssetup):
        model, params, rays, pe_dir, expr, latent = ssetup
        pe = positional_encoding(_pts(rays), 10, True, True)
        ref = model.apply(params, pe, pe_dir, expr, latent)
        out = self._fused(model, params, rays, pe_dir, expr, latent)
        assert out.shape == ref.shape == (8, 16, 4)
        scale = float(jnp.abs(ref).max())
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=0.01 * scale
        )

    def test_grads_match_apply(self, ssetup):
        model, params, rays, pe_dir, expr, latent = ssetup
        pe = positional_encoding(_pts(rays), 10, True, True)

        def loss_fused(params, latent, expr):
            return jnp.sum(
                self._fused(model, params, rays, pe_dir, expr, latent) ** 2
            )

        def loss_ref(params, latent, expr):
            return jnp.sum(
                model.apply(
                    params, pe, pe_dir, expr, latent, dtype=jnp.bfloat16
                ) ** 2
            )

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(params, latent, expr)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(params, latent, expr)
        for k in g2[0]:
            a, b = np.asarray(g1[0][k]), np.asarray(g2[0][k])
            assert a.shape == b.shape, k
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-8)
            assert rel < 0.05, (k, rel)
        for i in (1, 2):  # latent and expression grads
            rel = np.abs(np.asarray(g1[i]) - np.asarray(g2[i])).max() / (
                np.abs(np.asarray(g2[i])).max() + 1e-8
            )
            assert rel < 0.05, i

    def test_render_kernel_matches_composite(self, ssetup):
        from nerface_tpu.ops.compositing import (
            inject_background,
            volume_render_radiance_field,
        )
        from nerface_tpu.ops.pallas.fused_mlp import fused_paper_render
        from nerface_tpu.render.pipeline import _fused_conditioning

        model, params, rays, pe_dir, expr, latent = ssetup
        ro, rd, z = rays
        rng = np.random.RandomState(5)
        bg = jnp.asarray(rng.rand(8, 3).astype(np.float32))
        cond, dir_contrib, small = _fused_conditioning(
            model, params, pe_dir, expr, latent
        )
        out = fused_paper_render(
            params, ro, rd, z, dir_contrib, cond, background=bg,
            num_encoding_fn_xyz=10, out_weights=True, small=True,
        )
        pe = positional_encoding(_pts(rays), 10, True, True)
        radiance = model.apply(params, pe, pe_dir, expr, latent)
        radiance = inject_background(radiance, bg)
        rgb, disp, acc, weights, _ = volume_render_radiance_field(
            radiance, z, rd, background_prior=bg
        )
        scale = float(jnp.abs(rgb).max())
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(rgb), atol=0.02 * scale
        )
        np.testing.assert_allclose(
            np.asarray(out["weights"]), np.asarray(weights), atol=2e-2
        )


class TestFlexFamilyKernel:
    """FlexibleNeRFModel-family fused kernel (ops/pallas/fused_flex.py):
    skip-free trunk at the reference's universal hyperparameters
    (num_layers=4, hidden 256, skip_connect_every=3)."""

    @pytest.fixture(scope="class", params=[
        "ConditionalBlendshapeLearnableCodeNeRFModel",
        "ConditionalBlendshapeNeRFModel",
        "FlexibleNeRFModel",
    ])
    def fsetup(self, request):
        model = MODELS[request.param](
            num_layers=4, hidden_size=256, skip_connect_every=3,
            num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
        )
        params = model.init(jax.random.PRNGKey(2))
        R, S = 8, 16
        rng = np.random.RandomState(2)
        ro = jnp.asarray(rng.randn(R, 3).astype(np.float32) * 0.1)
        rd = jnp.asarray(rng.randn(R, 3).astype(np.float32))
        z = jnp.asarray(np.cumsum(rng.rand(R, S).astype(np.float32) * 0.05, -1))
        dirs = jnp.asarray(rng.randn(R, 3).astype(np.float32))
        pe_dir = positional_encoding(dirs, 4, False, True)
        expr = jnp.asarray(rng.randn(76).astype(np.float32) * 0.1)
        latent = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
        return model, params, (ro, rd, z), pe_dir, expr, latent

    def _fused(self, model, params, rays, pe_dir, expr, latent, tr=4):
        from nerface_tpu.models.mlp import cond_contribution
        from nerface_tpu.ops.pallas.fused_flex import (
            flex_fused_eligible,
            fused_flex_mlp,
        )
        from nerface_tpu.render.pipeline import EncodeSpec

        assert flex_fused_eligible(model, EncodeSpec(10, True, True), pe_dir)
        e = expr if model.takes_expression else None
        l = latent if model.takes_latent else None
        e, l = model._prepare(params, e, l, None)
        v0 = params["layer1.bias"]
        segs = model._cond_segments_layer1(e, l)
        if segs:
            v0 = v0 + cond_contribution(params, "layer1", segs, model.dim_xyz)
        dd = pe_dir.shape[-1]
        h = model.hidden_size
        dir_contrib = linear_cols(params, "layers_dir.0", pe_dir, h, h + dd)
        ro, rd, z = rays
        return fused_flex_mlp(
            params, ro, rd, z, dir_contrib, v0[None, :],
            n_hidden=model.num_layers - 1, hidden_size=h,
            num_encoding_fn_xyz=10, rays_per_tile=tr,
        )

    def test_forward_matches_apply(self, fsetup):
        model, params, rays, pe_dir, expr, latent = fsetup
        pe = positional_encoding(_pts(rays), 10, True, True)
        ref = model.apply(
            params, pe, pe_dir,
            expr if model.takes_expression else None,
            latent if model.takes_latent else None,
        )
        out = self._fused(model, params, rays, pe_dir, expr, latent)
        assert out.shape == ref.shape == (8, 16, 4)
        scale = float(jnp.abs(ref).max())
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=0.01 * scale
        )

    def test_grads_match_apply(self, fsetup):
        model, params, rays, pe_dir, expr, latent = fsetup
        pe = positional_encoding(_pts(rays), 10, True, True)

        def loss_fused(params):
            return jnp.sum(
                self._fused(model, params, rays, pe_dir, expr, latent) ** 2
            )

        def loss_ref(params):
            return jnp.sum(
                model.apply(
                    params, pe, pe_dir,
                    expr if model.takes_expression else None,
                    latent if model.takes_latent else None,
                    dtype=jnp.bfloat16,
                ) ** 2
            )

        g1 = jax.grad(loss_fused)(params)
        g2 = jax.grad(loss_ref)(params)
        for k in g2:
            a, b = np.asarray(g1[k]), np.asarray(g2[k])
            assert a.shape == b.shape, k
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-8)
            assert rel < 0.05, (k, rel)

    def test_pipeline_dispatches_flex_kernel(self, monkeypatch):
        """render_rays routes an eligible flex model through the kernel."""
        import nerface_tpu.ops.pallas.fused_flex as ff
        from nerface_tpu.ops.pallas import fused_mlp as fm
        from nerface_tpu.render.pipeline import (
            EncodeSpec,
            RenderSettings,
            render_rays,
        )

        # kernels gate on a TPU backend; force availability (interpret mode)
        monkeypatch.setattr(
            fm, "fused_paper_mlp_available", lambda n, tr: n % tr == 0
        )

        model = MODELS["ConditionalBlendshapeLearnableCodeNeRFModel"](
            num_layers=4, hidden_size=256, skip_connect_every=3,
            num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
        )
        params = model.init(jax.random.PRNGKey(3))
        calls = []
        real = ff.fused_flex_mlp

        def spy(*a, **k):
            calls.append(1)
            return real(*a, **k)

        monkeypatch.setattr(ff, "fused_flex_mlp", spy)
        rng = np.random.RandomState(3)
        R = 8
        rd = rng.randn(R, 3).astype(np.float32)
        rd[:, 2] = -np.abs(rd[:, 2]) - 0.5
        settings = RenderSettings(
            num_coarse=8, num_fine=8, perturb=False,
            radiance_field_noise_std=0.0, near=0.2, far=0.8,
            encode_xyz=EncodeSpec(10, True, True),
            encode_dir=EncodeSpec(4, False, True),
            fused="on",
        )
        out = render_rays(
            model, model, params, params,
            jnp.zeros((R, 3)), jnp.asarray(rd), settings,
            key=jax.random.PRNGKey(0),
            expressions=jnp.asarray(rng.randn(76).astype(np.float32)),
            latent_code=jnp.zeros((32,)),
        )
        assert calls, "flex kernel was not dispatched"
        assert np.isfinite(np.asarray(out["rgb_fine"])).all()


class TestPrecisionKnobValidation:
    """ADVICE r3: env knobs must fail eagerly with a clear message, and
    SPLIT must be rejected for linspace (non-power-of-two) bands."""

    def test_check_pe_mode_split_rejects_linear_bands(self, monkeypatch):
        from nerface_tpu.ops.pallas import fused_mlp as fm

        monkeypatch.setattr(fm, "_PE_MODE", "SPLIT")
        with pytest.raises(ValueError, match="log-sampled"):
            fm.check_pe_mode(False)
        fm.check_pe_mode(True)  # log bands: fine

    def test_check_pe_mode_other_modes_accept_linear_bands(self, monkeypatch):
        from nerface_tpu.ops.pallas import fused_mlp as fm

        for mode in ("DEFAULT", "HIGHEST"):
            monkeypatch.setattr(fm, "_PE_MODE", mode)
            fm.check_pe_mode(False)

    @pytest.mark.parametrize(
        "var,val",
        [("NERFACE_PE_PRECISION", "HIGH EST"),
         ("NERFACE_CUMPROD_PRECISION", "SPLIT")],
    )
    def test_bad_env_value_raises_named_error_at_import(self, var, val):
        import subprocess
        import sys

        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "import nerface_tpu.ops.pallas.fused_mlp\n"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env={**__import__('os').environ, var: val},
            capture_output=True, text=True,
        )
        assert proc.returncode != 0
        assert var in proc.stderr and "allowed values" in proc.stderr

    def test_resample_cdf_matmul_pinned_highest(self):
        # the exact-match contract site must not follow the env knob
        import inspect

        from nerface_tpu.ops.pallas import fused_mlp as fm

        src = inspect.getsource(fm._resample_kernel)
        assert "precision=jax.lax.Precision.HIGHEST" in src
        assert "precision=CUMPROD_PRECISION" not in src
