"""Occupancy-grid ray skipping (`eval/occupancy.py` + the fast-eval
integration in `eval/renderer.py`).

Quality contract (same as the bbox fast path it extends): rays the grid
keeps render bit-identically to the parity renderer; rays it skips
composite to the exact background. The reference renders every ray
(`eval_transformed_rays.py:449-467`) — this mode is opt-in and off the
parity path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerface_tpu.eval.occupancy import (
    OccupancyGrid,
    _dilate,
    active_fraction,
    build_occupancy_grid,
    conservative_block,
    default_sigma_threshold,
    ray_aabb,
    ray_occupancy_mask,
    ray_occupancy_mask_blocked,
    ray_occupancy_mask_splat,
    tighten_aabb,
)
from nerface_tpu.eval.renderer import render_full_frame
from nerface_tpu.models import MODELS
from nerface_tpu.ops.rays import get_ray_bundle
from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings

H = W = 16
NEAR, FAR = 0.2, 0.8


def _unit_grid(occupied):
    """8^3 grid over [0,1]^3 with the given voxel-index list occupied."""
    g = np.zeros((8, 8, 8), bool)
    for v in occupied:
        g[v] = True
    return OccupancyGrid(
        jnp.asarray(g), jnp.zeros(3, jnp.float32), jnp.ones(3, jnp.float32)
    )


class TestMask:
    def test_single_voxel_hit_and_miss(self):
        occ = _unit_grid([(4, 4, 4)])  # voxel center (0.5625, ...)
        ro = jnp.asarray([[0.5625, 0.5625, 0.0], [0.9, 0.9, 0.0]])
        rd = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        m = ray_occupancy_mask(occ, ro, rd, 0.0, 1.0, n_probes=64)
        assert bool(m[0]) and not bool(m[1])

    def test_outside_aabb_never_hits(self):
        occ = _unit_grid([(0, 0, 0)])
        ro = jnp.asarray([[5.0, 5.0, 5.0]])
        rd = jnp.asarray([[0.0, 0.0, 1.0]])
        assert not bool(ray_occupancy_mask(occ, ro, rd, 0.0, 1.0, 64)[0])

    def test_all_occupied_keeps_in_box_rays(self):
        occ = _unit_grid([tuple(v) for v in np.ndindex(8, 8, 8)])
        ro = jnp.asarray([[0.5, 0.5, 0.1], [3.0, 3.0, 3.0]])
        rd = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        m = ray_occupancy_mask(occ, ro, rd, 0.0, 0.5, 64)
        assert bool(m[0]) and not bool(m[1])


class TestAabbAndThreshold:
    def test_ray_aabb_contains_sample_points(self):
        pose = np.eye(4, dtype=np.float32)
        intr = np.array([20.0, 20.0, 0.5, 0.5], np.float32)
        lo, hi = ray_aabb(pose[None], intr, H, W, NEAR, FAR)
        ro, rd = get_ray_bundle(
            H, W, jnp.asarray(intr), jnp.asarray(pose[:3, :4])
        )
        for t in (NEAR, 0.5 * (NEAR + FAR), FAR):
            p = np.asarray(ro + t * rd).reshape(-1, 3)
            assert (p >= lo - 1e-5).all() and (p <= hi + 1e-5).all()

    def test_default_sigma_threshold(self):
        # alpha(sigma_thr * dz) == 1e-2 by construction
        thr = default_sigma_threshold(NEAR, FAR, num_coarse=6)
        dz = (FAR - NEAR) / 6
        assert np.isclose(1.0 - np.exp(-thr * dz), 1e-2, rtol=1e-6)


class _BallField:
    """Fake model: density 100 inside a ball at `center`, 0 outside
    (occupancy-builder mechanics without training a field)."""

    takes_expression = False
    takes_latent = False

    def __init__(self, center, radius):
        self.center = jnp.asarray(center, jnp.float32)
        self.radius = float(radius)

    def apply(self, params, pe_xyz, pe_dir, expr=None, latent=None,
              dtype=None):
        xyz = pe_xyz[..., :3]
        d = jnp.linalg.norm(xyz - self.center, axis=-1, keepdims=True)
        sigma = jnp.where(d < self.radius, 100.0, 0.0)
        return jnp.concatenate(
            [jnp.zeros(sigma.shape[:-1] + (3,)), sigma], axis=-1
        )


class TestBuilder:
    def test_ball_marks_expected_voxels(self):
        model = _BallField([0.5, 0.5, 0.5], 0.2)
        occ = build_occupancy_grid(
            model, {}, EncodeSpec(0, True, True), None,
            np.zeros(3, np.float32), np.ones(3, np.float32),
            resolution=16, sigma_threshold=1.0, dilate=0, chunk=1024,
        )
        g = np.asarray(occ.grid)
        assert g[8, 8, 8]            # ball center
        assert not g[0, 0, 0]        # corner
        frac = occ.occupancy_fraction()
        # ball volume 4/3 pi 0.2^3 = 0.0335 of the cube
        assert 0.01 < frac < 0.10

    def test_dilate_grows_the_set(self):
        model = _BallField([0.5, 0.5, 0.5], 0.2)
        kw = dict(
            resolution=16, sigma_threshold=1.0, chunk=1024,
        )
        base = build_occupancy_grid(
            model, {}, EncodeSpec(0, True, True), None,
            np.zeros(3, np.float32), np.ones(3, np.float32), dilate=0, **kw
        )
        fat = build_occupancy_grid(
            model, {}, EncodeSpec(0, True, True), None,
            np.zeros(3, np.float32), np.ones(3, np.float32), dilate=1, **kw
        )
        b, f = np.asarray(base.grid), np.asarray(fat.grid)
        assert (f | b == f).all() and f.sum() > b.sum()

    def test_expression_max_pools(self):
        """Occupied under ANY sampled expression stays occupied."""

        class _ExprBall(_BallField):
            takes_expression = True

            def apply(self, params, pe_xyz, pe_dir, expr=None, latent=None,
                      dtype=None):
                xyz = pe_xyz[..., :3]
                center = self.center + jnp.asarray(
                    [expr[0], 0.0, 0.0], jnp.float32
                )
                d = jnp.linalg.norm(xyz - center, axis=-1, keepdims=True)
                sigma = jnp.where(d < self.radius, 100.0, 0.0)
                return jnp.concatenate(
                    [jnp.zeros(sigma.shape[:-1] + (3,)), sigma], axis=-1
                )

        model = _ExprBall([0.3, 0.5, 0.5], 0.15)
        occ = build_occupancy_grid(
            model, {}, EncodeSpec(0, True, True), None,
            np.zeros(3, np.float32), np.ones(3, np.float32),
            resolution=16,
            expressions=[np.zeros(4, np.float32),
                         np.array([0.4, 0, 0, 0], np.float32)],
            sigma_threshold=1.0, dilate=0, chunk=1024,
        )
        g = np.asarray(occ.grid)
        assert g[int(0.3 * 16), 8, 8] and g[int(0.7 * 16), 8, 8]

    def test_save_load_roundtrip(self, tmp_path):
        occ = _unit_grid([(1, 2, 3)])
        p = str(tmp_path / "occ.npz")
        occ.save(p)
        back = OccupancyGrid.load(p)
        assert (np.asarray(back.grid) == np.asarray(occ.grid)).all()
        assert np.allclose(np.asarray(back.aabb_hi), 1.0)


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
        radiance_field_noise_std=0.1, near=NEAR, far=FAR,
        encode_xyz=EncodeSpec(4, True, True),
        encode_dir=EncodeSpec(2, False, True),
        **kw,
    )


class TestRendererIntegration:
    def test_kept_rays_match_parity_skipped_are_background(self, setup):
        """An occupancy grid covering only part of the frustum: kept rays
        == parity renderer bit-for-bit, skipped rays == background."""
        model, pc, pf, intr, pose, expr, latent, bg = setup
        lo, hi = ray_aabb(
            np.eye(4, dtype=np.float32)[None], intr, H, W, NEAR, FAR
        )
        # occupy only the left half of the volume (x below the midpoint)
        res = 8
        g = np.zeros((res, res, res), bool)
        g[: res // 2] = True
        occ = OccupancyGrid(
            jnp.asarray(g), jnp.asarray(lo), jnp.asarray(hi)
        )
        key = jax.random.PRNGKey(3)
        common = dict(
            key=key, expressions=expr, latent_code=latent, background=bg,
        )
        full = render_full_frame(
            model, model, pc, pf, H, W, intr, pose, _settings(), **common
        )
        s = _settings(fast_eval=True, fast_eval_capacity=0.7)
        fast = render_full_frame(
            model, model, pc, pf, H, W, intr, pose, s,
            occupancy=occ, **common,
        )
        ro, rd = get_ray_bundle(
            H, W, jnp.asarray(intr), jnp.asarray(pose)
        )
        kept = np.asarray(
            ray_occupancy_mask(
                occ, ro.reshape(-1, 3), rd.reshape(-1, 3), NEAR, FAR,
                s.occupancy_probes,
            )
        ).reshape(H, W)
        assert 0 < kept.sum() < H * W  # the split is non-trivial
        a = np.asarray(full["rgb_fine"])
        b = np.asarray(fast["rgb_fine"])
        np.testing.assert_allclose(b[kept], a[kept], rtol=1e-5, atol=1e-5)
        # non-kept rays: skipped slots are the exact background; spare
        # capacity slots hold real renders (== the parity renderer) —
        # same contract as the bbox fast path
        out_b, out_a = b[~kept], a[~kept]
        out_bg = np.asarray(bg)[~kept]
        is_bg = np.isclose(out_b, out_bg, atol=1e-6).all(axis=-1)
        is_real = np.isclose(out_b, out_a, rtol=1e-4, atol=1e-4).all(axis=-1)
        assert (is_bg | is_real).all()
        assert is_bg.sum() > 0  # some rays really were skipped

    def test_bbox_and_occupancy_intersect(self, setup):
        """With both: a ray must pass BOTH tests to render."""
        model, pc, pf, intr, pose, expr, latent, bg = setup
        lo, hi = ray_aabb(
            np.eye(4, dtype=np.float32)[None], intr, H, W, NEAR, FAR
        )
        g = np.ones((8, 8, 8), bool)
        occ = OccupancyGrid(jnp.asarray(g), jnp.asarray(lo), jnp.asarray(hi))
        bbox = np.array([4, 11, 3, 12], np.int32)
        s = _settings(fast_eval=True, fast_eval_capacity=0.6)
        common = dict(
            key=jax.random.PRNGKey(3), expressions=expr,
            latent_code=latent, background=bg,
        )
        both = render_full_frame(
            model, model, pc, pf, H, W, intr, pose, s,
            bbox=bbox, occupancy=occ, **common,
        )
        bbox_only = render_full_frame(
            model, model, pc, pf, H, W, intr, pose, s,
            bbox=bbox, **common,
        )
        # an all-occupied grid changes nothing vs the bbox-only path
        np.testing.assert_allclose(
            np.asarray(both["rgb_fine"]), np.asarray(bbox_only["rgb_fine"]),
            rtol=1e-6, atol=1e-6,
        )

    def test_active_fraction_sizes_capacity(self, setup):
        _, _, _, intr, pose, _, _, _ = setup
        lo, hi = ray_aabb(
            np.eye(4, dtype=np.float32)[None], intr, H, W, NEAR, FAR
        )
        all_occ = OccupancyGrid(
            jnp.ones((8, 8, 8), bool), jnp.asarray(lo), jnp.asarray(hi)
        )
        none_occ = OccupancyGrid(
            jnp.zeros((8, 8, 8), bool), jnp.asarray(lo), jnp.asarray(hi)
        )
        poses = np.eye(4, dtype=np.float32)[None]
        hi_frac = active_fraction(
            all_occ, poses, intr, H, W, NEAR, FAR
        )
        lo_frac = active_fraction(
            none_occ, poses, intr, H, W, NEAR, FAR
        )
        assert hi_frac > 0.95 and lo_frac == 0.0

    def test_settings_from_cfg(self):
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
                    "occupancy": True, "occupancy_resolution": 32,
                    "occupancy_probes": 96, "occupancy_dilate": 2,
                },
            },
        })
        s = RenderSettings.from_cfg(cfg, mode="validation")
        assert s.occupancy and s.occupancy_resolution == 32
        assert s.occupancy_probes == 96 and s.occupancy_dilate == 2


class TestBlockedMask:
    """Block-downsampled probing (`ray_occupancy_mask_blocked`): one
    probed ray per B×B pixel block, conservative through the grid's
    dilation margin (`conservative_block` derives the safe B)."""

    def _frustum(self, intr):
        pose = np.eye(4, dtype=np.float32)
        return ray_aabb(pose[None], intr, H, W, NEAR, FAR)

    def test_block1_equals_per_ray(self):
        occ = _unit_grid([(4, 4, 4), (2, 6, 3)])
        intr = np.array([20.0, 20.0, 0.5, 0.5], np.float32)
        ro, rd = get_ray_bundle(
            H, W, jnp.asarray(intr), jnp.eye(4, dtype=jnp.float32)[:3, :4]
        )
        ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
        a = ray_occupancy_mask(occ, ro, rd, 0.0, 1.0, 64)
        b = ray_occupancy_mask_blocked(occ, ro, rd, H, W, 0.0, 1.0, 64, 1)
        assert (np.asarray(a) == np.asarray(b)).all()

    def test_blocked_on_dilated_covers_per_ray_on_true(self):
        """The conservativeness contract: for every safe block size, the
        blocked mask over the DILATED grid is a superset of the exact
        per-ray mask over the TRUE grid (no ray with real density is
        ever skipped)."""
        rng = np.random.RandomState(7)
        intr = np.array([40.0, 40.0, 0.5, 0.5], np.float32)
        pose = jnp.eye(4, dtype=jnp.float32)[:3, :4]
        lo, hi = self._frustum(intr)
        for trial in range(5):
            g = rng.rand(8, 8, 8) < 0.04
            true = OccupancyGrid(
                jnp.asarray(g), jnp.asarray(lo), jnp.asarray(hi)
            )
            dil = OccupancyGrid(
                _dilate(jnp.asarray(g), 1), jnp.asarray(lo), jnp.asarray(hi)
            )
            b = conservative_block(true, intr, FAR, H, W, dilate=1)
            ro, rd = get_ray_bundle(H, W, jnp.asarray(intr), pose)
            ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
            exact = np.asarray(
                ray_occupancy_mask(true, ro, rd, NEAR, FAR, 256)
            )
            blocked = np.asarray(ray_occupancy_mask_blocked(
                dil, ro, rd, H, W, NEAR, FAR, 256, b
            ))
            assert (blocked | ~exact).all(), (
                f"trial {trial}: blocked mask (B={b}) skipped "
                f"{int((exact & ~blocked).sum())} truly-occupied rays"
            )

    def test_conservative_block_bound(self):
        occ = _unit_grid([(4, 4, 4)])  # vox = 1/8 over [0,1]^3
        # limit = dilate*vox*f/(sqrt(2)*far): generous focal -> capped at 8
        assert conservative_block(
            occ, np.array([2000.0, 2000.0, 0.5, 0.5]), 0.8, 512, 512
        ) == 8
        # tiny focal -> even B=2 unsafe -> 1
        assert conservative_block(
            occ, np.array([4.0, 4.0, 0.5, 0.5]), 0.8, 512, 512
        ) == 1
        # must divide H and W (510 is even -> 2 is the largest legal B)
        assert conservative_block(
            occ, np.array([2000.0, 2000.0, 0.5, 0.5]), 0.8, 510, 512
        ) == 2
        assert conservative_block(
            occ, np.array([2000.0, 2000.0, 0.5, 0.5]), 0.8, 511, 512
        ) == 1

    def test_renderer_blocked_kept_rays_match_parity(self, setup):
        """Through the real fast renderer with occupancy_block set: kept
        rays bit-match parity, skipped rays composite to background."""
        model, pc, pf, intr, pose, expr, latent, bg = setup
        lo, hi = ray_aabb(
            np.eye(4, dtype=np.float32)[None], intr, H, W, NEAR, FAR
        )
        g = np.zeros((8, 8, 8), bool)
        g[:2] = True
        occ = OccupancyGrid(
            _dilate(jnp.asarray(g), 1), jnp.asarray(lo), jnp.asarray(hi)
        )
        common = dict(
            key=jax.random.PRNGKey(3), expressions=expr,
            latent_code=latent, background=bg,
        )
        full = render_full_frame(
            model, model, pc, pf, H, W, intr, pose, _settings(), **common
        )
        s = _settings(
            fast_eval=True, fast_eval_capacity=0.9, occupancy_block=4
        )
        fast = render_full_frame(
            model, model, pc, pf, H, W, intr, pose, s,
            occupancy=occ, **common,
        )
        ro, rd = get_ray_bundle(H, W, jnp.asarray(intr), jnp.asarray(pose))
        kept = np.asarray(ray_occupancy_mask_blocked(
            occ, ro.reshape(-1, 3), rd.reshape(-1, 3), H, W, NEAR, FAR,
            s.occupancy_probes, 4,
        )).reshape(H, W)
        assert 0 < kept.sum() < H * W
        a, b = np.asarray(full["rgb_fine"]), np.asarray(fast["rgb_fine"])
        np.testing.assert_allclose(b[kept], a[kept], rtol=1e-5, atol=1e-5)
        out_b, out_a = b[~kept], a[~kept]
        out_bg = np.asarray(bg)[~kept]
        is_bg = np.isclose(out_b, out_bg, atol=1e-6).all(axis=-1)
        is_real = np.isclose(out_b, out_a, rtol=1e-4, atol=1e-4).all(axis=-1)
        assert (is_bg | is_real).all()

    def test_active_fraction_blocked_matches_renderer_count(self):
        """Capacity contract: active_fraction(block=B) equals the mean of
        the same blocked mask the renderer computes."""
        occ = _unit_grid([(4, 4, 4), (3, 3, 3)])
        intr = np.array([20.0, 20.0, 0.5, 0.5], np.float32)
        pose = np.eye(4, dtype=np.float32)
        ro, rd = get_ray_bundle(
            H, W, jnp.asarray(intr), jnp.asarray(pose[:3, :4])
        )
        m = ray_occupancy_mask_blocked(
            occ, ro.reshape(-1, 3), rd.reshape(-1, 3), H, W, NEAR, FAR,
            128, 4,
        )
        f = active_fraction(
            occ, pose[None], intr, H, W, NEAR, FAR, 128, block=4
        )
        assert f == pytest.approx(float(np.asarray(m).mean()))


def _front_grid(occupied, res=8):
    """res^3 grid over a box IN FRONT of an identity-pose camera
    (z in [-0.9, -0.3] — the camera looks down -z)."""
    g = np.zeros((res, res, res), bool)
    for v in occupied:
        g[v] = True
    return OccupancyGrid(
        jnp.asarray(g),
        jnp.asarray([-0.3, -0.3, -0.9], jnp.float32),
        jnp.asarray([0.3, 0.3, -0.3], jnp.float32),
    )


class TestSplat:
    """Projection-splat occupancy mask (`ray_occupancy_mask_splat`): an
    exact conservative superset of any probe mask, computed by splatting
    the projected pixel bboxes of the occupied voxel boxes."""

    intr = np.array([20.0, 20.0, 0.5, 0.5], np.float32)
    pose = np.eye(4, dtype=np.float32)[:3, :4]

    def test_with_boxes_covers_exactly_the_occupied_voxels(self):
        rng = np.random.RandomState(7)
        g = rng.rand(8, 8, 8) < 0.2
        occ = OccupancyGrid(
            jnp.asarray(g), jnp.zeros(3, jnp.float32),
            jnp.ones(3, jnp.float32),
        ).with_boxes(round_to=16)
        # reconstruct the voxel set from the merged run boxes
        vox = 1.0 / 8
        back = np.zeros((8, 8, 8), bool)
        lo = np.asarray(occ.boxes_lo)
        hi = np.asarray(occ.boxes_hi)
        for b_lo, b_hi in zip(lo[np.asarray(occ.boxes_valid)],
                              hi[np.asarray(occ.boxes_valid)]):
            i0 = np.round(b_lo / vox).astype(int)
            i1 = np.round(b_hi / vox).astype(int)
            assert i1[0] == i0[0] + 1 and i1[1] == i0[1] + 1  # z-runs only
            back[i0[0], i0[1], i0[2]:i1[2]] = True
        assert (back == g).all()
        # padding is invalid and the count is rounded up
        assert occ.boxes_lo.shape[0] % 16 == 0
        assert int(np.asarray(occ.boxes_valid).sum()) < occ.boxes_lo.shape[0]

    def test_splat_superset_of_probe(self):
        """Conservativeness: every ray the per-ray probe keeps, the splat
        keeps (random grids, off-center pose)."""
        rng = np.random.RandomState(3)
        for trial in range(4):
            occ = _front_grid(
                [tuple(v) for v in rng.randint(0, 8, size=(20, 3))]
            )
            pose = self.pose.copy()
            pose[:, 3] = rng.randn(3) * 0.05  # jitter the camera
            boxed = occ.with_boxes(round_to=8)
            splat = np.asarray(ray_occupancy_mask_splat(
                boxed, jnp.asarray(pose), self.intr, H, W
            ))
            ro, rd = get_ray_bundle(
                H, W, jnp.asarray(self.intr), jnp.asarray(pose)
            )
            probe = np.asarray(ray_occupancy_mask(
                occ, ro.reshape(-1, 3), rd.reshape(-1, 3), NEAR, FAR, 256
            ))
            assert (splat | ~probe).all(), f"trial {trial}: splat missed rays"

    def test_splat_is_tight_for_a_single_voxel(self):
        """Exactness: one voxel's splat is within rounding (the 1-pixel
        floor/ceil margin) of the probe mask — no halo inflation."""
        occ = _front_grid([(4, 4, 4)])
        boxed = occ.with_boxes(round_to=8)
        splat = np.asarray(ray_occupancy_mask_splat(
            boxed, jnp.asarray(self.pose), self.intr, H, W
        )).reshape(H, W)
        ro, rd = get_ray_bundle(
            H, W, jnp.asarray(self.intr), jnp.asarray(self.pose)
        )
        probe = np.asarray(ray_occupancy_mask(
            occ, ro.reshape(-1, 3), rd.reshape(-1, 3), 0.1, 1.2, 512
        )).reshape(H, W)
        assert (splat | ~probe).all()
        # the splat rect is the probe silhouette grown by <= 1 px per side
        grown = np.zeros_like(probe)
        idx = np.argwhere(probe)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                r = np.clip(idx[:, 0] + di, 0, H - 1)
                c = np.clip(idx[:, 1] + dj, 0, W - 1)
                grown[r, c] = True
        assert (grown | ~splat).all(), "splat exceeds probe + 1px"

    def test_behind_camera_box_splats_full_frame(self):
        g = np.zeros((8, 8, 8), bool)
        g[4, 4, 4] = True
        occ = OccupancyGrid(  # box BEHIND the camera (+z)
            jnp.asarray(g),
            jnp.asarray([-0.3, -0.3, 0.3], jnp.float32),
            jnp.asarray([0.3, 0.3, 0.9], jnp.float32),
        ).with_boxes(round_to=8)
        m = np.asarray(ray_occupancy_mask_splat(
            occ, jnp.asarray(self.pose), self.intr, H, W
        ))
        assert m.all()  # conservative: cannot project, keep everything

    def test_empty_grid_splats_nothing(self):
        occ = _front_grid([]).with_boxes(round_to=8)
        m = np.asarray(ray_occupancy_mask_splat(
            occ, jnp.asarray(self.pose), self.intr, H, W
        ))
        assert not m.any()

    def test_offscreen_box_splats_nothing(self):
        occ = OccupancyGrid(  # in front but far off to +x
            jnp.asarray(np.ones((2, 2, 2), bool)),
            jnp.asarray([5.0, 5.0, -0.9], jnp.float32),
            jnp.asarray([5.6, 5.6, -0.3], jnp.float32),
        ).with_boxes(round_to=8)
        m = np.asarray(ray_occupancy_mask_splat(
            occ, jnp.asarray(self.pose), self.intr, H, W
        ))
        assert not m.any()

    def test_active_fraction_uses_splat_when_boxes_present(self):
        occ = _front_grid([(4, 4, 4), (3, 4, 4)])
        boxed = occ.with_boxes(round_to=8)
        f = active_fraction(
            boxed, np.eye(4, dtype=np.float32)[None], self.intr,
            H, W, NEAR, FAR
        )
        m = np.asarray(ray_occupancy_mask_splat(
            boxed, jnp.asarray(self.pose), self.intr, H, W
        ))
        assert f == pytest.approx(float(m.mean()))
        assert 0.0 < f < 0.5

    def test_tighten_aabb_shrinks_to_the_ball(self):
        model = _BallField([0.0, 0.0, -0.6], 0.1)
        lo0 = np.array([-0.3, -0.3, -0.9], np.float32)
        hi0 = np.array([0.3, 0.3, -0.3], np.float32)
        enc = lambda x: x  # identity PE: _BallField reads xyz directly
        lo, hi = tighten_aabb(
            model, None, enc, None, lo0, hi0, None, None,
            sigma_threshold=1.0,
        )
        # contains the ball with margin, strictly inside the frustum box
        assert (lo <= np.array([-0.1, -0.1, -0.7]) + 1e-6).all()
        assert (hi >= np.array([0.1, 0.1, -0.5]) - 1e-6).all()
        assert (lo >= lo0 - 1e-6).all() and (hi <= hi0 + 1e-6).all()
        assert ((hi - lo) < (hi0 - lo0) * 0.9).all()

    def test_tighten_aabb_empty_field_keeps_the_box(self):
        model = _BallField([99.0, 99.0, 99.0], 0.01)  # nothing in box
        lo0 = np.array([-0.3, -0.3, -0.9], np.float32)
        hi0 = np.array([0.3, 0.3, -0.3], np.float32)
        lo, hi = tighten_aabb(
            model, None, lambda x: x, None, lo0, hi0, None, None,
            sigma_threshold=1.0,
        )
        assert np.allclose(lo, lo0) and np.allclose(hi, hi0)

    def test_supersample_catches_sub_voxel_features(self):
        """The splat grid's conservativeness guard: a feature that sits
        between the coarse voxel centers is missed by the center-only
        build (ss=1) but caught by the 2x supersampled build the splat
        path uses (any of the 8 sub-centers clears the threshold)."""
        # res 4 over the unit cube: centers at 0.125+k/4; a radius-0.12
        # ball at 0.25 (a voxel CORNER) is 0.217 from every coarse
        # center but only 0.108 from the nearest ss=2 sub-center
        model = _BallField([0.25, 0.25, 0.25], 0.12)
        kw = dict(
            resolution=4, sigma_threshold=1.0, dilate=0, chunk=512,
        )
        coarse = build_occupancy_grid(
            model, {}, EncodeSpec(0, True, True), None,
            np.zeros(3, np.float32), np.ones(3, np.float32), **kw,
        )
        assert not np.asarray(coarse.grid).any()
        fine = build_occupancy_grid(
            model, {}, EncodeSpec(0, True, True), None,
            np.zeros(3, np.float32), np.ones(3, np.float32),
            supersample=2, **kw,
        )
        g = np.asarray(fine.grid)
        assert g.shape == (4, 4, 4)  # pooled back to the coarse shape
        assert g[:2, :2, :2].any() and g.sum() <= 8

    def test_supersample_one_is_the_center_build(self):
        model = _BallField([0.5, 0.5, 0.5], 0.2)
        kw = dict(
            resolution=8, sigma_threshold=1.0, dilate=0, chunk=512,
        )
        a = build_occupancy_grid(
            model, {}, EncodeSpec(0, True, True), None,
            np.zeros(3, np.float32), np.ones(3, np.float32), **kw,
        )
        b = build_occupancy_grid(
            model, {}, EncodeSpec(0, True, True), None,
            np.zeros(3, np.float32), np.ones(3, np.float32),
            supersample=1, **kw,
        )
        assert (np.asarray(a.grid) == np.asarray(b.grid)).all()

    def test_renderer_splat_kept_rays_match_parity(self, setup):
        """e2e through the fast renderer with a boxed grid: kept rays ==
        parity bit-for-bit, skipped rays == background (the same quality
        contract as the probe path)."""
        model, pc, pf, intr, pose, expr, latent, bg = setup
        lo, hi = ray_aabb(
            np.eye(4, dtype=np.float32)[None], intr, H, W, NEAR, FAR
        )
        res = 8
        g = np.zeros((res, res, res), bool)
        g[: res // 2] = True  # left half of the frustum box
        occ = OccupancyGrid(
            jnp.asarray(g), jnp.asarray(lo), jnp.asarray(hi)
        ).with_boxes(round_to=64)
        key = jax.random.PRNGKey(3)
        common = dict(
            key=key, expressions=expr, latent_code=latent, background=bg,
        )
        full = render_full_frame(
            model, model, pc, pf, H, W, intr, pose, _settings(), **common
        )
        s = _settings(fast_eval=True, fast_eval_capacity=1.0)
        fast = render_full_frame(
            model, model, pc, pf, H, W, intr, pose, s,
            occupancy=occ, **common,
        )
        kept = np.asarray(ray_occupancy_mask_splat(
            occ, jnp.asarray(pose), intr, H, W
        )).reshape(H, W)
        assert 0 < kept.sum() < H * W
        a = np.asarray(full["rgb_fine"])
        b = np.asarray(fast["rgb_fine"])
        np.testing.assert_allclose(b[kept], a[kept], rtol=1e-5, atol=1e-5)
        out_b, out_a = b[~kept], a[~kept]
        out_bg = np.asarray(bg)[~kept]
        is_bg = np.isclose(out_b, out_bg, atol=1e-6).all(axis=-1)
        is_real = np.isclose(out_b, out_a, rtol=1e-4, atol=1e-4).all(axis=-1)
        assert (is_bg | is_real).all()
