"""Oracle parity of the rewritten LLFF pose-path math (data/llff.py)
against the reference's `load_llff.py` functions (pure numpy, importable
without the mogrify/image machinery). The LLFF recipe is the spec; the
implementations are structured differently — these tests pin that they
compute identical numbers."""

import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/nerface_code/nerf-pytorch"

if not os.path.isdir(REF_DIR):  # pragma: no cover
    pytest.skip("reference checkout unavailable", allow_module_level=True)

from nerface_tpu.data import llff as ours  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    for name in ("imageio", "pytorch3d", "pytorch3d.transforms",
                 "torchsearchsorted", "tqdm"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "tqdm":
                mod.tqdm = lambda x, **k: x
            sys.modules[name] = mod
    sys.path.insert(0, REF_DIR)
    try:
        import nerf.load_llff as ref_llff
    finally:
        sys.path.pop(0)
    return ref_llff


def _poses(n=7, seed=0):
    """Plausible recentered-ish LLFF poses (3, 5) with an hwf column."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        fwd = ours._unit(np.array([0, 0, 1.0]) + 0.2 * rng.randn(3))
        up = ours._unit(np.array([0, 1.0, 0]) + 0.2 * rng.randn(3))
        pos = np.array([0, 0, -4.0]) + 0.5 * rng.randn(3)
        m = ours.viewmatrix(fwd, up, pos)
        hwf = np.array([[24.0], [32.0], [30.0]])
        out.append(np.concatenate([m, hwf], 1))
    return np.stack(out, 0)


class TestPoseMathOracle:
    def test_viewmatrix(self, ref):
        rng = np.random.RandomState(1)
        for _ in range(5):
            z, up, pos = rng.randn(3), rng.randn(3), rng.randn(3)
            np.testing.assert_array_equal(
                ours.viewmatrix(z, up, pos), ref.viewmatrix(z, up, pos)
            )

    def test_poses_avg(self, ref):
        p = _poses()
        np.testing.assert_array_equal(ours.poses_avg(p), ref.poses_avg(p))

    def test_recenter_poses(self, ref):
        p = _poses()
        np.testing.assert_allclose(
            ours.recenter_poses(p), ref.recenter_poses(p.copy()),
            rtol=0, atol=1e-14,
        )

    def test_render_path_spiral(self, ref):
        p = _poses()
        c2w = ours.poses_avg(p)
        up = ours._unit(p[:, :3, 1].sum(0))
        rads = np.percentile(np.abs(p[:, :3, 3]), 90, 0)
        a = ours.render_path_spiral(
            c2w, up, rads, focal=3.7, zdelta=0.4, zrate=0.5, rots=2, N=24
        )
        b = ref.render_path_spiral(
            c2w, up, rads, focal=3.7, zdelta=0.4, zrate=0.5, rots=2, N=24
        )
        np.testing.assert_allclose(np.stack(a), np.stack(b), rtol=0, atol=1e-13)

    def test_spherify_poses(self, ref):
        p = _poses(n=9, seed=3)
        bds = np.abs(np.random.RandomState(4).randn(9, 2)) + np.array([1.0, 4.0])
        pr_a, ring_a, bds_a = ours.spherify_poses(p, bds)
        pr_b, ring_b, bds_b = ref.spherify_poses(p.copy(), bds.copy())
        np.testing.assert_allclose(pr_a, pr_b, rtol=0, atol=1e-12)
        np.testing.assert_allclose(ring_a, ring_b, rtol=0, atol=1e-12)
        np.testing.assert_allclose(bds_a, bds_b, rtol=0, atol=1e-12)
