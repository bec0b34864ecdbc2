"""Metrics harness tests: PSNR/SSIM/L1 numerics, ScalarMetric, and the
folder-comparison harness (equivalent of `nerf/metrics.py`, which ships no
tests of its own)."""

import math
import os

import numpy as np
import pytest

from nerface_tpu.metrics import ScalarMetric, l1, psnr, ssim, two_folders


class TestScalarMetric:
    def test_running_mean(self):
        m = ScalarMetric()
        assert m.peek() == 0.0  # divides by 1 when empty (`metrics.py:39-42`)
        for v in (1.0, 2.0, 6.0):
            m.update(v)
        assert m.peek() == pytest.approx(3.0)
        m.reset()
        assert m.peek() == 0.0


class TestImageMetrics:
    def test_psnr_closed_form(self, rng):
        x = rng.rand(16, 16, 3)
        y = x + 0.1  # MSE = 0.01 exactly
        assert psnr(x, y) == pytest.approx(10 * math.log10(1 / 0.01), abs=1e-9)
        assert psnr(x, x) == float("inf")
        # data_range=2 (legacy skimage float behavior) adds 10*log10(4)
        assert psnr(x, y, data_range=2.0) - psnr(x, y) == pytest.approx(
            10 * math.log10(4), abs=1e-9
        )

    def test_l1(self, rng):
        x = rng.rand(8, 8, 3)
        assert l1(x, x) == 0.0
        assert l1(x, x + 0.25) == pytest.approx(0.25, abs=1e-12)

    def test_ssim_identity_and_bounds(self, rng):
        x = rng.rand(32, 32, 3)
        assert ssim(x, x) == pytest.approx(1.0, abs=1e-9)
        noisy = np.clip(x + rng.randn(32, 32, 3) * 0.2, 0, 1)
        s = ssim(x, noisy)
        assert 0.0 < s < 1.0
        # symmetric
        assert ssim(noisy, x) == pytest.approx(s, abs=1e-12)

    def test_ssim_constant_shift(self):
        # Constant images differing by luminance only: SSIM =
        # (2·u1·u2 + C1)/(u1² + u2² + C1) — variance terms cancel.
        a = np.full((16, 16), 0.4)
        b = np.full((16, 16), 0.6)
        c1 = 0.01**2
        expected = (2 * 0.4 * 0.6 + c1) / (0.4**2 + 0.6**2 + c1)
        assert ssim(a, b) == pytest.approx(expected, abs=1e-9)

    def test_ssim_grayscale_vs_multichannel(self, rng):
        g = rng.rand(24, 24)
        x = np.stack([g, g, g], axis=-1)
        assert ssim(x, np.clip(x + 0.05, 0, 1)) == pytest.approx(
            ssim(g, np.clip(g + 0.05, 0, 1)), abs=1e-12
        )


class TestTwoFolders:
    def test_end_to_end(self, rng, tmp_path):
        from PIL import Image

        gt, gen = tmp_path / "gt", tmp_path / "gen"
        gt.mkdir(), gen.mkdir()
        for i in range(3):
            a = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
            b = np.clip(
                a.astype(int) + rng.randint(-12, 12, a.shape), 0, 255
            ).astype(np.uint8)
            Image.fromarray(a).save(gt / f"f_{i:04d}.png")
            Image.fromarray(b).save(gen / f"{i:04d}.png")

        summary = two_folders(str(gt), str(gen), log=False)
        assert 20 < summary["PSNR"] < 50
        assert 0 < summary["SSIM"] <= 1
        assert summary["L1"] > 0
        assert math.isnan(summary["LPIPS"])  # no weights available offline
        assert (gen / "metrics.txt").exists()
        assert (gen / "L2" / "0000.png").exists()
        text = (gen / "metrics.txt").read_text()
        assert "mean PSNR" in text and "Summary" in text

    def test_generated_more_than_gt_asserts(self, rng, tmp_path):
        from PIL import Image

        gt, gen = tmp_path / "gt", tmp_path / "gen"
        gt.mkdir(), gen.mkdir()
        img = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(gen / "0000.png")
        Image.fromarray(img).save(gen / "0001.png")
        Image.fromarray(img).save(gt / "0000.png")
        with pytest.raises(AssertionError):
            two_folders(str(gt), str(gen), log=False)
