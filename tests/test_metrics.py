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


def _numpy_conv2d(x, w, b, stride=1, pad=0):
    """Direct conv2d oracle: x (C,H,W), w (O,C,kh,kw), b (O,)."""
    c, h, wd = x.shape
    o, _, kh, kw = w.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad)))
    ho = (h + 2 * pad - kh) // stride + 1
    wo = (wd + 2 * pad - kw) // stride + 1
    out = np.empty((o, ho, wo), np.float64)
    for i in range(ho):
        for j in range(wo):
            patch = xp[:, i * stride:i * stride + kh, j * stride:j * stride + kw]
            out[:, i, j] = np.tensordot(w, patch, axes=([1, 2, 3], [0, 1, 2])) + b
    return out


def _numpy_maxpool(x, k=3, s=2):
    c, h, w = x.shape
    ho, wo = (h - k) // s + 1, (w - k) // s + 1
    out = np.empty((c, ho, wo), x.dtype)
    for i in range(ho):
        for j in range(wo):
            out[:, i, j] = x[:, i * s:i * s + k, j * s:j * s + k].max(axis=(1, 2))
    return out


def _numpy_lpips(im1, im2, convs, lins, shift, scale):
    """Published LPIPS formula, implemented from scratch in numpy:
    scaling layer -> AlexNet features (5 ReLU taps) -> channel-unit-normalize
    -> squared diff -> 1x1 linear head -> spatial mean -> sum over layers."""

    def features(im):
        x = (np.asarray(im, np.float64).transpose(2, 0, 1) - shift.reshape(3, 1, 1)) / scale.reshape(3, 1, 1)
        taps = []
        # conv1(11,4,2) relu pool | conv2(5,1,2) relu pool | conv3(3,1,1)
        # relu | conv4 relu | conv5 relu  — taps after each relu
        x = np.maximum(_numpy_conv2d(x, *convs[0], stride=4, pad=2), 0)
        taps.append(x)
        x = _numpy_maxpool(x)
        x = np.maximum(_numpy_conv2d(x, *convs[1], stride=1, pad=2), 0)
        taps.append(x)
        x = _numpy_maxpool(x)
        for ci in (2, 3, 4):
            x = np.maximum(_numpy_conv2d(x, *convs[ci], stride=1, pad=1), 0)
            taps.append(x)
        return taps

    def unit_norm(x):
        return x / (np.sqrt((x**2).sum(axis=0, keepdims=True)) + 1e-10)

    f1, f2 = features(im1), features(im2)
    total = 0.0
    for a, b, w in zip(f1, f2, lins):
        d = (unit_norm(a) - unit_norm(b)) ** 2
        total += (w.reshape(-1, 1, 1) * d).sum(axis=0).mean()
    return total


class TestLPIPS:
    def test_golden_vs_numpy_formula(self, rng, tmp_path):
        """The LPIPSAlex port reproduces the published LPIPS formula on
        RANDOM weights (pretrained weights need egress; the structure —
        scaling layer, tap points, unit-normalization, 1x1 heads, spatial
        mean, layer sum — is what this pins). Oracle is an independent
        from-scratch numpy implementation."""
        import torch

        from nerface_tpu.metrics.lpips import LPIPSAlex, lpips_available

        specs = [  # (out, in, k) per conv
            (64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3), (256, 256, 3),
        ]
        conv_ids = (0, 3, 6, 8, 10)
        sd = {}
        convs, lins = [], []
        for (o, c, k), idx in zip(specs, conv_ids):
            w = rng.randn(o, c, k, k).astype(np.float32) * 0.1
            b = rng.randn(o).astype(np.float32) * 0.1
            sd[f"net.features.{idx}.weight"] = torch.from_numpy(w)
            sd[f"net.features.{idx}.bias"] = torch.from_numpy(b)
            convs.append((w.astype(np.float64), b.astype(np.float64)))
        for i, (o, _, _) in enumerate(specs):
            lw = np.abs(rng.randn(1, o, 1, 1).astype(np.float32)) * 0.1
            sd[f"lin{i}.model.1.weight"] = torch.from_numpy(lw)
            lins.append(lw.reshape(o).astype(np.float64))
        path = str(tmp_path / "combined.pth")
        torch.save(sd, path)
        assert lpips_available(path)

        scorer = LPIPSAlex(path)
        im1 = rng.rand(64, 64, 3).astype(np.float32)
        im2 = np.clip(im1 + rng.randn(64, 64, 3).astype(np.float32) * 0.1, 0, 1)

        got = scorer(im1, im2)
        want = _numpy_lpips(
            im1, im2, convs, lins,
            LPIPSAlex._SHIFT.astype(np.float64), LPIPSAlex._SCALE.astype(np.float64),
        )
        assert got == pytest.approx(want, rel=1e-4)
        # identity -> exactly zero distance
        assert scorer(im1, im1) == pytest.approx(0.0, abs=1e-10)

    def test_export_combined_roundtrip(self, rng, tmp_path):
        """export_combined merges a torchvision-style AlexNet state_dict and
        an lpips-package heads file into the combined layout LPIPSAlex
        loads."""
        import torch

        from nerface_tpu.metrics.lpips import LPIPSAlex, export_combined

        specs = [
            (64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3), (256, 256, 3),
        ]
        conv_ids = (0, 3, 6, 8, 10)
        alex_sd = {}
        for (o, c, k), idx in zip(specs, conv_ids):
            alex_sd[f"features.{idx}.weight"] = torch.from_numpy(
                rng.randn(o, c, k, k).astype(np.float32) * 0.1)
            alex_sd[f"features.{idx}.bias"] = torch.from_numpy(
                rng.randn(o).astype(np.float32) * 0.1)
        # torchvision alexnet also carries classifier weights — must be dropped
        alex_sd["classifier.1.weight"] = torch.zeros(4096, 9216)
        lin_sd = {
            f"lin{i}.model.1.weight": torch.from_numpy(
                np.abs(rng.randn(1, o, 1, 1).astype(np.float32)))
            for i, (o, _, _) in enumerate(specs)
        }
        ap, lp, cp = (str(tmp_path / n) for n in ("alex.pth", "lin.pth", "comb.pth"))
        torch.save(alex_sd, ap)
        torch.save(lin_sd, lp)
        export_combined(ap, lp, cp)

        scorer = LPIPSAlex(cp)
        im = rng.rand(32, 32, 3).astype(np.float32)
        d = scorer(im, np.clip(im + 0.05, 0, 1))
        assert np.isfinite(d) and d > 0


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
