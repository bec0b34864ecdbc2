"""LPIPS (AlexNet backbone) — self-contained torch implementation.

The reference uses the `lpips` pip package with pretrained AlexNet
(`nerf/metrics.py:15,64-76,172`). This image has no torchvision/lpips and
no network egress, so pretrained weights cannot be fetched; this module
implements the same network (AlexNet features + per-layer 1x1 linear heads,
unit-normalized activations, input scaling layer) and loads weights from a
user-provided path: either an original `lpips` package state_dict
(`--lpips-weights alex.pth` + torchvision alexnet state_dict) or a single
combined file exported by `export_combined()`.

Without weights, `lpips_available()` is False and the metrics harness
reports LPIPS as nan — the other metrics are unaffected.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_ALEX_CHANNELS = [64, 192, 384, 256, 256]


def lpips_available(weights_path: Optional[str] = None) -> bool:
    return bool(weights_path) and os.path.exists(weights_path)


def export_combined(
    alexnet_weights: str, lpips_weights: str, out_path: str
) -> None:
    """Merge a torchvision AlexNet state_dict (`features.N.{weight,bias}`,
    from `torchvision.models.alexnet(weights=...).state_dict()`) and an
    lpips-package checkpoint (`lin{i}.model.1.weight` heads, e.g.
    `lpips/weights/v0.1/alex.pth`) into ONE file loadable by `LPIPSAlex`.

    Run this on a machine with network access / the packages installed,
    then ship the combined file here and pass it as `--lpips-weights`.
    """
    import torch

    alex_sd = torch.load(alexnet_weights, map_location="cpu", weights_only=True)
    lin_sd = torch.load(lpips_weights, map_location="cpu", weights_only=True)
    combined = {}
    for k, v in alex_sd.items():
        if k.startswith("features."):
            combined[f"net.{k}"] = v
    for i in range(5):
        w = lin_sd.get(f"lin{i}.model.1.weight", lin_sd.get(f"lins.{i}.weight"))
        if w is None:
            raise ValueError(f"missing linear head {i} in {lpips_weights}")
        combined[f"lin{i}.model.1.weight"] = w
    torch.save(combined, out_path)


class LPIPSAlex:
    """LPIPS-alex scorer. `weights` is a combined state_dict file holding
    both the AlexNet feature extractor ('net.*') and the linear heads
    ('lin*.model.1.weight'), the layout the lpips package checkpoints use.
    """

    # ImageNet-style input scaling used by LPIPS (its ScalingLayer).
    _SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
    _SCALE = np.array([0.458, 0.448, 0.450], np.float32)

    def __init__(self, weights_path: str):
        import torch
        import torch.nn as nn

        self._torch = torch

        class _AlexFeatures(nn.Module):
            def __init__(self):
                super().__init__()
                self.features = nn.Sequential(
                    nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(inplace=True),
                    nn.MaxPool2d(3, 2),
                    nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(inplace=True),
                    nn.MaxPool2d(3, 2),
                    nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(inplace=True),
                    nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(inplace=True),
                    nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(inplace=True),
                )
                # ReLU outputs tapped after indices 1, 4, 7, 9, 11.
                self.taps = (1, 4, 7, 9, 11)

            def forward(self, x):
                outs = []
                for i, layer in enumerate(self.features):
                    x = layer(x)
                    if i in self.taps:
                        outs.append(x)
                return outs

        self.net = _AlexFeatures().eval()
        self.lins = [
            nn.Conv2d(c, 1, 1, bias=False).eval() for c in _ALEX_CHANNELS
        ]

        sd = torch.load(weights_path, map_location="cpu", weights_only=True)
        net_sd = {
            k[len("net."):]: v for k, v in sd.items() if k.startswith("net.")
        }
        if net_sd:
            # lpips-package layout: net.slice?.* indexed by global layer id.
            remap = {}
            for k, v in net_sd.items():
                parts = k.split(".")
                remap[f"features.{parts[-2]}.{parts[-1]}"] = v
            self.net.load_state_dict(remap)
        for i in range(5):
            w = sd.get(f"lin{i}.model.1.weight", sd.get(f"lins.{i}.weight"))
            if w is None:
                raise ValueError(f"missing linear head {i} in {weights_path}")
            self.lins[i].weight.data = w

    @staticmethod
    def _normalize(x, eps=1e-10):
        norm = (x**2).sum(dim=1, keepdim=True).sqrt()
        return x / (norm + eps)

    def __call__(self, im1: np.ndarray, im2: np.ndarray) -> float:
        """im1/im2: (H, W, 3) float in [0, 1]. Returns the LPIPS distance.

        Matches `lpips_single_image_pair` (`metrics.py:64-76`), which feeds
        [0,1] tensors directly (the lpips package expects [-1,1]; the
        reference does not rescale — reproduced as-is).
        """
        torch = self._torch

        def prep(im):
            t = torch.from_numpy(np.asarray(im, np.float32)).permute(2, 0, 1)[None]
            shift = torch.from_numpy(self._SHIFT).view(1, 3, 1, 1)
            scale = torch.from_numpy(self._SCALE).view(1, 3, 1, 1)
            return (t - shift) / scale

        with torch.no_grad():
            f1 = self.net(prep(im1))
            f2 = self.net(prep(im2))
            total = 0.0
            for a, b, lin in zip(f1, f2, self.lins):
                d = (self._normalize(a) - self._normalize(b)) ** 2
                total = total + lin(d).mean(dim=(2, 3))
        return float(total.item())
