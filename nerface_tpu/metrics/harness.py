"""Folder-vs-folder metrics harness — equivalent of
`nerf/metrics.py:20-148`: per-image L1/PSNR/SSIM/LPIPS with running means
(`ScalarMetric` :20-42), an L2 heatmap image per pair (:45-55), and a
`metrics.txt` written into the generated-images folder (:86-140).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from nerface_tpu.metrics.image import l1, psnr, ssim


class ScalarMetric:
    """Running mean (`metrics.py:20-42`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.num_observations = 0.0
        self.aggregated_value = 0.0

    def update(self, x: float) -> None:
        self.aggregated_value += x
        self.num_observations += 1

    def peek(self) -> float:
        return self.aggregated_value / (
            self.num_observations if self.num_observations > 0 else 1
        )

    def __repr__(self):
        return str(self.peek())


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.array(Image.open(path)) / 255.0


def _numeric_sort(names):
    return sorted(names, key=lambda f: int("".join(filter(str.isdigit, f)) or 0))


def _save_l2_image(im1: np.ndarray, im2: np.ndarray, outname: str) -> None:
    from nerface_tpu.eval.driver import error_image
    from PIL import Image

    Image.fromarray(error_image(im1, im2)).save(outname)


def two_folders(
    path_gt: str,
    path_generated: str,
    lpips_weights: Optional[str] = None,
    data_range: float = 1.0,
    save_l2_images: bool = True,
    log: bool = True,
) -> Dict[str, float]:
    """Compare GT vs generated folders; writes `metrics.txt` +
    `L2/%04d.png` into `path_generated`; returns the summary means."""
    lpips_fn = None
    if lpips_weights:
        from nerface_tpu.metrics.lpips import LPIPSAlex

        lpips_fn = LPIPSAlex(lpips_weights)

    metrics = {k: ScalarMetric() for k in ("L1", "PSNR", "SSIM", "LPIPS")}

    names_gt = _numeric_sort(
        [f for f in os.listdir(path_gt)
         if os.path.isfile(os.path.join(path_gt, f)) and f.endswith(".png")]
    )
    names_gen = _numeric_sort(
        [f for f in os.listdir(path_generated)
         if os.path.isfile(os.path.join(path_generated, f)) and f.endswith(".png")]
    )
    assert len(names_gen) <= len(names_gt), (len(names_gen), len(names_gt))

    if save_l2_images:
        os.makedirs(os.path.join(path_generated, "L2"), exist_ok=True)

    fout = os.path.join(path_generated, "metrics.txt")
    with open(fout, "w") as fo:
        for i, (name_gt, name_gen) in enumerate(zip(names_gt, names_gen)):
            im_real = _load_image(os.path.join(path_gt, name_gt))[..., :3]
            im_gen = _load_image(os.path.join(path_generated, name_gen))[..., :3]
            assert im_real.shape == im_gen.shape, (im_real.shape, im_gen.shape)

            if save_l2_images:
                _save_l2_image(
                    im_real, im_gen, os.path.join(path_generated, "L2", "%04d.png" % i)
                )
            vals = {
                "L1": l1(im_real, im_gen),
                "PSNR": psnr(im_real, im_gen, data_range=data_range),
                "SSIM": ssim(im_real, im_gen, data_range=data_range),
                "LPIPS": lpips_fn(im_real, im_gen) if lpips_fn else float("nan"),
            }
            for k, v in vals.items():
                if not np.isnan(v):
                    metrics[k].update(v)
                fo.write(name_gen + "   %s:  \t%5f \n" % (k, v))
            fo.write("\n")

        fo.write("=" * 80)
        fo.write(
            "\n Summary \n folder 1: %s \n folder 2: %s \n"
            % (path_gt, path_generated)
        )
        fo.write("-" * 80)
        for k in ("L1", "PSNR", "SSIM", "LPIPS"):
            fo.write("\n mean %s:\t%5f" % (k, metrics[k].peek()))
        fo.write("\n")

    summary = {k: m.peek() for k, m in metrics.items()}
    if lpips_fn is None:
        summary["LPIPS"] = float("nan")
    if log:
        print("=" * 80)
        print(" Summary\n folder 1: %s\n folder 2: %s" % (path_gt, path_generated))
        for k, v in summary.items():
            print(" mean %s:\t%5f" % (k, v))
    return summary
