#!/usr/bin/env python
"""Measure the opt-in fast-eval mode vs the parity renderer at 512².

Frames a realistic head bbox (the reference person datasets' head occupies
roughly 40-50% of the 512² frame) and times full-frame renders both ways
on the flagship model. Slope timing with host-read sync (block_until_ready
does not wait on the axon tunnel).

Run on the real TPU: python tools/perf/fast_eval_bench.py [--frames 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--bbox", type=int, nargs=4,
                    default=[100, 420, 130, 390],
                    metavar=("H0", "H1", "W0", "W1"))
    args = ap.parse_args()

    from nerface_tpu.eval.renderer import render_full_frame
    from nerface_tpu.models import MODELS
    from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings

    H = W = args.size
    bbox = np.asarray(args.bbox, np.int32)
    area = ((bbox[1] - bbox[0] + 1) * (bbox[3] - bbox[2] + 1)) / (H * W)

    model = MODELS["ConditionalBlendshapePaperNeRFModel"](
        num_encoding_fn_xyz=10, num_encoding_fn_dir=4
    )
    kc, kf = jax.random.split(jax.random.PRNGKey(0))
    params_c, params_f = model.init(kc), model.init(kf)
    rng = np.random.RandomState(0)
    intr = np.array([2500.0, 2500.0, 0.5, 0.5], np.float32)
    pose = np.eye(4, dtype=np.float32)[:3, :4]
    expr = jnp.asarray(rng.randn(76).astype(np.float32) * 0.1)
    latent = jnp.zeros((32,), jnp.float32)
    bg = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))

    def settings(fast):
        return RenderSettings(
            num_coarse=64, num_fine=64, perturb=False,
            radiance_field_noise_std=0.0, near=0.2, far=0.8,
            encode_xyz=EncodeSpec(10, True, True),
            encode_dir=EncodeSpec(4, False, True),
            chunksize=65536, fused="on",
            fast_eval=fast, fast_eval_capacity=float(area) * 1.05,
        )

    # Occupancy mode: the mask content is irrelevant to throughput — only
    # the capacity (rendered rays) and the probe-gather cost are — so use
    # an ellipsoid "head" filling ~60% of the bbox frustum, the typical
    # face-to-bbox ratio, instead of training a field first.
    from nerface_tpu.eval.occupancy import OccupancyGrid, ray_aabb

    lo, hi = ray_aabb(
        np.eye(4, dtype=np.float32)[None], intr, H, W, 0.2, 0.8
    )
    res = 64
    c = (np.arange(res) + 0.5) / res
    gx, gy, gz = np.meshgrid(c, c, c, indexing="ij")
    # ellipsoid centered on the bbox frustum's center, axes ~55% of the
    # box half-extents (face-within-bbox proportions)
    cy = (bbox[0] + bbox[1]) / 2 / H
    cx = (bbox[2] + bbox[3]) / 2 / W
    ry = (bbox[1] - bbox[0]) / H * 0.55 / 2
    rx = (bbox[3] - bbox[2]) / W * 0.55 / 2
    ell = (
        ((gx - cx) / max(rx, 1e-3)) ** 2
        + ((gy - cy) / max(ry, 1e-3)) ** 2
        + ((gz - 0.5) / 0.45) ** 2
    ) < 1.0
    occ = OccupancyGrid(
        jnp.asarray(ell), jnp.asarray(lo), jnp.asarray(hi)
    )
    # capacity must reflect the rendered mask = bbox AND occupancy
    from nerface_tpu.eval.occupancy import ray_occupancy_mask
    from nerface_tpu.ops.rays import get_ray_bundle

    ro, rd = get_ray_bundle(
        H, W, jnp.asarray(intr), jnp.asarray(pose)
    )
    occ_m = np.asarray(ray_occupancy_mask(
        occ, ro.reshape(-1, 3), rd.reshape(-1, 3), 0.2, 0.8, 128
    )).reshape(H, W)
    ii, jj = np.mgrid[0:H, 0:W]
    bb_m = (
        (ii >= bbox[0]) & (ii <= bbox[1])
        & (jj >= bbox[2]) & (jj <= bbox[3])
    )
    occ_frac = float((occ_m & bb_m).mean())

    def run(mode, n_frames):
        s = settings(mode != "parity")
        if mode == "occupancy":
            import dataclasses as _dc

            s = _dc.replace(
                s, fast_eval_capacity=min(1.0, occ_frac * 1.1)
            )
        out = None
        for i in range(n_frames):
            out = render_full_frame(
                model, model, params_c, params_f, H, W, intr, pose, s,
                key=jax.random.PRNGKey(i), expressions=expr,
                latent_code=latent, background=bg, dtype=jnp.bfloat16,
                bbox=bbox if mode != "parity" else None,
                occupancy=occ if mode == "occupancy" else None,
            )
        return float(jnp.mean(out["rgb_fine"]))  # host-read sync

    for mode in ("parity", "fast-eval", "occupancy"):
        cap = {
            "parity": None, "fast-eval": float(area) * 1.05,
            "occupancy": min(1.0, occ_frac * 1.1),
        }[mode]
        run(mode, 1)  # compile + warm
        t0 = time.perf_counter()
        run(mode, args.frames)
        dt = (time.perf_counter() - t0) / args.frames
        extra = f" (active capacity {cap:.2f})" if cap else ""
        print(f"{mode:9s}: {dt * 1e3:8.1f} ms/frame  "
              f"{1.0 / dt:5.2f} fps{extra}")


if __name__ == "__main__":
    main()
