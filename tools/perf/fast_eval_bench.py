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

    def run(fast, n_frames):
        s = settings(fast)
        out = None
        for i in range(n_frames):
            out = render_full_frame(
                model, model, params_c, params_f, H, W, intr, pose, s,
                key=jax.random.PRNGKey(i), expressions=expr,
                latent_code=latent, background=bg, dtype=jnp.bfloat16,
                bbox=bbox if fast else None,
            )
        return float(jnp.mean(out["rgb_fine"]))  # host-read sync

    for fast in (False, True):
        label = "fast-eval" if fast else "parity  "
        run(fast, 1)  # compile + warm
        t0 = time.perf_counter()
        run(fast, args.frames)
        dt = (time.perf_counter() - t0) / args.frames
        extra = f" (active capacity {float(area) * 1.05:.2f})" if fast else ""
        print(f"{label}: {dt * 1e3:8.1f} ms/frame  "
              f"{1.0 / dt:5.2f} fps{extra}")


if __name__ == "__main__":
    main()
