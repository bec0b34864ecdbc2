"""Perf probe — full-frame eval time vs lax.map tile size at 512².
Run from the repo root; numbers recorded in BENCH_NOTES.md."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from nerface_tpu.models import MODELS
from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings
from nerface_tpu.eval.renderer import render_full_frame

H = W = 512


def main():
    model = MODELS["ConditionalBlendshapePaperNeRFModel"](
        num_encoding_fn_xyz=10, num_encoding_fn_dir=4
    )
    params = model.init(jax.random.PRNGKey(0))
    settings = RenderSettings(
        num_coarse=64, num_fine=64, perturb=False,
        radiance_field_noise_std=0.0, near=0.2, far=0.8,
        encode_xyz=EncodeSpec(10, True, True),
        encode_dir=EncodeSpec(4, False, True),
        fused="on", chunksize=65536,
    )
    intrinsics = np.array([1370.0, 1370.0, 0.5, 0.5], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 0.4
    expr = jnp.asarray(np.random.RandomState(0).randn(76).astype(np.float32) * 0.1)
    bg = jnp.asarray(np.random.RandomState(1).rand(H, W, 3).astype(np.float32))

    for tile in (16384, 65536, 262144):
        def frame():
            out = render_full_frame(
                model, model, params, params, H, W, intrinsics, pose,
                settings, expressions=expr, latent_code=jnp.zeros((32,)),
                background=bg, tile=tile, dtype=jnp.bfloat16,
            )
            return out["rgb_fine"]

        try:
            img = frame()
            _ = float(jnp.sum(img))  # host sync (axon ignores block_until_ready)
            t0 = time.perf_counter()
            k1 = 3
            for _ in range(k1):
                _ = float(jnp.sum(frame()))
            t1 = time.perf_counter()
            k2 = 10
            for _ in range(k2):
                _ = float(jnp.sum(frame()))
            t2 = time.perf_counter()
            dt = ((t2 - t1) - (t1 - t0) * (k2 / k1)) / (k2 - k1 * (k2 / k1)) \
                if False else ((t2 - t1) / k2)
            print(f"tile={tile:7d}: {dt*1e3:8.1f} ms/frame "
                  f"({H*W/dt/1e6:.2f} Mray/s)")
        except Exception as e:
            print(f"tile={tile:7d}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
