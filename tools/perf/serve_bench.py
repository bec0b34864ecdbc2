#!/usr/bin/env python
"""Measure avatar-serving request latency on the real chip.

Times `AvatarServer.handle()` end-to-end — render + host sync + PNG
encode + JSON build — for the parity renderer and the fast-eval path,
against a real trained checkpoint. This is the number a deployment sees:
per-request wall time at a warm jit cache, protocol overhead included.

Run on the real TPU (needs a 512² dataset + checkpoint, e.g. the paper
schedule run's):

    python tools/perf/serve_bench.py \
        --config /tmp/paper1m/cfg.yml \
        --checkpoint /tmp/paper1m/logs/paper1m/checkpoint1000001
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def bench(server, label, n, encode):
    request = {"frame": 0, "maps": ["rgb_fine"]}
    if encode:
        request["encode"] = "png_base64"
    r = server.handle(dict(request))  # warmup/compile
    assert r["ok"], r
    times = []
    for i in range(n):
        request["seed"] = i  # same executable, fresh RNG stream
        t0 = time.time()
        r = server.handle(dict(request))
        times.append(time.time() - t0)
        assert r["ok"], r
    ms = np.median(times) * 1000.0
    print(
        f"{label:34s} median {ms:8.1f} ms/request  "
        f"({1000.0 / ms:.2f} fps)  [n={n}, "
        f"min {min(times) * 1e3:.1f}, max {max(times) * 1e3:.1f}]"
    )
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--requests", type=int, default=20)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--f32", dest="bf16", action="store_false")
    args = ap.parse_args()

    import jax.numpy as jnp

    from nerface_tpu.config import load_config
    from nerface_tpu.serve import AvatarServer

    dtype = jnp.bfloat16 if args.bf16 else None
    cfg = load_config(args.config)

    parity = AvatarServer(cfg, checkpoint=args.checkpoint, dtype=dtype, log=False)
    print(f"serving {parity.H}x{parity.W}, dtype "
          f"{'bf16' if args.bf16 else 'f32'}")
    p = bench(parity, "parity renderer", args.requests, encode=False)
    bench(parity, "parity + png_base64", args.requests, encode=True)
    del parity

    cfg.nerf.validation["fast_eval"] = True
    fast = AvatarServer(cfg, checkpoint=args.checkpoint, dtype=dtype, log=False)
    print(f"fast-eval bbox {fast.fast_bbox.tolist()}, "
          f"capacity {fast.settings.fast_eval_capacity:.2f}")
    f = bench(fast, "fast-eval renderer", args.requests, encode=False)
    bench(fast, "fast-eval + png_base64", args.requests, encode=True)
    print(f"fast-eval speedup over parity: {p / f:.2f}x")


if __name__ == "__main__":
    main()
