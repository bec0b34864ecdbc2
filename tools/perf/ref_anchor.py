#!/usr/bin/env python
"""Measured in-env anchor for the baseline denominator (bench.py).

Runs the UNMODIFIED reference training script
(`/root/reference/nerface_code/nerf-pytorch/train_transformed_rays.py`,
via the same runpy + stub harness as tools/parity_rehearsal.py) on CPU
torch at the production workload shape — 2048 rays/step, 64 coarse + 64
fine samples, 512x512 frames, the paper config's own values
(`config/dave/dave_dvp_lcode_fixed_bg_512_paper_model.yml:134,160-162`)
— and reports rays/s from the steady-state slope of its own per-iter
[TRAIN] prints (print_every=1).

The reference logs no throughput anywhere (SURVEY.md §6;
`train_transformed_rays.py:243` is a bare trange), so BASELINE.md's
10k rays/s PyTorch-1-GPU figure is an estimate by necessity. This tool
adds the one anchor that IS measurable in this environment: the same
unmodified script, same workload, CPU torch. bench.py reports
vs_baseline against the GPU estimate and vs_measured_cpu_ref against
this number.

Timing protocol: timestamps are taken as each "[TRAIN] Iter: N" line is
written (a Tee subclass), so dataset load / importance-map precompute /
the i==0 validation render are all excluded; the rate is the median of
the per-iter gaps over iters >= 2.

Usage: python tools/perf/ref_anchor.py [--iters 30] [--res 512]
Writes <workdir>/result.json and prints one summary line.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
for p in (REPO_ROOT, os.path.join(REPO_ROOT, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

import parity_rehearsal as pr  # noqa: E402  (tools/parity_rehearsal.py)


def run_reference_timed(cfg_path: str) -> dict:
    """Like parity_rehearsal.run_reference, but records a wall-clock
    timestamp per [TRAIN] print instead of parsing losses, and starts
    from the script's own fresh init (no checkpoint: Adam state warmup
    is part of the measured loop either way)."""
    import runpy

    import torch

    pr._stub_modules()
    os.environ.setdefault("MPLBACKEND", "Agg")
    real_cuda = torch.cuda.is_available
    torch.cuda.is_available = lambda: False
    # relu -> clamp: reproduces torch-1.5 autograd semantics for the
    # script's in-place `sigma_a[:, -1] += 1e-6` (same substitution as
    # parity_rehearsal.run_reference; clamp has identical flop cost)
    real_relu = torch.nn.functional.relu
    torch.nn.functional.relu = lambda x, inplace=False: torch.clamp(x, min=0)

    stamps: dict[int, float] = {}
    pat = re.compile(r"\[TRAIN\] Iter: (\d+) ")

    class Tee(io.TextIOBase):
        def write(self, s):
            m = pat.search(s)
            if m:
                stamps[int(m.group(1))] = time.perf_counter()
            return len(s)

    argv, cwd = sys.argv, os.getcwd()
    sys.argv = ["train_transformed_rays.py", "--config", cfg_path]
    sys.path.insert(0, pr.REF_DIR)
    try:
        os.chdir(pr.REF_DIR)
        with contextlib.redirect_stdout(Tee()):
            runpy.run_path(
                os.path.join(pr.REF_DIR, "train_transformed_rays.py"),
                run_name="__main__",
            )
    finally:
        os.chdir(cwd)
        sys.argv = argv
        sys.path.remove(pr.REF_DIR)
        torch.cuda.is_available = real_cuda
        torch.nn.functional.relu = real_relu
    return stamps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--res", type=int, default=512,
                    help="frame resolution (importance sampling maps "
                         "scale with it; 512 is the paper config)")
    ap.add_argument("--rays", type=int, default=2048)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--workdir", type=str, default="/tmp/ref_anchor")
    args = ap.parse_args()

    import numpy as np

    # keep everything (incl. any jax import inside the data helpers) off
    # the tunneled TPU: this is a pure CPU-torch measurement
    import jax

    jax.config.update("jax_platforms", "cpu")

    from nerface_tpu.data.synthetic import make_synthetic_flame_dataset

    os.makedirs(args.workdir, exist_ok=True)
    ds_dir = os.path.join(args.workdir, f"ds{args.res}")
    if not os.path.exists(os.path.join(ds_dir, "transforms_train.json")):
        print(f"[anchor] building {args.res}^2 synthetic dataset ...")
        make_synthetic_flame_dataset(ds_dir, H=args.res, W=args.res,
                                     n_train=8, n_val=1, n_test=1)

    cfg_path = os.path.join(args.workdir, "cfg.yml")
    pr._write_config(cfg_path, ds_dir, os.path.join(args.workdir, "logs"),
                     args.iters, args.rays, args.samples)

    print(f"[anchor] running the unmodified reference script "
          f"({args.iters} iters, {args.rays} rays x "
          f"{args.samples}+{args.samples} samples, CPU torch) ...")
    t0 = time.perf_counter()
    stamps = run_reference_timed(cfg_path)
    total = time.perf_counter() - t0
    if len(stamps) < 4:
        sys.exit(f"[anchor] only {len(stamps)} [TRAIN] prints captured")

    its = sorted(stamps)
    # steady state: skip iter 0->1 (contains the i==0 validation render)
    # and iter 1->2 (first post-val step; allocator warm-up)
    gaps = [stamps[b] - stamps[a]
            for a, b in zip(its[2:-1], its[3:])]
    med = float(np.median(gaps))
    rays_per_sec = args.rays / med
    result = {
        "metric": "ref_cpu_train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "median_s_per_iter": round(med, 3),
        "iters_timed": len(gaps),
        "total_wall_s": round(total, 1),
        "workload": f"{args.rays} rays x {args.samples}+{args.samples} "
                    f"samples, {args.res}^2 frames",
        "script": "reference train_transformed_rays.py, unmodified, "
                  "CPU torch",
    }
    out = os.path.join(args.workdir, "result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    print(f"[anchor] wrote {out}")


if __name__ == "__main__":
    main()
