#!/usr/bin/env python
"""Does in-kernel matmul precision (PE / transmittance-cumprod) change
what the bf16 fused train path actually learns?

Trains the flagship paper model on an identical synthetic dataset with an
identical feed/RNG under each precision mode (subprocess per mode — the
knobs are read at import, see ops/pallas/fused_mlp.py), then scores every
checkpoint on neutral ground: the f32 XLA parity renderer over the test
split. Any PSNR spread beyond run-to-run noise is precision-attributable,
because everything else (batches, init, step RNG) is bit-identical.

Companion to the throughput measurement (BENCH_NOTES.md "In-kernel
precision"): HIGHEST costs −5.5% train step; this probe shows what that
buys in output quality.

Run on the real TPU:  python tools/perf/pe_precision_probe.py [--iters N]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

MODES = [
    ("DEFAULT", "DEFAULT"),   # production: single-pass bf16-operand MXU
    ("SPLIT", "DEFAULT"),     # two-pass hi/lo split PE (f32-grade args)
    ("HIGHEST", "HIGHEST"),   # 6-pass exact f32 everywhere
]


def write_config(ds_dir: str, logdir: str, iters: int) -> str:
    """Reference paper config scaled to the probe workload, but keeping
    the PRODUCTION train shape (2048 rays, 64+64 samples)."""
    import yaml

    ref_cfg = os.path.join(
        "/root/reference/nerface_code/nerf-pytorch",
        "config/dave/dave_dvp_lcode_fixed_bg_512_paper_model.yml",
    )
    with open(ref_cfg) as f:
        cfg = yaml.safe_load(f)
    cfg["dataset"]["basedir"] = ds_dir
    cfg["dataset"]["half_res"] = False
    cfg["experiment"].update(
        logdir=logdir, id="probe", train_iters=iters,
        print_every=max(iters // 5, 1), validate_every=iters + 1,
        save_every=iters,
    )
    cfg["nerf"]["validation"].update(chunksize=16384)
    path = os.path.join(os.path.dirname(logdir), "probe_cfg.yml")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.dump(cfg, f)
    return path


def child(cfg_path: str, renders_dir: str, ds_dir: str) -> None:
    """Train (bf16 fused, knobs from env) + score on the f32 XLA path."""
    import jax.numpy as jnp

    from nerface_tpu.config import load_config
    from nerface_tpu.eval.driver import EvalFlags, evaluate
    from nerface_tpu.metrics.harness import two_folders
    from nerface_tpu.train.checkpoint import latest_checkpoint
    from nerface_tpu.train.loop import train

    jcfg = load_config(cfg_path)
    t0 = time.perf_counter()
    train(jcfg, dtype=jnp.bfloat16)
    train_s = time.perf_counter() - t0
    ckpt = latest_checkpoint(
        os.path.join(jcfg.experiment.logdir, jcfg.experiment.id)
    )
    # Neutral ground: f32 XLA renderer (dtype=None -> fused kernels off).
    evaluate(jcfg, ckpt, renders_dir, eval_flags=EvalFlags(), log=False,
             dtype=None)
    m = two_folders(os.path.join(ds_dir, "test"), renders_dir, log=False)
    print("CHILD_RESULT " + json.dumps({
        "pe": os.environ.get("NERFACE_PE_PRECISION", "DEFAULT"),
        "cumprod": os.environ.get("NERFACE_CUMPROD_PRECISION", "DEFAULT"),
        "psnr": float(m["PSNR"]), "ssim": float(m["SSIM"]),
        "l1": float(m["L1"]), "train_s": round(train_s, 1),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--workdir", type=str, default="/tmp/pe_precision_probe")
    ap.add_argument("--size", type=int, default=64,
                    help="dataset H=W; 256+ puts top-band PE arguments "
                         "(2^9 x, ~0.35 rad at bf16's 2^-8 grid) in the "
                         "regime where rounding could cost detail")
    ap.add_argument("--compact", action="store_true",
                    help="hard-truncated blob (sharp silhouette edge = "
                         "high-frequency content the top PE bands carry)")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--cfg", type=str, default="", help=argparse.SUPPRESS)
    ap.add_argument("--renders", type=str, default="", help=argparse.SUPPRESS)
    ap.add_argument("--ds", type=str, default="", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        child(args.cfg, args.renders, args.ds)
        return

    from nerface_tpu.data.synthetic import make_synthetic_flame_dataset

    w = args.workdir
    ds_dir = os.path.join(w, "ds")
    if not os.path.exists(os.path.join(ds_dir, "transforms_train.json")):
        make_synthetic_flame_dataset(
            ds_dir, n_train=16, n_val=2, n_test=4, H=args.size,
            W=args.size, seed=0, compact=args.compact,
        )

    results = []
    for pe, cum in MODES:
        tag = f"pe_{pe.lower()}_cum_{cum.lower()}"
        logdir = os.path.join(w, tag, "logs")
        cfg_path = write_config(ds_dir, logdir, args.iters)
        env = dict(os.environ, NERFACE_PE_PRECISION=pe,
                   NERFACE_CUMPROD_PRECISION=cum)
        print(f"[probe] {tag}: training {args.iters} iters ...", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--cfg", cfg_path,
             "--renders", os.path.join(w, tag, "renders"),
             "--ds", ds_dir],
            env=env, capture_output=True, text=True,
        )
        line = [l for l in r.stdout.splitlines()
                if l.startswith("CHILD_RESULT ")]
        if r.returncode != 0 or not line:
            print(r.stdout[-2000:], file=sys.stderr)
            print(r.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"{tag} failed (rc={r.returncode})")
        results.append(json.loads(line[0][len("CHILD_RESULT "):]))
        print(f"[probe]   {results[-1]}", flush=True)

    print("\nmode (PE/cumprod)       test PSNR   SSIM     L1       train s")
    for r in results:
        print(f"{r['pe']:>8}/{r['cumprod']:<8}    {r['psnr']:8.3f}  "
              f"{r['ssim']:.4f}  {r['l1']:.5f}  {r['train_s']:8.1f}")


if __name__ == "__main__":
    main()
