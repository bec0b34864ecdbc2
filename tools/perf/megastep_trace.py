"""Perf probe — XProf/perfetto trace of the PRODUCTION megastep.

bench.py has read ~205k rays/s for two rounds while the 3x-forward
speed-of-light ledger (BENCH_NOTES.md round 2) says 5.9 ms vs ~9.9 ms
measured. The round-3 XProf split (train step 95.4% Pallas-kernel device
time, 0.45 ms XLA glue) predates the K=50 execution window that bench.py
and the production loop now run. This probe traces the exact program
bench.py times — `make_train_megastep` at the paper workload (2048 rays,
64+64 samples, flagship model, bf16 fused kernels) — and attributes
device time per step:

  - top per-op-name device totals,
  - bucket split: fused Pallas train kernels / resample+sort glue /
    Adam+LR+bookkeeping / other XLA,
  - device busy vs wall (dispatch gaps at window granularity).

The capture uses jax.profiler's perfetto output
(`perfetto_trace.json.gz`), which this image can parse without the
xplane protobuf toolchain. Device tracks are auto-detected (process
names carrying "TPU"/"device"); run with --dump-tracks to see them.

Usage: python tools/perf/megastep_trace.py [--windows 2]
       [--logdir /tmp/megatrace] [--dump-tracks] [--top 25]
"""
import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

NUM_RAYS = 2048
WINDOW = 50

# op-name substring -> bucket (first match wins, checked in order)
BUCKETS = [
    ("train_kernel", "fused train kernels (Pallas)"),
    ("mlp_kernel", "fused eval kernels (Pallas)"),
    # the jitted megastep wraps each pallas_call in a closed_call; in this
    # program the only closed_calls ARE the two train kernels (coarse and
    # fine pass — verify in the top-ops table: 1:2 duration ratio)
    ("closed_call", "fused train kernels (Pallas)"),
    ("while", "scan self-time (in-loop glue)"),
    ("sort", "resample: sort/merge"),
    ("searchsorted", "resample: searchsorted"),
    ("cumsum", "resample: cdf cumsum"),
    ("one_hot", "resample: one-hot gathers"),
    ("gather", "gathers"),
    ("scatter", "scatters (latent grad)"),
    ("rng", "per-ray RNG"),
    ("threefry", "per-ray RNG"),
    ("random", "per-ray RNG"),
    ("adam", "Adam/optimizer"),
    ("copy", "copies/relayouts"),
    ("transpose", "copies/relayouts"),
    ("fusion", "XLA fusions (glue)"),
]


def build_megastep():
    """The exact setup bench.py times (kept in sync by hand; both pin the
    paper workload of dave_dvp_lcode_fixed_bg_512_paper_model.yml)."""
    import jax
    import jax.numpy as jnp

    from nerface_tpu.config import CfgNode, FeatureFlags
    from nerface_tpu.models import MODELS
    from nerface_tpu.render.pipeline import EncodeSpec, RenderSettings
    from nerface_tpu.train.state import create_train_state
    from nerface_tpu.train.step import make_train_megastep

    model = MODELS["ConditionalBlendshapePaperNeRFModel"](
        num_encoding_fn_xyz=10, num_encoding_fn_dir=4
    )
    cfg = CfgNode({
        "optimizer": {"type": "Adam", "lr": 5e-4},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
    })
    flags = FeatureFlags()
    settings = RenderSettings(
        num_coarse=64, num_fine=64, perturb=True,
        radiance_field_noise_std=0.1, near=0.2, far=0.8,
        encode_xyz=EncodeSpec(10, True, True),
        encode_dir=EncodeSpec(4, False, True),
        fused="on",
    )
    state, opt = create_train_state(
        jax.random.PRNGKey(0), model, model, cfg, flags, n_train=16,
        background=jnp.zeros((512, 512, 3)),
    )
    mega = make_train_megastep(
        model, model, settings, flags, opt, dtype=jnp.bfloat16
    )
    rng = np.random.RandomState(0)
    rd = rng.randn(NUM_RAYS, 3).astype(np.float32)
    rd[:, 2] = -np.abs(rd[:, 2]) - 0.5
    one = {
        "ray_origins": np.zeros((NUM_RAYS, 3), np.float32),
        "ray_directions": rd,
        "target_rgb": rng.rand(NUM_RAYS, 3).astype(np.float32),
        "background_rgb": rng.rand(NUM_RAYS, 3).astype(np.float32),
        "expression": rng.randn(76).astype(np.float32) * 0.1,
        "latent_index": np.asarray(0, np.int32),
    }
    batches = jax.device_put(
        {k: np.stack([v] * WINDOW) for k, v in one.items()}
    )
    key = jax.random.PRNGKey(1)
    return state, mega, batches, key


def load_perfetto(logdir):
    paths = sorted(glob.glob(os.path.join(
        logdir, "**", "perfetto_trace.json.gz"), recursive=True))
    if not paths:
        sys.exit(f"[trace] no perfetto_trace.json.gz under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"] if isinstance(data, dict) else data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=2)
    ap.add_argument("--logdir", type=str, default="/tmp/megatrace")
    ap.add_argument("--dump-tracks", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax

    state, mega, batches, key = build_megastep()

    def window(state, it):
        s2, ms = mega(state, batches, key, np.int32(it))
        return s2, ms

    print("[trace] warmup (compile) ...", flush=True)
    state, metrics = window(state, 0)
    float(metrics["total_loss"][-1])  # host-read sync (axon: block_until_
    state, metrics = window(state, WINDOW)  # one hot window pre-trace
    float(metrics["total_loss"][-1])

    n_steps = args.windows * WINDOW
    print(f"[trace] tracing {args.windows} windows ({n_steps} steps) ...",
          flush=True)
    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir, create_perfetto_trace=True)
    t0 = time.perf_counter()
    it = WINDOW
    for _ in range(args.windows):
        it += WINDOW
        state, metrics = window(state, it)
    float(metrics["total_loss"][-1])
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"[trace] wall {wall * 1e3:.1f} ms = "
          f"{wall * 1e3 / n_steps:.3f} ms/step "
          f"({NUM_RAYS * n_steps / wall:,.0f} rays/s)")

    events = load_perfetto(args.logdir)

    # --- map (pid, tid) -> names from metadata events
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"]["name"]

    # --- per-track totals over complete events
    track_tot = defaultdict(float)
    track_n = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            k = (e["pid"], e.get("tid"))
            track_tot[k] += e["dur"]
            track_n[k] += 1
    if args.dump_tracks or not track_tot:
        print("\n[tracks] pid/tid -> process | thread | events | total ms")
        for k in sorted(track_tot, key=lambda k: -track_tot[k]):
            print(f"  {k}: {pnames.get(k[0], '?'):32s} | "
                  f"{tnames.get(k, '?'):28s} | {track_n[k]:6d} | "
                  f"{track_tot[k] / 1e3:9.2f}")

    # --- device tracks: XLA op rows on a TPU device process. The op row
    # carries one event per executed HLO op; higher rows (step/module)
    # duplicate the same span, so keep only threads named like op rows
    # ("XLA Ops"), falling back to the busiest thread per device pid.
    dev_pids = {p for p, n in pnames.items()
                if "TPU" in n or "device" in n.lower()}
    if not dev_pids:
        print("[trace] WARNING: no TPU-named process track; "
              "falling back to the busiest track")
    op_tracks = [k for k in track_tot
                 if (k[0] in dev_pids or not dev_pids)
                 and "op" in tnames.get(k, "").lower()]
    if not op_tracks:
        cand = [k for k in track_tot if k[0] in dev_pids] or list(track_tot)
        op_tracks = [max(cand, key=lambda k: track_tot[k])]
    print(f"\n[trace] op tracks: "
          f"{[(pnames.get(k[0], '?'), tnames.get(k, '?')) for k in op_tracks]}")

    # XLA op rows NEST (the scan `while` event spans each iteration and
    # contains the kernel closed_calls and fusions) — attribute SELF time:
    # each event's duration minus its directly-nested children.
    raw = [(e["ts"], e["dur"], e["name"]) for e in events
           if e.get("ph") == "X" and "dur" in e
           and (e["pid"], e.get("tid")) in op_tracks]
    raw.sort(key=lambda r: (r[0], -r[1]))
    per_op = defaultdict(float)   # self time per op name
    busy = 0.0                    # top-level (non-nested) time
    span_lo = min((r[0] for r in raw), default=0.0)
    span_hi = max((r[0] + r[1] for r in raw), default=0.0)
    stack = []  # (end_ts, name)
    for ts, dur, name in raw:
        while stack and ts >= stack[-1][0] - 1e-9:
            stack.pop()
        per_op[name] += dur
        if stack:
            per_op[stack[-1][1]] -= dur  # take out of the parent's self
        else:
            busy += dur
        stack.append((ts + dur, name))

    print(f"\n[device] busy (top-level) {busy / 1e3:.2f} ms over span "
          f"{(span_hi - span_lo) / 1e3:.2f} ms "
          f"-> busy/step {busy / 1e3 / n_steps:.3f} ms, "
          f"gap {(span_hi - span_lo - busy) / 1e3 / n_steps:.3f} ms/step")

    buckets = defaultdict(float)
    for name, dur in per_op.items():
        low = name.lower()
        for sub, label in BUCKETS:
            if sub in low:
                buckets[label] += dur
                break
        else:
            buckets["other"] += dur
    print("\n[buckets] device ms/step")
    for label, dur in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {label:38s} {dur / 1e3 / n_steps:8.4f} "
              f"({dur / busy * 100:5.1f}%)")

    print(f"\n[top {args.top} ops] device ms/step")
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {dur / 1e3 / n_steps:8.4f}  {name[:100]}")


if __name__ == "__main__":
    main()
