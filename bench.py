"""Headline benchmark: training-step throughput (rays/sec) on the flagship
NeRFace paper model at the reference's exact workload — 2048 rays/step,
64 coarse + 64 fine samples/ray, PE(10 xyz / 4 dir), 76-dim expression,
32-dim latent code, fixed-background compositing
(`config/dave/dave_dvp_lcode_fixed_bg_512_paper_model.yml:134,142-144,160-162`).

Execution matches production since round 4: K=50 steps per dispatched
program (`train/step.py::make_train_megastep`, the train loop's default
window at paper-schedule cadences) — per-step math identical to the
sequential loop (tests/test_megastep.py), with the inter-step dispatch
gaps the scan removes. Round-4 production runs sustain within ~3% of this
number end-to-end (BENCH_NOTES.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline denominator: the reference records no throughput (SURVEY.md §6);
we pin the PyTorch-1-GPU estimate at 10,000 rays/s (≈5 steps/s × 2048 rays
for nerf-pytorch-class code on a 2021 single GPU, the reference's stated
hardware, README.md:39). BASELINE.json's target is ≥20× → vs_baseline ≥ 20.

The estimate is additionally anchored by a MEASUREMENT taken in this
environment (`tools/perf/ref_anchor.py`, 2026-08-20; BASELINE.md): the
unmodified reference script at the same workload runs at 118.6 rays/s on
this image's CPU torch (median 17.27 s/iter). The JSON carries that as
`vs_measured_cpu_ref`; `vs_baseline` stays against the GPU estimate.
"""

import json
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_SEC = 10_000.0
# measured in-env anchor: unmodified reference script, CPU torch, same
# workload (tools/perf/ref_anchor.py 2026-08-20; BASELINE.md row 3)
MEASURED_CPU_REF_RAYS_PER_SEC = 118.6
NUM_RAYS = 2048
WINDOW = 50   # steps per dispatched program (production default)
WARMUP = 1    # windows
STEPS = 100   # timed steps per repeat (2 windows)
REPEATS = 3  # median of independent slope measurements (tunnel variance)


def _device_ready(timeout: float = 120.0) -> bool:
    """Probe backend init in a SUBPROCESS: a dead tunnel makes
    jax.devices() hang forever rather than error (observed in the
    round-3 outage), so an in-process probe would hang this benchmark."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_for_device(attempts: int = 10, probe_timeout: float = 120.0) -> bool:
    """Ride out a transient tunnel outage (the skill notes say workers
    recover in minutes); give up after ~20 min so the driver gets an
    honest artifact instead of a hang."""
    for i in range(attempts):
        if _device_ready(probe_timeout):
            return True
        last = i + 1 == attempts
        print(
            f"[bench] TPU backend unreachable (probe {i + 1}/{attempts})"
            + ("" if last else "; retrying in 60s"),
            file=sys.stderr, flush=True,
        )
        if not last:
            time.sleep(60.0)
    return False


def main():
    if not _wait_for_device():
        # still one JSON line out — an honest zero, not a hang
        print(json.dumps({
            "metric": "train_rays_per_sec",
            "value": 0.0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
            "error": "TPU backend unreachable (tunnel outage); "
                     "no measurement taken",
        }))
        return
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
        fused="on",  # fused Pallas MLP, bf16 MXU / f32 params+accum
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
    base_key = jax.random.PRNGKey(1)
    it = 0

    def window(state, it):
        s2, ms = mega(state, batches, base_key, jnp.asarray(it, jnp.int32))
        return s2, ms, it + WINDOW

    for _ in range(WARMUP):
        state, metrics, it = window(state, it)
    # NOTE: sync via a host read — on the tunneled `axon` platform
    # jax.block_until_ready returns before execution completes, which
    # silently turns the benchmark into a dispatch-rate measurement.
    float(metrics["total_loss"][-1])

    # Median of REPEATS independent slope measurements: the shared tunnel
    # has ~2x run-to-run variance, so a single 100-step slope can land a
    # red artifact on an unchanged repo (BENCH_NOTES.md "De-noising").
    rates = []
    for rep in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(STEPS // WINDOW):
            state, metrics, it = window(state, it)
        float(metrics["total_loss"][-1])  # host-read sync (see NOTE above)
        dt = time.perf_counter() - t0
        rates.append(NUM_RAYS * STEPS / dt)
        print(
            f"[bench] rep {rep}: device={jax.devices()[0].platform} "
            f"steps={STEPS} dt={dt:.3f}s rays/s={rates[-1]:,.0f} "
            f"loss={float(metrics['total_loss'][-1]):.5f}",
            file=sys.stderr,
        )
    rays_per_sec = sorted(rates)[len(rates) // 2]
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        # the reference records no throughput; denominator is an estimate
        "baseline": "10k rays/s, ESTIMATED PyTorch-1-GPU (reference logs none)",
        # measured in-env anchor (the one denominator that IS checkable):
        # unmodified reference script, CPU torch, same workload — 118.6
        # rays/s (tools/perf/ref_anchor.py; BASELINE.md)
        "vs_measured_cpu_ref": round(
            rays_per_sec / MEASURED_CPU_REF_RAYS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
