"""Perf probe — production-loop ledger at the 512² paper schedule.

Attributes the sustained-vs-bench throughput gap (BENCH_NOTES.md round 3:
~67k rays/s sustained vs 205k bench) cause by cause, on the real chip:

  A. bare chained steps, batch resident on device  (what bench.py times)
  B. + per-step host feed batch (one host→device upload per step)
  C. metric pull styles: 8x float() round trips vs one jax.device_get
  D. one validation pass (2 frames at 512², as the loop runs it)
  E. one orbax checkpoint save (device pull + disk write)

then folds D/E into per-step cost at the paper cadence
(print 100 / validate 1000 / save 5000 —
`dave_dvp_lcode_fixed_bg_512_paper_model.yml`).

Usage: python tools/perf/loop_breakdown.py [/tmp/synth512]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import time

import jax
import jax.numpy as jnp
import numpy as np

NUM_RAYS = 2048


def sync(x):
    return float(np.asarray(x).ravel()[0])


def main():
    basedir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth512"
    from nerface_tpu.config import CfgNode, FeatureFlags, load_config
    from nerface_tpu.data import RayFeed, load_flame_data
    from nerface_tpu.models import build_model
    from nerface_tpu.render.pipeline import RenderSettings
    from nerface_tpu.train.loop import build_models_from_cfg, setup_background, validate
    from nerface_tpu.train.state import create_train_state
    from nerface_tpu.train.step import make_train_step

    cfg = CfgNode({
        "experiment": {"id": "probe", "logdir": "/tmp/probe_logs",
                       "randomseed": 42, "train_iters": 1000000,
                       "validate_every": 1000, "save_every": 5000,
                       "print_every": 100},
        "dataset": {"basedir": basedir, "half_res": False, "testskip": 1,
                    "no_ndc": True, "near": 0.2, "far": 0.8},
        "models": {
            "coarse": {"type": "ConditionalBlendshapePaperNeRFModel",
                       "num_layers": 4, "hidden_size": 256,
                       "skip_connect_every": 3, "include_input_xyz": True,
                       "log_sampling_xyz": True, "num_encoding_fn_xyz": 10,
                       "use_viewdirs": True, "include_input_dir": False,
                       "num_encoding_fn_dir": 4, "log_sampling_dir": True},
            "fine": {"type": "ConditionalBlendshapePaperNeRFModel",
                     "num_layers": 4, "hidden_size": 256,
                     "skip_connect_every": 3, "include_input_xyz": True,
                     "log_sampling_xyz": True, "num_encoding_fn_xyz": 10,
                     "use_viewdirs": True, "include_input_dir": False,
                     "num_encoding_fn_dir": 4, "log_sampling_dir": True},
        },
        "optimizer": {"type": "Adam", "lr": 5.0e-4},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
        "nerf": {
            "use_viewdirs": True,
            "train": {"num_random_rays": NUM_RAYS, "chunksize": 2048,
                      "perturb": True, "num_coarse": 64, "num_fine": 64,
                      "white_background": False,
                      "radiance_field_noise_std": 0.1, "lindisp": False},
            "validation": {"chunksize": 65536, "perturb": True,
                           "num_coarse": 64, "num_fine": 64,
                           "white_background": False,
                           "radiance_field_noise_std": 0.0,
                           "lindisp": False},
        },
    })
    flags = FeatureFlags.from_cfg(cfg)
    dataset = load_flame_data(basedir, half_res=False, testskip=1)
    model_coarse, model_fine = build_models_from_cfg(cfg)
    background = setup_background(dataset, flags)
    state, optimizer = create_train_state(
        jax.random.PRNGKey(42), model_coarse, model_fine, cfg, flags,
        n_train=len(dataset.i_train),
        background=jnp.asarray(background) if background is not None else None,
    )
    settings = RenderSettings.from_cfg(cfg, mode="train")
    step_fn = make_train_step(model_coarse, model_fine, settings, flags,
                              optimizer, dtype=jnp.bfloat16, donate=True)

    feed = RayFeed(dataset, num_rays=NUM_RAYS,
                   background=background if flags.fixed_background else None,
                   seed=42).start()
    base_key = jax.random.PRNGKey(42)

    # warm up compile
    batch0 = next(feed)
    state, metrics = step_fn(state, batch0, jax.random.fold_in(base_key, 0))
    sync(metrics["total_loss"])
    print("compiled", flush=True)

    def run(n, fixed_batch, pull_every=0, pull_style="get"):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(n):
            b = fixed_batch if fixed_batch is not None else next(feed)
            state, m = step_fn(state, b, jax.random.fold_in(base_key, i))
            if pull_every and i % pull_every == 0:
                if pull_style == "get":
                    jax.device_get(m)
                else:
                    for v in m.values():
                        float(v)
        sync(m["total_loss"])
        return (time.perf_counter() - t0) / n

    fixed = jax.device_put(next(feed))

    # A: device-resident batch, chained steps
    run(30, fixed)
    a = run(300, fixed)
    print(f"A bare chained steps:        {a*1e3:7.2f} ms/step  ({NUM_RAYS/a/1e3:6.1f}k rays/s)")

    # B: host feed batch per step
    run(30, None)
    b = run(300, None)
    print(f"B + host feed upload/step:   {b*1e3:7.2f} ms/step  ({NUM_RAYS/b/1e3:6.1f}k rays/s)")

    # C: metric pulls
    c_get = run(300, None, pull_every=100, pull_style="get")
    c_flt = run(300, None, pull_every=100, pull_style="float")
    print(f"C pull/100 via device_get:   {c_get*1e3:7.2f} ms/step")
    print(f"C pull/100 via 8x float():   {c_flt*1e3:7.2f} ms/step")

    # D: one validation pass (as the loop runs it, minus TB)
    t0 = time.perf_counter()
    vm = validate(cfg, dataset, model_coarse, model_fine, state, background,
                  flags, None, step=100, dtype=jnp.bfloat16)
    d_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    vm = validate(cfg, dataset, model_coarse, model_fine, state, background,
                  flags, None, step=101, dtype=jnp.bfloat16)
    d = time.perf_counter() - t0
    print(f"D validation pass:           {d*1e3:7.0f} ms  (first incl. compile {d_compile:.1f}s)")

    # E: one checkpoint save
    from nerface_tpu.train import checkpoint as ckpt_lib
    t0 = time.perf_counter()
    ckpt_lib.save_checkpoint("/tmp/probe_ckpt", state, {"loss": 0.0})
    e = time.perf_counter() - t0
    print(f"E checkpoint save:           {e*1e3:7.0f} ms")

    per = b + (c_flt - b) + d / 1000 + e / 5000
    print("--- paper-cadence ledger (print 100 / val 1000 / save 5000) ---")
    print(f"projected sustained:         {per*1e3:7.2f} ms/step  ({NUM_RAYS/per/1e3:6.1f}k rays/s)")
    print(f"  bare step      {a*1e3:6.2f} ms")
    print(f"  feed upload    {(b-a)*1e3:6.2f} ms")
    print(f"  metric pulls   {(c_flt-b)*1e3:6.2f} ms")
    print(f"  validation     {d/1000*1e3:6.2f} ms")
    print(f"  checkpoint     {e/5000*1e3:6.2f} ms")
    feed.stop()


if __name__ == "__main__":
    main()
