#!/usr/bin/env python
"""Characterize host-RSS growth per train step on the tunneled TPU.

Observed on the 1M-iteration paper-schedule run (BENCH_NOTES.md): host
RSS grows linearly at ~120 KB/iter — almost exactly the per-step
host→device ray-batch size — while the same loop on the CPU backend
shows only tapering allocator growth. Hypothesis: the experimental axon
tunnel client retains per-execution input buffers. This probe measures
the slope directly for (a) the default host feed and (b) the
device-resident feed (`--device-feed`, which moves batch assembly
on-device and sends no per-step host arrays), attributing the growth.

Run on the real chip (nothing else using it):

    python tools/perf/host_rss_probe.py [--iters 3000] [--size 256]
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def rss_kb() -> int:
    from nerface_tpu.utils.profiling import host_rss_gb

    return int((host_rss_gb() or 0.0) * 1024 * 1024)


class RssSampler(threading.Thread):
    def __init__(self, period=2.0):
        super().__init__(daemon=True)
        self.samples = []
        self.period = period
        self._stop = threading.Event()

    def run(self):
        while not self._stop.is_set():
            self.samples.append((time.time(), rss_kb()))
            self._stop.wait(self.period)

    def stop(self):
        self._stop.set()
        self.join()


def slope_kb_per_s(samples, skip_frac=0.3):
    """Least-squares slope over the tail (skip warmup/compile)."""
    import numpy as np

    tail = samples[int(len(samples) * skip_frac):]
    if len(tail) < 4:
        return float("nan")
    t = np.array([s[0] for s in tail])
    r = np.array([s[1] for s in tail], float)
    t -= t[0]
    return float(np.polyfit(t, r, 1)[0])


def run_variant(cfg, iters, device_feed):
    from nerface_tpu.train.loop import train

    sampler = RssSampler()
    sampler.start()
    t0 = time.time()
    train(cfg, max_iters=iters, log=False, device_feed=device_feed)
    wall = time.time() - t0
    sampler.stop()
    kbps = slope_kb_per_s(sampler.samples)
    it_per_s = iters / wall
    label = "device feed" if device_feed else "host feed"
    print(
        f"{label:12s}: {kbps:8.1f} KB/s at {it_per_s:6.1f} it/s "
        f"-> {kbps / max(it_per_s, 1e-9):7.2f} KB/iter "
        f"(rss {sampler.samples[0][1] // 1024} -> "
        f"{sampler.samples[-1][1] // 1024} MB over {wall:.0f}s)"
    )
    return kbps / max(it_per_s, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--rays", type=int, default=2048)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "tests"))
    from test_eval_driver import _tiny_cfg

    from nerface_tpu.data.synthetic import make_synthetic_flame_dataset

    ds = make_synthetic_flame_dataset(
        "/tmp/rss_probe/ds", H=args.size, W=args.size,
        n_train=8, n_val=1, n_test=1, num_samples=16,
    )
    cfg = _tiny_cfg(ds, "/tmp/rss_probe/logs")
    # Production step shape: 2048 rays x 64+64 samples, flagship widths.
    for node, n in ((cfg.nerf.train, "train"), (cfg.nerf.validation, "val")):
        node["num_coarse"] = 64
        node["num_fine"] = 64
    cfg.nerf.train["num_random_rays"] = args.rays
    cfg.models.coarse["num_encoding_fn_xyz"] = 10
    cfg.models.coarse["num_encoding_fn_dir"] = 4
    cfg.models.coarse["num_layers"] = 6
    cfg.models.coarse["hidden_size"] = 256
    cfg.models.fine["num_encoding_fn_xyz"] = 10
    cfg.models.fine["num_encoding_fn_dir"] = 4
    cfg.experiment["validate_every"] = 0
    cfg.experiment["save_every"] = 10 ** 9
    cfg.experiment["print_every"] = 10 ** 9
    cfg.experiment["train_iters"] = args.iters

    host = run_variant(cfg, args.iters, device_feed=False)
    dev = run_variant(cfg, args.iters, device_feed=True)
    if dev < 0.2 * host:
        print("=> growth tracks per-step host->device transfers "
              "(tunnel client retention); the device feed avoids it")
    else:
        print("=> growth is NOT explained by per-step host transfers")


if __name__ == "__main__":
    main()
