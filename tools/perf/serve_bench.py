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


def bench_pipelined(server, label, n, encode):
    """Steady-state pipelined rate on ONE connection: send all n requests
    back-to-back, then timestamp each reply as it arrives. serve_tcp
    overlaps request k's device render with request k-1's host half
    (readback + PNG encode + reply), so the steady-state inter-reply gap
    is the render-bound cost alone — the number the synchronous
    `handle()` rows cannot show. Reports the median gap after the first
    reply (which pays the pipeline fill)."""
    import json
    import socket
    import threading

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    t_srv = threading.Thread(
        target=server.serve_tcp, args=("127.0.0.1", port),
        kwargs={"max_requests": n}, daemon=True,
    )
    t_srv.start()
    time.sleep(0.5)

    with socket.create_connection(("127.0.0.1", port), timeout=600) as c:
        f = c.makefile("rwb")
        payload = b""
        for i in range(n):
            req = {"frame": 0, "maps": ["rgb_fine"], "seed": i}
            if encode:
                req["encode"] = "png_base64"
            payload += json.dumps(req).encode() + b"\n"
        t0 = time.time()
        f.write(payload)
        f.flush()
        arrivals = []
        for _ in range(n):
            resp = json.loads(f.readline())
            assert resp["ok"], resp
            arrivals.append(time.time())
    wall = arrivals[-1] - t0
    gaps = np.diff(np.asarray(arrivals))
    ms = float(np.median(gaps)) * 1000.0
    print(
        f"{label:34s} median {ms:8.1f} ms/request  "
        f"({1000.0 / ms:.2f} fps steady)  [n={n}, "
        f"first-reply {(arrivals[0] - t0) * 1e3:.1f} ms, "
        f"aggregate {n / wall:.2f} req/s]"
    )
    return ms


def bench_concurrent(server, label, n_clients, per_client, encode):
    """p50/p95 request latency with n_clients live TCP connections driving
    the selectors loop concurrently — requests serialize at the one
    renderer, so per-request latency ≈ n_clients × solo latency while
    THROUGHPUT holds; what this measures is that a multiplexed client mix
    neither deadlocks nor starves anyone."""
    import json
    import socket
    import threading

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    total = n_clients * per_client
    t_srv = threading.Thread(
        target=server.serve_tcp, args=("127.0.0.1", port),
        kwargs={"max_requests": total + n_clients}, daemon=True,
    )
    t_srv.start()
    time.sleep(0.5)

    lat = [[] for _ in range(n_clients)]
    errs = []

    def client(ci):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=120) as c:
                f = c.makefile("rwb")
                for i in range(per_client):
                    req = {"frame": 0, "maps": ["rgb_fine"],
                           "seed": ci * 1000 + i}
                    if encode:
                        req["encode"] = "png_base64"
                    t0 = time.time()
                    f.write(json.dumps(req).encode() + b"\n")
                    f.flush()
                    resp = json.loads(f.readline())
                    lat[ci].append(time.time() - t0)
                    assert resp["ok"], resp
        except Exception as e:  # surface in main thread
            errs.append((ci, repr(e)))

    threads = [threading.Thread(target=client, args=(ci,))
               for ci in range(n_clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    wall = time.time() - t0
    assert not errs, errs
    allt = np.asarray([x for c in lat for x in c])
    print(
        f"{label:34s} p50 {np.percentile(allt, 50)*1e3:8.1f} ms  "
        f"p95 {np.percentile(allt, 95)*1e3:8.1f} ms  "
        f"throughput {len(allt)/wall:.2f} req/s  "
        f"[{n_clients} clients x {per_client} reqs]"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--requests", type=int, default=20)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--f32", dest="bf16", action="store_false")
    ap.add_argument("--clients", type=int, default=3,
                    help="concurrent-connection count for the selectors-"
                         "loop section (0 skips it)")
    ap.add_argument("--modes", type=str, default="parity,fast,occupancy",
                    help="comma-separated sections to run (parity, fast, "
                         "occupancy) — the occupancy grid build alone is "
                         "~80 s on a converged 512² checkpoint, so long "
                         "runs can split sections across invocations")
    args = ap.parse_args()
    modes = {m.strip() for m in args.modes.split(",") if m.strip()}
    bad = modes - {"parity", "fast", "occupancy"}
    if bad:
        raise SystemExit(f"unknown --modes {sorted(bad)}; allowed: "
                         "parity, fast, occupancy")

    import jax.numpy as jnp

    from nerface_tpu.config import load_config
    from nerface_tpu.serve import AvatarServer

    dtype = jnp.bfloat16 if args.bf16 else None
    cfg = load_config(args.config)

    p = None
    if "parity" in modes:
        parity = AvatarServer(cfg, checkpoint=args.checkpoint, dtype=dtype,
                              log=False)
        print(f"serving {parity.H}x{parity.W}, dtype "
              f"{'bf16' if args.bf16 else 'f32'}")
        p = bench(parity, "parity renderer", args.requests, encode=False)
        bench(parity, "parity + png_base64", args.requests, encode=True)
        del parity

    if "fast" in modes:
        cfg.nerf.validation["fast_eval"] = True
        fast = AvatarServer(cfg, checkpoint=args.checkpoint, dtype=dtype,
                            log=False)
        print(f"fast-eval bbox {fast.fast_bbox.tolist()}, "
              f"capacity {fast.settings.fast_eval_capacity:.2f}")
        f = bench(fast, "fast-eval renderer", args.requests, encode=False)
        bench(fast, "fast-eval + png_base64", args.requests, encode=True)
        if p is not None:
            print(f"fast-eval speedup over parity: {p / f:.2f}x")

        bench_pipelined(fast, "fast-eval, pipelined (1 conn)",
                        args.requests, encode=True)
        if args.clients:
            bench_concurrent(fast, "fast-eval, concurrent clients",
                             args.clients, max(4, args.requests // 4),
                             encode=True)
        del fast

    if "occupancy" in modes:
        cfg.nerf.validation["fast_eval"] = True
        cfg.nerf.validation["occupancy"] = True
        occ = AvatarServer(cfg, checkpoint=args.checkpoint, dtype=dtype,
                           log=True)
        print(f"occupancy capacity {occ.settings.fast_eval_capacity:.2f}")
        o = bench(occ, "occupancy renderer", args.requests, encode=False)
        bench(occ, "occupancy + png_base64", args.requests, encode=True)
        if p is not None:
            print(f"occupancy speedup over parity: {p / o:.2f}x")


if __name__ == "__main__":
    main()
