"""Avatar serving CLI — a resident render server over a trained
checkpoint. No reference equivalent (`eval_transformed_rays.py` is
batch-only); this is the deployment surface: load + compile once, then
answer render requests over stdio or TCP at the fast-eval frame rate.

Protocol: newline-delimited JSON (see `nerface_tpu/serve.py`).

    # stdio, parity renderer
    echo '{"frame": 0, "save": "/tmp/out_"}' | \
        python -m nerface_tpu.cli.serve --config c.yml --checkpoint ckpt --stdio

    # TCP, fast-eval + bf16 (the production serving configuration)
    python -m nerface_tpu.cli.serve --config c.yml --checkpoint ckpt \
        --listen 0.0.0.0:7860 --fast-eval --bf16
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument(
        "--checkpoint", type=str, required=True,
        help="Checkpoint to serve (orbax dir or reference torch .ckpt).",
    )
    mode = parser.add_mutually_exclusive_group(required=True)
    mode.add_argument(
        "--stdio", action="store_true",
        help="Serve JSONL requests on stdin, responses on stdout.",
    )
    mode.add_argument(
        "--listen", type=str, metavar="HOST:PORT",
        help="Serve the JSONL protocol over TCP.",
    )
    parser.add_argument(
        "--fast-eval", action="store_true",
        help="Head-bbox ray skipping (equals nerf.validation.fast_eval).",
    )
    parser.add_argument(
        "--bf16", action="store_true",
        help="Render in bfloat16 (fused kernels on TPU).",
    )
    parser.add_argument(
        "--num-devices", type=int, default=0,
        help="Shard each frame's rays over this many devices "
             "(0 = single device).",
    )
    parser.add_argument(
        "--warmup", action="store_true",
        help="Render one frame before accepting requests so the first "
             "request does not pay the compile.",
    )
    parser.add_argument(
        "--max-requests", type=int, default=None,
        help="Exit after this many requests (testing/draining).",
    )
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import sys

    import jax

    from nerface_tpu.config import load_config
    from nerface_tpu.serve import AvatarServer

    cfg = load_config(args.config)
    if args.fast_eval:
        cfg.nerf.validation["fast_eval"] = True

    dtype = None
    if args.bf16:
        import jax.numpy as jnp

        dtype = jnp.bfloat16

    mesh = None
    if args.num_devices and args.num_devices > 1:
        import numpy as np
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()[: args.num_devices]), ("data",))

    server = AvatarServer(
        cfg, checkpoint=args.checkpoint, dtype=dtype, mesh=mesh,
    )
    if args.warmup:
        server.render(maps=("rgb_fine",))
        print("[serve] warmup render done", file=sys.stderr, flush=True)

    if args.stdio:
        n = server.serve_jsonl(
            sys.stdin, sys.stdout, max_requests=args.max_requests
        )
        print(f"[serve] handled {n} requests", file=sys.stderr, flush=True)
    else:
        host, _, port = args.listen.rpartition(":")
        n = server.serve_tcp(
            host or "127.0.0.1", int(port), max_requests=args.max_requests
        )
        print(f"[serve] handled {n} requests", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
