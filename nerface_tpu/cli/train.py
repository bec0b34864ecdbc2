"""Train CLI — equivalent of `train_transformed_rays.py:26-36` arg surface.

Extra (TPU-only) options: --num-devices to train data-parallel over a
device mesh, --bf16 for a bfloat16 compute path, --export-torch to also
write reference-schema torch checkpoints.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--config", type=str, required=True, help="Path to (.yml) config file."
    )
    parser.add_argument(
        "--load-checkpoint",
        type=str,
        default="",
        help="Path to load saved checkpoint from (orbax dir or torch .ckpt).",
    )
    parser.add_argument(
        "--max-iters", type=int, default=None,
        help="Override cfg.experiment.train_iters.",
    )
    parser.add_argument(
        "--num-devices", type=int, default=0,
        help="Data-parallel over this many devices (0 = single device).",
    )
    parser.add_argument(
        "--bf16", action="store_true", help="bfloat16 compute (fp32 params)."
    )
    parser.add_argument(
        "--export-torch", action="store_true",
        help="Also write reference-schema torch .ckpt files.",
    )
    parser.add_argument(
        "--profile", type=str, default=None, metavar="LOGDIR",
        help="Capture a jax.profiler trace of the run into LOGDIR.",
    )
    parser.add_argument(
        "--debug-nans", action="store_true",
        help="Fail fast on NaNs inside jitted code (jax_debug_nans).",
    )
    parser.add_argument(
        "--device-feed", action="store_true",
        help="Sample ray batches fully on device (jitted Gumbel top-k) "
             "instead of the host feed.",
    )
    parser.add_argument(
        "--steps-per-execute", type=int, default=None, metavar="K",
        help="Run K train steps per dispatched program (lax.scan window; "
             "one host->device upload per window). Default: auto — 50 for "
             "production-length schedules, shrunk to divide the "
             "print/validate/save cadences; 1 for short runs. Bit-parity "
             "with K=1 is guaranteed (tests/test_megastep.py).",
    )
    parser.add_argument(
        "--coordinator-address", type=str, default=None, metavar="HOST:PORT",
        help="jax.distributed coordinator; with --num-processes/--process-id "
             "this process joins a multi-host mesh and trains data-parallel "
             "over every chip of every process (grads all-reduced over "
             "ICI/DCN).",
    )
    parser.add_argument(
        "--num-processes", type=int, default=None,
        help="total process count for --coordinator-address.",
    )
    parser.add_argument(
        "--process-id", type=int, default=None,
        help="this process's id (0..num-processes-1).",
    )
    parser.add_argument(
        "--platform", type=str, default=None,
        choices=["cpu", "tpu", "axon"],
        help="Force the JAX platform (e.g. 'cpu' for CI / debugging on a "
             "TPU host). Default: whatever the environment provides.",
    )
    parser.add_argument(
        "--matmul-precision", type=str, default=None,
        choices=["default", "high", "highest"],
        help="XLA matmul precision. TPUs run f32 matmuls in bf16-multipass "
             "form by default; pass 'highest' for strict-f32 reference "
             "parity (slower).",
    )
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    # A supervisor (cli/supervise.py) stops us with SIGTERM; turn it into
    # SystemExit so the loop's `finally` (feed stop, TB flush) runs before
    # the process dies. 143 = 128+SIGTERM, the conventional code.
    import signal
    import sys as _sys

    signal.signal(signal.SIGTERM, lambda *_: _sys.exit(143))

    import jax

    if args.platform:
        # Must precede any backend use (the image's sitecustomize only
        # registers plugins at boot; backend init is lazy until the first
        # device query, so this still takes effect here).
        jax.config.update("jax_platforms", args.platform)

    if args.coordinator_address:
        # Must run before any backend use: joins this process's chips into
        # the global device set (SURVEY §5 distributed backend row).
        from nerface_tpu.train.distributed import initialize

        if args.num_processes is None or args.process_id is None:
            raise SystemExit(
                "--coordinator-address needs --num-processes and --process-id"
            )
        initialize(args.coordinator_address, args.num_processes,
                   args.process_id)

    import jax.numpy as jnp
    import numpy as np

    from nerface_tpu.config import load_config
    from nerface_tpu.train.loop import train

    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)

    mesh = None
    if args.coordinator_address:
        # the mesh spans every process's devices; --num-devices is implied
        from nerface_tpu.train.distributed import global_data_mesh

        mesh = global_data_mesh()
    elif args.num_devices and args.num_devices > 1:
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()[: args.num_devices]), ("data",))

    if args.debug_nans:
        from nerface_tpu.utils.profiling import enable_debug

        enable_debug(nans=True)

    import contextlib

    ctx = contextlib.nullcontext()
    if args.profile:
        from nerface_tpu.utils.profiling import profile_trace

        ctx = profile_trace(args.profile)

    with ctx:
        train(
            load_config(args.config),
            load_checkpoint=args.load_checkpoint,
            max_iters=args.max_iters,
            mesh=mesh,
            export_torch=args.export_torch,
            dtype=jnp.bfloat16 if args.bf16 else None,
            # flag forces on; otherwise the config decides
            # (experiment.device_feed — see train/loop.py)
            device_feed=True if args.device_feed else None,
            steps_per_execute=args.steps_per_execute,
        )


if __name__ == "__main__":
    main()
