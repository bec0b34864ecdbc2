#!/usr/bin/env python
"""Full-script loop-parity rehearsal: the reference's UNMODIFIED
`train_transformed_rays.py` vs this framework's training CLI, on the same
synthetic dataset, from the same initial checkpoint, with the same config.

Complements tests/test_reference_loop_parity.py (which couples the two
iteration loops on a fixed feed): here the reference script runs end to
end — its own dataloader, ray-importance sampling, feed order, LR
schedule, checkpointing — as released. The two runs draw frames/rays from
independent RNG streams, so the comparison is statistical: smoothed loss
trajectories and the final render quality on the same validation frame
(both checkpoints rendered through THIS repo's f32 renderer).

Usage:  python tools/parity_rehearsal.py [--iters 400] [--out PARITY.md]
Writes a markdown report with the recorded numbers.

The reference script needs CPU torch plus stubs for modules that are not
in this image (pytorch3d, torchsearchsorted, torchvision, cv2 — none on
the executed path at half_res=False) and the relu→clamp substitution that
reproduces torch-1.5 autograd semantics for the reference's in-place
`sigma_a[:,-1] += 1e-6` (see tests/test_reference_loop_parity.py).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys
import types

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:  # robust to any cwd (the run chdirs mid-flight)
    sys.path.insert(0, REPO_ROOT)

REF_DIR = "/root/reference/nerface_code/nerf-pytorch"
REF_CFG = os.path.join(
    REF_DIR, "config/dave/dave_dvp_lcode_fixed_bg_512_paper_model.yml"
)


def _stub_modules():
    import numpy as np

    for name in ("pytorch3d", "pytorch3d.transforms", "torchsearchsorted",
                 "torchvision", "torchvision.transforms", "cv2"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if not hasattr(sys.modules["cv2"], "resize"):
        sys.modules["cv2"].resize = lambda img, dsize, **k: img
        sys.modules["cv2"].INTER_AREA = 3

    class _ToPILImage:  # cast_to_image (train_transformed_rays.py:581-585)
        def __call__(self, tensor):
            arr = tensor.detach().cpu().numpy()
            if arr.ndim == 3:  # (C, H, W) -> (H, W, C)
                arr = np.moveaxis(arr, 0, -1)
            return (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)

    sys.modules["torchvision.transforms"].ToPILImage = _ToPILImage
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"
    ]


def _write_config(path, basedir, logdir, iters, rays, samples,
                  deterministic=False, seed=None, frozen_latents=False):
    import yaml

    with open(REF_CFG) as f:
        cfg = yaml.safe_load(f)
    cfg["dataset"]["basedir"] = basedir
    cfg["dataset"]["half_res"] = False
    cfg["experiment"]["logdir"] = logdir
    cfg["experiment"]["id"] = "rehearsal"
    cfg["experiment"]["train_iters"] = iters
    cfg["experiment"]["print_every"] = 1
    cfg["experiment"]["validate_every"] = 10 * iters  # only fires at i==0
    cfg["experiment"]["save_every"] = iters - 1
    if seed is not None:
        cfg["experiment"]["randomseed"] = seed
    cfg["nerf"]["train"]["num_random_rays"] = rays
    cfg["nerf"]["train"]["num_coarse"] = samples
    cfg["nerf"]["train"]["num_fine"] = samples
    cfg["nerf"]["validation"]["num_coarse"] = samples
    cfg["nerf"]["validation"]["num_fine"] = samples
    cfg["nerf"]["validation"]["chunksize"] = 2048
    if deterministic:  # isolate the stochastic elements (A/B diagnosis)
        cfg["nerf"]["train"]["perturb"] = False
        cfg["nerf"]["train"]["radiance_field_noise_std"] = 0.0
    if frozen_latents:
        # latents pinned to zero — the resumed REFERENCE's de-facto
        # semantics (its resume bug silently freezes them; PARITY.md)
        cfg["experiment"]["flags"] = {"disable_latent_codes": True}
    with open(path, "w") as f:
        yaml.dump(cfg, f)
    return cfg


def run_reference(cfg_path, init_ckpt):
    """Run the reference script via runpy on CPU torch; returns the list of
    per-iter losses parsed from its own [TRAIN] prints."""
    import runpy

    import torch

    _stub_modules()
    os.environ.setdefault("MPLBACKEND", "Agg")

    real_relu = torch.nn.functional.relu
    torch.nn.functional.relu = lambda x, inplace=False: torch.clamp(x, min=0)
    real_cuda = torch.cuda.is_available
    torch.cuda.is_available = lambda: False

    argv = sys.argv
    cwd = os.getcwd()
    sys.argv = ["train_transformed_rays.py", "--config", cfg_path,
                "--load-checkpoint", init_ckpt]
    sys.path.insert(0, REF_DIR)
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            return len(s)

    try:
        os.chdir(REF_DIR)  # the script resolves ./nerf relative imports
        with contextlib.redirect_stdout(Tee()):
            runpy.run_path(
                os.path.join(REF_DIR, "train_transformed_rays.py"),
                run_name="__main__",
            )
    finally:
        os.chdir(cwd)
        sys.argv = argv
        sys.path.remove(REF_DIR)
        torch.nn.functional.relu = real_relu
        torch.cuda.is_available = real_cuda

    losses = {}
    for m in re.finditer(
        r"\[TRAIN\] Iter: (\d+) Loss: ([0-9.eE+-]+)", buf.getvalue()
    ):
        losses[int(m.group(1))] = float(m.group(2))
    return [losses[i] for i in sorted(losses)]


def run_ours(cfg_path, init_ckpt, bf16=False):
    """Run this repo's training CLI and parse its per-iter losses.

    Default: the f32 XLA parity path.  bf16=True: the production path —
    bfloat16 compute, which routes training through the one-pass fused
    Pallas train kernel (`train/fused.py`; requires a TPU backend)."""
    from nerface_tpu.cli import train as train_cli

    argv = ["--config", cfg_path, "--load-checkpoint", init_ckpt]
    if bf16:
        argv.append("--bf16")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        train_cli.main(argv)
    losses = {}
    for m in re.finditer(
        r"\[TRAIN\] Iter: (\d+) Loss: ([0-9.eE+-]+)", buf.getvalue()
    ):
        losses[int(m.group(1))] = float(m.group(2))
    return [losses[i] for i in sorted(losses)]


def render_psnr(cfg, params, val_dir):
    """Render every val frame with this repo's f32 renderer; mean PSNR vs
    GT (a single 64² frame's PSNR swings by >1 dB between adjacent late
    checkpoints in this overfit regime — averaging frames tightens it)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerface_tpu.data.flame import load_flame_data
    from nerface_tpu.models import MODELS
    from nerface_tpu.ops.math import mse2psnr_jnp
    from nerface_tpu.ops.rays import get_ray_bundle
    from nerface_tpu.render.pipeline import (
        EncodeSpec,
        RenderSettings,
        run_one_iter_of_nerf,
    )

    ds = load_flame_data(cfg["dataset"]["basedir"], half_res=False)
    H, W = ds.H, ds.W
    bg = ds.load_background()
    model = MODELS[cfg["models"]["coarse"]["type"]](
        num_encoding_fn_xyz=cfg["models"]["coarse"]["num_encoding_fn_xyz"],
        num_encoding_fn_dir=cfg["models"]["coarse"]["num_encoding_fn_dir"],
        include_input_xyz=cfg["models"]["coarse"]["include_input_xyz"],
        include_input_dir=cfg["models"]["coarse"]["include_input_dir"],
    )
    s = cfg["nerf"]["validation"]
    settings = RenderSettings(
        num_coarse=s["num_coarse"], num_fine=s["num_fine"], perturb=False,
        radiance_field_noise_std=0.0,
        near=cfg["dataset"]["near"], far=cfg["dataset"]["far"],
        encode_xyz=EncodeSpec(
            cfg["models"]["coarse"]["num_encoding_fn_xyz"], True, True
        ),
        encode_dir=EncodeSpec(
            cfg["models"]["coarse"]["num_encoding_fn_dir"], False, True
        ),
        fused="off",
    )
    psnrs, rgb = [], None
    for i_val in [int(i) for i in ds.i_val]:
        gt = ds.images[i_val][..., :3]
        ro, rd = get_ray_bundle(H, W, ds.intrinsics, ds.poses[i_val][:3, :4])
        out = run_one_iter_of_nerf(
            H, W, model, model, params["coarse"], params["fine"],
            jnp.asarray(ro), jnp.asarray(rd), settings,
            key=jax.random.PRNGKey(0),
            expressions=jnp.asarray(ds.expressions[i_val]),
            latent_code=jnp.zeros((32,), jnp.float32),
            background_prior=(
                jnp.asarray(bg.reshape(-1, 3)) if bg is not None else None
            ),
            mode="validation",
        )
        rgb = np.asarray(out[3])
        mse = float(np.mean((rgb - gt) ** 2))
        psnrs.append(float(mse2psnr_jnp(jnp.asarray(mse))))
    return float(np.mean(psnrs)), rgb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--rays", type=int, default=256)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--res", type=int, default=64,
                    help="synthetic dataset resolution (HxW); the round-5 "
                         "non-toy rehearsals run --res 128 --samples 32")
    ap.add_argument("--workdir", type=str, default="/tmp/parity_rehearsal")
    ap.add_argument("--out", type=str, default="PARITY.md")
    ap.add_argument("--deterministic", action="store_true",
                    help="perturb off + sigma noise 0 on both sides")
    ap.add_argument("--seed", type=int, default=None,
                    help="rewrite experiment.randomseed for this run")
    ap.add_argument("--side", choices=["both", "ref", "ours"], default="both",
                    help="run one side only; dumps a JSON result under "
                         "workdir/results/ for later aggregation")
    ap.add_argument("--fused-bf16", action="store_true",
                    help="our side runs the PRODUCTION path: bf16 compute "
                         "through the one-pass fused Pallas train kernel "
                         "(needs the TPU backend; do not combine with "
                         "--side ref)")
    ap.add_argument("--frozen-latents", action="store_true",
                    help="our side pins latent codes to zero "
                         "(experiment.flags.disable_latent_codes) — the "
                         "resumed reference's de-facto semantics")
    ap.add_argument("--prepare", action="store_true",
                    help="only create the shared dataset + init checkpoint")
    ap.add_argument("--report", action="store_true",
                    help="aggregate workdir/results/*.json into a summary "
                         "table (no runs)")
    args = ap.parse_args()

    if args.report:
        import glob
        import json as _json

        import numpy as _np

        rows = []
        for f in sorted(glob.glob(os.path.join(args.workdir, "results",
                                               "*.json"))):
            d = _json.load(open(f))
            xs = d["losses"]
            m = xs[0]
            for x in xs:
                m = 0.95 * m + 0.05 * x
            rows.append((os.path.basename(f)[:-5], xs[0], m,
                         float(_np.mean(xs[-50:])), d["final_psnr"]))
        print(f"{'run':36s} {'first':>8s} {'EMA':>8s} {'last50':>9s} "
              f"{'valPSNR':>8s}")
        for name, first, emaf, l50, psnr in rows:
            print(f"{name:36s} {first:8.4f} {emaf:8.4f} {l50:9.2e} "
                  f"{psnr:8.2f}")
        return

    # Force the CPU backend via jax.config, not the env var: this image's
    # sitecustomize pre-imports jax against the axon TPU tunnel, so a
    # plain JAX_PLATFORMS=cpu is too late on some paths and the rehearsal
    # would silently run (and occasionally hang) on the tunneled device.
    # The fused-bf16 production path is the one mode that NEEDS the TPU:
    # the Pallas train kernel only compiles on tpu/axon backends.
    import jax

    if not args.fused_bf16:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from nerface_tpu.config import FeatureFlags, load_config
    from nerface_tpu.data.synthetic import make_synthetic_flame_dataset
    from nerface_tpu.models import MODELS
    from nerface_tpu.train.checkpoint import (
        export_torch_checkpoint,
        load_torch_checkpoint,
        import_torch_weights,
    )
    from nerface_tpu.train.state import create_train_state

    import jax
    import jax.numpy as jnp

    import json

    os.makedirs(args.workdir, exist_ok=True)
    ds_dir = os.path.join(args.workdir, "ds")
    if not os.path.exists(os.path.join(ds_dir, "transforms_train.json")):
        make_synthetic_flame_dataset(ds_dir, H=args.res, W=args.res,
                                     n_train=8, n_val=4, n_test=1)

    tag = "det" if args.deterministic else "prod"
    if args.seed is not None:
        tag += f"_s{args.seed}"
    if args.frozen_latents:
        tag += "_frozen"

    # shared initial checkpoint (our init exported to the torch schema);
    # always built from PRNGKey(0) so every run of every seed resumes
    # from identical weights.  Written atomically (parallel per-seed
    # background runs may race on first creation).
    ref_cfg_path = os.path.join(args.workdir, f"cfg_ref_{tag}.yml")
    ref_logdir = os.path.join(args.workdir, f"ref_logs_{tag}")
    cfg = _write_config(ref_cfg_path, ds_dir, ref_logdir, args.iters,
                        args.rays, args.samples,
                        deterministic=args.deterministic, seed=args.seed)
    init_ckpt = os.path.join(args.workdir, "init.ckpt")
    if not os.path.exists(init_ckpt):
        jcfg = load_config(ref_cfg_path)
        model = MODELS[cfg["models"]["coarse"]["type"]](
            num_encoding_fn_xyz=cfg["models"]["coarse"]["num_encoding_fn_xyz"],
            num_encoding_fn_dir=cfg["models"]["coarse"]["num_encoding_fn_dir"],
            include_input_xyz=cfg["models"]["coarse"]["include_input_xyz"],
            include_input_dir=cfg["models"]["coarse"]["include_input_dir"],
        )
        state, _ = create_train_state(
            jax.random.PRNGKey(0), model, model, jcfg, FeatureFlags(),
            n_train=8,
        )
        tmp = init_ckpt + f".tmp{os.getpid()}"
        export_torch_checkpoint(tmp, state, loss=0.0, psnr=0.0)
        os.replace(tmp, init_ckpt)
    if args.prepare:
        print(f"[rehearsal] prepared {ds_dir} and {init_ckpt}")
        return

    def _template_state():
        jcfg = load_config(ref_cfg_path)
        model = MODELS[cfg["models"]["coarse"]["type"]](
            num_encoding_fn_xyz=cfg["models"]["coarse"]["num_encoding_fn_xyz"],
            num_encoding_fn_dir=cfg["models"]["coarse"]["num_encoding_fn_dir"],
            include_input_xyz=cfg["models"]["coarse"]["include_input_xyz"],
            include_input_dir=cfg["models"]["coarse"]["include_input_dir"],
        )
        state, _ = create_train_state(
            jax.random.PRNGKey(0), model, model, jcfg, FeatureFlags(),
            n_train=8,
        )
        return state

    results_dir = os.path.join(args.workdir, "results")
    os.makedirs(results_dir, exist_ok=True)

    def _dump(side, losses, psnr):
        rec = {
            "side": side, "seed": args.seed, "iters": args.iters,
            "deterministic": args.deterministic,
            "fused_bf16": bool(args.fused_bf16 and side == "ours"),
            "losses": losses, "final_psnr": psnr,
        }
        path = os.path.join(results_dir, f"{side}_{tag}"
                            + ("_fused" if rec["fused_bf16"] else "") + ".json")
        with open(path, "w") as f:
            json.dump(rec, f)
        print(f"[rehearsal] wrote {path} (final PSNR {psnr:.2f} dB)")
        return rec

    ref_losses = our_losses = None
    ref_psnr = our_psnr = float("nan")

    if args.side in ("both", "ref"):
        print(f"[rehearsal] reference script, {args.iters} iters on CPU ...")
        ref_losses = run_reference(ref_cfg_path, init_ckpt)
        print(f"[rehearsal] parsed {len(ref_losses)} reference losses; "
              f"first {ref_losses[0]:.4f} last {ref_losses[-1]:.4f}")
        ref_ckpts = sorted(
            f for f in os.listdir(os.path.join(ref_logdir, "rehearsal"))
            if f.endswith(".ckpt")
        )
        ref_state = import_torch_weights(
            _template_state(), load_torch_checkpoint(
                os.path.join(ref_logdir, "rehearsal", ref_ckpts[-1])
            ),
        )
        ref_psnr, _ = render_psnr(cfg, ref_state.params, ds_dir)
        _dump("ref", ref_losses, ref_psnr)

    if args.side in ("both", "ours"):
        our_cfg_path = os.path.join(args.workdir, f"cfg_ours_{tag}.yml")
        our_logdir = os.path.join(args.workdir, f"our_logs_{tag}")
        _write_config(our_cfg_path, ds_dir, our_logdir, args.iters, args.rays,
                      args.samples, deterministic=args.deterministic,
                      seed=args.seed, frozen_latents=args.frozen_latents)
        mode = "PRODUCTION bf16 fused" if args.fused_bf16 else "f32 XLA parity"
        print(f"[rehearsal] nerface-tpu CLI ({mode}), {args.iters} iters ...")
        our_losses = run_ours(our_cfg_path, init_ckpt, bf16=args.fused_bf16)
        print(f"[rehearsal] parsed {len(our_losses)} of our losses; "
              f"first {our_losses[0]:.4f} last {our_losses[-1]:.4f}")

        from nerface_tpu.train.checkpoint import (
            latest_checkpoint,
            load_checkpoint,
        )
        our_ckpt = latest_checkpoint(os.path.join(our_logdir, "rehearsal"))
        our_state = load_checkpoint(our_ckpt, _template_state())
        our_psnr, _ = render_psnr(cfg, our_state.params, ds_dir)
        _dump("ours", our_losses, our_psnr)

    if args.side != "both":
        return

    def ema(xs, a=0.05):
        out, m = [], xs[0]
        for x in xs:
            m = (1 - a) * m + a * x
            out.append(m)
        return np.asarray(out)

    n = min(len(ref_losses), len(our_losses))
    e_ref, e_our = ema(ref_losses[:n]), ema(our_losses[:n])
    tail = slice(n // 2, n)
    rel_tail = float(np.mean(np.abs(e_our[tail] - e_ref[tail]) / e_ref[tail]))

    our_path = ("bf16 fused production path" if args.fused_bf16
                else "f32 XLA parity path")
    report = f"""# Loop-parity rehearsal (full reference script)

Reference `train_transformed_rays.py`, UNMODIFIED, run end-to-end on CPU
torch vs `nerface_tpu.cli.train` ({our_path}) — same synthetic
dataset ({args.res}x{args.res}, 8 train frames), same config scaled to {args.iters} iters /
{args.rays} rays / {args.samples}+{args.samples} samples, same initial
checkpoint (exported through the torch interop). Frame/ray selection RNG
is independent per side, so trajectories are compared smoothed.

| quantity | reference | nerface-tpu |
|---|---|---|
| first-iter loss | {ref_losses[0]:.4f} | {our_losses[0]:.4f} |
| final-iter loss (EMA) | {e_ref[-1]:.4f} | {e_our[-1]:.4f} |
| mean val PSNR (4 frames) of final checkpoint (our f32 renderer) | {ref_psnr:.2f} dB | {our_psnr:.2f} dB |

Mean relative EMA-loss gap over the second half: {rel_tail:.2%}.
PSNR delta: {abs(our_psnr - ref_psnr):.2f} dB.

Reproduce: `python tools/parity_rehearsal.py --iters {args.iters} \
--res {args.res} --rays {args.rays} --samples {args.samples}`.
"""
    with open(args.out, "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
