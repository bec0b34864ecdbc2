"""Full test-sequence evaluation / reenactment — the equivalent of
`eval_transformed_rays.py:201-498`.

Renders every test frame (pose + expression from `transforms_test.json`,
which for reenactment is a *driven* sequence produced by the dataset
builder), writes `savedir/{i:04d}.png` plus `normals/`, optional
`disparity/` and `error/` folders, and reports avg seconds per image —
the reference's only performance metric (:483,498).

Ablation semantics reproduced from the reference (SURVEY.md §2.4):

* `interpolate_mouth`: pose/expr pinned to frame 241, expression blendshape
  68 swept over linspace(-1, 1, 150) (:405-410).
* `frontalize`: pose pinned to frame 0 (:412-413).
* `ablate='expression'`: pose pinned to frame 100 (:422-423).
* `ablate='latent_code'`: pose/expr pinned to frame 100, latent code from
  `idx_map[100+i, 1]` (:424-428).
* `ablate='view_dir'`: pose/expr pinned to frame 100, the direction-branch
  input taken from the rays of pose `240+i` (:429-433).
* latent-code selection: the released script unconditionally pins
  `idx_map[10, 1]` (:444, the "USE THIS" line) — kept as the
  `fix_latent_code_index=True` default; with False, `idx_map[i, 1]` is
  used when >= 0 (:441-443). `ablate='latent_code'` overrides both.
* `no_lcode`: latent table replaced by zeros but still *used* (:386-389).
* `replace_background`: checkpoint background replaced by the dataset's
  `bg/00050.png` (:335-344).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerface_tpu.config.flags import EvalFlags, FeatureFlags
from nerface_tpu.data.flame import FlameDataset, load_flame_data
from nerface_tpu.eval.normals import normal_map_from_depth
from nerface_tpu.eval.renderer import render_full_frame
from nerface_tpu.ops.rays import get_ray_bundle
from nerface_tpu.render.pipeline import RenderSettings


def cast_to_image(img: np.ndarray) -> np.ndarray:
    """[0,1] float (H,W,3) -> uint8, clamped (`eval_transformed_rays.py:184-192`)."""
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255.0).round().astype(np.uint8)


@jax.jit
def device_cast_to_image(img: jnp.ndarray) -> jnp.ndarray:
    """`cast_to_image` computed ON DEVICE (f32 clip·255 → round-half-even
    → uint8, bit-parity pinned in tests/test_serve.py) so the host link
    carries the 786 KB uint8 frame instead of the 3.1 MB f32 one — on the
    tunneled backend readback is the dominant non-render cost
    (BENCH_NOTES.md "Serving latency")."""
    x = jnp.clip(img.astype(jnp.float32), 0.0, 1.0) * 255.0
    return jnp.round(x).astype(jnp.uint8)


@jax.jit
def device_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """C-style float→uint8 truncation on device (for maps already scaled
    to 0..255, e.g. `normal_map_from_depth` output)."""
    return x.astype(jnp.uint8)


def cast_to_disparity_image(disp: np.ndarray) -> np.ndarray:
    """Per-frame min-max normalize -> uint8 (`eval_transformed_rays.py:195-198`)."""
    disp = np.asarray(disp, np.float64)
    rng = disp.max() - disp.min()
    img = (disp - disp.min()) / (rng if rng > 0 else 1.0)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


_JET_STOPS = np.array(
    [  # matplotlib 'jet' control points
        (0.000, (0.0, 0.0, 0.5)),
        (0.110, (0.0, 0.0, 1.0)),
        (0.365, (0.0, 1.0, 1.0)),
        (0.500, (0.5, 1.0, 0.5)),
        (0.635, (1.0, 1.0, 0.0)),
        (0.890, (1.0, 0.0, 0.0)),
        (1.000, (0.5, 0.0, 0.0)),
    ],
    dtype=object,
)


def jet_colormap(x: np.ndarray) -> np.ndarray:
    """Map [0,1] floats to jet RGB uint8 (stand-in for plt.imshow cmap='jet',
    `eval_transformed_rays.py:160-182` — no matplotlib dependency)."""
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    pos = np.array([s[0] for s in _JET_STOPS], np.float64)
    cols = np.array([s[1] for s in _JET_STOPS], np.float64)
    out = np.empty(x.shape + (3,), np.float64)
    for c in range(3):
        out[..., c] = np.interp(x, pos, cols[:, c])
    return (out * 255).astype(np.uint8)


def error_image(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """Per-pixel L2-norm error, jet-mapped, normalized to the frame max
    (the reference renders this via matplotlib, :160-182,489-497)."""
    diff = np.linalg.norm(np.asarray(gt, np.float64) - np.asarray(pred, np.float64), axis=2)
    peak = diff.max()
    return jet_colormap(diff / (peak if peak > 0 else 1.0))


def _save_png(path: str, img) -> None:
    from PIL import Image

    # np.asarray here (not in the render loop): device→host readback of
    # jax arrays runs in the saver thread, overlapped with the next
    # frame's render dispatch.
    Image.fromarray(np.asarray(img)).save(path)


class _AsyncSaver:
    """Background PNG writer: at 512² the PNG encode costs ~0.5 s/image —
    comparable to the render itself — so saves overlap with the next
    frame's render (the reference saves synchronously inside its timed
    loop, `eval_transformed_rays.py:484-497`)."""

    def __init__(self, workers: int = 4):
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=workers)
        self._futures = []

    def save(self, path: str, img) -> None:
        self._futures.append(self._pool.submit(_save_png, path, img))
        # Bound the backlog: queued device arrays pin device buffers, so
        # a long run whose readback lags its renders must not accumulate
        # the whole sequence on-chip.
        if len(self._futures) > 16:
            self._futures.pop(0).result()

    def wait(self) -> None:
        for f in self._futures:
            f.result()
        self._futures.clear()

    def shutdown(self) -> None:
        self.wait()
        self._pool.shutdown()


def evaluate(
    cfg,
    checkpoint: str,
    savedir: str,
    eval_flags: Optional[EvalFlags] = None,
    dataset: Optional[FlameDataset] = None,
    save_disparity_image: bool = False,
    save_error_image: bool = False,
    max_frames: Optional[int] = None,
    dtype=None,
    log: bool = True,
    mesh=None,
) -> Dict[str, float]:
    """Run the full evaluation loop; returns timing/count summary.

    The summary separates `setup_s` (dataset load unless passed in,
    checkpoint restore, fast-eval/occupancy-grid build) from
    `frame_loop_s` (render + readback + PNG writes, saver threads
    joined) so wall-clock fps probes can report sustained per-frame cost
    without amortizing one-time setup into it."""
    from nerface_tpu.train import checkpoint as ckpt_lib
    from nerface_tpu.train.loop import build_models_from_cfg
    from nerface_tpu.train.state import create_train_state

    t_setup0 = time.perf_counter()

    flags = eval_flags if eval_flags is not None else EvalFlags.from_cfg(cfg)

    if dataset is None:
        dataset = load_flame_data(
            cfg.dataset.basedir,
            half_res=cfg.dataset.half_res,
            testskip=cfg.dataset.testskip,
            test=True,
            cachedir=cfg.dataset.get("cachedir"),
        )

    model_coarse, model_fine = build_models_from_cfg(cfg)
    train_flags = FeatureFlags.from_cfg(cfg)
    # Template sized for checkpoint restore; latent table size comes from
    # the checkpoint itself on load.
    state, _ = create_train_state(
        jax.random.PRNGKey(0), model_coarse, model_fine, cfg, train_flags,
        n_train=max(len(dataset.i_train), 1),
        background=jnp.zeros((dataset.H, dataset.W, 3)),
    )
    if os.path.isdir(checkpoint):
        state = ckpt_lib.load_checkpoint(checkpoint, state)
    else:
        state = ckpt_lib.import_torch_weights(
            state, ckpt_lib.load_torch_checkpoint(checkpoint)
        )

    H, W, intrinsics = dataset.H, dataset.W, dataset.intrinsics

    background = state.params.get("background")
    if background is None:
        background = state.fixed_background
    if flags.replace_background:
        background = jnp.asarray(dataset.load_background())
    if flags.no_background:
        background = None

    latent_codes = state.params.get("latent_codes")
    use_latent_code = latent_codes is not None
    if flags.no_lcode:
        use_latent_code = True
        latent_codes = jnp.zeros((5000, 32), jnp.float32)
    idx_map = None
    if use_latent_code:
        try:
            idx_map = dataset.load_index_map()
        except FileNotFoundError:
            # the reference hard-requires index_map.npy
            # (`eval_transformed_rays.py:329`); fall back to an identity
            # map with a warning so datasets without one still render
            print(
                "WARNING: index_map.npy not found; using identity "
                "latent-code mapping"
            )
            n = len(dataset.poses)
            idx_map = np.stack([np.arange(n), np.arange(n)], axis=-1)

    render_poses = dataset.poses[dataset.i_test]
    render_expressions = dataset.expressions[dataset.i_test].copy()
    if flags.no_expressions:
        render_expressions = np.zeros_like(render_expressions)

    settings = RenderSettings.from_cfg(cfg, mode="validation")

    # Opt-in fast eval (nerf.validation.fast_eval, default off — the
    # parity path renders every ray): skip rays outside the UNION of the
    # test split's head bboxes, with the active-ray capacity sized to that
    # union so no ray overflows. The union (not per-frame boxes) keeps
    # ablation modes safe — they render frame i under other frames' poses.
    fast_bbox = None
    occ_grid = None
    if settings.fast_eval:
        from nerface_tpu.eval.occupancy import fast_eval_setup

        # the mouth sweep renders expression[68] across [-1, 1] — beyond
        # anything in the dataset — so those extremes must join the
        # occupancy grid's expression sample or the sweep's density
        # lands in voxels the grid marks empty (clipped mouth)
        extra = None
        if flags.interpolate_mouth and len(render_expressions):
            base = render_expressions[
                min(241, len(render_expressions) - 1)
            ]
            extremes = []
            for v in (-1.0, 1.0):
                e = np.asarray(base).copy()
                e[68] = v
                extremes.append(e)
            extra = extremes
        fast_bbox, settings, occ_grid = fast_eval_setup(
            dataset, render_poses, render_expressions, settings,
            model_coarse, state.params["coarse"],
            latent_codes=latent_codes if use_latent_code else None,
            dtype=dtype, log=log, extra_expressions=extra,
        )

    os.makedirs(savedir, exist_ok=True)
    os.makedirs(os.path.join(savedir, "normals"), exist_ok=True)
    if save_disparity_image:
        os.makedirs(os.path.join(savedir, "disparity"), exist_ok=True)
    if save_error_image:
        os.makedirs(os.path.join(savedir, "error"), exist_ok=True)

    n_frames = len(render_expressions)
    if max_frames is not None:
        n_frames = min(n_frames, max_frames)

    times = []
    latent_index = 0
    saver = _AsyncSaver()
    setup_s = time.perf_counter() - t_setup0
    t_loop0 = time.perf_counter()
    for i in range(n_frames):
        t0 = time.time()
        pose = render_poses[i]
        expression = render_expressions[i]
        ray_directions_ablation = None

        if flags.interpolate_mouth:
            pose = render_poses[min(241, len(render_poses) - 1)]
            expression = render_expressions[min(241, len(render_expressions) - 1)].copy()
            sweep = np.arange(-1.0, 1.0, 2.0 / 150.0)
            expression[68] = sweep[min(i, len(sweep) - 1)]
        if flags.frontalize:
            pose = render_poses[0]

        if flags.ablate == "expression":
            pose = render_poses[min(100, len(render_poses) - 1)]
        elif flags.ablate == "latent_code":
            j = min(100, len(render_poses) - 1)
            pose = render_poses[j]
            expression = render_expressions[j]
            if idx_map is not None and 100 + i < len(idx_map) and idx_map[100 + i, 1] >= 0:
                latent_index = int(idx_map[100 + i, 1])
        elif flags.ablate == "view_dir":
            j = min(100, len(render_poses) - 1)
            pose = render_poses[j]
            expression = render_expressions[j]
            k = min(240 + i, len(render_poses) - 1)
            _, ray_directions_ablation = get_ray_bundle(
                H, W, jnp.asarray(intrinsics),
                jnp.asarray(render_poses[k][:3, :4]),
            )

        if use_latent_code and flags.ablate != "latent_code":
            if flags.fix_latent_code_index and idx_map is not None:
                latent_index = int(idx_map[min(10, len(idx_map) - 1), 1])
            elif idx_map is not None and i < len(idx_map) and idx_map[i, 1] >= 0:
                latent_index = int(idx_map[i, 1])
        latent_code = (
            latent_codes[max(latent_index, 0)] if use_latent_code else None
        )

        out = render_full_frame(
            model_coarse, model_fine,
            state.params["coarse"], state.params.get("fine"),
            H, W, intrinsics, pose[:3, :4], settings,
            key=jax.random.PRNGKey(i),
            expressions=jnp.asarray(expression),
            latent_code=latent_code,
            background=background,
            ray_directions_ablation=ray_directions_ablation,
            dtype=dtype,
            mesh=mesh,
            bbox=fast_bbox,
            occupancy=occ_grid,
        )
        rgb = out.get("rgb_fine", out["rgb_coarse"])
        disp = out.get("disp_fine", out["disp_coarse"])
        normals = normal_map_from_depth(
            disp, jnp.asarray(intrinsics, jnp.float32), out["bg_weight"], clean=True
        )
        # Quantize on device: only uint8 frames ride the host link, and
        # the readback itself happens in the saver threads, overlapped
        # with the next frame's render.
        rgb_u8 = device_cast_to_image(rgb)
        normals_u8 = device_uint8(normals)
        jax.block_until_ready(rgb_u8)
        times.append(time.time() - t0)

        saver.save(os.path.join(savedir, f"{i:04d}.png"), rgb_u8)
        saver.save(
            os.path.join(savedir, "normals", f"{i:04d}.png"), normals_u8
        )
        if save_disparity_image:
            saver.save(
                os.path.join(savedir, "disparity", f"{i:04d}.png"),
                cast_to_disparity_image(disp),
            )
        if save_error_image and len(dataset.i_test) > i:
            gt = dataset.images[dataset.i_test[i]][..., :3]
            # error vs the QUANTIZED render — the image the run ships
            saver.save(
                os.path.join(savedir, "error", f"{i:04d}.png"),
                error_image(gt, np.asarray(rgb_u8, np.float64) / 255.0),
            )
        if log:
            print(f"Avg time per image: {sum(times) / (i + 1)}")

    saver.shutdown()
    return {
        "frames": float(n_frames),
        "avg_time_per_image": (sum(times) / len(times)) if times else 0.0,
        "setup_s": setup_s,
        "frame_loop_s": time.perf_counter() - t_loop0,
    }
