"""Synthetic FLAME-format dataset generation (host, numpy).

Stands in for the reference's offline data tooling when no real tracked
face data is available (the reference ships none in-tree either; its
dataset zip is external — `README.md:30`).  Produces a dataset directory
with exactly the on-disk schema the loader consumes
(`transforms_{split}.json` with camera_angle_x/intrinsics/frames[...],
`{split}/f_%04d.png`, `bg/00050.png`, `index_map.npy` — see SURVEY.md §2.4).

The scene is an analytic emissive Gaussian blob whose radius/color respond
to the expression vector, volume-rendered over a checkerboard background
with the same compositing math as the renderer — so a correctly-working
NeRF can actually fit it, and eval PSNR is meaningful.
"""

from __future__ import annotations

import json
import os
import numpy as np


def _look_at(cam_pos: np.ndarray) -> np.ndarray:
    """c2w with -z looking at the origin (OpenGL-style, like the tracker
    poses: head at origin, camera at z≈0.5)."""
    forward = cam_pos / np.linalg.norm(cam_pos)  # camera -z points to origin
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, forward)
    right /= np.linalg.norm(right)
    true_up = np.cross(forward, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = forward
    c2w[:3, 3] = cam_pos
    return c2w


def _checkerboard(H: int, W: int, tile: int = 8) -> np.ndarray:
    yy, xx = np.mgrid[0:H, 0:W]
    checker = ((yy // tile + xx // tile) % 2).astype(np.float32)
    bg = np.stack(
        [0.15 + 0.2 * checker, 0.25 + 0.15 * checker, 0.45 - 0.1 * checker], axis=-1
    )
    return bg


def render_blob_frame(
    H: int,
    W: int,
    intrinsics: np.ndarray,
    c2w: np.ndarray,
    expression: np.ndarray,
    background: np.ndarray,
    num_samples: int = 48,
    near: float = 0.2,
    far: float = 0.8,
    compact: bool = False,
) -> np.ndarray:
    """Analytic volume render of the expression-conditioned blob.

    `compact=True` renders a SMALL blob with hard-truncated support
    (sigma exactly 0 beyond 2.5 radii) — the regime of real tracked
    heads, where the scene has genuine empty space, background pixels
    equal the bg prior exactly, and occupancy/bbox ray skipping can
    win. The default (legacy) blob is an untruncated Gaussian whose
    σ=400 halo extends across most of the frustum: a converged model
    correctly learns nonzero density everywhere (round-4 finding,
    BENCH_NOTES.md), so datasets for sparsity-dependent features should
    pass compact=True."""
    fx, fy, cx, cy = intrinsics
    ii, jj = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack(
        [(ii - W * cx) / fx, -(jj - H * cy) / fy, -np.ones_like(ii)], axis=-1
    )
    rd = dirs @ c2w[:3, :3].T
    ro = c2w[:3, 3]

    t = np.linspace(near, far, num_samples, dtype=np.float32)
    pts = ro[None, None, None, :] + rd[..., None, :] * t[None, None, :, None]

    # Expression controls blob radius and color mix.
    e0 = float(expression[0]) if len(expression) else 0.0
    e1 = float(expression[1]) if len(expression) > 1 else 0.0
    radius = (0.012 if compact else 0.08) * (1.0 + 0.4 * np.tanh(e0))
    color = np.clip(
        np.array([0.8 + 0.2 * np.tanh(e1), 0.4, 0.3 - 0.2 * np.tanh(e1)]), 0, 1
    ).astype(np.float32)

    d2 = np.sum(pts * pts, axis=-1)
    sigma = 400.0 * np.exp(-d2 / (2 * radius * radius))
    if compact:
        cut = 2.5 * radius
        sigma = np.where(d2 < cut * cut, sigma, 0.0)

    dists = np.diff(t, append=t[-1] + 1e10).astype(np.float32)
    dists = dists[None, None, :] * np.linalg.norm(rd, axis=-1)[..., None]
    alpha = 1.0 - np.exp(-sigma * dists)
    trans = np.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = np.roll(trans, 1, axis=-1)
    trans[..., 0] = 1.0
    weights = alpha * trans

    rgb = np.sum(weights[..., None] * color[None, None, None, :], axis=-2)
    acc = np.sum(weights, axis=-1)
    return np.clip(rgb + (1.0 - acc[..., None]) * background, 0.0, 1.0)


def make_synthetic_flame_dataset(
    outdir: str,
    n_train: int = 8,
    n_val: int = 2,
    n_test: int = 2,
    H: int = 64,
    W: int = 64,
    expr_dim: int = 76,
    seed: int = 0,
    num_samples: int = 48,
    compact: bool = False,
) -> str:
    """Write a loader-compatible synthetic dataset; returns `outdir`.

    `compact=True` (see render_blob_frame): truly-bounded head stand-in —
    background pixels equal bg/00050.png exactly, per-frame bboxes are
    computed from the truncated blob's projection (like a tracker's), and
    the GT is sampled finely enough for the small support."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    if compact:
        num_samples = max(num_samples, 128)
    camera_angle_x = 0.35
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    intrinsics = np.array([focal, focal, 0.5, 0.5], np.float32)
    background = _checkerboard(H, W)

    os.makedirs(os.path.join(outdir, "bg"), exist_ok=True)
    Image.fromarray((background * 255).astype(np.uint8)).save(
        os.path.join(outdir, "bg", "00050.png")
    )

    counts = {"train": n_train, "val": n_val, "test": n_test}
    frame_id = 0
    for split, n in counts.items():
        os.makedirs(os.path.join(outdir, split), exist_ok=True)
        frames = []
        for k in range(n):
            # Camera near z=0.5 with small jitter (tracker-pose-like).
            jitter = rng.randn(3) * np.array([0.06, 0.06, 0.02])
            cam = np.array([0.0, 0.0, 0.5]) + jitter
            c2w = _look_at(cam.astype(np.float32))
            expr = np.zeros(expr_dim, np.float32)
            expr[:6] = rng.randn(6).astype(np.float32) * 0.5
            img = render_blob_frame(
                H, W, intrinsics, c2w, expr, background,
                num_samples=num_samples, compact=compact,
            )
            name = f"f_{frame_id:04d}"
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(outdir, split, name + ".png")
            )
            if compact:
                # tracker-like per-frame bbox: the truncated blob's
                # projected extent plus 30% looseness
                r_blob = 0.012 * (1.0 + 0.4 * np.tanh(float(expr[0])))
                cut = 2.5 * r_blob
                dist = float(np.linalg.norm(cam))
                half = 1.3 * (cut / max(dist - cut, 1e-6)) / (
                    2.0 * np.tan(0.5 * camera_angle_x)
                )
                half = float(min(0.49, half))
                bbox = np.array(
                    [0.5 - half, 0.5 + half, 0.5 - half, 0.5 + half],
                    np.float32,
                )
            else:
                # legacy blob: the σ=400 Gaussian halo spans most of the
                # frustum; this box bounds the CORE, not the visible
                # extent (use compact=True when that matters)
                bbox = np.array([0.30, 0.70, 0.30, 0.70], np.float32)
            frames.append(
                {
                    "file_path": f"{split}/{name}",
                    "transform_matrix": c2w.tolist(),
                    "expression": expr.tolist(),
                    "bbox": bbox.tolist(),
                }
            )
            frame_id += 1
        with open(os.path.join(outdir, f"transforms_{split}.json"), "w") as f:
            json.dump(
                {
                    "camera_angle_x": camera_angle_x,
                    "intrinsics": intrinsics.tolist(),
                    "frames": frames,
                },
                f,
            )

    # index_map.npy: dataset order -> shuffled-train order (identity here).
    index_map = np.stack(
        [np.arange(n_train + n_val + n_test),
         np.concatenate([np.arange(n_train), -np.ones(n_val + n_test, int)])],
        axis=-1,
    )
    np.save(os.path.join(outdir, "index_map.npy"), index_map)
    return outdir
