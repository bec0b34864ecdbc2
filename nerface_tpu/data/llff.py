"""LLFF (real forward-facing) dataset loader — equivalent of
`nerf/load_llff.py` (stock nerf-pytorch loader; SURVEY.md §2 component 7).

Reads `poses_bounds.npy` + `images/`, applies the LLFF axis fix, bd-factor
rescaling, pose recentering, optional spherification, and builds the spiral
render path (`load_llff.py:278-356`). Deviation: `_minify` (:12-66) shells
out to ImageMagick `mogrify`; here downsampled image sets are generated
with PIL area resize — same `images_{factor}` cache-directory contract.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import numpy as np


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.linalg.norm(x)


def viewmatrix(z: np.ndarray, up: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(3, 4) camera matrix from forward/up/position (`load_llff.py:143-149`)."""
    vec2 = _normalize(z)
    vec0 = _normalize(np.cross(up, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], 1)


def poses_avg(poses: np.ndarray) -> np.ndarray:
    """Average pose (`load_llff.py:157-166`)."""
    hwf = poses[0, :3, -1:]
    center = poses[:, :3, 3].mean(0)
    vec2 = _normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return np.concatenate([viewmatrix(vec2, up, center), hwf], 1)


def recenter_poses(poses: np.ndarray) -> np.ndarray:
    """Recenter so the average pose is the identity (`load_llff.py:185-197`)."""
    poses_ = poses + 0
    bottom = np.reshape([0, 0, 0, 1.0], [1, 4])
    c2w = np.concatenate([poses_avg(poses)[:3, :4], bottom], -2)
    bottom = np.tile(np.reshape(bottom, [1, 1, 4]), [poses.shape[0], 1, 1])
    hom = np.concatenate([poses[:, :3, :4], bottom], -2)
    hom = np.linalg.inv(c2w) @ hom
    poses_[:, :3, :4] = hom[:, :3, :4]
    return poses_


def render_path_spiral(
    c2w: np.ndarray, up: np.ndarray, rads, focal: float, zdelta: float,
    zrate: float, rots: int, N: int,
) -> List[np.ndarray]:
    """Spiral render path (`load_llff.py:169-182`)."""
    render_poses = []
    rads = np.array(list(rads) + [1.0])
    hwf = c2w[:, 4:5]
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, N + 1)[:-1]:
        c = np.dot(
            c2w[:3, :4],
            np.array(
                [
                    0.5 * np.cos(theta),
                    -0.5 * np.sin(theta),
                    -np.sin(theta * zrate / 2),
                    1.0,
                ]
            )
            * rads,
        )
        z = _normalize(c - np.dot(c2w[:3, :4], np.array([0, 0, -focal, 1.0])))
        render_poses.append(np.concatenate([viewmatrix(z, up, c), hwf], 1))
    return render_poses


def spherify_poses(
    poses: np.ndarray, bds: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Recenter to the point of minimum line distance and build a circular
    render path (`load_llff.py:200-275`)."""

    def p34_to_44(p):
        return np.concatenate(
            [p, np.tile(np.reshape(np.eye(4)[-1, :], [1, 1, 4]), [p.shape[0], 1, 1])],
            1,
        )

    rays_d = poses[:, :3, 2:3]
    rays_o = poses[:, :3, 3:4]

    a_i = np.eye(3) - rays_d * np.transpose(rays_d, [0, 2, 1])
    b_i = -a_i @ rays_o
    pt_mindist = np.squeeze(
        -np.linalg.inv((np.transpose(a_i, [0, 2, 1]) @ a_i).mean(0)) @ b_i.mean(0)
    )

    center = pt_mindist
    up = (poses[:, :3, 3] - center).mean(0)
    vec0 = _normalize(up)
    vec1 = _normalize(np.cross([0.1, 0.2, 0.3], vec0))
    vec2 = _normalize(np.cross(vec0, vec1))
    c2w = np.stack([vec1, vec2, vec0, center], 1)

    poses_reset = np.linalg.inv(p34_to_44(c2w[None])) @ p34_to_44(poses[:, :3, :4])
    rad = np.sqrt(np.mean(np.sum(np.square(poses_reset[:, :3, 3]), -1)))
    sc = 1.0 / rad
    poses_reset[:, :3, 3] *= sc
    bds = bds * sc
    rad *= sc

    centroid = np.mean(poses_reset[:, :3, 3], 0)
    zh = centroid[2]
    radcircle = np.sqrt(rad**2 - zh**2)
    new_poses = []
    for th in np.linspace(0.0, 2.0 * np.pi, 120):
        camorigin = np.array([radcircle * np.cos(th), radcircle * np.sin(th), zh])
        up_c = np.array([0, 0, -1.0])
        vec2 = _normalize(camorigin)
        vec0 = _normalize(np.cross(vec2, up_c))
        vec1 = _normalize(np.cross(vec2, vec0))
        new_poses.append(np.stack([vec0, vec1, vec2, camorigin], 1))
    new_poses = np.stack(new_poses, 0)
    new_poses = np.concatenate(
        [new_poses, np.broadcast_to(poses[0, :3, -1:], new_poses[:, :3, -1:].shape)],
        -1,
    )
    poses_reset = np.concatenate(
        [
            poses_reset[:, :3, :4],
            np.broadcast_to(poses[0, :3, -1:], poses_reset[:, :3, -1:].shape),
        ],
        -1,
    )
    return poses_reset, new_poses, bds


def _minify(basedir: str, factor: int) -> str:
    """Generate `images_{factor}/` with PIL area downsampling (replaces the
    reference's ImageMagick `mogrify` subprocess, `load_llff.py:12-66`)."""
    from PIL import Image

    outdir = os.path.join(basedir, f"images_{factor}")
    srcdir = os.path.join(basedir, "images")
    names = sorted(
        f for f in os.listdir(srcdir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if os.path.exists(outdir):
        existing = [
            f for f in os.listdir(outdir)
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        ]
        if len(existing) == len(names):
            return outdir
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        with Image.open(os.path.join(srcdir, name)) as im:
            w, h = im.size
            im.resize((w // factor, h // factor), Image.LANCZOS).save(
                os.path.join(outdir, os.path.splitext(name)[0] + ".png")
            )
    return outdir


def _load_data(basedir: str, factor: Optional[int] = None):
    from PIL import Image

    poses_arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
    poses = poses_arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
    bds = poses_arr[:, -2:].transpose([1, 0])

    if factor is not None and factor != 1:
        imgdir = _minify(basedir, factor)
    else:
        factor = 1
        imgdir = os.path.join(basedir, "images")

    imgfiles = [
        os.path.join(imgdir, f)
        for f in sorted(os.listdir(imgdir))
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    ]
    if poses.shape[-1] != len(imgfiles):
        raise ValueError(
            f"Mismatch between imgs {len(imgfiles)} and poses {poses.shape[-1]}"
        )

    imgs = []
    for f in imgfiles:
        with Image.open(f) as im:
            imgs.append(np.asarray(im)[..., :3] / 255.0)
    imgs = np.stack(imgs, -1)

    sh = imgs.shape[:2]
    poses[:2, 4, :] = np.array(sh).reshape([2, 1])
    poses[2, 4, :] = poses[2, 4, :] * 1.0 / factor
    return poses, bds, imgs


@dataclasses.dataclass
class LLFFDataset:
    images: np.ndarray        # (N, H, W, 3)
    poses: np.ndarray         # (N, 3, 5) — last column is [H, W, focal]
    bds: np.ndarray           # (N, 2) near/far bounds
    render_poses: np.ndarray  # spiral or circular path
    i_test: int

    @property
    def hwf(self):
        h, w, f = self.poses[0, :3, -1]
        return [int(h), int(w), float(f)]

    def as_tuple(self):
        return self.images, self.poses, self.bds, self.render_poses, self.i_test


def load_llff_data(
    basedir: str,
    factor: int = 4,
    recenter: bool = True,
    bd_factor: Optional[float] = 0.75,
    spherify: bool = False,
    path_zflat: bool = False,
) -> LLFFDataset:
    poses, bds, imgs = _load_data(basedir, factor=factor)

    # LLFF axis fix: [down right back] -> [right up back] (:290)
    poses = np.concatenate([poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
    poses = np.moveaxis(poses, -1, 0).astype(np.float32)
    images = np.moveaxis(imgs, -1, 0).astype(np.float32)
    bds = np.moveaxis(bds, -1, 0).astype(np.float32)

    sc = 1.0 if bd_factor is None else 1.0 / (bds.min() * bd_factor)
    poses[:, :3, 3] *= sc
    bds = bds * sc

    if recenter:
        poses = recenter_poses(poses)

    if spherify:
        poses, render_poses, bds = spherify_poses(poses, bds)
    else:
        c2w = poses_avg(poses)
        up = _normalize(poses[:, :3, 1].sum(0))
        close_depth, inf_depth = bds.min() * 0.9, bds.max() * 5.0
        dt = 0.75
        focal = 1.0 / (((1.0 - dt) / close_depth + dt / inf_depth))
        zdelta = close_depth * 0.2
        tt = poses[:, :3, 3]
        rads = np.percentile(np.abs(tt), 90, 0)
        c2w_path = c2w
        N_views, N_rots = 120, 2
        if path_zflat:
            zloc = -close_depth * 0.1
            c2w_path[:3, 3] = c2w_path[:3, 3] + zloc * c2w_path[:3, 2]
            rads[2] = 0.0
            N_rots = 1
            N_views //= 2
        render_poses = render_path_spiral(
            c2w_path, up, rads, focal, zdelta, zrate=0.5, rots=N_rots, N=N_views
        )

    render_poses = np.array(render_poses).astype(np.float32)
    c2w = poses_avg(poses)
    dists = np.sum(np.square(c2w[:3, 3] - poses[:, :3, 3]), -1)
    i_test = int(np.argmin(dists))

    return LLFFDataset(
        images=images.astype(np.float32),
        poses=poses.astype(np.float32),
        bds=bds,
        render_poses=render_poses,
        i_test=i_test,
    )
