"""Host-side ray-batch feed.

Replaces the reference's per-step host work (frame pick, full-frame ray
bundle, importance draw, gathers — `train_transformed_rays.py:289-331`)
with a prefetching producer that:

* never builds the full H×W ray bundle: pixel directions in the camera
  frame are precomputed once, and only the ~2048 selected pixels are
  gathered and rotated by the frame's pose (a (k,3)@(3,3) matmul);
* draws importance-sampled pixels via Gumbel top-k (see data/sampler.py);
* runs in a background thread with a bounded queue so the TPU never waits
  on the host.

Each batch carries ray origins/directions, target RGB, background RGB, the
expression vector, and the frame's latent-code index (the gather from the
trainable latent table happens inside the jitted train step).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from nerface_tpu.data.flame import FlameDataset
from nerface_tpu.data.sampler import build_importance_maps, sample_ray_indices


class RayFeed:
    def __init__(
        self,
        dataset: FlameDataset,
        num_rays: int,
        background: Optional[np.ndarray] = None,
        seed: int = 42,
        bbox_p: float = 0.9,
        prefetch: int = 4,
        start_batch: int = 0,
    ):
        self.dataset = dataset
        self.num_rays = num_rays
        # Counter-based stream: batch b's draws depend only on
        # (seed, b), so a resumed run constructed with
        # start_batch=state.step continues the EXACT sample sequence an
        # uninterrupted run would have produced, instead of replaying
        # the stream from batch 0.
        self.seed = int(seed)
        self._batch_index = int(start_batch)
        H, W = dataset.H, dataset.W
        intr = np.asarray(dataset.intrinsics, np.float32)
        if intr.ndim == 0:
            intr = np.array([intr, intr, 0.5, 0.5], np.float32)
        ii, jj = np.meshgrid(
            np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32),
            indexing="xy",
        )
        self._dirs_cam = np.stack(
            [
                (ii - W * intr[2]) / intr[0],
                -(jj - H * intr[3]) / intr[1],
                -np.ones_like(ii),
            ],
            axis=-1,
        ).reshape(-1, 3)
        self._images_flat = dataset.images.reshape(dataset.images.shape[0], -1, dataset.images.shape[-1])
        self._background_flat = (
            background.reshape(-1, background.shape[-1]) if background is not None else None
        )
        self._maps = build_importance_maps(
            dataset.bboxes, H, W, dataset.i_train, p=bbox_p
        )
        self._train_pos = {int(g): i for i, g in enumerate(dataset.i_train)}
        # Native C++ sampler/assembler (Gumbel top-k + fused gather/rotate);
        # numpy path when the toolchain is unavailable.
        from nerface_tpu import native as _native

        self._native = _native if _native.available() else None
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- single-batch production -------------------------------------------

    def _batch_rng(self) -> np.random.RandomState:
        """Fresh generator keyed by (seed, batch index) — see __init__."""
        ss = np.random.SeedSequence([self.seed, self._batch_index])
        return np.random.RandomState(ss.generate_state(4))

    def sample_batch(self) -> Dict[str, np.ndarray]:
        ds = self.dataset
        rng = self._batch_rng()
        self._batch_index += 1
        img_idx = int(rng.choice(ds.i_train))
        train_pos = self._train_pos[img_idx]

        if self._native is not None:
            seed = int(rng.randint(0, 2**63 - 1))
            sel = self._native.gumbel_topk(
                self._maps[train_pos], self.num_rays, seed
            )
            ro, rd, target, bg = self._native.assemble_batch(
                sel,
                self._dirs_cam,
                self._images_flat[img_idx],
                ds.poses[img_idx],
                self._background_flat,
            )
        else:
            sel = sample_ray_indices(
                rng, self._maps[train_pos], self.num_rays
            )
            pose = ds.poses[img_idx]
            dirs = self._dirs_cam[sel]
            rd = (dirs @ pose[:3, :3].T.astype(np.float32)).astype(np.float32)
            ro = np.broadcast_to(pose[:3, 3].astype(np.float32), rd.shape).copy()
            target = self._images_flat[img_idx][sel, :3]
            bg = (
                self._background_flat[sel, :3].astype(np.float32)
                if self._background_flat is not None
                else None
            )

        batch = {
            "ray_origins": ro,
            "ray_directions": rd,
            "target_rgb": target,
            "expression": ds.expressions[img_idx],
            "latent_index": np.int32(img_idx),
            "frame_index": np.int32(img_idx),
            "pixel_indices": sel.astype(np.int32),
        }
        if bg is not None:
            batch["background_rgb"] = bg
        return batch

    # -- prefetch loop -------------------------------------------------------

    def _worker(self):
        while not self._stop.is_set():
            batch = self.sample_batch()
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.25)
                    break
                except queue.Full:
                    continue

    def start(self) -> "RayFeed":
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            self._thread = None

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        if self._thread is not None:
            return self._queue.get()
        return self.sample_batch()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
