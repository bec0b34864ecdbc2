"""Fully device-resident ray feed: per-step frame pick, importance-sampled
pixel draw (Gumbel top-k), and ray assembly as ONE jitted function — no
host work or host→device transfer per step.

The host `RayFeed` (data/pipeline.py) reproduces the reference's numpy
sampling pipeline and is the default; this feed is the scale-out variant
(SURVEY.md §2.2: "device-side Gumbel top-k is an alternative but changes
RNG semantics"). Images are stored on device as uint8 ((N·H·W·3) bytes —
a 5000-frame 512² dataset is ~3.9 GB) and normalized after the gather.

The sampled batch dict is identical in schema to RayFeed's, so it drops
into `make_train_step` unchanged; under a mesh the same sampler runs with
a per-device key and each chip draws its own ray batch.

Measured single-chip: ~21 ms/step vs the host feed's ~17 ms — the 262k-wide
top_k shares the one TPU core with the train step, while the host feed's
sampling runs concurrently on CPU threads. Use this feed when the host
would bottleneck (many chips per host, or hosts without the C++ sampler).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerface_tpu.data.flame import FlameDataset
from nerface_tpu.data.sampler import build_importance_maps


class DeviceRayFeed:
    def __init__(
        self,
        dataset: FlameDataset,
        num_rays: int,
        background: Optional[np.ndarray] = None,
        bbox_p: float = 0.9,
    ):
        self.num_rays = num_rays
        H, W = dataset.H, dataset.W
        intr = np.asarray(dataset.intrinsics, np.float32)
        if intr.ndim == 0:
            intr = np.array([intr, intr, 0.5, 0.5], np.float32)
        ii, jj = np.meshgrid(
            np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32),
            indexing="xy",
        )
        dirs = np.stack(
            [
                (ii - W * intr[2]) / intr[0],
                -(jj - H * intr[3]) / intr[1],
                -np.ones_like(ii),
            ],
            axis=-1,
        ).reshape(-1, 3)

        maps = build_importance_maps(
            dataset.bboxes, H, W, dataset.i_train, p=bbox_p
        )

        # device residents
        self.dirs_cam = jnp.asarray(dirs)
        self.images_u8 = jnp.asarray(
            np.clip(
                dataset.images[dataset.i_train][..., :3] * 255.0, 0, 255
            ).astype(np.uint8).reshape(len(dataset.i_train), -1, 3)
        )
        self.poses = jnp.asarray(
            dataset.poses[dataset.i_train][:, :3, :4].astype(np.float32)
        )
        self.expressions = jnp.asarray(
            dataset.expressions[dataset.i_train].astype(np.float32)
        )
        self.i_train = jnp.asarray(np.asarray(dataset.i_train, np.int32))
        self.log_maps = jnp.asarray(
            np.log(np.maximum(maps, 1e-300)).astype(np.float32)
        )
        self.background = (
            jnp.asarray(
                np.asarray(background, np.float32).reshape(-1, 3)
            )
            if background is not None
            else None
        )

    def make_sampler(self):
        """Return a jitted `sample(key) -> batch` drawing one train frame
        uniformly and `num_rays` pixels without replacement from its bbox
        importance map."""
        num_rays = self.num_rays
        dirs_cam = self.dirs_cam
        images_u8 = self.images_u8
        poses = self.poses
        expressions = self.expressions
        i_train = self.i_train
        log_maps = self.log_maps
        background = self.background
        n_train = images_u8.shape[0]

        @jax.jit
        def sample(key: jax.Array) -> Dict[str, jnp.ndarray]:
            k_frame, k_pix = jax.random.split(key)
            t = jax.random.randint(k_frame, (), 0, n_train)

            # Gumbel top-k over the frame's importance map == sampling
            # without replacement proportional to the map
            g = jax.random.gumbel(k_pix, log_maps.shape[-1:], jnp.float32)
            _, sel = jax.lax.top_k(log_maps[t] + g, num_rays)

            pose = poses[t]
            rd = dirs_cam[sel] @ pose[:3, :3].T
            ro = jnp.broadcast_to(pose[:3, 3], rd.shape)
            target = images_u8[t][sel].astype(jnp.float32) * (1.0 / 255.0)

            batch = {
                "ray_origins": ro,
                "ray_directions": rd,
                "target_rgb": target,
                "expression": expressions[t],
                "latent_index": i_train[t],
                "frame_index": i_train[t],
                "pixel_indices": sel.astype(jnp.int32),
            }
            if background is not None:
                batch["background_rgb"] = background[sel]
            return batch

        return sample
