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

    def _draw(self, k_frame: jax.Array, k_pix: jax.Array) -> Dict[str, jnp.ndarray]:
        """One frame + `num_rays` pixels from its importance map.

        Gumbel top-k over the map == sampling without replacement
        proportional to the map.  Shared by the single-device and mesh
        samplers so their draws are keyed identically."""
        t = jax.random.randint(k_frame, (), 0, self.images_u8.shape[0])
        g = jax.random.gumbel(k_pix, self.log_maps.shape[-1:], jnp.float32)
        _, sel = jax.lax.top_k(self.log_maps[t] + g, self.num_rays)

        pose = self.poses[t]
        rd = self.dirs_cam[sel] @ pose[:3, :3].T
        ro = jnp.broadcast_to(pose[:3, 3], rd.shape)
        target = self.images_u8[t][sel].astype(jnp.float32) * (1.0 / 255.0)

        batch = {
            "ray_origins": ro,
            "ray_directions": rd,
            "target_rgb": target,
            "expression": self.expressions[t],
            "latent_index": self.i_train[t],
            "frame_index": self.i_train[t],
            "pixel_indices": sel.astype(jnp.int32),
        }
        if self.background is not None:
            batch["background_rgb"] = self.background[sel]
        return batch

    def make_sampler(self):
        """Return a jitted `sample(key) -> batch` drawing one train frame
        uniformly and `num_rays` pixels without replacement from its bbox
        importance map."""
        return jax.jit(self.unjit_sampler())

    def unjit_sampler(self):
        """The same `sample(key) -> batch` WITHOUT the jit wrapper — for
        composing inside a larger jitted program (the K-steps-per-dispatch
        train scan, `train/step.py::make_train_megastep`), where batch k is
        drawn in-scan with the feed's counter-keyed stream."""

        def sample(key: jax.Array) -> Dict[str, jnp.ndarray]:
            k_frame, k_pix = jax.random.split(key)
            return self._draw(k_frame, k_pix)

        return sample

    def make_mesh_sampler(self, mesh, data_axis: str = "data", jit: bool = True):
        """Per-device sampling for a data-parallel mesh — the feed's target
        regime (many chips per host, where a host feed would bottleneck).

        One frame is drawn per step (shared across the mesh: the train
        step replicates the expression/latent entries, `train/step.py`
        in_specs), then every device draws its OWN `num_rays` pixels from
        that frame's importance map with a per-device fold of the step
        key. The returned global batch has n_devices x num_rays rays,
        laid out so device d's shard IS its own draw (sharding constraint
        over `data_axis`) — no cross-device gather ever materializes.
        Deterministic: block d equals a single-device draw with
        fold_in(key_pix, d)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(mesh.devices.size)
        ray_sharding = NamedSharding(mesh, P(data_axis))
        rep_sharding = NamedSharding(mesh, P())
        # one shared definition of "per-ray batch entry" — a key added
        # to one site but not the other would silently replicate instead
        # of shard (or vice versa) on multi-device runs
        from nerface_tpu.train.distributed import RAY_KEYS as ray_keys

        def sample(key: jax.Array) -> Dict[str, jnp.ndarray]:
            k_frame, k_pix = jax.random.split(key)
            per_dev = jax.vmap(
                lambda d: self._draw(k_frame, jax.random.fold_in(k_pix, d))
            )(jnp.arange(n_dev))
            out = {}
            for k, v in per_dev.items():
                if k in ray_keys:
                    out[k] = jax.lax.with_sharding_constraint(
                        v.reshape((n_dev * self.num_rays,) + v.shape[2:]),
                        ray_sharding,
                    )
                else:
                    # identical across devices (same k_frame); keep one
                    out[k] = jax.lax.with_sharding_constraint(
                        v[0], rep_sharding
                    )
            return out

        return jax.jit(sample) if jit else sample

    def make_process_sampler(self, mesh, data_axis: str = "data"):
        """Multi-process variant of `make_mesh_sampler`: a sampler whose
        output is a GLOBAL batch over a process-spanning mesh, with zero
        per-step host work or host→device ray transfer.

        A process-spanning jit cannot close over this process's committed
        feed residents, so each process instead runs a PROCESS-LOCAL jit
        that draws the blocks owned by its own devices — device with
        global mesh position g draws with `fold_in(k_pix, g)`, exactly
        the stream `make_mesh_sampler` assigns to that position — sharded
        over a local sub-mesh so every local device computes (and holds)
        its own block. The local shards are then reinterpreted as the
        global array's shards via `make_array_from_single_device_arrays`
        (a metadata operation: no copy, no host round trip). Result: the
        global batch is bit-identical to the single-process mesh
        sampler's, which is what makes the multi-process device-feed run
        leave the same checkpoint as the single-process one
        (tests/test_distributed.py)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from nerface_tpu.train.distributed import RAY_KEYS as ray_keys

        n_dev = int(mesh.devices.size)
        flat = list(mesh.devices.reshape(-1))
        pid = jax.process_index()
        local = [(g, d) for g, d in enumerate(flat) if d.process_index == pid]
        if not local:
            raise ValueError("mesh has no devices on this process")
        local_devs = np.asarray([d for _, d in local])
        global_ids = np.asarray([g for g, _ in local], np.int32)
        n_local = len(local)

        lmesh = Mesh(local_devs, (data_axis,))
        ray_local = NamedSharding(lmesh, P(data_axis))
        rep_local = NamedSharding(lmesh, P())
        ray_global = NamedSharding(mesh, P(data_axis))
        rep_global = NamedSharding(mesh, P())

        @jax.jit
        def local_sample(key: jax.Array) -> Dict[str, jnp.ndarray]:
            k_frame, k_pix = jax.random.split(key)
            per_dev = jax.vmap(
                lambda g: self._draw(k_frame, jax.random.fold_in(k_pix, g))
            )(jnp.asarray(global_ids))
            out = {}
            for k, v in per_dev.items():
                if k in ray_keys:
                    out[k] = jax.lax.with_sharding_constraint(
                        v.reshape((n_local * self.num_rays,) + v.shape[2:]),
                        ray_local,
                    )
                else:
                    out[k] = jax.lax.with_sharding_constraint(v[0], rep_local)
            return out

        def sample(key: jax.Array) -> Dict[str, jax.Array]:
            lb = local_sample(key)
            out = {}
            for k, v in lb.items():
                shards = [s.data for s in v.addressable_shards]
                if k in ray_keys:
                    gshape = (n_dev * self.num_rays,) + v.shape[1:]
                    out[k] = jax.make_array_from_single_device_arrays(
                        gshape, ray_global, shards
                    )
                else:
                    out[k] = jax.make_array_from_single_device_arrays(
                        v.shape, rep_global, shards
                    )
            return out

        return sample
