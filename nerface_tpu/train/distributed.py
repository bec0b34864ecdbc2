"""Multi-process (multi-host) distributed initialization and data plumbing.

The reference is strictly single-process/single-device (SURVEY §2.2:
`train_transformed_rays.py:80-83` is a bare cuda-else-cpu check); this
module is the TPU-native scale-out story beyond one host: each process owns
its local chips, `jax.distributed.initialize` joins them into one global
device set, and the existing data-parallel `shard_map` train step
(`train/step.py`) runs unchanged over a process-spanning mesh — XLA routes
the gradient all-reduce over ICI within a host and DCN across hosts.

The one genuinely multi-process concern is data: a `jit`-ed function over a
process-spanning mesh must be fed global `jax.Array`s, but each process
only holds host-local numpy data. `global_batch` assembles them with
`jax.make_array_from_process_local_data`. Every process draws the SAME
host-side sample stream (the feeds are seeded), so slicing the global batch
by process keeps the global step bit-identical to the single-process mesh
step — which is exactly what the multi-process dryrun asserts
(`__graft_entry__.dryrun_multichip(n, n_processes=...)`).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import numpy as np

#: batch entries carrying a per-ray leading axis (sharded over the mesh);
#: everything else (expression vector, latent index) is replicated.
RAY_KEYS = frozenset({
    "ray_origins", "ray_directions", "target_rgb", "background_rgb",
    "pixel_indices", "ray_index",
})


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Optional[Iterable[int]] = None,
) -> None:
    """Join this process into the global device set.

    Call before any other JAX use (backend init pins the topology). On TPU
    pods the three arguments are normally inferable from the environment
    and may be None-equivalent; they are explicit here because the CLI
    drives CPU/mixed setups too."""
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def is_primary() -> bool:
    """True on the process that should own logging/checkpoint IO."""
    return jax.process_index() == 0


def global_data_mesh(data_axis: str = "data") -> jax.sharding.Mesh:
    """A 1-D mesh over every device of every process."""
    return jax.sharding.Mesh(np.asarray(jax.devices()), (data_axis,))


def process_ray_slice(n_rays: int) -> slice:
    """This process's contiguous slice of the global ray axis.

    Mesh order is `jax.devices()` order, which groups devices by process
    id, so the per-process block of a `P('data')`-sharded axis is
    contiguous: n_rays must divide evenly over processes (it already must
    divide over devices for shard_map)."""
    nproc = jax.process_count()
    if n_rays % nproc:
        raise ValueError(f"{n_rays} rays not divisible by {nproc} processes")
    per = n_rays // nproc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def global_batch(
    batch: Dict[str, np.ndarray],
    mesh: jax.sharding.Mesh,
    data_axis: str = "data",
) -> Dict[str, jax.Array]:
    """Host-local numpy batch → global jax.Arrays on a process-spanning mesh.

    `batch` holds the FULL global sample (identical on every process, from
    the seed-shared feed); ray-axis entries are sliced to this process's
    block and assembled into a `P(data_axis)`-sharded global array;
    everything else becomes a fully-replicated global array."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return {k: jax.device_put(v) for k, v in batch.items()}

    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if k in RAY_KEYS:
            sharding = NamedSharding(mesh, P(data_axis))
            out[k] = jax.make_array_from_process_local_data(
                sharding, v[process_ray_slice(v.shape[0])], v.shape
            )
        else:
            sharding = NamedSharding(mesh, P())
            out[k] = jax.make_array_from_process_local_data(
                sharding, v, v.shape
            )
    return out
