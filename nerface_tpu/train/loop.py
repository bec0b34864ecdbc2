"""The training loop — equivalent of `train_transformed_rays.py:24-575`.

Host side: config/data load, model build, background/latent setup, the
prefetching ray feed, periodic validation renders, TensorBoard scalars and
checkpoints.  Device side: one jitted step (train/step.py), optionally
shard_map'd over a data mesh.  Resume works from both native (orbax) and
reference torch checkpoints.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerface_tpu.config import CfgNode, FeatureFlags, load_config
from nerface_tpu.data import RayFeed, load_flame_data
from nerface_tpu.data.flame import FlameDataset
from nerface_tpu.models import build_model
from nerface_tpu.ops.math import mse2psnr
from nerface_tpu.render.pipeline import RenderSettings
from nerface_tpu.train import checkpoint as ckpt_lib
from nerface_tpu.train.state import TrainState, create_train_state
from nerface_tpu.train.step import make_train_step
from nerface_tpu.utils.tb import ScalarWriter


def _host_rss_gb() -> float:
    """This process's resident set in GiB (0.0 where /proc is missing so
    the TB scalar is always writable)."""
    from nerface_tpu.utils.profiling import host_rss_gb

    return host_rss_gb() or 0.0


def build_models_from_cfg(cfg):
    """Coarse + (optional) fine model, reproducing the reference's
    constructor quirks (fine model gets the *coarse* num_layers/hidden_size;
    skip_connect_every is never forwarded) —
    `train_transformed_rays.py:100-124`."""
    model_coarse = build_model(cfg.models.coarse)
    model_fine = None
    if "fine" in cfg.models:
        model_fine = build_model(
            cfg.models.fine,
            num_layers=cfg.models.coarse.num_layers,
            hidden_size=cfg.models.coarse.hidden_size,
        )
    return model_coarse, model_fine


def setup_background(
    dataset: FlameDataset, flags: FeatureFlags
) -> Optional[np.ndarray]:
    """Fixed background: GT `bg/00050.png`. Trainable background: mean of
    train frames, optionally blurred (`train_transformed_rays.py:143-170`)."""
    if flags.train_background:
        avg = dataset.images[dataset.i_train].mean(axis=0)
        if flags.blur_background:
            from nerface_tpu.utils.smoothing import gaussian_smooth

            avg = np.asarray(gaussian_smooth(jnp.asarray(avg), 11, 11.0))
        return avg.astype(np.float32)
    if flags.fixed_background:
        bg = dataset.load_background()
        assert bg.shape == dataset.images[dataset.i_train][0].shape, (
            bg.shape, dataset.images.shape)
        return bg
    return None


def validate(
    cfg,
    dataset: FlameDataset,
    model_coarse,
    model_fine,
    state: TrainState,
    background: Optional[np.ndarray],
    flags: FeatureFlags,
    writer: Optional[ScalarWriter],
    step: int,
    num_frames: int = 2,
    dtype=None,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Dict[str, float]:
    """Full-frame validation renders (`train_transformed_rays.py:427-549`).

    Reference quirks kept: only the first `num_frames`(=2) val frames are
    rendered but the summed loss divides by len(i_val) (:463,516); the
    latent code used for validation is zeros (:502).
    """
    from nerface_tpu.eval.renderer import render_full_frame

    settings = RenderSettings.from_cfg(cfg, mode="validation")
    use_bg = flags.train_background or flags.fixed_background
    bg = None
    if use_bg:
        bg_src = (
            state.params["background"]
            if state.params.get("background") is not None
            else (state.fixed_background if state.fixed_background is not None else background)
        )
        bg = jnp.asarray(bg_src)

    latent = (
        jnp.zeros(32) if (flags.train_latent_codes or flags.disable_latent_codes) else None
    )
    total_loss = 0.0
    coarse_loss = fine_loss = 0.0
    last = None
    t0 = time.time()
    for img_idx in dataset.i_val[:num_frames]:
        expr = jnp.asarray(dataset.expressions[img_idx])
        if flags.disable_expressions:
            expr = jnp.zeros_like(expr)
        out = render_full_frame(
            model_coarse, model_fine,
            state.params["coarse"], state.params.get("fine"),
            dataset.H, dataset.W, dataset.intrinsics,
            dataset.poses[img_idx][:3, :4],
            settings,
            key=jax.random.PRNGKey(int(step)),
            expressions=expr,
            latent_code=latent,
            background=bg,
            dtype=dtype,
            mesh=mesh,
        )
        target = dataset.images[img_idx][..., :3]
        coarse_loss = float(np.mean((np.asarray(out["rgb_coarse"]) - target) ** 2))
        if "rgb_fine" in out:
            fine_loss = float(np.mean((np.asarray(out["rgb_fine"]) - target) ** 2))
            # DELIBERATE reference quirk: train_transformed_rays.py:509-514
            # sets curr_loss = curr_fine_loss and then adds BOTH, so the
            # reference's validation/loss double-counts the fine MSE when
            # a fine model exists; reproduced for scalar parity.
            total_loss += fine_loss + fine_loss
        else:
            total_loss += coarse_loss
        last = (out, target)

    n_val = max(len(dataset.i_val), 1)
    loss = total_loss / n_val
    psnr = mse2psnr(loss)
    metrics = {"loss": loss, "psnr": psnr, "coarse_loss": coarse_loss,
               "fine_loss": fine_loss, "time": time.time() - t0}
    if writer is not None and last is not None:
        out, target = last
        writer.scalar("validation/loss", loss, step)
        writer.scalar("validation/coarse_loss", coarse_loss, step)
        writer.scalar("validation/psnr", psnr, step)
        writer.image("validation/rgb_coarse", np.asarray(out["rgb_coarse"]), step)
        if "rgb_fine" in out:
            writer.scalar("validation/fine_loss", fine_loss, step)
            writer.image("validation/rgb_fine", np.asarray(out["rgb_fine"]), step)
        writer.image("validation/img_target", target, step)
        if bg is not None:
            writer.image("validation/background", np.asarray(bg), step)
            writer.image(
                "validation/weights", np.asarray(out["bg_weight"]), step,
                dataformats="HW",
            )
    return metrics


def _effective_window(requested, cadences, multiprocess: bool) -> int:
    """Largest execution-window size K ≤ `requested` that divides every
    active cadence, so print/validate/save boundaries always land on a
    window end (the loop bookkeeps at step j with the state AFTER step j —
    exactly the sequential loop's semantics).

    Multi-process runs stay at K=1: the host feed's `global_batch`
    process-exchange happens per step outside jit."""
    if multiprocess:
        return 1
    cad = [int(c) for c in cadences if c and int(c) > 0]
    k = max(1, int(requested))
    if cad:
        k = min([k] + cad)
    while k > 1 and any(c % k for c in cad):
        k -= 1
    return k


def train(
    cfg: CfgNode,
    load_checkpoint: str = "",
    max_iters: Optional[int] = None,
    dataset: Optional[FlameDataset] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    log: bool = True,
    export_torch: bool = False,
    dtype=None,
    device_feed: Optional[bool] = None,
    steps_per_execute: Optional[int] = None,
) -> TrainState:
    """Run training per the config; returns the final TrainState.

    Multi-process (`jax.distributed`-initialized callers): pass the
    process-spanning mesh; every process must run this function with the
    same config/seed.  Each draws the identical global sample stream and
    contributes its local ray block (`train/distributed.py::global_batch`);
    logging/checkpoint IO happens on process 0 only, and validation renders
    process-locally (full-frame eval does not span hosts).

    `steps_per_execute` (or `cfg.experiment.steps_per_execute`) sets the
    execution window K: K train steps run as ONE dispatched `lax.scan`
    (`train/step.py::make_train_megastep`), with one host→device batch
    upload per window instead of per step, metric pulls and checkpoint
    writes on background threads, and a single-transfer state pull for
    saves. Bit-parity with K=1 is pinned by tests/test_megastep.py; the
    measured per-cause ledger is in BENCH_NOTES.md (round 4). Default:
    auto — 50 for production-length schedules, 1 for short runs.
    """
    flags = FeatureFlags.from_cfg(cfg)
    if device_feed is None:
        # config-selectable (experiment.device_feed: True): the host feed
        # leaks ~its per-step batch bytes on the tunneled backend
        # (BENCH_NOTES.md round 4 — proportional to bytes uploaded, not
        # dispatches), so long schedules should sample on device
        device_feed = bool(cfg.experiment.get("device_feed") or False)
    multiprocess = jax.process_count() > 1
    primary = jax.process_index() == 0

    if dataset is None:
        dataset = load_flame_data(
            cfg.dataset.basedir,
            half_res=cfg.dataset.half_res,
            testskip=cfg.dataset.testskip,
            cachedir=cfg.dataset.get("cachedir"),
        )

    seed = int(cfg.experiment.randomseed)
    np.random.seed(seed)

    model_coarse, model_fine = build_models_from_cfg(cfg)
    background = setup_background(dataset, flags)

    state, optimizer = create_train_state(
        jax.random.PRNGKey(seed), model_coarse, model_fine, cfg, flags,
        n_train=len(dataset.i_train),
        background=jnp.asarray(background) if background is not None else None,
    )

    logdir = os.path.join(str(cfg.experiment.logdir), str(cfg.experiment.id))
    writer = ScalarWriter(logdir, cfg=cfg, enabled=log and primary)

    # Resume: native orbax dir or reference torch .ckpt file.
    if load_checkpoint:
        if os.path.isdir(load_checkpoint):
            state = ckpt_lib.load_checkpoint(load_checkpoint, state)
        elif os.path.isfile(load_checkpoint):
            state = ckpt_lib.import_torch_weights(
                state, ckpt_lib.load_torch_checkpoint(load_checkpoint)
            )
        else:
            # a typo'd path silently restarting a long schedule from
            # scratch is far worse than dying here
            raise FileNotFoundError(
                f"--load-checkpoint path does not exist: {load_checkpoint!r}"
            )

    # canonical (torch-registration) parameter order for checkpoint
    # interop — params dicts that pass through jit come back key-sorted
    canonical_order = {
        "coarse": list(jax.eval_shape(model_coarse.init, jax.random.PRNGKey(0)))
    }
    if model_fine is not None:
        canonical_order["fine"] = list(
            jax.eval_shape(model_fine.init, jax.random.PRNGKey(0))
        )

    settings = RenderSettings.from_cfg(cfg, mode="train")
    from nerface_tpu.train.optim import flat_adam_donation_unsafe

    donate = not flat_adam_donation_unsafe(state.opt_state)
    if not donate and primary:
        print(
            "[train] flat_adam on the tunneled axon backend: buffer "
            "donation disabled (known donation-aliasing runtime failure "
            "at production batch size — BENCH_NOTES.md; repro in "
            "tools/perf/flat_adam_donation_repro.py)"
        )

    train_iters = int(max_iters if max_iters is not None else cfg.experiment.train_iters)
    validate_every = int(cfg.experiment.validate_every)
    save_every = int(cfg.experiment.save_every)
    print_every = int(cfg.experiment.print_every)

    # Execution-window size: explicit arg > config > auto (50 for
    # production-length schedules, where per-step host costs dominate the
    # tunnel — BENCH_NOTES.md round-4 ledger; 1 for short/test runs so
    # tiny trainings don't pay extra scan compiles).
    k_req = steps_per_execute
    if k_req is None:
        k_req = cfg.experiment.get("steps_per_execute")
    if k_req is None or str(k_req) == "auto":
        k_req = 50 if train_iters >= 2000 else 1
    k_exec = _effective_window(
        k_req, [print_every, validate_every, save_every], multiprocess
    )
    use_mega = k_exec > 1
    if use_mega and primary:
        print(f"[train] execution window: {k_exec} steps/dispatch")

    from nerface_tpu.train.step import make_train_megastep

    step_fn = mega_fn = None
    feed = None
    feed_base = jax.random.PRNGKey(seed + 1)
    if device_feed:
        # fully on-device sampling: frame pick + Gumbel top-k + gathers in
        # one jitted fn; no per-step host work (scale-out variant)
        from nerface_tpu.data.device_feed import DeviceRayFeed

        dfeed = DeviceRayFeed(
            dataset,
            num_rays=int(cfg.nerf.train.num_random_rays),
            background=background if flags.fixed_background else None,
        )
        # under a mesh every device draws its own ray batch in place
        # (feed's target regime: many chips per host)
        if use_mega:
            # the sampler runs INSIDE the train scan (one dispatch per K
            # steps, zero per-step host work), keyed by the same
            # counter-keyed stream the per-step feed would draw
            sample_fn = (
                dfeed.make_mesh_sampler(mesh, jit=False) if mesh is not None
                else dfeed.unjit_sampler()
            )
            mega_fn = make_train_megastep(
                model_coarse, model_fine, settings, flags, optimizer,
                mesh=mesh, dtype=dtype, donate=donate, sample_fn=sample_fn,
            )
        else:
            # multi-process: each process's local jit draws its own
            # devices' blocks of the global batch (same per-device key
            # folds as the single-process mesh sampler — bit-identical
            # stream), assembled into global arrays without any host
            # round trip (device_feed.make_process_sampler)
            sampler = (
                dfeed.make_process_sampler(mesh) if multiprocess
                else dfeed.make_mesh_sampler(mesh) if mesh is not None
                else dfeed.make_sampler()
            )
            feed_counter = int(state.step)  # counter-keyed: resume continues
            # the uninterrupted run's draw sequence (same design as RayFeed)

            class _DeviceFeedIter:
                def start(self):
                    return self

                def stop(self):
                    pass

                def __next__(self):
                    nonlocal feed_counter
                    sub = jax.random.fold_in(feed_base, feed_counter)
                    feed_counter += 1
                    return sampler(sub)

            feed = _DeviceFeedIter()
    else:
        feed = RayFeed(
            dataset,
            num_rays=int(cfg.nerf.train.num_random_rays),
            background=background if flags.fixed_background else None,
            seed=seed,
            # resume continues the uninterrupted run's exact sample
            # stream (counter-based draws), not a replay of batch 0
            start_batch=int(state.step),
        ).start()
        if use_mega:
            mega_fn = make_train_megastep(
                model_coarse, model_fine, settings, flags, optimizer,
                mesh=mesh, dtype=dtype, donate=donate,
            )
    if not use_mega:
        step_fn = make_train_step(
            model_coarse, model_fine, settings, flags, optimizer, mesh=mesh,
            dtype=dtype, donate=donate,
        )

    if multiprocess:
        # Initial state lives on this process's default device; a committed
        # local array cannot enter a process-spanning jit. Hand numpy to the
        # first step instead — jit replicates it over the global mesh (every
        # process constructed the identical state from the shared seed).
        state = jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "sharding") else x, state
        )

    # Counter-based step keys (fold_in by iteration) instead of a
    # sequential split chain: a resumed run draws the SAME per-step
    # randomness the uninterrupted run would have at each iteration.
    base_key = jax.random.PRNGKey(seed)
    start_iter = int(state.step)
    t_start = time.time()
    rays_per_step = int(cfg.nerf.train.num_random_rays)
    if device_feed and mesh is not None:
        # mesh device feed: every device draws its OWN num_random_rays
        # (device_feed.py make_mesh_sampler), so a step consumes
        # n_devices x num_random_rays rays
        rays_per_step *= int(mesh.devices.size)
    metrics = {}

    # -- background IO: metric pulls + checkpoint writes off the dispatch
    # thread. On the tunneled backend every host read is a round trip
    # (~0.05-0.3 s); the round-4 ledger (tools/perf/loop_breakdown.py)
    # measured per-print float() pulls at 12.5 ms/step and a per-leaf
    # orbax save at 20 s — both now overlap training.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    io_pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="train-log")

    # -- async validation: the full-frame render (~2.5 s at 512² on the
    # tunneled chip, the last synchronous cost in the round-4 sustained
    # ledger) runs on a side thread from a snapshot of the post-boundary
    # params, so train windows keep dispatching. Snapshot = jnp.copy per
    # leaf (a device-side copy dispatch): the next window may DONATE the
    # state's buffers, so the render must own its own. Default: on for
    # windowed (production) single-process runs; `experiment.async_val`
    # overrides. Metrics are bit-identical to the synchronous call — the
    # snapshot is the same post-step-j state (tests/test_async_val.py).
    async_val = cfg.experiment.get("async_val")
    if async_val is None:
        async_val = use_mega
    async_val = bool(async_val) and not multiprocess
    val_pool = None
    val_pending: deque = deque()
    if async_val:
        val_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="train-val"
        )

    ckpt_writer = None
    flatten_state = None
    torch_export = None
    if not multiprocess:
        flatten_state, unflatten_state = ckpt_lib.make_state_flattener(state)
        ckpt_writer = ckpt_lib.AsyncCheckpointWriter(unflatten_state)
        if export_torch and primary:
            from nerface_tpu.train.schedule import from_cfg as _sched

            _schedule = _sched(cfg)

            def torch_export(host_state, m):
                ckpt_lib.export_torch_checkpoint(
                    os.path.join(
                        logdir, f"checkpoint{int(host_state.step):05d}.ckpt"
                    ),
                    host_state,
                    loss=float(m.get("total_loss", 0.0)),
                    psnr=float(m.get("psnr", 0.0)),
                    key_order=canonical_order,
                    lr=float(_schedule(int(host_state.step))),
                )

    _log_prev = {"t": None, "n": 0}

    def _log_train(row, j, n_done):
        # io thread: the device_get blocks until step j has actually
        # executed, so `elapsed` measures completed work, not dispatch.
        m = {k: float(v) for k, v in jax.device_get(row).items()}
        now = time.time()
        elapsed = now - t_start
        rays_s = rays_per_step * n_done / max(elapsed, 1e-9)
        inst = rays_s
        if _log_prev["t"] is not None and n_done > _log_prev["n"]:
            inst = (
                rays_per_step * (n_done - _log_prev["n"])
                / max(now - _log_prev["t"], 1e-9)
            )
        _log_prev["t"], _log_prev["n"] = now, n_done
        print(
            f"[TRAIN] Iter: {j} Loss: {m['total_loss']:.6f} "
            f"BG Loss: {m['background_loss']:.6f} PSNR: {m['psnr']:.3f} "
            f"LatentReg: {m['latent_code_loss']:.6f} "
            f"rays/s: {rays_s:,.0f} (inst {inst:,.0f})"
        )
        writer.scalar("train/coarse_loss", m["coarse_loss"], j)
        writer.scalar("train/fine_loss", m["fine_loss"], j)
        writer.scalar("train/psnr", m["psnr"], j)
        writer.scalar("train/rays_per_sec", rays_s, j)
        writer.scalar("train/rays_per_sec_inst", inst, j)
        # Host-RSS observability for long schedules (the tunneled
        # backend historically leaked the per-step input batch —
        # BENCH_NOTES.md; the window feed divides that by K).
        writer.scalar("host/rss_gb", _host_rss_gb(), j)
        if flags.train_latent_codes:
            writer.scalar("train/code_loss", m["latent_code_loss"], j)
        if flags.supervised_train_background:
            writer.scalar("train/bg_loss", m["background_loss"], j)

    # Dispatch backpressure: without any host sync the dispatch thread
    # would run ahead unboundedly (queueing uploads — the old RSS-leak
    # shape). At each print boundary we enqueue the loss scalar and pull
    # the PREVIOUS boundary's — one overlapped round trip per
    # print_every steps bounds run-ahead to ~2 print windows.
    _sync_q = deque()

    def _backpressure(row):
        _sync_q.append(row["total_loss"])
        if len(_sync_q) > 1:
            float(np.asarray(_sync_q.popleft()))

    try:
        i = start_iter
        while i < train_iters:
            # window [i .. j]: j is the next bookkeeping-eligible index
            # (multiple of k_exec, where every active cadence lands), so
            # bookkeeping at j sees the state AFTER step j — the exact
            # sequential-loop semantics.
            if use_mega:
                j = i if i % k_exec == 0 else (i // k_exec + 1) * k_exec
                j = min(j, train_iters - 1)
                k_run = j - i + 1
                if device_feed:
                    state, ms = mega_fn(
                        state, base_key, feed_base,
                        jnp.asarray(i, jnp.int32), k_run,
                    )
                else:
                    batches = [next(feed) for _ in range(k_run)]
                    stacked = {
                        k: np.stack([b[k] for b in batches])
                        for k in batches[0]
                    }
                    state, ms = mega_fn(
                        state, stacked, base_key, jnp.asarray(i, jnp.int32)
                    )
                metrics = jax.tree.map(lambda x: x[-1], ms)
            else:
                j = i
                batch = next(feed)
                if multiprocess and not device_feed:
                    # host feed: local numpy → global arrays (the device
                    # feed's process sampler already emits global arrays)
                    from nerface_tpu.train.distributed import global_batch

                    batch = global_batch(batch, mesh)
                sub = jax.random.fold_in(base_key, i)
                state, metrics = step_fn(state, batch, sub)

            if j % print_every == 0 or j == train_iters - 1:
                _backpressure(metrics)
                if primary:
                    io_pool.submit(_log_train, metrics, j, j - start_iter + 1)

            if validate_every > 0 and j % validate_every == 0 and len(dataset.i_val):
                # Validation rides the same mesh as training: the frame's
                # ray axis is sharded so all chips render, none idle.
                # Multi-process: render process-locally instead (full-frame
                # eval inputs are host-local); only process 0 logs. Params
                # are replicated over the global mesh, so every process can
                # read a full local copy.
                if val_pool is not None:
                    import dataclasses as _dc

                    snap = _dc.replace(
                        state,
                        params=jax.tree.map(jnp.copy, state.params),
                        fixed_background=(
                            jnp.copy(state.fixed_background)
                            if state.fixed_background is not None else None
                        ),
                    )

                    def _run_val(vs, vj):
                        vm = validate(
                            cfg, dataset, model_coarse, model_fine, vs,
                            background, flags, writer, vj, dtype=dtype,
                            mesh=mesh,
                        )
                        if primary:
                            print(
                                f"[VAL] Iter: {vj} loss: {vm['loss']:.6f} "
                                f"PSNR: {vm['psnr']:.3f} "
                                f"time: {vm['time']:.2f}s"
                            )
                        return vm

                    val_pending.append(val_pool.submit(_run_val, snap, j))
                    # at most one render in flight: the next validation
                    # boundary waits for the previous render (bounds both
                    # device contention and snapshot memory to one copy)
                    while len(val_pending) > 1:
                        val_pending.popleft().result()
                else:
                    val_state = state
                    if multiprocess:
                        val_state = jax.tree.map(
                            lambda x: np.asarray(x) if hasattr(x, "sharding") else x,
                            state,
                        )
                    vm = validate(
                        cfg, dataset, model_coarse, model_fine, val_state,
                        background, flags, writer, j, dtype=dtype,
                        mesh=None if multiprocess else mesh,
                    )
                    if primary:
                        print(
                            f"[VAL] Iter: {j} loss: {vm['loss']:.6f} "
                            f"PSNR: {vm['psnr']:.3f} time: {vm['time']:.2f}s"
                        )

            if save_every > 0 and (j % save_every == 0 or j == train_iters - 1):
                if ckpt_writer is not None:
                    # one device-side byte-concat dispatch; the pull +
                    # orbax write + torch export happen on the writer
                    # thread while training continues
                    ckpt_writer.submit(
                        logdir, flatten_state(state),
                        metrics=metrics if primary else None,
                        torch_export=torch_export,
                    )
                else:
                    # EVERY process enters the save: orbax coordinates
                    # multi-process writes internally (a primary-only call
                    # deadlocks in its barrier sync); only process 0
                    # touches the sidecar files.
                    ckpt_lib.save_checkpoint(
                        logdir, state,
                        {k: float(v) for k, v in metrics.items()} if primary
                        else None,
                    )
                    if export_torch and primary:
                        from nerface_tpu.train.schedule import from_cfg as _msched

                        ckpt_lib.export_torch_checkpoint(
                            os.path.join(
                                logdir, f"checkpoint{int(state.step):05d}.ckpt"
                            ),
                            state,
                            loss=float(metrics.get("total_loss", 0.0)),
                            psnr=float(metrics.get("psnr", 0.0)),
                            key_order=canonical_order,
                            lr=float(_msched(cfg)(int(state.step))),
                        )
            i = j + 1
    finally:
        try:
            if feed is not None:
                feed.stop()
            while val_pending:  # surface side-thread render failures
                val_pending.popleft().result()
            if ckpt_writer is not None:
                ckpt_writer.finish()
        finally:
            if val_pool is not None:
                val_pool.shutdown(wait=True)
            io_pool.shutdown(wait=True)
            writer.close()
    return state


def train_from_config_file(config_path: str, **kwargs) -> TrainState:
    return train(load_config(config_path), **kwargs)
