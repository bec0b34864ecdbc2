"""K-steps-per-dispatch execution window (train/step.py::make_train_megastep).

The contract under test: a K-window scan reproduces K sequential
`make_train_step` calls BIT-FOR-BIT (same fold_in(base_key, i) per step,
same feed stream), for both the host-stacked-batch mode and the in-scan
device-feed mode, including through the real train loop with its async
checkpoint writer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerface_tpu.config import CfgNode, FeatureFlags
from nerface_tpu.data import RayFeed, load_flame_data
from nerface_tpu.data.synthetic import make_synthetic_flame_dataset
from nerface_tpu.render.pipeline import RenderSettings
from nerface_tpu.train import checkpoint as ckpt_lib
from nerface_tpu.train.loop import (
    _effective_window,
    build_models_from_cfg,
    setup_background,
    train,
)
from nerface_tpu.train.state import create_train_state
from nerface_tpu.train.step import make_train_megastep, make_train_step


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_mega")
    return make_synthetic_flame_dataset(
        str(d), n_train=4, n_val=2, n_test=2, H=24, W=24
    )


def _cfg(synth_dir, logdir, train_iters=12, **exp):
    experiment = {
        "id": "mega",
        "logdir": logdir,
        "randomseed": 42,
        "train_iters": train_iters,
        "validate_every": 0,
        "save_every": 0,
        "print_every": 4,
        "device": 0,
    }
    experiment.update(exp)
    return CfgNode(
        {
            "experiment": experiment,
            "dataset": {
                "type": "blender",
                "basedir": synth_dir,
                "half_res": False,
                "testskip": 1,
                "no_ndc": True,
                "near": 0.2,
                "far": 0.8,
            },
            "models": {
                "coarse": {
                    "type": "ConditionalBlendshapePaperNeRFModel",
                    "num_layers": 4,
                    "hidden_size": 32,
                    "skip_connect_every": 3,
                    "include_input_xyz": True,
                    "log_sampling_xyz": True,
                    "num_encoding_fn_xyz": 4,
                    "use_viewdirs": True,
                    "include_input_dir": False,
                    "num_encoding_fn_dir": 2,
                    "log_sampling_dir": True,
                },
                "fine": {
                    "type": "ConditionalBlendshapePaperNeRFModel",
                    "num_layers": 4,
                    "hidden_size": 32,
                    "skip_connect_every": 3,
                    "num_encoding_fn_xyz": 4,
                    "include_input_xyz": True,
                    "log_sampling_xyz": True,
                    "use_viewdirs": True,
                    "include_input_dir": False,
                    "num_encoding_fn_dir": 2,
                    "log_sampling_dir": True,
                },
            },
            "optimizer": {"type": "Adam", "lr": 5.0e-4},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
            "nerf": {
                "use_viewdirs": True,
                "encode_position_fn": "positional_encoding",
                "encode_direction_fn": "positional_encoding",
                "train": {
                    "num_random_rays": 64,
                    "chunksize": 2048,
                    "perturb": True,
                    "num_coarse": 8,
                    "num_fine": 8,
                    "white_background": False,
                    "radiance_field_noise_std": 0.1,
                    "lindisp": False,
                },
                "validation": {
                    "chunksize": 4096,
                    "perturb": True,
                    "num_coarse": 8,
                    "num_fine": 8,
                    "white_background": False,
                    "radiance_field_noise_std": 0.0,
                    "lindisp": False,
                },
            },
        }
    )


def _setup(synth_dir, tmp_path):
    cfg = _cfg(synth_dir, str(tmp_path))
    flags = FeatureFlags.from_cfg(cfg)
    dataset = load_flame_data(synth_dir, half_res=False, testskip=1)
    mc, mf = build_models_from_cfg(cfg)
    background = setup_background(dataset, flags)
    state, opt = create_train_state(
        jax.random.PRNGKey(42), mc, mf, cfg, flags,
        n_train=len(dataset.i_train),
        background=jnp.asarray(background) if background is not None else None,
    )
    settings = RenderSettings.from_cfg(cfg, mode="train")
    return cfg, flags, dataset, mc, mf, background, state, opt, settings


def _leaves_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


def test_effective_window():
    # divides every active cadence
    assert _effective_window(50, [100, 1000, 5000], False) == 50
    assert _effective_window(64, [100, 1000, 5000], False) == 50
    assert _effective_window(7, [100, 1000, 5000], False) == 5
    # zero cadences are inactive
    assert _effective_window(50, [100, 0, 0], False) == 50
    assert _effective_window(50, [0, 0, 0], False) == 50
    # degenerate
    assert _effective_window(1, [100], False) == 1
    assert _effective_window(50, [7], False) == 7
    # multiprocess pins K=1
    assert _effective_window(50, [100], True) == 1


def test_host_feed_window_bit_parity(synth_dir, tmp_path):
    """Windows [0..0], [1..5], [6..6] == 7 sequential steps, bitwise."""
    cfg, flags, dataset, mc, mf, background, state, opt, settings = _setup(
        synth_dir, tmp_path
    )
    base_key = jax.random.PRNGKey(42)

    feed = RayFeed(dataset, num_rays=64,
                   background=background if flags.fixed_background else None,
                   seed=42)
    batches = [feed.sample_batch() for _ in range(7)]

    step = make_train_step(mc, mf, settings, flags, opt, donate=False)
    seq_state = state
    for i, b in enumerate(batches):
        seq_state, seq_metrics = step(seq_state, b, jax.random.fold_in(base_key, i))

    mega = make_train_megastep(mc, mf, settings, flags, opt, donate=False)

    def stack(bs):
        return {k: np.stack([b[k] for b in bs]) for k in bs[0]}

    win_state = state
    win_state, _ = mega(win_state, stack(batches[0:1]), base_key,
                        jnp.asarray(0, jnp.int32))
    win_state, ms = mega(win_state, stack(batches[1:6]), base_key,
                         jnp.asarray(1, jnp.int32))
    assert jax.tree.leaves(ms)[0].shape[0] == 5  # per-step metric rows
    win_state, ms = mega(win_state, stack(batches[6:7]), base_key,
                         jnp.asarray(6, jnp.int32))

    assert int(win_state.step) == int(seq_state.step) == 7
    assert _leaves_equal(win_state.params, seq_state.params)
    assert _leaves_equal(win_state.opt_state, seq_state.opt_state)
    # last metric row == the sequential step's metrics
    row = jax.tree.map(lambda x: x[-1], ms)
    for k in seq_metrics:
        assert np.array_equal(np.asarray(row[k]), np.asarray(seq_metrics[k])), k


def test_device_feed_window_parity(synth_dir, tmp_path):
    """In-scan device sampling vs the per-step device feed.

    The draws use identical keys (fold_in(feed_base, i)), but the
    sampler's (R,3)@(3,3) ray rotate fuses differently inside the train
    scan than in the standalone jitted sampler, so equality is
    float-rounding-level (allclose), not bitwise. WITHIN the megastep
    program, window splits are bit-exact (second assertion) — that is
    the resume contract."""
    from nerface_tpu.data.device_feed import DeviceRayFeed

    cfg, flags, dataset, mc, mf, background, state, opt, settings = _setup(
        synth_dir, tmp_path
    )
    base_key = jax.random.PRNGKey(42)
    feed_base = jax.random.PRNGKey(43)

    dfeed = DeviceRayFeed(dataset, num_rays=64,
                          background=background if flags.fixed_background else None)
    sampler = dfeed.make_sampler()

    step = make_train_step(mc, mf, settings, flags, opt, donate=False)
    seq_state = state
    for i in range(5):
        b = sampler(jax.random.fold_in(feed_base, i))
        seq_state, _ = step(seq_state, b, jax.random.fold_in(base_key, i))

    mega = make_train_megastep(mc, mf, settings, flags, opt, donate=False,
                               sample_fn=dfeed.unjit_sampler())
    win_state = state
    win_state, _ = mega(win_state, base_key, feed_base,
                        jnp.asarray(0, jnp.int32), 2)
    win_state, _ = mega(win_state, base_key, feed_base,
                        jnp.asarray(2, jnp.int32), 3)

    # Adam normalizes early gradients to ~±lr, so a one-ULP dot difference
    # in the sampler can move a param by O(lr·steps·ulp-share): observed
    # max |Δ| ≈ 5e-6 after 5 steps (≈1% of one 5e-4 update). Bound it at
    # a tenth of one update per step.
    for a, b in zip(jax.tree.leaves(seq_state.params),
                    jax.tree.leaves(win_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5 * 5e-4 * 0.1)

    # window splits of the SAME program are bit-exact: 2+3 == 5
    one_state, _ = mega(state, base_key, feed_base,
                        jnp.asarray(0, jnp.int32), 5)
    assert _leaves_equal(one_state.params, win_state.params)
    assert _leaves_equal(one_state.opt_state, win_state.opt_state)


def test_mesh_megastep_matches_single_device(synth_dir, tmp_path):
    """Megastep under a 2-device data mesh == single-device megastep
    (partition-invariant per-ray RNG)."""
    from jax.sharding import Mesh

    cfg, flags, dataset, mc, mf, background, state, opt, settings = _setup(
        synth_dir, tmp_path
    )
    base_key = jax.random.PRNGKey(42)
    feed = RayFeed(dataset, num_rays=64,
                   background=background if flags.fixed_background else None,
                   seed=42)
    batches = [feed.sample_batch() for _ in range(4)]
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}

    mega1 = make_train_megastep(mc, mf, settings, flags, opt, donate=False)
    s1, _ = mega1(state, stacked, base_key, jnp.asarray(0, jnp.int32))

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    mega2 = make_train_megastep(mc, mf, settings, flags, opt, mesh=mesh,
                                donate=False)
    s2, _ = mega2(state, stacked, base_key, jnp.asarray(0, jnp.int32))

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_train_loop_windowed_bit_parity(synth_dir, tmp_path):
    """The real train() with steps_per_execute=4 == steps_per_execute=1,
    bitwise, including the async checkpoint writer's on-disk artifact."""
    cfg1 = _cfg(synth_dir, str(tmp_path / "a"), train_iters=10,
                save_every=8, validate_every=8, print_every=4)
    s1 = train(cfg1, log=False, steps_per_execute=1)

    cfg2 = _cfg(synth_dir, str(tmp_path / "b"), train_iters=10,
                save_every=8, validate_every=8, print_every=4)
    s2 = train(cfg2, log=False, steps_per_execute=4)

    assert int(s1.step) == int(s2.step) == 10
    assert _leaves_equal(s1.params, s2.params)
    assert _leaves_equal(s1.opt_state, s2.opt_state)

    # both wrote the same final checkpoint (async writer drained on exit)
    c1 = ckpt_lib.latest_checkpoint(str(tmp_path / "a" / "mega"))
    c2 = ckpt_lib.latest_checkpoint(str(tmp_path / "b" / "mega"))
    assert c1 is not None and c2 is not None
    assert ckpt_lib.checkpoint_step(c1) == ckpt_lib.checkpoint_step(c2) == 10


def test_resume_mid_window_continues_stream(synth_dir, tmp_path):
    """Stopping at a checkpoint and resuming with a window size keeps the
    uninterrupted run's exact parameter trajectory."""
    cfg_full = _cfg(synth_dir, str(tmp_path / "full"), train_iters=10,
                    save_every=0, print_every=5)
    s_full = train(cfg_full, log=False, steps_per_execute=5)

    cfg_a = _cfg(synth_dir, str(tmp_path / "ab"), train_iters=5,
                 save_every=5, print_every=5)
    train(cfg_a, log=False, steps_per_execute=5)
    ckpt = ckpt_lib.latest_checkpoint(str(tmp_path / "ab" / "mega"))
    assert ckpt is not None and ckpt_lib.checkpoint_step(ckpt) == 5

    cfg_b = _cfg(synth_dir, str(tmp_path / "ab"), train_iters=10,
                 save_every=0, print_every=5)
    s_resumed = train(cfg_b, log=False, steps_per_execute=5,
                      load_checkpoint=ckpt)
    assert int(s_resumed.step) == 10
    assert _leaves_equal(s_resumed.params, s_full.params)


def test_state_flattener_roundtrip(synth_dir, tmp_path):
    cfg, flags, dataset, mc, mf, background, state, opt, settings = _setup(
        synth_dir, tmp_path
    )
    flatten, unflatten = ckpt_lib.make_state_flattener(state)
    buf = np.asarray(flatten(state))
    assert buf.dtype == np.uint8 and buf.ndim == 1
    restored = unflatten(buf)
    assert _leaves_equal(restored, state)
    # dtypes survive the bitcast round trip (step counter is int32)
    assert np.asarray(restored.step).dtype == np.int32
