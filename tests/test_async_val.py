"""Async validation (train/loop.py): the full-frame validation render runs
on a side thread from a post-boundary params snapshot while train windows
keep dispatching.

Contract under test: metrics are BIT-IDENTICAL to the synchronous call
(the snapshot is the same post-step-j state, copied leaf-by-leaf so later
windows may donate the live buffers), every validation boundary still
fires, and the trained state is unaffected.
"""

import io
import re
from contextlib import redirect_stdout

import numpy as np
import pytest

from nerface_tpu.config import CfgNode
from nerface_tpu.data.synthetic import make_synthetic_flame_dataset
from nerface_tpu.train.loop import train


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_aval")
    return make_synthetic_flame_dataset(
        str(d), n_train=4, n_val=2, n_test=2, H=24, W=24
    )


def _cfg(synth_dir, logdir, async_val, train_iters=12):
    from test_megastep import _cfg as mega_cfg

    return mega_cfg(
        synth_dir, logdir, train_iters=train_iters,
        id="aval", validate_every=4, async_val=async_val,
    )


def _val_lines(text):
    return re.findall(
        r"\[VAL\] Iter: (\d+) loss: ([0-9.eE+-]+) PSNR: ([0-9.eE+-]+)", text
    )


def test_async_validation_matches_sync(synth_dir, tmp_path):
    buf_sync, buf_async = io.StringIO(), io.StringIO()

    with redirect_stdout(buf_sync):
        s_sync = train(
            _cfg(synth_dir, str(tmp_path / "sync"), async_val=False),
            log=False, steps_per_execute=4,
        )
    with redirect_stdout(buf_async):
        s_async = train(
            _cfg(synth_dir, str(tmp_path / "async"), async_val=True),
            log=False, steps_per_execute=4,
        )

    v_sync = _val_lines(buf_sync.getvalue())
    v_async = _val_lines(buf_async.getvalue())
    # every boundary fired on both paths: iters 4 and 8 (j=0 lands before
    # any window; the loop starts at i=0, first boundary multiple of 4)
    assert [it for it, _, _ in v_sync] == [it for it, _, _ in v_async]
    assert len(v_sync) >= 2
    for (i1, l1, p1), (i2, l2, p2) in zip(v_sync, v_async):
        assert l1 == l2, f"iter {i1}: sync loss {l1} != async {l2}"
        assert p1 == p2, f"iter {i1}: sync PSNR {p1} != async {p2}"

    # training itself is untouched by the side-thread render
    assert int(s_sync.step) == int(s_async.step)
    for a, b in zip(
        (np.asarray(x) for x in __import__("jax").tree.leaves(s_sync.params)),
        (np.asarray(x) for x in __import__("jax").tree.leaves(s_async.params)),
    ):
        np.testing.assert_array_equal(a, b)


def test_async_validation_render_failure_surfaces(synth_dir, tmp_path, monkeypatch):
    """A crash inside the side-thread render must fail the run, not vanish."""
    import nerface_tpu.train.loop as loop_mod

    def boom(*a, **k):
        raise RuntimeError("validation render exploded")

    monkeypatch.setattr(loop_mod, "validate", boom)
    with pytest.raises(RuntimeError, match="validation render exploded"):
        with redirect_stdout(io.StringIO()):
            train(
                _cfg(synth_dir, str(tmp_path / "boom"), async_val=True),
                log=False, steps_per_execute=4,
            )
