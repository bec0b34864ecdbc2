"""flat_adam (train/optim.py): bit-parity with optax.adam and torch
checkpoint interop through the flat moment layout."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerface_tpu.train.optim import (
    FlatAdamState,
    flat_adam,
    flat_moments_to_tree,
    tree_to_flat_moments,
)


def _tree(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "a": {"w": jax.random.normal(k1, (16, 8)), "b": jax.random.normal(k2, (8,))},
        "c": jax.random.normal(k3, (4, 4)),
        "none_leaf": None,
    }


class TestFlatAdam:
    def test_matches_optax_adam(self):
        params = _tree(jax.random.PRNGKey(0))
        sched = optax.exponential_decay(1e-3, 100, 0.5)
        ref = optax.adam(learning_rate=sched)
        flat = flat_adam(learning_rate=sched)
        s_ref, s_flat = ref.init(params), flat.init(params)
        p_ref, p_flat = params, params
        for i in range(5):
            g = _tree(jax.random.PRNGKey(10 + i))
            u_ref, s_ref = ref.update(g, s_ref)
            u_flat, s_flat = flat.update(g, s_flat)
            p_ref = optax.apply_updates(p_ref, u_ref)
            p_flat = optax.apply_updates(p_flat, u_flat)
        for (k1, v1), (k2, v2) in zip(
            jax.tree_util.tree_leaves_with_path(p_ref),
            jax.tree_util.tree_leaves_with_path(p_flat),
        ):
            assert jax.tree_util.keystr(k1) == jax.tree_util.keystr(k2)
            np.testing.assert_allclose(
                np.asarray(v1), np.asarray(v2), rtol=2e-6, atol=1e-7
            )

    def test_moment_tree_roundtrip(self):
        params = _tree(jax.random.PRNGKey(1))
        flat = flat_adam(1e-3)
        s = flat.init(params)
        g = _tree(jax.random.PRNGKey(2))
        _, s = flat.update(g, s)
        mu_tree, nu_tree = flat_moments_to_tree(s, params)
        np.testing.assert_allclose(
            np.asarray(mu_tree["a"]["w"]),
            0.1 * np.asarray(g["a"]["w"]),
            rtol=1e-6,
        )
        s2 = tree_to_flat_moments(s, mu_tree, nu_tree, s.count)
        np.testing.assert_allclose(np.asarray(s2.mu), np.asarray(s.mu))
        np.testing.assert_allclose(np.asarray(s2.nu), np.asarray(s.nu))

    def test_checkpoint_interop_flat_layout(self):
        """export/import torch optimizer state sees through the flat
        layout (train/checkpoint.py:_moment_trees)."""
        from nerface_tpu.train import checkpoint as ckpt_lib
        from nerface_tpu.train.state import TrainState

        params = {
            "coarse": {
                "l.weight": jnp.asarray(np.random.RandomState(0).randn(2, 4), jnp.float32),
                "l.bias": jnp.zeros((2,)),
            },
            "fine": None, "latent_codes": None, "background": None,
        }
        opt = flat_adam(1e-2)
        s = opt.init(params)
        g = jax.tree.map(lambda x: x * 0.1, params)
        _, s = opt.update(g, s)
        state = TrainState(
            step=jnp.asarray(1, jnp.int32), params=params,
            opt_state=(s,), fixed_background=None,
        )
        sd = ckpt_lib.export_torch_optimizer_state(state)
        assert 0 in sd["state"]
        np.testing.assert_allclose(
            sd["state"][0]["exp_avg"],
            0.1 * 0.1 * np.asarray(params["coarse"]["l.weight"]),
            rtol=1e-6,
        )
        # wipe and reimport
        wiped = TrainState(
            step=state.step, params=params,
            opt_state=(FlatAdamState(
                jnp.zeros((), jnp.int32),
                jnp.zeros_like(s.mu), jnp.zeros_like(s.nu),
            ),),
            fixed_background=None,
        )
        restored = ckpt_lib.import_torch_optimizer_state(wiped, sd)
        a1 = ckpt_lib._find_adam_state(restored.opt_state)
        np.testing.assert_allclose(np.asarray(a1.mu), np.asarray(s.mu))
        np.testing.assert_allclose(np.asarray(a1.nu), np.asarray(s.nu))


class TestDonationFence:
    """flat_adam + donation is known-broken on the tunneled axon backend
    (BENCH_NOTES.md; tools/perf/flat_adam_donation_repro.py); the train
    loop consults `flat_adam_donation_unsafe` to fall back to
    non-donating dispatch."""

    def test_safe_on_cpu(self):
        from nerface_tpu.train.optim import (
            flat_adam,
            flat_adam_donation_unsafe,
        )

        opt = flat_adam(1e-3)
        state = opt.init({"w": jnp.zeros((4,))})
        assert not flat_adam_donation_unsafe(state)

    def test_unsafe_on_axon_with_flat_state(self, monkeypatch):
        import jax as _jax

        from nerface_tpu.train.optim import (
            flat_adam,
            flat_adam_donation_unsafe,
        )

        opt = flat_adam(1e-3)
        state = opt.init({"w": jnp.zeros((4,))})
        monkeypatch.setattr(_jax, "default_backend", lambda: "axon")
        assert flat_adam_donation_unsafe(state)
        # per-tensor optax state never trips the fence
        import optax

        adam_state = optax.adam(1e-3).init({"w": jnp.zeros((4,))})
        assert not flat_adam_donation_unsafe(adam_state)
