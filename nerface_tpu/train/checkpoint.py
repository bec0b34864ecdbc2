"""Checkpointing: Orbax for native state, plus two-way torch-dict interop.

The logical schema mirrors the reference checkpoint
(`train_transformed_rays.py:554-572`): iter, coarse/fine model weights,
optimizer state, loss/psnr scalars, background, latent codes — so renders
from either framework's checkpoints are comparable.  The torch converters
let users (a) evaluate reference-trained `.ckpt` files in this framework
and (b) export checkpoints the reference's eval script can consume.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerface_tpu.train.state import TrainState


# -- native (orbax) ----------------------------------------------------------


def save_checkpoint(ckpt_dir: str, state: TrainState, metrics: Optional[Dict] = None):
    """Save to `ckpt_dir/checkpoint{step:05d}` (reference naming modulo
    extension; orbax writes a directory)."""
    import orbax.checkpoint as ocp

    step = int(state.step)
    path = os.path.join(os.path.abspath(ckpt_dir), f"checkpoint{step:05d}")
    payload = {
        "iter": step,
        "params": jax.tree.map(np.asarray, state.params),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
        "fixed_background": (
            np.asarray(state.fixed_background)
            if state.fixed_background is not None
            else None
        ),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if metrics:
        import json

        with open(path + ".metrics.json", "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f)
    return path


def load_checkpoint(path: str, state_template: TrainState) -> TrainState:
    """Restore a TrainState saved by `save_checkpoint` (needs a template
    with the right pytree structure, e.g. a freshly-initialized state)."""
    import orbax.checkpoint as ocp

    template = {
        "iter": 0,
        "params": jax.tree.map(np.asarray, state_template.params),
        "opt_state": jax.tree.map(np.asarray, state_template.opt_state),
        "fixed_background": (
            np.asarray(state_template.fixed_background)
            if state_template.fixed_background is not None
            else None
        ),
    }
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), target=template)
    return TrainState(
        step=jnp.asarray(restored["iter"], jnp.int32),
        params=jax.tree.map(jnp.asarray, restored["params"]),
        opt_state=jax.tree.map(jnp.asarray, restored["opt_state"]),
        fixed_background=(
            jnp.asarray(restored["fixed_background"])
            if restored["fixed_background"] is not None
            else None
        ),
    )


# -- async checkpointing (single-transfer state pull) -------------------------


def make_state_flattener(state: TrainState):
    """Build `(flatten, unflatten)` for pulling a TrainState off the device
    in ONE transfer.

    Why: on the tunneled axon backend every per-leaf `np.asarray` pays a
    host round trip — a ~300-leaf TrainState costs ~20 s per checkpoint
    save (BENCH_NOTES.md round-4 ledger), which at the paper schedule's
    save_every=5000 is ~4 ms/step of pure blocking. `flatten` is one jitted
    program that bitcasts every leaf to bytes and concatenates into a
    single uint8 vector (one dispatch; caller pulls it with one transfer);
    `unflatten` rebuilds the numpy TrainState host-side.
    """
    leaves, treedef = jax.tree.flatten(state)
    specs = [(tuple(np.shape(l)), np.dtype(l.dtype)) for l in leaves]
    nbytes = [int(np.prod(s, dtype=np.int64)) * d.itemsize for s, d in specs]
    offsets = np.concatenate([[0], np.cumsum(nbytes)]).astype(np.int64)

    @jax.jit
    def flatten(st: TrainState) -> jnp.ndarray:
        parts = []
        for x in jax.tree.leaves(st):
            x = jnp.asarray(x)
            if x.dtype.itemsize > 1:
                x = jax.lax.bitcast_convert_type(x, jnp.uint8)
            else:
                x = x.astype(jnp.uint8)
            parts.append(x.reshape(-1))
        return jnp.concatenate(parts)

    def unflatten(buf) -> TrainState:
        buf = np.asarray(buf, dtype=np.uint8)
        out = []
        for (shape, dt), o, n in zip(specs, offsets[:-1], nbytes):
            out.append(
                np.frombuffer(buf[o:o + n].tobytes(), dtype=dt).reshape(shape)
            )
        return jax.tree.unflatten(treedef, out)

    return flatten, unflatten


class AsyncCheckpointWriter:
    """Checkpoint writes off the training thread.

    The caller dispatches `flatten(state)` (device-side byte concat —
    returns without syncing) and submits the flat buffer here; one worker
    thread pulls it (a single transfer) and runs the orbax save plus the
    optional torch export while the train loop keeps dispatching steps.
    At most one write is in flight — a second `submit` first drains the
    previous one, bounding host memory to one state snapshot. `finish()`
    joins the worker and re-raises any write error; call it before
    reading the checkpoint directory (tests, end of training).
    """

    def __init__(self, unflatten):
        from concurrent.futures import ThreadPoolExecutor

        self._unflatten = unflatten
        self._pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer"
        )
        self._future = None

    def submit(self, ckpt_dir: str, flat_dev, metrics=None, torch_export=None):
        self.drain()
        self._future = self._pool.submit(
            self._write, ckpt_dir, flat_dev, metrics, torch_export
        )

    def _write(self, ckpt_dir, flat_dev, metrics, torch_export):
        state = self._unflatten(np.asarray(flat_dev))
        if metrics is not None:
            metrics = {k: float(np.asarray(v)) for k, v in metrics.items()}
        path = save_checkpoint(ckpt_dir, state, metrics)
        if torch_export is not None:
            torch_export(state, metrics or {})
        return path

    def drain(self):
        if self._future is not None:
            fut, self._future = self._future, None
            fut.result()

    def finish(self):
        self.drain()
        self._pool.shutdown(wait=True)


def checkpoint_step(path: str) -> int:
    """Step number encoded in a `checkpoint{step}` basename (-1 if none).

    Numeric, not lexical: `checkpoint{step:05d}` grows to 6 digits past
    step 99999 (the reference's paper schedule runs to 1M), where string
    order would rank `checkpoint100001` below `checkpoint95001`."""
    digits = os.path.basename(path.rstrip("/"))[len("checkpoint"):]
    return int(digits) if digits.isdigit() else -1


def is_complete_checkpoint(path: str) -> bool:
    """True once orbax has committed the save (metadata file present).

    A process killed mid-save can leave a partial directory; restart
    tooling must skip it or restoration fails."""
    return os.path.isdir(path) and os.path.exists(
        os.path.join(path, "_CHECKPOINT_METADATA")
    )


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Highest-step COMPLETE `checkpoint{step}` directory under ckpt_dir."""
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [
        os.path.join(ckpt_dir, d)
        for d in os.listdir(ckpt_dir)
        if d.startswith("checkpoint") and checkpoint_step(d) >= 0
    ]
    cands = [p for p in cands if is_complete_checkpoint(p)]
    return max(cands, key=checkpoint_step) if cands else None


# -- torch interop -----------------------------------------------------------


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Read a reference `.ckpt` into numpy (no torch tensors leak out).

    Returns {"iter", "coarse", "fine", "background", "latent_codes"} where
    coarse/fine are state-dict-named weight dicts matching this
    framework's parameter names 1:1.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    def _to_np(sd):
        if sd is None:
            return None
        return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}

    background = ckpt.get("background")
    latent_codes = ckpt.get("latent_codes")
    opt_sd = ckpt.get("optimizer_state_dict")
    if opt_sd is not None:
        opt_sd = {
            "state": {
                idx: {
                    k: (np.asarray(v.detach().cpu().numpy())
                        if hasattr(v, "detach") else v)
                    for k, v in ent.items()
                }
                for idx, ent in opt_sd.get("state", {}).items()
            },
            "param_groups": opt_sd.get("param_groups", []),
        }
    return {
        "iter": int(ckpt.get("iter", 0)),
        "optimizer": opt_sd,
        "coarse": _to_np(ckpt["model_coarse_state_dict"]),
        "fine": _to_np(ckpt.get("model_fine_state_dict")),
        "background": (
            np.asarray(background.detach().cpu().numpy())
            if background is not None
            else None
        ),
        "latent_codes": (
            np.asarray(latent_codes.detach().cpu().numpy())
            if latent_codes is not None
            else None
        ),
    }


def import_torch_weights(state: TrainState, torch_ckpt: Dict[str, Any]) -> TrainState:
    """Overwrite model weights / background / latent codes from a converted
    reference checkpoint; Adam moments are also imported when the
    checkpoint carries an optimizer_state_dict (the reference loads it on
    resume, `train_transformed_rays.py:224`).

    Deliberate non-reproduction of a reference bug: the reference's resume
    rebinds `latent_codes`/`background` to FRESH nn.Parameters
    (`train_transformed_rays.py:218-224`) while its optimizer still holds
    the originals, so after any resume those tensors never train again
    (verified: resumed reference runs end with exactly-zero latent norms —
    PARITY.md). Here the imported values land in the one params tree the
    optimizer updates, so they keep training
    (tests/test_train_step.py::TestResumeKeepsTrainingAuxParams)."""
    params = dict(state.params)
    for which in ("coarse", "fine"):
        if torch_ckpt.get(which) is not None and params.get(which) is not None:
            loaded = {k: jnp.asarray(v) for k, v in torch_ckpt[which].items()}
            missing = set(params[which]) - set(loaded)
            if missing:
                raise ValueError(f"torch checkpoint missing {which} keys: {missing}")
            params[which] = {k: loaded[k] for k in params[which]}
    if torch_ckpt.get("latent_codes") is not None:
        codes = jnp.asarray(torch_ckpt["latent_codes"])
        if params.get("latent_codes") is not None:
            if codes.shape != params["latent_codes"].shape and not torch_ckpt.get("optimizer"):
                # table follows the checkpoint (eval across datasets is
                # fine), but the template's Adam moments keep the old
                # shape — training from here needs the ckpt's optimizer
                print(
                    "WARNING: checkpoint latent_codes shape "
                    f"{codes.shape} != template "
                    f"{params['latent_codes'].shape} and the checkpoint "
                    "carries no optimizer state; evaluating is fine, "
                    "resuming training is not."
                )
            params["latent_codes"] = codes
        else:
            # the config doesn't train/use latent codes: adding the leaf
            # anyway would desync params from the optimizer state tree
            # and crash the first update with an opaque structure error
            print(
                "WARNING: checkpoint contains latent_codes but the config "
                "does not use them; ignoring the table."
            )
    fixed_bg = state.fixed_background
    if torch_ckpt.get("background") is not None:
        bg = jnp.asarray(torch_ckpt["background"])
        if params.get("background") is not None:
            params["background"] = bg
        else:
            fixed_bg = bg
    new_state = TrainState(
        step=jnp.asarray(torch_ckpt.get("iter", 0), jnp.int32),
        params=params,
        opt_state=state.opt_state,
        fixed_background=fixed_bg,
    )
    if torch_ckpt.get("optimizer") is not None:
        # the loaded state_dicts' key order IS torch registration order —
        # the order the reference's optimizer indexed params in
        key_order = {
            scope: list(torch_ckpt[scope])
            for scope in ("coarse", "fine")
            if torch_ckpt.get(scope) is not None
        }
        try:
            new_state = import_torch_optimizer_state(
                new_state, torch_ckpt["optimizer"], key_order=key_order
            )
        except ValueError:
            pass  # non-Adam optimizer: weights-only import
    return new_state


def export_torch_checkpoint(
    path: str,
    state: TrainState,
    loss: float = 0.0,
    psnr: float = 0.0,
    key_order=None,
    lr: float = 5.0e-4,
):
    """Write a reference-schema `.ckpt` consumable by the reference's eval
    AND train-resume scripts (`eval_transformed_rays.py:301-330`,
    `train_transformed_rays.py:212-225`) — Adam moments included."""
    import torch

    key_order = key_order or {}

    def _to_torch(tree, scope=None):
        if tree is None:
            return None
        order = key_order.get(scope) or list(tree)
        return {k: torch.from_numpy(np.asarray(tree[k]).copy()) for k in order}

    background = state.params.get("background")
    if background is None:
        background = state.fixed_background
    try:
        opt_sd = export_torch_optimizer_state(state, key_order=key_order, lr=lr)
        opt_sd["state"] = {
            idx: {
                "step": ent["step"],
                "exp_avg": torch.from_numpy(ent["exp_avg"].copy()),
                "exp_avg_sq": torch.from_numpy(ent["exp_avg_sq"].copy()),
            }
            for idx, ent in opt_sd["state"].items()
        }
    except ValueError:
        opt_sd = None

    ckpt = {
        "iter": int(state.step),
        "model_coarse_state_dict": _to_torch(state.params["coarse"], "coarse"),
        "model_fine_state_dict": _to_torch(state.params.get("fine"), "fine"),
        "optimizer_state_dict": opt_sd,
        "loss": float(loss),
        "psnr": float(psnr),
        "background": (
            torch.from_numpy(np.asarray(background).copy())
            if background is not None
            else None
        ),
        "latent_codes": (
            torch.from_numpy(np.asarray(state.params["latent_codes"]).copy())
            if state.params.get("latent_codes") is not None
            else None
        ),
    }
    torch.save(ckpt, path)
    return path


# -- optimizer-state interop --------------------------------------------------

def _ordered_param_names(params: Dict[str, Any], key_order=None):
    """The reference's optimizer param ordering: coarse weights, fine
    weights (module registration order), latent codes, then the background
    as its own param group (`train_transformed_rays.py:170-199`).

    CAUTION: a params dict that has been through jit is key-SORTED (pytree
    flattening sorts dict keys), which is not registration order. Pass
    `key_order` = {"coarse": [names...], "fine": [...]} — e.g. from the
    model's init() insertion order or a loaded torch state_dict's key
    order — whenever reference-compatible indices matter."""
    key_order = key_order or {}

    def keys(scope):
        return key_order.get(scope) or list(params[scope])

    names = [("coarse", k) for k in keys("coarse")]
    if params.get("fine") is not None:
        names += [("fine", k) for k in keys("fine")]
    if params.get("latent_codes") is not None:
        names.append(("latent_codes", None))
    if params.get("background") is not None:
        names.append(("background", None))
    return names


def _is_flat_adam(adam) -> bool:
    return getattr(adam.mu, "ndim", None) == 1


def _moment_trees(adam, params):
    """mu/nu as params-shaped trees, whatever the optimizer's internal
    layout (per-tensor optax trees, or train/optim.py's flat buffers)."""
    if _is_flat_adam(adam):
        from nerface_tpu.train.optim import flat_moments_to_tree

        return flat_moments_to_tree(adam, params)
    return adam.mu, adam.nu


def _find_adam_state(opt_state):
    """Locate the ScaleByAdamState (count/mu/nu) inside an optax chain."""
    for element in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: hasattr(x, "mu") and hasattr(x, "nu")
    ):
        if hasattr(element, "mu") and hasattr(element, "nu"):
            return element
    raise ValueError("no Adam state found in optimizer state")


def _get_entry(tree, scope, key):
    node = tree[scope]
    return node if key is None else node[key]


def _set_entry(tree, scope, key, value):
    if key is None:
        tree[scope] = value
    else:
        tree[scope] = dict(tree[scope])
        tree[scope][key] = value


def export_torch_optimizer_state(
    state: TrainState, key_order=None, lr: float = 5.0e-4
) -> Dict[str, Any]:
    """optax Adam moments -> torch.optim.Adam state_dict layout
    ({'state': {idx: {step, exp_avg, exp_avg_sq}}, 'param_groups': [...]}),
    indices following the reference's param registration order.

    `lr` should be the schedule-CURRENT learning rate: the reference
    updates `param_group["lr"]` in place after every step and saves the
    whole group (`train_transformed_rays.py:393-400`), and on resume
    torch's `Optimizer.load_state_dict` replaces ALL group
    hyperparameters with the saved ones — so the groups we emit must
    carry the full Adam hyperparameter set, not just the param indices,
    or the resumed `optimizer.step()` dies on a missing 'betas'."""
    adam = _find_adam_state(state.opt_state)
    names = _ordered_param_names(state.params, key_order)
    step = int(np.asarray(adam.count))
    mu_tree, nu_tree = _moment_trees(adam, state.params)
    entries = {}
    for idx, (scope, key) in enumerate(names):
        mu = _get_entry(mu_tree, scope, key)
        nu = _get_entry(nu_tree, scope, key)
        if mu is None:
            continue
        entries[idx] = {
            "step": step,
            "exp_avg": np.asarray(mu),
            "exp_avg_sq": np.asarray(nu),
        }
    # The reference's optimizer ALWAYS has two param groups — the second
    # holds the background tensor even when it isn't trained ("obsolete
    # but need for continuing training", `train_transformed_rays.py:
    # 189-200`) — and torch's load_state_dict requires matching group
    # sizes on resume. Emit that layout unconditionally: group 2 is the
    # background slot (with moments only when it was actually trained).
    # Hyperparameters come from a live torch.optim.Adam so the key set is
    # exact for the installed torch version (both reference groups use
    # the same lr; see the construction cited above).
    try:
        import torch

        template = {
            k: v
            for k, v in torch.optim.Adam(
                [torch.nn.Parameter(torch.zeros(1))], lr=lr
            ).param_groups[0].items()
            if k != "params"
        }
    except ImportError:  # numpy-only fallback (torch 2.x Adam defaults)
        template = {
            "lr": lr, "betas": (0.9, 0.999), "eps": 1e-8,
            "weight_decay": 0, "amsgrad": False, "maximize": False,
            "foreach": None, "capturable": False, "differentiable": False,
            "fused": None,
        }
    n_main = len(names) - (1 if state.params.get("background") is not None else 0)
    groups = [
        dict(template, params=list(range(n_main))),
        dict(template, params=[n_main]),
    ]
    return {"state": entries, "param_groups": groups}


def import_torch_optimizer_state(
    state: TrainState, torch_opt_sd: Dict[str, Any], key_order=None
) -> TrainState:
    """torch.optim.Adam state_dict -> optax Adam moments, so a reference
    training run resumes seamlessly (the reference loads
    optimizer_state_dict on resume, `train_transformed_rays.py:224`).
    Missing entries (params never stepped) keep zero moments."""
    adam = _find_adam_state(state.opt_state)
    names = _ordered_param_names(state.params, key_order)
    mu_tree, nu_tree = _moment_trees(adam, state.params)
    mu = {k: (dict(v) if isinstance(v, dict) else v) for k, v in mu_tree.items()}
    nu = {k: (dict(v) if isinstance(v, dict) else v) for k, v in nu_tree.items()}
    count = adam.count
    entries = torch_opt_sd.get("state", {})
    for idx, (scope, key) in enumerate(names):
        ent = entries.get(idx, entries.get(str(idx)))
        if ent is None:
            continue
        step = ent.get("step", 0)
        count = jnp.asarray(
            int(np.asarray(step)), dtype=jnp.asarray(adam.count).dtype
        )
        _set_entry(mu, scope, key, jnp.asarray(np.asarray(ent["exp_avg"])))
        _set_entry(nu, scope, key, jnp.asarray(np.asarray(ent["exp_avg_sq"])))
    if _is_flat_adam(adam):
        from nerface_tpu.train.optim import tree_to_flat_moments

        new_adam = tree_to_flat_moments(adam, mu, nu, count)
    else:
        new_adam = adam._replace(count=count, mu=mu, nu=nu)

    def swap(node):
        return new_adam if node is adam else node

    new_opt_state = jax.tree_util.tree_map(
        swap, state.opt_state,
        is_leaf=lambda x: hasattr(x, "mu") and hasattr(x, "nu"),
    )
    return TrainState(
        step=state.step, params=state.params, opt_state=new_opt_state,
        fixed_background=state.fixed_background,
    )
