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


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = sorted(
        d for d in os.listdir(ckpt_dir)
        if d.startswith("checkpoint") and os.path.isdir(os.path.join(ckpt_dir, d))
    )
    return os.path.join(ckpt_dir, cands[-1]) if cands else None


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
    return {
        "iter": int(ckpt.get("iter", 0)),
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
    reference checkpoint (optimizer state is left untouched; mirrors the
    eval path, which never loads it)."""
    params = dict(state.params)
    for which in ("coarse", "fine"):
        if torch_ckpt.get(which) is not None and params.get(which) is not None:
            loaded = {k: jnp.asarray(v) for k, v in torch_ckpt[which].items()}
            missing = set(params[which]) - set(loaded)
            if missing:
                raise ValueError(f"torch checkpoint missing {which} keys: {missing}")
            params[which] = {k: loaded[k] for k in params[which]}
    if torch_ckpt.get("latent_codes") is not None:
        params["latent_codes"] = jnp.asarray(torch_ckpt["latent_codes"])
    fixed_bg = state.fixed_background
    if torch_ckpt.get("background") is not None:
        bg = jnp.asarray(torch_ckpt["background"])
        if params.get("background") is not None:
            params["background"] = bg
        else:
            fixed_bg = bg
    return TrainState(
        step=jnp.asarray(torch_ckpt.get("iter", 0), jnp.int32),
        params=params,
        opt_state=state.opt_state,
        fixed_background=fixed_bg,
    )


def export_torch_checkpoint(
    path: str,
    state: TrainState,
    loss: float = 0.0,
    psnr: float = 0.0,
):
    """Write a reference-schema `.ckpt` consumable by the reference's eval
    script (`eval_transformed_rays.py:301-330`). Optimizer state is exported
    as None — the reference eval never reads it."""
    import torch

    def _to_torch(tree):
        if tree is None:
            return None
        return {k: torch.from_numpy(np.asarray(v).copy()) for k, v in tree.items()}

    background = state.params.get("background")
    if background is None:
        background = state.fixed_background
    ckpt = {
        "iter": int(state.step),
        "model_coarse_state_dict": _to_torch(state.params["coarse"]),
        "model_fine_state_dict": _to_torch(state.params.get("fine")),
        "optimizer_state_dict": None,
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
