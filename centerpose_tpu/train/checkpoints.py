"""Checkpoint save/restore via Orbax (reference: lib/models/model.py
save_model/load_model, SURVEY.md §5.4).

Preserves the reference's contract:
- periodic ``model_last`` + metric-gated ``model_best`` (+ optional per-epoch
  snapshots under SAVE_ALL);
- resume restores step/params/opt_state/batch_stats;
- ``restore_params_filtered`` reproduces load_model's "skip parameters whose
  shapes mismatch, with a warning" behavior (enables backbone-swap
  finetuning).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state, epoch: int = 0) -> None:
    """Write {step, epoch, params, batch_stats, opt_state} to ``path``."""
    payload = {
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    _ckptr().save(os.path.abspath(path), payload, force=True)


def load_checkpoint(path: str) -> Dict[str, Any]:
    return _ckptr().restore(os.path.abspath(path))


def restore_state(state, payload: Dict[str, Any]):
    """Full resume: step/params/batch_stats/opt_state from a payload."""
    import jax.numpy as jnp

    return state.replace(
        step=jnp.asarray(payload["step"]),
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state.opt_state),
            jax.tree_util.tree_leaves(payload["opt_state"]),
        ),
    )


def restore_params_filtered(
    init_params: Any, loaded_params: Any, verbose: bool = True
) -> Any:
    """Merge loaded params into init params, skipping missing keys and
    shape mismatches with a warning (reference load_model semantics)."""
    flat_init = dict(jax.tree_util.tree_flatten_with_path(init_params)[0] and
                     {jax.tree_util.keystr(p): v for p, v in
                      jax.tree_util.tree_flatten_with_path(init_params)[0]})
    flat_loaded = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(loaded_params)[0]
    }
    merged = {}
    for key, init_v in flat_init.items():
        if key not in flat_loaded:
            if verbose:
                print(f"[ckpt] missing in checkpoint, keeping init: {key}")
            merged[key] = init_v
        elif tuple(np.shape(flat_loaded[key])) != tuple(np.shape(init_v)):
            if verbose:
                print(
                    f"[ckpt] shape mismatch for {key}: "
                    f"ckpt {np.shape(flat_loaded[key])} vs model {np.shape(init_v)}; skipping"
                )
            merged[key] = init_v
        else:
            merged[key] = flat_loaded[key]
    for key in flat_loaded:
        if key not in flat_init and verbose:
            print(f"[ckpt] unexpected key in checkpoint, dropped: {key}")
    # rebuild the tree in init order
    paths, treedef = jax.tree_util.tree_flatten_with_path(init_params)
    leaves = [merged[jax.tree_util.keystr(p)] for p, _ in paths]
    return jax.tree_util.tree_unflatten(treedef, leaves)
