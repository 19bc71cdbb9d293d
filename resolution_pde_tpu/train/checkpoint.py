"""Checkpointing via Orbax: sharded-array-aware save/restore.

Reference parity: torch.save of {model_state_dict, optimizer_state_dict,
loss_history, val_loss_history, l2_loss} to
checkpoints/<model_type>/<pde>_<job>.pt (main_1d.py:193-203), loaded for
warm start (main_1d.py:127-132) and by the eval drivers
(autoregressive_eval.py:121-122). This module adds what the reference
lacks: step counters for exact resume and multi-host sharded arrays.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state, history: Optional[dict] = None,
                    extra: Optional[dict] = None) -> None:
    """Save a TrainState (+ scalar history) to `path` (a directory)."""
    path = os.path.abspath(path)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        # PRNG keys are typed arrays; store raw key data for portability.
        "dropout_key": jax.random.key_data(state.dropout_key),
    }
    if state.model_state:
        payload["model_state"] = state.model_state
    if history is not None:
        payload["history"] = {
            k: np.asarray(v, dtype=np.float64) for k, v in history.items() if v
        }
    if extra is not None:
        payload["extra"] = extra
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, state):
    """Restore into the structure of `state` (a template TrainState).

    Returns (state, history_dict_or_None).
    """
    path = os.path.abspath(path)
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "dropout_key": jax.random.key_data(state.dropout_key),
    }
    if state.model_state:
        template["model_state"] = state.model_state
    ckptr = ocp.StandardCheckpointer()
    # Restore leniently: older checkpoints may lack history/extra.
    restored = ckptr.restore(path, None)
    new_state = state.replace(
        params=_fit_tree(template["params"], restored["params"]),
        opt_state=_fit_tree(template["opt_state"], restored["opt_state"]),
        step=restored["step"],
        dropout_key=jax.random.wrap_key_data(
            np.asarray(restored["dropout_key"], dtype=np.uint32)
        ),
        model_state=(
            _fit_tree(template["model_state"], restored["model_state"])
            if "model_state" in restored and state.model_state else
            state.model_state
        ),
    )
    return new_state, restored.get("history")


def _fit_tree(template, restored):
    """Map restored leaves onto the template's pytree structure."""
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    r_leaves = jax.tree_util.tree_leaves(restored)
    if len(t_leaves) != len(r_leaves):
        raise ValueError(
            f"checkpoint has {len(r_leaves)} leaves, expected {len(t_leaves)}"
        )
    fitted = [
        np.asarray(r).astype(np.asarray(t).dtype)
        if hasattr(t, "dtype") else r
        for t, r in zip(t_leaves, r_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, fitted)
