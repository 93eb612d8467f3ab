"""Checkpoint save/resume for params + optimizer state + training progress.

Mirrors the reference's checkpoint payload and policy
(base/base_trainer.py:126-176): periodic `checkpoint-epoch{n}.ckpt`, a
`model_best.ckpt` on monitored improvement, arch/optimizer-type mismatch
warnings on resume. Stored as a pickle of numpy-ified pytrees (host-side,
device-agnostic); structure is re-bound to the live optimizer state on load.
"""
from __future__ import annotations

import logging
import os
import pickle
from pathlib import Path

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str | Path, *, params, opt_state, epoch: int,
                    monitor_best: float, config: dict,
                    scheduler_state: dict | None = None) -> None:
    state = {
        "arch": config.get("arch", {}),
        "optimizer": config.get("optimizer", {}),
        "epoch": int(epoch),
        "params": _to_numpy(params),
        "opt_state": _to_numpy(opt_state),
        "monitor_best": float(monitor_best),
        "scheduler": scheduler_state or {},
        "config": config,
    }
    # Atomic write: the trainer writes checkpoints (incl. model_best.ckpt)
    # from a background thread; a crash mid-write must never leave a
    # previously-good checkpoint truncated. Write a sibling tmp file and
    # os.replace() it into place (atomic on POSIX within one filesystem).
    path = Path(path)
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as fout:
        pickle.dump(state, fout, pickle.HIGHEST_PROTOCOL)
        fout.flush()
        os.fsync(fout.fileno())
    os.replace(tmp, path)


def load_checkpoint(path: str | Path) -> dict:
    with open(path, "rb") as fin:
        return pickle.load(fin)


def restore_into(state: dict, *, params_template, opt_state_template,
                 config: dict | None = None):
    """Re-bind saved numpy trees onto live pytree structures.

    Emits the reference's resume warnings (base_trainer.py:164-174) when the
    arch or optimizer type changed.
    """
    if config is not None:
        if state.get("arch") != config.get("arch"):
            logger.warning(
                "Warning: Architecture configuration given in config file is "
                "different from that of checkpoint.")
        if state.get("optimizer", {}).get("type") != \
                config.get("optimizer", {}).get("type"):
            logger.warning(
                "Warning: Optimizer type given in config file is different "
                "from that of checkpoint. Optimizer parameters not resumed.")
            params = _rebind(params_template, state["params"])
            return params, opt_state_template
    params = _rebind(params_template, state["params"])
    opt_state = _rebind(opt_state_template, state["opt_state"])
    return params, opt_state


def restore_params(state: dict, params_template):
    """Re-bind just the model parameters from a checkpoint payload (the
    eval/infer path — optimizer state not needed, test_fast.py:76-80)."""
    return _rebind(params_template, state["params"])


def _rebind(template, saved):
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    s_leaves = jax.tree_util.tree_leaves(saved)
    if len(t_leaves) != len(s_leaves):
        raise ValueError(
            f"checkpoint has {len(s_leaves)} leaves, model expects "
            f"{len(t_leaves)} — architecture mismatch")
    for t, s in zip(t_leaves, s_leaves):
        if hasattr(t, "shape") and hasattr(s, "shape") and \
                tuple(t.shape) != tuple(np.asarray(s).shape):
            raise ValueError(
                f"checkpoint leaf shape {np.asarray(s).shape} != model leaf "
                f"shape {tuple(t.shape)} — architecture mismatch")
    return jax.tree_util.tree_unflatten(treedef, s_leaves)
