"""Training/serving checkpoints (orbax) — the engine-level counterpart of the
reference's forward-artifact persistence.

The reference's only checkpointing is the O.bin/logsumexp.bin round trip
(/root/reference/src/main.cpp:66-81,110-113 — forward artifacts reloaded by
the backward CLI invocation); that contract lives in utils/io.py + cli.py.
This module is the TPU-native engine equivalent (SURVEY.md §5 "checkpoint /
resume: orbax-style checkpoint for the serving/training engine"): full train
state (params + optimizer + step) with atomic directory commits, restorable
onto a different device mesh (orbax re-shards on restore by target
shardings).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, params, opt_state=None, step: int = 0) -> str:
    """Atomically save a train-state checkpoint to `path` (a directory)."""
    state = {"params": params, "step": np.int64(step)}
    if opt_state is not None:
        state["opt_state"] = opt_state
    ckpt = _checkpointer()
    path = os.path.abspath(path)
    ckpt.save(path, state, force=True)
    return path


def restore_checkpoint(path: str, like=None):
    """Restore a checkpoint. If `like` (a matching pytree of arrays /
    ShapeDtypeStructs, possibly with shardings) is given, orbax restores
    directly onto those specs — this is how a checkpoint written on one mesh
    reloads onto another."""
    ckpt = _checkpointer()
    path = os.path.abspath(path)
    if like is None:
        return ckpt.restore(path)
    return ckpt.restore(path, item=like)


def save_for_backward(path_dir: str, o, lse) -> None:
    """The reference CLI's artifact contract (O.bin + logsumexp.bin,
    src/main.cpp:110-113) expressed at the engine level — see utils/io.py
    for the raw-fp32 codec."""
    from cuda_flash_attention_tpu.utils.io import save_binary_file

    os.makedirs(path_dir, exist_ok=True)
    save_binary_file(os.path.join(path_dir, "O.bin"), np.asarray(o))
    save_binary_file(os.path.join(path_dir, "logsumexp.bin"), np.asarray(lse))
