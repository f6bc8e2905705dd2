"""Sampler-state checkpoint/resume via orbax.

New capability over the reference (SURVEY.md section 5: the reference has no
sampler-state checkpointing — an interrupted HMC run restarts from scratch).
Snapshots the full chain-state pytree (x/z, PRNG keys, tau/eps/sigma_y,
epoch counters, sample buffers) so multi-host runs survive restarts.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_chain_state(path: str, state: Any, step: int = 0):
    """Write a chain-state pytree snapshot (orbax if available, else npz)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(path, f"step_{step}"), state, force=True)
    except Exception:
        leaves, treedef = jax.tree.flatten(state)
        np.savez(
            path + f"_step{step}.npz",
            *[np.asarray(l) for l in leaves],
            treedef=np.asarray(str(treedef)),
        )


def load_chain_state(path: str, template: Any, step: int = 0) -> Optional[Any]:
    """Restore a snapshot into the structure of `template`; None if absent."""
    try:
        import orbax.checkpoint as ocp

        full = os.path.join(os.path.abspath(path), f"step_{step}")
        if not os.path.exists(full):
            raise FileNotFoundError(full)
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(full, item=template)
        return jax.tree.map(
            lambda t, r: np.asarray(r, dtype=np.asarray(t).dtype), template, restored
        )
    except Exception:
        npz = path + f"_step{step}.npz"
        if not os.path.exists(npz):
            return None
        data = np.load(npz, allow_pickle=True)
        leaves = [data[k] for k in data.files if k != "treedef"]
        treedef = jax.tree.structure(template)
        return jax.tree.unflatten(treedef, leaves)
