"""Checkpoint / resume for receiver carried state.

The reference has no checkpointing (SURVEY.md §5) — all DSP state lives in
C structs.  Here every chain's carried state is an explicit pytree
(ChainCarry / AMChainCarry / FrontendState / decoder delay lines), so
serialization is generic: flatten to arrays + a treedef key, store as an
``.npz``.  The same pytrees are the time-shard halo contract, so a
checkpoint taken at a block boundary resumes bit-exactly.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save_state(path: str, state) -> None:
    """Save any pytree of arrays/scalars to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_state(path: str, like):
    """Load a pytree saved by :func:`save_state`; ``like`` provides the
    structure (e.g. ``chain_init_carry()``)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    n = len(leaves)
    loaded = [data[f"leaf_{i}"] for i in range(n)]
    out = []
    for ref, arr in zip(leaves, loaded):
        ref = np.asarray(ref)
        if arr.shape != ref.shape:
            raise ValueError(f"shape mismatch {arr.shape} != {ref.shape}")
        out.append(jax.numpy.asarray(arr.astype(ref.dtype)))
    return jax.tree.unflatten(treedef, out)
