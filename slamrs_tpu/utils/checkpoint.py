"""Checkpoint / resume for rollout state.

The reference has NO persistence — map save/load is an explicitly
unimplemented future direction (slamrs README.md:45) and the config
editor's Apply discards all node state (app.rs:121-134).  A production
TPU framework needs both, so this module adds them as a framework
capability (SURVEY §5.4):

* ``save(path, state)`` / ``load(path, like)``: any pytree of arrays
  (``WorldState``, ``GridSlamState``, ...) round-trips through one
  ``.npz`` file; ``load`` restores onto the template's treedef, dtypes
  and shardings (so a fleet checkpoint resumes onto the same mesh).
* CLI: ``python -m slamrs_tpu rollout ... --save-state s.npz`` /
  ``--resume s.npz``.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

_SEP = "|"


def save(path: str, state: Any) -> None:
    """Serialize a pytree of arrays to ``path`` (.npz).

    bfloat16 leaves are stored widened to float32 (exact; npz has no
    bf16 dtype) — ``load`` casts back to the template's dtype, which is
    a lossless round trip."""
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(state)

    def to_np(leaf):
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.bfloat16:
            leaf = leaf.astype(jnp.float32)
        return np.asarray(leaf)

    arrays = {f"leaf_{i}": to_np(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save` onto the structure, dtypes
    and device placement of ``like`` (build it with the same config)."""
    import jax.numpy as jnp

    with np.load(path) as data:
        like_leaves, treedef = jax.tree.flatten(like)
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        if n != len(like_leaves):
            raise ValueError(
                f"checkpoint has {n} leaves, template has "
                f"{len(like_leaves)} — config mismatch")
        out = []
        for i, tmpl in enumerate(like_leaves):
            arr = data[f"leaf_{i}"]
            if hasattr(tmpl, "shape") and tuple(arr.shape) != tuple(
                    tmpl.shape):
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != template "
                    f"{tmpl.shape}")
            if hasattr(tmpl, "dtype"):
                leaf = jnp.asarray(arr, tmpl.dtype)
                if hasattr(tmpl, "sharding") and hasattr(
                        tmpl.sharding, "mesh"):
                    leaf = jax.device_put(leaf, tmpl.sharding)
            else:
                leaf = arr
            out.append(leaf)
    return jax.tree.unflatten(treedef, out)
