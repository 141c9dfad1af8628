"""Gather-free small-table lookups.

TPU has no fast vector-gather: ``table[idx]`` with per-lane indices lowers
to a serialized gather that dominates whole pipelines (measured ~10x the
cost of the surrounding math for a 360-entry beam table).  The TPU-native
formulation turns the lookup into matmuls the MXU can chew:

* one-hot:  ``out = onehot(idx, B) @ table`` — B compares per lane;
* radix:    factor ``idx = hi * lo_size + lo`` and contract two small
  one-hots against a reshaped table — ``hi_size + lo_size`` compares per
  lane (≈ 2·sqrt(B)) plus small MXU contractions.

Used by the dense occupancy-grid integrator for beam-table lookups.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


def onehot_lookup(table: Array, idx: Array) -> Array:
    """table [B] or [B, K]; idx int[...] -> [...] or [..., K]."""
    b = table.shape[0]
    squeeze = table.ndim == 1
    t = table[:, None] if squeeze else table
    iota = lax.broadcasted_iota(jnp.int32, (*idx.shape, b), idx.ndim)
    oh = (idx[..., None] == iota).astype(t.dtype)
    out = jnp.einsum("...b,bk->...k", oh, t,
                     preferred_element_type=jnp.float32)
    return out[..., 0] if squeeze else out


def radix_lookup(table: Array, idx: Array) -> Array:
    """Radix-factored one-hot lookup: ~2*sqrt(B) compares per lane.

    table [B] or [B, K]; idx int[...] (values in [0, B)) -> [...] / [..., K].
    """
    b = table.shape[0]
    squeeze = table.ndim == 1
    t = table[:, None] if squeeze else table
    k = t.shape[1]

    lo_sz = max(int(math.isqrt(b)), 1)
    hi_sz = -(-b // lo_sz)  # ceil
    pad = hi_sz * lo_sz - b
    if pad:
        t = jnp.concatenate([t, jnp.zeros((pad, k), t.dtype)], axis=0)
    t2 = t.reshape(hi_sz, lo_sz * k)

    hi = idx // lo_sz
    lo = idx % lo_sz
    iota_hi = lax.broadcasted_iota(jnp.int32, (*idx.shape, hi_sz), idx.ndim)
    iota_lo = lax.broadcasted_iota(jnp.int32, (*idx.shape, lo_sz), idx.ndim)
    oh_hi = (hi[..., None] == iota_hi).astype(t.dtype)
    oh_lo = (lo[..., None] == iota_lo).astype(t.dtype)

    m1 = jnp.einsum("...h,hj->...j", oh_hi, t2,
                    preferred_element_type=jnp.float32)
    m1 = m1.reshape(*idx.shape, lo_sz, k)
    out = jnp.einsum("...l,...lk->...k", oh_lo, m1,
                     preferred_element_type=jnp.float32)
    return out[..., 0] if squeeze else out
