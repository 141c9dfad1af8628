"""Multi-chip fleet scaling: mesh construction and world-state sharding.

The reference is strictly single-process (SURVEY §2.3/§5.8: its only
"transports" are in-process mpsc channels and the robot serial/TCP link);
scale-out is a new, TPU-native capability: BASELINE config 5 asks for 256
parallel worlds on a v5e-8.

Design (the scaling-book recipe — pick a mesh, annotate shardings, let the
XLA SPMD partitioner insert the collectives):

* mesh axes ``(world, particle)``: the world axis is pure data parallelism
  (worlds never communicate); the particle axis shards the RBPF particle
  set *within* each world — weight normalization and the systematic
  resample's cumulative sum become cross-shard reductions, and the
  ancestor gather of per-particle grids becomes an all-to-all, all
  partitioner-inserted and riding ICI.
* ``shard_world_state`` annotates the :class:`WorldState` pytree: leaves
  with a leading worlds axis get ``P('world', ...)``; per-particle leaves
  (poses/grids/weights of the PF) additionally shard their particle axis;
  shared scalars (scan timer/counter) replicate.

No NCCL/MPI-style runtime exists or is needed: a jitted step with these
shardings IS the distributed program.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, particle_axis: int = 1,
              devices=None) -> Mesh:
    """Build a ``(world, particle)`` mesh over the first ``n_devices``.

    ``particle_axis`` devices are dedicated to particle-sharding; the rest
    to worlds (data parallel).  ``particle_axis=1`` gives a pure-DP mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % particle_axis != 0:
        raise ValueError(f"{n} devices not divisible by particle_axis="
                         f"{particle_axis}")
    arr = np.array(devices).reshape(n // particle_axis, particle_axis)
    return Mesh(arr, ("world", "particle"))


def fleet_shardings(state, mesh: Mesh, worlds: int):
    """Sharding pytree for a batched :class:`WorldState` (explicit per
    field: worlds axis -> 'world'; the PF's per-particle axis ->
    'particle'; shared scalars replicated)."""
    del worlds  # structure, not shapes, determines the specs
    ws = lambda *rest: NamedSharding(mesh, P("world", *rest))
    rep = NamedSharding(mesh, P())

    grid_sh = None
    if state.grid is not None:
        from slamrs_tpu.models.gridslam import GridSlamState

        if state.grid.tile_table is not None:
            # tiled maps (world-only meshes): grids is the per-world
            # tile POOL [W, n_phys, hb, C] — its second axis is physical
            # tiles, NOT particles; shard the world axis only
            grid_sh = GridSlamState(
                poses=ws("particle"),   # [W, P, 3]
                grids=ws(),             # [W, n_phys, hb, C] pool
                weights=ws("particle"),
                best_pose=ws(),
                best_idx=ws(),
                ancestors=ws("particle"),
                tile_table=ws("particle"),  # [W, P, nb]
            )
        else:
            grid_sh = GridSlamState(
                poses=ws("particle"),  # [W, P, 3]
                grids=ws("particle"),  # [W, P, H, Wc]
                weights=ws("particle"),  # [W, P]
                best_pose=ws(),  # [W, 3]
                best_idx=ws(),  # [W]
                ancestors=ws("particle"),  # [W, P]
            )
    icp_sh = (jax.tree.map(lambda _: ws(), state.icp)
              if state.icp is not None else None)
    ekf_sh = (jax.tree.map(lambda _: ws(), state.ekf)
              if state.ekf is not None else None)

    return type(state)(
        pose=ws(),
        accum_left=ws(),
        accum_right=ws(),
        scan_timer=rep,
        scan_counter=rep,
        grid=grid_sh,
        icp=icp_sh,
        ekf=ekf_sh,
    )


def shard_world_state(state, mesh: Mesh, worlds: int):
    """Place a host-built WorldState onto the mesh with fleet shardings."""
    shardings = fleet_shardings(state, mesh, worlds)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, s), state, shardings)
