"""Fleet composition of the best resample mechanisms (VERDICT r4 #4).

Round 4 left the scale-out story running its WORST resample path: batched
fleets forced ``resample_cow=False`` (whole-set gather) and tiled states
raised.  These tests gate the composition that replaces that:

* unsharded fleets apply ONE flattened cross-world CoW pass
  (``gridslam._update_fleet_cow`` — block-diagonal ancestors, only
  duplicated maps move),
* world-only meshes run that same pass per device under ``shard_map``,
* tiled pools run as a trace-time world loop (per-call CoW plans),
  unsharded and under a world-only mesh.

Reference semantics per world: ParticleFilter::resample
(slamrs/slam/src/grid/particle.rs:78-105) over independent worlds.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slamrs_tpu.core.types import OdometryReading, Scan
from slamrs_tpu.models import gridslam as gs

B = 64


def _fleet_inputs(seed, worlds, step=0):
    rng = np.random.default_rng(seed + 131 * step)
    angles = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.float32) * (2 * np.pi / B), (worlds, B))
    dist = jnp.asarray(rng.uniform(0.15, 0.95, size=(worlds, B)),
                       jnp.float32)
    valid = jnp.asarray(rng.random((worlds, B)) > 0.1)
    present = jnp.asarray(rng.random((worlds, B)) > 0.05)
    scan = Scan(angles, dist, jnp.ones((worlds, B), jnp.float32), valid,
                present)
    odo = OdometryReading(jnp.full((worlds,), 0.02, jnp.float32),
                          jnp.full((worlds,), 0.03, jnp.float32),
                          jnp.full((worlds,), 0.2, jnp.float32))
    keys = jax.random.split(jax.random.key(700 + step), worlds)
    return scan, odo, keys


def _base_cfg(**over):
    kw = dict(position_x=-2.0, position_y=-2.0, width=4.0, height=4.0,
              resolution=0.05, n_particles=16, max_scan_range=1.0,
              integrate="fused", grid_dtype="bfloat16",
              resample_neff_frac=1.0)  # force resampling every update
    kw.update(over)
    return gs.GridSlamConfig(**kw)


def _multiset_equal(poses_a, grids_a, poses_b, grids_b, world):
    """Per-world particle-multiset equality (slot order is free)."""
    ka = np.argsort([p.tobytes() + g.tobytes()
                     for p, g in zip(poses_a, grids_a)])
    kb = np.argsort([p.tobytes() + g.tobytes()
                     for p, g in zip(poses_b, grids_b)])
    np.testing.assert_array_equal(poses_a[ka], poses_b[kb],
                                  err_msg=f"world {world} poses")
    np.testing.assert_array_equal(grids_a[ka], grids_b[kb],
                                  err_msg=f"world {world} grids")


def test_fleet_cow_multiset_matches_gather():
    """The default unsharded-fleet resample (flattened cross-world CoW)
    must produce the same per-world particle MULTISET as the slot-exact
    gather mode after one resampling update (slot order is free, and the
    NEXT step's per-slot noise pairing makes trajectories order-dependent
    — so the comparison is one step from a common state, like the
    sharded local/gather gate).  A second local-mode update then checks
    consecutive CoW applications compose (pending lineage fully applied
    each call)."""
    worlds = 3
    res = {}
    st_local = None
    for mode in ("local", "gather"):
        cfg = _base_cfg(fleet_resample=mode)
        st = gs.GridSlamState.init(cfg, (worlds,))
        scan, odo, keys = _fleet_inputs(11, worlds)
        st, outs = gs.update_fleet(st, scan, odo, keys, cfg, mesh=None)
        assert bool(np.asarray(outs.resampled).all())
        # the CoW path applies lineage immediately: identity pending
        np.testing.assert_array_equal(
            np.asarray(st.ancestors),
            np.broadcast_to(np.arange(cfg.n_particles, dtype=np.int32),
                            (worlds, cfg.n_particles)))
        res[mode] = (np.asarray(st.poses), np.asarray(st.grids, np.float32))
        if mode == "local":
            st_local = st
    for w in range(worlds):
        _multiset_equal(res["local"][0][w], res["local"][1][w],
                        res["gather"][0][w], res["gather"][1][w], w)
    # consecutive CoW updates from the resampled state stay sound
    cfg = _base_cfg(fleet_resample="local")
    scan, odo, keys = _fleet_inputs(11, worlds, step=1)
    st2, outs2 = gs.update_fleet(st_local, scan, odo, keys, cfg, mesh=None)
    assert np.isfinite(np.asarray(st2.poses)).all()
    assert np.isfinite(np.asarray(outs2.n_eff)).all()


def test_fleet_cow_world_only_mesh_matches_unsharded():
    """A pure-DP (world-only) mesh runs the flattened CoW pass per device
    under shard_map; the per-world copy plan is identical to the
    unsharded flattened plan (block-diagonal alignment), so outputs agree
    up to cross-compilation fma contraction."""
    from slamrs_tpu.parallel.fleet import make_mesh

    worlds = 8
    mesh = make_mesh(8, particle_axis=1)
    cfg = _base_cfg()
    st_m = gs.GridSlamState.init(cfg, (worlds,))
    st_p = st_m
    # one resampling step suffices: consecutive-application composition
    # is covered unsharded above, and the mesh body IS that same path
    scan, odo, keys = _fleet_inputs(23, worlds)
    st_m, outs_m = gs.update_fleet(st_m, scan, odo, keys, cfg, mesh=mesh)
    st_p, outs_p = gs.update_fleet(st_p, scan, odo, keys, cfg, mesh=None)
    assert bool(np.asarray(outs_m.resampled).all())
    np.testing.assert_allclose(np.asarray(st_m.poses),
                               np.asarray(st_p.poses), atol=1e-5)
    d_m = np.asarray(st_m.grids, np.float32)
    d_p = np.asarray(st_p.grids, np.float32)
    eq = float((d_m == d_p).mean())
    assert eq > 0.9999, f"mesh/unsharded grid agreement {eq}"
    assert float(np.abs(d_m - d_p).max()) <= 0.25


def test_fleet_tiled_matches_per_world_dense():
    """Tiled fleets (config-3 formulation at scale): update_fleet on a
    batched tiled state must be bitwise the dense gather formulation run
    per world — same kernel math, the only difference is map storage +
    the relabel resample (the single-world gate of test_tiles.py,
    composed over worlds)."""
    from slamrs_tpu.ops.tiles import materialize

    kw = dict(position_x=-3.2, position_y=-6.4, width=6.4, height=12.8,
              resolution=0.05, n_particles=16, max_scan_range=1.0,
              integrate="fused", grid_dtype="bfloat16",
              resample_neff_frac=1.0)
    cfg_t = gs.GridSlamConfig(**kw, resample_cow="tiled")
    cfg_d = gs.GridSlamConfig(**kw, resample_cow=False,
                              fused_resident=False)
    spec = cfg_t.grid_spec
    worlds = 2
    st = gs.GridSlamState.init(cfg_t, (worlds,))
    assert st.tile_table is not None and st.tile_table.shape[0] == worlds
    dense = [gs.GridSlamState.init(cfg_d) for _ in range(worlds)]
    for step in range(2):
        scan, odo, keys = _fleet_inputs(37, worlds, step)
        st, outs = gs.update_fleet(st, scan, odo, keys, cfg_t, mesh=None)
        assert bool(np.asarray(outs.resampled).all())
        for i in range(worlds):
            dense[i], _ = gs.update(
                dense[i], jax.tree.map(lambda x: x[i], scan),
                jax.tree.map(lambda x: x[i], odo), keys[i], cfg_d)
            np.testing.assert_array_equal(np.asarray(st.poses[i]),
                                          np.asarray(dense[i].poses))
            # tiled tables carry a PENDING lineage
            mt = materialize(st.grids[i],
                             jnp.take(st.tile_table[i], st.ancestors[i],
                                      axis=0), spec)
            np.testing.assert_array_equal(
                np.asarray(mt, np.float32),
                np.asarray(dense[i].grids, np.float32),
                err_msg=f"world {i} step {step}")
    # batched estimated-map read-out goes through the per-world gather
    pt = gs.estimated_probability_grid(st, cfg_t)
    assert pt.shape == (worlds, spec.rows, spec.cols)
    for i in range(worlds):
        pd = gs.estimated_probability_grid(dense[i], cfg_d)
        np.testing.assert_array_equal(np.asarray(pt[i]), np.asarray(pd))


def test_fleet_tiled_world_mesh():
    """Tiled fleets under a world-only mesh: the trace-time world loop
    runs per device inside shard_map (each device owns whole pools) and
    matches the unsharded tiled fleet; particle-sharded meshes reject."""
    from slamrs_tpu.parallel.fleet import make_mesh

    kw = dict(position_x=-3.2, position_y=-6.4, width=6.4, height=12.8,
              resolution=0.05, n_particles=16, max_scan_range=1.0,
              integrate="fused", grid_dtype="bfloat16",
              resample_neff_frac=1.0)
    cfg = gs.GridSlamConfig(**kw, resample_cow="tiled")
    worlds = 8
    mesh = make_mesh(8, particle_axis=1)
    st0 = gs.GridSlamState.init(cfg, (worlds,))
    scan, odo, keys = _fleet_inputs(41, worlds)
    st_m, outs_m = gs.update_fleet(st0, scan, odo, keys, cfg, mesh=mesh)
    st_p, outs_p = gs.update_fleet(st0, scan, odo, keys, cfg, mesh=None)
    np.testing.assert_allclose(np.asarray(st_m.poses),
                               np.asarray(st_p.poses), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(st_m.tile_table),
                                  np.asarray(st_p.tile_table))
    d_m = np.asarray(st_m.grids, np.float32)
    d_p = np.asarray(st_p.grids, np.float32)
    eq = float((d_m == d_p).mean())
    assert eq > 0.9999, f"mesh/unsharded pool agreement {eq}"
    assert float(np.abs(d_m - d_p).max()) <= 0.25
    np.testing.assert_allclose(np.asarray(outs_m.n_eff),
                               np.asarray(outs_p.n_eff), rtol=1e-5)

    with pytest.raises(ValueError, match="worlds only"):
        gs.update_fleet(st0, scan, odo, keys, cfg,
                        mesh=make_mesh(8, particle_axis=2))


def test_auto_tiled_selection():
    """VERDICT r4 #5: tiled storage auto-selects at the geometry where it
    measured 2.7x (config-3-class multi-GB map sets) and stays OFF for
    the dense-kernel regimes (headline 0.05 m, 0.02 m, config 2)."""
    config3 = gs.GridSlamConfig(position_x=-25.0, position_y=-25.0,
                                width=50.0, height=50.0, resolution=0.05,
                                n_particles=1024, integrate="fused",
                                grid_dtype="bfloat16")
    assert gs.auto_tiled(config3)
    # init applies the auto decision (threshold lowered so the test does
    # not allocate a real 2 GB pool; the decision path is identical)
    small_auto = _base_cfg(resample_cow=None)
    old = gs._AUTO_TILED_BYTES
    try:
        gs._AUTO_TILED_BYTES = 1024
        assert gs.auto_tiled(small_auto)
        st = gs.GridSlamState.init(small_auto)
        assert st.tile_table is not None
    finally:
        gs._AUTO_TILED_BYTES = old
    # explicit pins override auto in BOTH directions
    assert not gs.auto_tiled(
        dataclasses.replace(config3, resample_cow=True))
    small = [
        _base_cfg(),                                   # headline 0.05 m
        _base_cfg(resolution=0.02, n_particles=1024),  # 0.02 m
        gs.GridSlamConfig(position_x=-10.0, position_y=-10.0, width=20.0,
                          height=20.0, resolution=0.05, n_particles=100,
                          integrate="fused", grid_dtype="bfloat16"),
        dataclasses.replace(config3, integrate="dda"),
    ]
    for cfg in small:
        assert not gs.auto_tiled(cfg), cfg
        assert gs.GridSlamState.init(
            dataclasses.replace(cfg, n_particles=4, width=4.0, height=4.0,
                                position_x=-2.0, position_y=-2.0)
        ).tile_table is None
