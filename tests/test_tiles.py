"""Tile-grained copy-on-write maps (ops/tiles.py): the tiled kernel +
plan must be bitwise-equivalent to dense maps + whole-set resampling.

Runs in Pallas interpret mode on the CPU mesh (compiled on real TPU by
bench.py's config-3 tiled entry).
"""

import jax
import jax.numpy as jnp
import numpy as np

from slamrs_tpu.core.types import OdometryReading, Scan
from slamrs_tpu.models import gridslam as gs
from slamrs_tpu.ops.fused import fused_update, window_rows
from slamrs_tpu.ops.grid import GridSpec2D
from slamrs_tpu.ops.tiles import (fused_update_tiled, init_tiled,
                                  materialize, tile_geometry, tiled_plan)

# 256 x 128 cells, 5 bands of 56 rows (wr == 56): windows cross band
# boundaries, t0 spans [0, 3]
SPEC = GridSpec2D(-3.2, -6.4, 6.4, 12.8, 0.05)
B = 360
P = 8


def _scan(seed):
    k = jax.random.key(seed)
    dist = jax.random.uniform(k, (B,), jnp.float32, 0.1, 1.0)
    valid = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.8, (B,))
    present = jnp.ones((B,), bool).at[350:].set(False)
    return dist, valid, present


def _poses(seed, span_y=5.9):
    k = jax.random.key(seed)
    return jnp.stack([
        jax.random.uniform(k, (P,), jnp.float32, -2.9, 2.9),
        jax.random.uniform(jax.random.fold_in(k, 1), (P,), jnp.float32,
                           -span_y, span_y),
        jax.random.uniform(jax.random.fold_in(k, 2), (P,), jnp.float32,
                           -3.0, 3.0)], axis=-1)


def test_tile_geometry():
    hb, nb, cols = tile_geometry(SPEC, 1.0)
    assert hb == window_rows(SPEC, 1.0) == 56
    assert nb == 5 and cols == 128


def test_tiled_plan_invariants():
    n_phys = P * 5 + 2 * P
    table = jnp.zeros((P, 5), jnp.int32)  # all share tile 0
    t0 = jnp.array([0, 0, 1, 2, 3, 3, 1, 0], jnp.int32)
    src, dst, new_table = map(np.asarray,
                              jax.jit(tiled_plan, static_argnums=2)(
                                  table, t0, n_phys))
    # everything shared: every request gets a FRESH, DISTINCT tile
    assert (src == 0).all()
    assert (dst != 0).all()
    assert len(set(dst.reshape(-1).tolist())) == 2 * P
    for i in range(P):
        assert new_table[i, t0[i]] == dst[i, 0]
        assert new_table[i, t0[i] + 1] == dst[i, 1]
    # second round on the new table: touched tiles are now exclusive ->
    # in place (dst == src), untouched bands still shared
    src2, dst2, _ = map(np.asarray,
                        jax.jit(tiled_plan, static_argnums=2)(
                            jnp.asarray(new_table), t0, n_phys))
    assert (src2 == dst2).all()
    # relabel concentrating everything on particle 0's row, same t0:
    # tiles become shared again -> fresh; freed tiles get recycled
    anc = jnp.zeros((P,), jnp.int32)
    relabeled = jnp.take(jnp.asarray(new_table), anc, axis=0)
    src3, dst3, _ = map(np.asarray,
                        jax.jit(tiled_plan, static_argnums=2)(
                            relabeled, t0, n_phys))
    # all rows reference p0's tiles now; every touched tile is shared by
    # all P rows (refcount P >= 2) so EVERY request must be fresh
    assert (src3[0] == np.asarray(new_table)[0, [t0[0], t0[0] + 1]]).all()
    assert (dst3 != src3).all()
    # every fresh dst is unique, and none is a live (referenced) tile
    vals = dst3.reshape(-1).tolist()
    assert len(vals) == len(set(vals))
    assert not (set(vals) & set(np.asarray(relabeled).reshape(-1).tolist()))


def test_tiled_update_matches_dense_kernel():
    """K updates with resamples in between: materialize(tiled) must stay
    BITWISE equal to the dense HBM kernel + whole-set jnp.take resample,
    and the likelihoods must match exactly."""
    hb, nb, cols = tile_geometry(SPEC, 1.0)
    pool, table = init_tiled(P, SPEC, 1.0, dtype=jnp.bfloat16)
    dense = jnp.zeros((P, SPEC.rows, cols), jnp.bfloat16)
    a0 = jnp.float32(0.0)
    rng = np.random.default_rng(7)
    for step in range(4):
        poses = _poses(100 + step)
        dist, valid, present = _scan(200 + step)
        pool, table, lt = fused_update_tiled(
            pool, table, poses, a0, dist, valid, present, SPEC, B, 1.0,
            interpret=True)
        dense, ld = fused_update(dense, poses, a0, dist, valid, present,
                                 SPEC, B, 1.0, resident=False,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(lt), np.asarray(ld),
                                      err_msg=f"lik step {step}")
        mat = materialize(pool, table, SPEC)
        np.testing.assert_array_equal(
            np.asarray(mat, np.float32), np.asarray(dense, np.float32),
            err_msg=f"maps step {step}")
        # resample: tiled relabels the table, dense gathers maps
        anc = jnp.asarray(np.sort(rng.integers(0, P, size=P)), jnp.int32)
        table = jnp.take(table, anc, axis=0)
        dense = jnp.take(dense, anc, axis=0)


def test_tiled_wide_grid_column_crop_matches_dense():
    """Column-cropped geometry (padded cols > 256 -> wc=256 + crop128
    pair path) — the config-3 shape this module exists for.  Guards the
    window's 128-aligned column offset reaching the cell pass (a c0
    drop integrates the scan into wrong columns and leaks increments
    into the padded column tail while the likelihood stays plausible)."""
    wide = GridSpec2D(-12.8, -6.4, 25.6, 12.8, 0.05)  # 256 x 512 cells
    hb, nb, cols = tile_geometry(wide, 1.0)
    assert cols == 512
    pool, table = init_tiled(P, wide, 1.0, dtype=jnp.bfloat16)
    dense = jnp.zeros((P, wide.rows, cols), jnp.bfloat16)
    a0 = jnp.float32(0.0)
    rng = np.random.default_rng(11)
    for step in range(3):
        k = jax.random.key(600 + step)
        poses = jnp.stack([
            jax.random.uniform(k, (P,), jnp.float32, -12.2, 12.2),
            jax.random.uniform(jax.random.fold_in(k, 1), (P,),
                               jnp.float32, -5.9, 5.9),
            jax.random.uniform(jax.random.fold_in(k, 2), (P,),
                               jnp.float32, -3.0, 3.0)], axis=-1)
        # pin two poses to the x-edges so c0 clamps both ways
        poses = poses.at[0, 0].set(-12.7).at[1, 0].set(12.7)
        dist, valid, present = _scan(700 + step)
        pool, table, lt = fused_update_tiled(
            pool, table, poses, a0, dist, valid, present, wide, B, 1.0,
            interpret=True)
        dense, ld = fused_update(dense, poses, a0, dist, valid, present,
                                 wide, B, 1.0, resident=False,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(lt), np.asarray(ld),
                                      err_msg=f"lik step {step}")
        mat = materialize(pool, table, wide)
        np.testing.assert_array_equal(
            np.asarray(mat, np.float32), np.asarray(dense, np.float32),
            err_msg=f"maps step {step}")
        # padded column tail must stay exactly 0 (CLAUDE.md invariant)
        assert (np.asarray(mat, np.float32)[:, :, wide.cols:] == 0).all()
        anc = jnp.asarray(np.sort(rng.integers(0, P, size=P)), jnp.int32)
        table = jnp.take(table, anc, axis=0)
        dense = jnp.take(dense, anc, axis=0)


def test_tiled_edge_windows_match():
    """Poses pinned to the grid's y-edges: r0/t0 clamping and the padded
    tail rows (nb*hb > spec.rows) must not change logical-row results."""
    pool, table = init_tiled(P, SPEC, 1.0, dtype=jnp.bfloat16)
    _, _, cols = tile_geometry(SPEC, 1.0)
    dense = jnp.zeros((P, SPEC.rows, cols), jnp.bfloat16)
    poses = _poses(300)
    poses = poses.at[0, 1].set(-6.3).at[1, 1].set(6.3)  # y edges
    poses = poses.at[2, 1].set(-6.0).at[3, 1].set(6.0)
    a0 = jnp.float32(0.0)
    dist, valid, present = _scan(301)
    pool, table, lt = fused_update_tiled(
        pool, table, poses, a0, dist, valid, present, SPEC, B, 1.0,
        interpret=True)
    dense, ld = fused_update(dense, poses, a0, dist, valid, present,
                             SPEC, B, 1.0, resident=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(lt), np.asarray(ld))
    np.testing.assert_array_equal(
        np.asarray(materialize(pool, table, SPEC), np.float32),
        np.asarray(dense, np.float32))


# 96 x 256 cells: the 0.02 m-CLASS geometry in miniature — the window
# (wr=56) covers most map rows, so auto_band_rows picks half-window
# bands (hb=24) and fused_update_tiled dispatches to the k-span cached
# kernel (kspan=3)
KSPEC = GridSpec2D(-6.4, -2.4, 12.8, 4.8, 0.05)


def test_tiled_kspan_matches_dense_kernel():
    """The k-span cached kernel (bands narrower than the window) must
    stay BITWISE equal to the dense HBM kernel, with the PENDING
    resample lineage applied in-call and the shared-window groups keyed
    on it (fillers cache the pre-rolled view; sharers skip middle-band
    DMAs and recompute from the cache)."""
    from slamrs_tpu.ops.tiles import auto_band_rows, span_geometry

    wr = window_rows(KSPEC, 1.0)
    hb = auto_band_rows(KSPEC, 1.0)
    assert hb is not None and wr > hb + 1
    _, kspan, nb = span_geometry(KSPEC, 1.0, hb)
    assert kspan >= 3
    pool, table = init_tiled(P, KSPEC, 1.0, dtype=jnp.bfloat16)
    assert pool.shape[1] == hb
    dense = jnp.zeros((P, KSPEC.rows, 256), jnp.bfloat16)
    a0 = jnp.float32(0.0)
    rng = np.random.default_rng(13)
    anc = jnp.arange(P, dtype=jnp.int32)  # first update: identity pending
    for step in range(4):
        k = jax.random.key(800 + step)
        poses = jnp.stack([
            jax.random.uniform(k, (P,), jnp.float32, -6.3, 6.3),
            jax.random.uniform(jax.random.fold_in(k, 1), (P,),
                               jnp.float32, -2.3, 2.3),
            jax.random.uniform(jax.random.fold_in(k, 2), (P,),
                               jnp.float32, -3.0, 3.0)], axis=-1)
        if step == 1:
            # true sharers: same ancestor (set below at step 0) AND the
            # exact same pose -> one filler + two cache sharers
            poses = poses.at[1].set(poses[0]).at[2].set(poses[0])
        if step == 2:
            # r0/t0 clamps at the y-edges, u0 clamps at the x-edges
            poses = poses.at[0, 1].set(-2.35).at[1, 1].set(2.35)
            poses = poses.at[2, 0].set(-6.35).at[3, 0].set(6.35)
        dist, valid, present = _scan(900 + step)
        pool, table, lt = fused_update_tiled(
            pool, table, poses, a0, dist, valid, present, KSPEC, B, 1.0,
            interpret=True, ancestors=anc)
        dense = jnp.take(dense, anc, axis=0)
        dense, ld = fused_update(dense, poses, a0, dist, valid, present,
                                 KSPEC, B, 1.0, resident=False,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(lt), np.asarray(ld),
                                      err_msg=f"lik step {step}")
        mat = materialize(pool, table, KSPEC)
        np.testing.assert_array_equal(
            np.asarray(mat, np.float32), np.asarray(dense, np.float32),
            err_msg=f"maps step {step}")
        # padded column tail must stay exactly 0 (CLAUDE.md invariant)
        assert (np.asarray(mat, np.float32)[:, :, KSPEC.cols:] == 0).all()
        # concentrated PENDING lineage for the next update
        anc = jnp.asarray(np.sort(rng.integers(0, max(2, P // 2), size=P)),
                          jnp.int32)
        if step == 0:
            anc = anc.at[0].set(0).at[1].set(0).at[2].set(0)


import pytest


@pytest.mark.parametrize("neff_frac", [1.0, 0.0])
def test_gridslam_tiled_bitwise_vs_gather(neff_frac):
    """gs.update with resample_cow="tiled" is bitwise the whole-set
    gather formulation (resample_cow=False): same kernel math, the only
    difference is map storage — so poses, weights, and the materialized
    best map must match exactly across resampling steps.  neff_frac=1.0
    resamples every step (fresh-tile CoW path); 0.0 never resamples
    (identity relabel -> exclusively-owned tiles, pure in-place writes)."""
    kw = dict(position_x=-3.2, position_y=-6.4, width=6.4, height=12.8,
              resolution=0.05, n_particles=P, max_scan_range=1.0,
              integrate="fused", grid_dtype="bfloat16",
              resample_neff_frac=neff_frac)
    cfg_t = gs.GridSlamConfig(**kw, resample_cow="tiled")
    cfg_d = gs.GridSlamConfig(**kw, resample_cow=False,
                              fused_resident=False)
    st = gs.GridSlamState.init(cfg_t)
    sd = gs.GridSlamState.init(cfg_d)
    assert st.tile_table is not None and sd.tile_table is None
    angles = jnp.arange(B, dtype=jnp.float32) * (2 * np.pi / B)
    odo = OdometryReading(jnp.float32(0.02), jnp.float32(0.03),
                          jnp.float32(0.2))
    for step in range(3):
        dist, valid, present = _scan(400 + step)
        scan = Scan(angles, dist, jnp.ones((B,)), valid, present)
        k = jax.random.key(500 + step)
        st, ot = gs.update(st, scan, odo, k, cfg_t)
        sd, od_ = gs.update(sd, scan, odo, k, cfg_d)
        np.testing.assert_array_equal(np.asarray(st.poses),
                                      np.asarray(sd.poses))
        np.testing.assert_array_equal(np.asarray(st.weights),
                                      np.asarray(sd.weights))
        np.testing.assert_array_equal(np.asarray(ot.pose),
                                      np.asarray(od_.pose))
        # the tiled table carries a PENDING lineage (slot i's map is
        # tile_table[ancestors[i]] until the next update applies it);
        # the dense formulation gathered its maps immediately
        mt = materialize(st.grids,
                         jnp.take(st.tile_table, st.ancestors, axis=0),
                         SPEC)
        np.testing.assert_array_equal(
            np.asarray(mt, np.float32),
            np.asarray(sd.grids, np.float32), err_msg=f"step {step}")
    # the estimated-map read-out goes through the tile gather
    pt = gs.estimated_probability_grid(st, cfg_t)
    pd = gs.estimated_probability_grid(sd, cfg_d)
    np.testing.assert_array_equal(np.asarray(pt), np.asarray(pd))
