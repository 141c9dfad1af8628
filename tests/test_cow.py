"""Copy-on-write resample: multiset equivalence with the gather form."""

import jax
import jax.numpy as jnp
import numpy as np

from slamrs_tpu.ops.cow import cow_plan, cow_resample
from slamrs_tpu.ops.resample import systematic_resample


def _multiset(poses, grids):
    """Canonical sorted representation of the particle multiset."""
    keys = [tuple(np.asarray(p).tolist()) + (float(np.asarray(g).sum()),
                                             float(np.abs(np.asarray(g)).sum()))
            for p, g in zip(poses, grids)]
    return sorted(keys)


def test_cow_plan_identity_is_empty():
    anc = jnp.arange(16, dtype=jnp.int32)
    src, dst, n = cow_plan(anc)
    assert int(n) == 0
    # padding entries are self-writes
    np.testing.assert_array_equal(np.asarray(src), np.asarray(dst))


def test_cow_plan_counts():
    anc = jnp.array([0, 0, 0, 3, 3, 7, 7, 7], jnp.int32)
    src, dst, n = cow_plan(anc)
    # unique ancestors 0,3,7 keep their slots; 5 extra children
    assert int(n) == 5
    s = np.asarray(src)[:5]
    d = np.asarray(dst)[:5]
    assert sorted(s.tolist()) == [0, 0, 3, 7, 7]
    # destinations are exactly the freed slots
    assert sorted(d.tolist()) == [1, 2, 4, 5, 6]


def test_cow_resample_matches_take_multiset():
    p = 32
    key = jax.random.key(0)
    for seed in range(5):
        k1, k2, k3, k4 = jax.random.split(jax.random.key(seed), 4)
        poses = jax.random.normal(k1, (p, 3), jnp.float32)
        grids = jax.random.normal(k2, (p, 8, 128), jnp.float32)
        w = jax.random.dirichlet(k3, jnp.ones((p,)) * 0.3)
        anc = systematic_resample(k4, w)

        take_poses = jnp.take(poses, anc, axis=0)
        take_grids = jnp.take(grids, anc, axis=0)
        cow_poses, cow_grids = cow_resample(grids, poses, anc,
                                            interpret=True)
        assert _multiset(take_poses, take_grids) == \
            _multiset(cow_poses, cow_grids)
        # pose/grid pairing preserved: each slot's pose matches its grid's
        # original owner
        cp = np.asarray(cow_poses)
        cg = np.asarray(cow_grids)
        op = np.asarray(poses)
        og = np.asarray(grids)
        for i in range(p):
            owner = np.flatnonzero((np.abs(og - cg[i]).sum(axis=(1, 2))
                                    < 1e-6))
            assert owner.size >= 1
            assert any(np.allclose(op[o], cp[i]) for o in owner)


def test_cow_resample_peaked_weights_staged_groups():
    """Degenerate resample (1-2 survivors): copy groups far larger than
    the staged-write window — exercises the stage fetch, slot-reuse
    waits and group/final drains of the staged kernel."""
    p = 64
    poses = jax.random.normal(jax.random.key(4), (p, 3), jnp.float32)
    grids = jax.random.normal(jax.random.key(5), (p, 8, 128), jnp.float32)
    for w in (jnp.zeros((p,)).at[7].set(1.0),                     # 1 group
              jnp.zeros((p,)).at[3].set(0.6).at[40].set(0.4)):    # 2 groups
        anc = systematic_resample(jax.random.key(6), w)
        take_poses = jnp.take(poses, anc, axis=0)
        take_grids = jnp.take(grids, anc, axis=0)
        cow_poses, cow_grids = cow_resample(grids, poses, anc,
                                            interpret=True)
        assert _multiset(take_poses, take_grids) == \
            _multiset(cow_poses, cow_grids)


def test_cow_resample_identity_noop():
    p = 8
    poses = jax.random.normal(jax.random.key(1), (p, 3), jnp.float32)
    grids = jax.random.normal(jax.random.key(2), (p, 8, 128), jnp.float32)
    anc = jnp.arange(p, dtype=jnp.int32)
    cow_poses, cow_grids = cow_resample(grids, poses, anc, interpret=True)
    np.testing.assert_array_equal(np.asarray(cow_poses), np.asarray(poses))
    np.testing.assert_array_equal(np.asarray(cow_grids), np.asarray(grids))


def test_gridslam_fused_hbm_cow_path():
    """End-to-end gridslam update on the HBM-window + CoW resample path
    (fused_resident=False): the slot-relabeled filter must stay healthy
    and its best-particle map must match the resident path's multiset."""
    from slamrs_tpu.core.types import OdometryReading, Scan
    from slamrs_tpu.models import gridslam as gs

    B = 360
    cfg = gs.GridSlamConfig(position_x=-2, position_y=-2, width=4.0,
                            height=4.0, resolution=0.05, n_particles=8,
                            max_scan_range=1.0, integrate="fused",
                            resample_neff_frac=1.0,  # force resampling
                            fused_resident=False)
    state = gs.GridSlamState.init(cfg)
    angles = jnp.arange(B, dtype=jnp.float32) * (2 * np.pi / B)
    scan = Scan(angles=angles,
                distances=jnp.full((B,), 0.8, jnp.float32),
                strengths=jnp.ones((B,), jnp.float32),
                valid=jnp.ones((B,), bool),
                present=jnp.ones((B,), bool))
    odo = OdometryReading(jnp.float32(0.01), jnp.float32(0.012),
                          jnp.float32(0.1))
    key = jax.random.key(3)
    for i in range(3):
        key, k = jax.random.split(key)
        state, out = gs.update(state, scan, odo, k, cfg)
        assert bool(out.resampled)
        assert np.isfinite(float(out.n_eff))
    # ancestors stay identity (CoW applies in place, no pending lineage)
    np.testing.assert_array_equal(np.asarray(state.ancestors),
                                  np.arange(8))
    assert float(jnp.abs(state.grids.astype(jnp.float32)).sum()) > 0


def test_cow_plan_byte_accounting():
    """The config-3 bound probe (bench.py --config3-bound) computes moved
    bytes as (n_copies + unique_sources) * map_bytes; gate the plan
    arithmetic it relies on: copy count == duplicated children, and the
    staged kernel's unique-source count == distinct ancestors with
    duplicates."""
    from slamrs_tpu.ops.cow import cow_plan

    p = 64
    anc_np = np.sort(np.array([0] * 10 + [3] * 5 + [7] * 2
                              + list(range(8, 8 + p - 17))))
    anc = jnp.asarray(anc_np, jnp.int32)
    src, dst, n_copies = cow_plan(anc)
    dup_children = int(sum(c - 1 for c in
                           np.bincount(anc_np) if c > 1))
    assert int(n_copies) == dup_children  # 9 + 4 + 1
    uniq_sources = len(np.unique(np.asarray(src)[:int(n_copies)]))
    assert uniq_sources == 3  # ancestors 0, 3, 7
    # destinations are freed slots (no surviving ancestor overwritten)
    freed = set(range(p)) - set(anc_np.tolist())
    assert set(np.asarray(dst)[:int(n_copies)].tolist()) <= freed
