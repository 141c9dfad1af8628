"""Fused Pallas RBPF kernel: correctness vs oracle + pipeline behavior.

Runs in Pallas interpret mode on the CPU mesh (the kernel itself is
exercised compiled on real TPU by bench.py / __graft_entry__).
"""

import jax
import jax.numpy as jnp
import numpy as np


from slamrs_tpu.core.types import OdometryReading, Scan
from slamrs_tpu.models import gridslam as gs
from slamrs_tpu.ops.fused import (encode_beam_table, fused_update,
                                  fused_update_reference,
                                  merge_segment_windows,
                                  shared_window_plan, window_rows)
from slamrs_tpu.ops.grid import GridSpec2D, grid_integrate_dense, \
    grid_log_likelihood, dense_window_for

SPEC = GridSpec2D(-2.0, -2.0, 4.0, 4.0, 0.05)
B = 360


def _mk(p=3, seed=0):
    grids = jax.random.normal(jax.random.key(seed), (p, 80, 128),
                              jnp.float32) * 0.5
    grids = grids.at[:, ::3, ::2].set(0.0)
    poses = jnp.stack([
        jax.random.uniform(jax.random.key(seed + 1), (p,), jnp.float32,
                           -1.3, 1.3),
        jax.random.uniform(jax.random.key(seed + 2), (p,), jnp.float32,
                           -1.3, 1.3),
        jax.random.uniform(jax.random.key(seed + 3), (p,), jnp.float32,
                           -3.0, 3.0)], axis=-1)
    dist = jax.random.uniform(jax.random.key(seed + 4), (B,), jnp.float32,
                              0.1, 1.0)
    valid = jax.random.bernoulli(jax.random.key(seed + 5), 0.8, (B,))
    present = jnp.ones((B,), bool).at[350:].set(False)
    return grids, poses, dist, valid, present


def test_kernel_matches_oracle_interpret():
    grids, poses, dist, valid, present = _mk()
    a0 = jnp.float32(0.0)
    g1, l1 = fused_update(grids, poses, a0, dist, valid, present,
                          SPEC, B, 1.0, interpret=True)
    g2, l2 = fused_update_reference(grids, poses, a0, dist, valid, present,
                                    SPEC, B, 1.0)
    # identical math modulo the atan2 polynomial: allow rare bin flips
    diff = np.abs(np.asarray(g1) - np.asarray(g2))
    frac = float((diff > 0.01).mean())
    assert frac < 1e-4, f"bin-flip fraction {frac}"
    # the endpoint likelihood is the same exact formulation in both:
    # tight equality (one-hot MXU gather == direct indexing)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-4)


def test_oracle_matches_dense_integrate():
    """The fused sensor model must agree with grid_integrate_dense on the
    window region (same inverse sensor model + multiplicity compensation)."""
    grids, poses, dist, valid, present = _mk(p=2, seed=7)
    a0 = jnp.float32(0.0)
    angles = jnp.arange(B, dtype=jnp.float32) * (2 * np.pi / B)
    g2, _ = fused_update_reference(grids, poses, a0, dist, valid, present,
                                   SPEC, B, 1.0)
    window = dense_window_for(SPEC, 1.0)
    dense = jax.vmap(lambda g, q: grid_integrate_dense(
        g[:, :SPEC.cols], SPEC, q, angles, dist, valid, present, window)
    )(grids, poses)
    # compare increments on the logical grid
    inc_f = np.asarray(g2[:, :, :SPEC.cols] - grids[:, :, :SPEC.cols])
    inc_d = np.asarray(dense - grids[:, :, :SPEC.cols])
    # same support + same classification for nearly all cells (different
    # angular rasterization -> sub-cell boundary flips allowed)
    agree = (np.abs(inc_f - inc_d) < 0.05) | \
            (np.sign(inc_f) == np.sign(inc_d))
    assert agree.mean() > 0.98, f"agreement {agree.mean()}"


def test_endpoint_likelihood_exact():
    """The fused likelihood IS the reference per-beam endpoint product:
    it must match grid_log_likelihood (the exact map.rs:113-145 port) up
    to float-associativity cell-boundary flips in the endpoint rounding.
    """
    grids, poses, dist, valid, present = _mk(p=8, seed=11)
    a0 = jnp.float32(0.0)
    angles = jnp.arange(B, dtype=jnp.float32) * (2 * np.pi / B)
    _, lik_f = fused_update_reference(grids, poses, a0, dist, valid,
                                      present, SPEC, B, 1.0)
    lik_ref = jax.vmap(lambda g, q: grid_log_likelihood(
        g[:, :SPEC.cols], SPEC, q, angles, dist, valid, present)
    )(grids, poses)
    lf = np.asarray(lik_f)
    lr = np.asarray(lik_ref)
    assert np.all(lf < 0) and np.all(lr < 0)
    # per-particle: the two formulations round endpoint coordinates with
    # different op orders ((x-px)/res + cos*d/res vs (x+cos*d-px)/res);
    # at most a couple of boundary beams may land in a neighboring cell
    per_beam_bound = abs(np.log(0.1))  # max |log factor| swing per beam
    assert np.abs(lf - lr).max() < 3 * per_beam_bound, (lf, lr)
    assert np.abs(lf - lr).mean() < 0.5


def _spearman(a, b):
    ra = np.argsort(np.argsort(a))
    rb = np.argsort(np.argsort(b))
    ra = ra - ra.mean()
    rb = rb - rb.mean()
    return float((ra * rb).sum()
                 / np.sqrt((ra * ra).sum() * (rb * rb).sum()))


def test_likelihood_rank_correlation_gate():
    """Ordering-level fidelity gate (what resampling selection sees):
    over 100 random (grids, poses) states, Spearman rank correlation
    between the fused likelihood and grid_log_likelihood must be >= 0.95
    per state, and the induced N_eff must agree closely."""
    from slamrs_tpu.ops.resample import (effective_particles,
                                         normalize_log_weights)

    angles = jnp.arange(B, dtype=jnp.float32) * (2 * np.pi / B)
    p = 16
    n_states = 100
    grids_all, poses_all, dist_all, valid_all, present_all = [], [], [], [], []
    for s in range(n_states):
        g, q, d, v, pr = _mk(p=p, seed=100 + 7 * s)
        grids_all.append(g)
        poses_all.append(q)
        dist_all.append(d)
        valid_all.append(v)
        present_all.append(pr)
    grids_all = jnp.stack(grids_all)
    poses_all = jnp.stack(poses_all)

    fused_b = jax.jit(jax.vmap(
        lambda g, q, d, v, pr: fused_update_reference(
            g, q, jnp.float32(0.0), d, v, pr, SPEC, B, 1.0)[1]))
    lik_f = np.asarray(fused_b(grids_all, poses_all,
                               jnp.stack(dist_all), jnp.stack(valid_all),
                               jnp.stack(present_all)))
    lik_r = np.zeros_like(lik_f)
    for s in range(n_states):
        lik_r[s] = np.asarray(jax.vmap(
            lambda g, q, s=s: grid_log_likelihood(
                g[:, :SPEC.cols], SPEC, q, angles, dist_all[s],
                valid_all[s], present_all[s]))(grids_all[s], poses_all[s]))

    rhos = np.array([_spearman(lik_f[s], lik_r[s])
                     for s in range(n_states)])
    assert (rhos >= 0.95).all(), f"min Spearman {rhos.min()}"
    # N_eff agreement: the resampling trigger must see the same degeneracy
    w_f = np.asarray(normalize_log_weights(jnp.asarray(lik_f)))
    w_r = np.asarray(normalize_log_weights(jnp.asarray(lik_r)))
    neff_f = np.asarray(effective_particles(jnp.asarray(w_f)))
    neff_r = np.asarray(effective_particles(jnp.asarray(w_r)))
    rel = np.abs(neff_f - neff_r) / neff_r
    assert np.median(rel) < 0.05, f"median N_eff rel err {np.median(rel)}"
    assert rel.max() < 0.35, f"max N_eff rel err {rel.max()}"


def test_hbm_column_crop_matches_oracle():
    """resident=False with cols > 128: the 8-aligned 128-lane column
    crop (the compute-halving window) must reproduce the full-width
    oracle exactly, including poses near the grid edges where c0
    clamps."""
    spec = GridSpec2D(-2.56, -2.56, 5.12, 5.12, 0.02)  # 256 x 256 cells
    p = 4
    grids = jax.random.normal(jax.random.key(11), (p, 256, 256),
                              jnp.float32) * 0.5
    grids = grids.at[:, ::3, ::2].set(0.0)
    # one interior pose, one near each x-edge (c0 clamps to 0 / cols-wc)
    poses = jnp.array([[0.1, -0.2, 0.3],
                       [-2.2, 0.0, 1.2],
                       [2.2, 0.3, -0.7],
                       [0.0, 2.2, 2.0]], jnp.float32)
    dist = jax.random.uniform(jax.random.key(12), (B,), jnp.float32,
                              0.1, 1.0)
    valid = jax.random.bernoulli(jax.random.key(13), 0.8, (B,))
    present = jnp.ones((B,), bool)
    a0 = jnp.float32(0.0)
    g1, l1 = fused_update(grids, poses, a0, dist, valid, present,
                          spec, B, 1.0, resident=False, interpret=True)
    g2, l2 = fused_update_reference(grids, poses, a0, dist, valid, present,
                                    spec, B, 1.0)
    diff = np.abs(np.asarray(g1) - np.asarray(g2))
    frac = float((diff > 0.01).mean())
    assert frac < 1e-4, f"bin-flip fraction {frac}"
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-4)


def test_hbm_deferred_lineage_matches_gather_then_kernel():
    """BOTH fused-lineage HBM kernels (_kernel_hbm_staged with in-place
    aliasing, _kernel_hbm_anc with band copies) must be BITWISE identical
    to materializing the resample first (jnp.take by ancestor) and
    running the plain HBM kernel: the lineage indirection only moves
    WHERE bytes come from, never what they are.  Covers duplicated,
    skipped, identity, whole-set-collapse, and UNSORTED ancestors (the
    staged plan stages per segment — wasteful, never wrong), and r0
    clamped at both grid edges."""
    grids, poses, dist, valid, present = _mk(p=8, seed=21)
    # push two poses to the y-edges so r0 clamps to 0 / rows-wr
    poses = poses.at[0, 1].set(-1.9).at[1, 1].set(1.9)
    a0 = jnp.float32(0.0)
    patterns = ([0, 0, 3, 3, 3, 5, 7, 7],     # dup + self mix
                list(range(8)),               # identity (skip): all lone
                [7] * 8,                      # whole-set collapse
                [1, 1, 2, 3, 4, 4, 6, 7],     # self slots adjacent to dups
                [3, 0, 0, 5, 3, 7, 1, 1])     # unsorted, incl. anc[5]==5
    for lineage in ("staged", "bands"):
        for anc_np in patterns:
            anc = jnp.asarray(anc_np, jnp.int32)
            g1, l1 = fused_update(grids, poses, a0, dist, valid, present,
                                  SPEC, B, 1.0, resident=False,
                                  interpret=True, ancestors=anc,
                                  hbm_lineage=lineage)
            g2, l2 = fused_update(jnp.take(grids, anc, axis=0), poses, a0,
                                  dist, valid, present, SPEC, B, 1.0,
                                  resident=False, interpret=True)
            np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2),
                                          err_msg=f"{lineage} {anc_np}")
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2),
                                          err_msg=f"{lineage} {anc_np}")


def test_pack2_packed_lik_matches_unpacked_bf16():
    """The packed-window likelihood fold (_lik_gather_fold_packed: i32
    sublane-pair gather + half-depth fold + 16-bit extract) must be
    BITWISE identical to the unpacked fold.  pack2=True routes phase B
    through the packed fold; pack2=False on the same bf16 geometry
    (cols == 128, so no crop128 pair either) uses _lik_gather_fold on
    the unpacked f32 window — disjoint code paths, same bits.  The grid
    update differs only by pack2's virtual-coordinate increment
    evaluation (same ops, same order — fma-contraction class)."""
    grids, poses, dist, valid, present = _mk(p=8, seed=41)
    grids = grids.astype(jnp.bfloat16)
    a0 = jnp.float32(0.0)
    g1, l1 = fused_update(grids, poses, a0, dist, valid, present,
                          SPEC, B, 1.0, interpret=True, pack2=True)
    g2, l2 = fused_update(grids, poses, a0, dist, valid, present,
                          SPEC, B, 1.0, interpret=True, pack2=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    d1 = np.asarray(g1, np.float32)
    d2 = np.asarray(g2, np.float32)
    assert float((d1 == d2).mean()) > 0.999
    np.testing.assert_allclose(d1, d2, atol=0.06)
    # and ground the likelihood against the direct-indexing oracle
    _, lr = fused_update_reference(grids, poses, a0, dist, valid,
                                   present, SPEC, B, 1.0)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(lr),
                               rtol=1e-5, atol=1e-4)


def test_merge_segment_windows_coverage_and_fallback():
    """merge_segment_windows invariants: offspring adopt the segment
    LEADER's (r0, u0) exactly when the leader placement still covers
    their scan disc (rows [floor(cy)-dh, floor(cy)+dh] clipped to the
    logical grid inside [r0, r0+wr), columns likewise inside the
    128-lane view); non-covered offspring keep their own placement;
    leaders and singleton segments are unchanged."""
    dh, wr, rows, cols = 53, 120, 200, 200
    anc = jnp.asarray([4, 4, 4, 4, 9, 9, 12], jnp.int32)
    #                  L  near far edge L near lone
    cy = jnp.asarray([100.0, 103.0, 170.0, 4.0, 60.0, 62.0, 30.0])
    cx = jnp.asarray([100.0, 98.0, 100.0, 100.0, 80.0, 170.0, 30.0])
    cxy = jnp.stack([cx, cy], axis=-1)
    r0 = jnp.asarray([40, 48, 112, 0, 0, 8, 0], jnp.int32)
    u0 = jnp.asarray([40, 32, 40, 40, 16, 104, 0], jnp.int32)
    r0m, u0m = map(np.asarray, merge_segment_windows(
        anc, r0, u0, cxy, dh, wr, rows, cols))
    # particle 1: rows [50, 156] and cols [45, 151] fit the leader's
    # [40, 160) x [40, 168) placement -> adopts (40, 40)
    assert r0m[1] == 40 and u0m[1] == 40
    # particle 2: cy=170 -> row 199 (clipped) >= 40+120 -> keeps own r0;
    # columns still covered -> adopts leader u0
    assert r0m[2] == 112 and u0m[2] == 40
    # particle 3: cy=4 -> lo_r clipped to 0 < 40 -> keeps own r0=0
    assert r0m[3] == 0
    # particle 5: cx=170 -> col 199 (clipped) >= 40+... leader u0=16
    # covers [16, 144) but hi_c=199 isn't inside -> keeps own u0
    assert u0m[5] == 104 and r0m[5] == 0  # rows merged (60->62 close)
    # leaders and the lone segment are untouched
    assert (r0m[[0, 4, 6]] == [40, 0, 0]).all()
    assert (u0m[[0, 4, 6]] == [40, 16, 0]).all()


def test_shared_window_plan_groups_fillers_overflow():
    """shared_window_plan invariants: equal (stage slot, r0/8, u0/8)
    keys share a slot with exactly the LOWEST particle index filling;
    in-place particles (spos < 0) are private; cache slots go to the
    LARGEST groups first and singleton groups never take one (their
    private path through the reserved per-buffer slots is identical
    work)."""
    spos = jnp.array([0, 0, 0, -1, 1, 1, 2, -1], jnp.int32)
    r0 = jnp.array([8, 8, 16, 8, 8, 8, 8, 8], jnp.int32)
    u0 = jnp.array([8, 8, 8, 8, 24, 24, 8, 8], jnp.int32)
    wsel, wfill = map(np.asarray, shared_window_plan(spos, r0, u0, 8))
    assert list(wfill) == [1, 0, 1, 1, 1, 0, 1, 1]
    assert wsel[0] == wsel[1] >= 0 and wsel[4] == wsel[5] >= 0
    assert wsel[0] != wsel[4]
    # singletons (split-group particle 2, lone-segment particle 6) and
    # in-place particles (3, 7) are private
    assert wsel[2] == wsel[6] == -1
    assert wsel[3] == -1 and wsel[7] == -1  # in-place: never cached
    # nw=1: only the first size-2 group keeps a slot; everyone else
    # fills privately
    wsel1, wfill1 = map(np.asarray, shared_window_plan(spos, r0, u0, 1))
    assert wsel1[0] == wsel1[1] == 0
    assert wsel1[4] == wsel1[5] == -1
    assert list(wfill1) == [1, 0, 1, 1, 1, 1, 1, 1]
    # a bigger group posted LATER in particle order wins the slot
    spos3 = jnp.array([0, 0, 1, 1, 1, -1, -1, -1], jnp.int32)
    flat = jnp.full((8,), 8, jnp.int32)
    wsel3, _ = map(np.asarray, shared_window_plan(spos3, flat, flat, 1))
    assert wsel3[2] == wsel3[3] == wsel3[4] == 0
    assert wsel3[0] == wsel3[1] == -1


def test_hbm_staged_sharewin_bitwise_vs_gather():
    """The shared-window cache (bf16 + crop128 staged kernel:
    shared_window_plan + ops.fused._cached_body) must be bitwise
    identical to materializing the resample (jnp.take) and running the
    plain HBM kernel: sharing a pre-rolled window and rounding the roll
    offset to 8 changes which LANE a grid cell computes on, never any
    per-cell value (crop128's disc gate keeps the whole disc inside the
    view after rounding).  Poses are CLUSTERED per ancestor with jitter
    spanning 8-cell boundaries, so the plan produces real shared groups,
    split groups, and private particles in the same call."""
    spec = GridSpec2D(-2.56, -2.0, 5.12, 4.0, 0.02)  # 200 x 256 cells
    p = 16
    grids = (jax.random.normal(jax.random.key(31), (p, 200, 256),
                               jnp.float32) * 0.5)
    grids = grids.at[:, ::3, ::2].set(0.0).astype(jnp.bfloat16)
    centers = jnp.array([[0.3, -0.2], [-1.5, 0.8], [1.7, 1.1],
                         [-0.4, -1.2]], jnp.float32)
    kj, kt = jax.random.split(jax.random.key(32))
    jit_xy = jax.random.uniform(kj, (p, 2), jnp.float32, -0.08, 0.08)
    xy = centers[jnp.arange(p) % 4] + jit_xy
    theta = jax.random.uniform(kt, (p,), jnp.float32, -3.0, 3.0)
    poses = jnp.concatenate([xy, theta[:, None]], axis=-1)
    dist = jax.random.uniform(jax.random.key(33), (B,), jnp.float32,
                              0.1, 1.0)
    valid = jax.random.bernoulli(jax.random.key(34), 0.8, (B,))
    present = jnp.ones((B,), bool)
    a0 = jnp.float32(0.0)
    concentrated = [0] * 6 + [4] * 5 + [9] * 4 + [12]  # 12 is lone self
    patterns = (concentrated, list(range(p)), [7] * p,
                [3, 0, 0, 5, 3, 7, 1, 1, 9, 9, 9, 11, 2, 2, 14, 15])
    for anc_np in patterns:
        anc = jnp.asarray(anc_np, jnp.int32)
        g1, l1 = fused_update(grids, poses, a0, dist, valid, present,
                              spec, B, 1.0, resident=False,
                              interpret=True, ancestors=anc,
                              hbm_lineage="staged")
        g2, l2 = fused_update(jnp.take(grids, anc, axis=0), poses, a0,
                              dist, valid, present, spec, B, 1.0,
                              resident=False, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(g1, np.float32), np.asarray(g2, np.float32),
            err_msg=f"{anc_np}")
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2),
                                      err_msg=f"{anc_np}")


def test_gridslam_staged_lineage_bitwise_vs_gather():
    """The auto HBM route (staged-lineage kernel, pending ancestors) and
    the whole-set gather route (materialized resample) are the SAME
    filter in different representations: both order resampled slots by
    ancestor gather, so with identical keys every per-step output and
    the materialized maps must match bitwise across several steps with
    forced resampling.  (CoW cannot be compared bitwise across steps:
    it is slot-PRESERVING, and motion noise is drawn per slot, so the
    trajectories legitimately decouple after the first resample.)"""
    cfg_kw = dict(position_x=-2, position_y=-2, width=4.0, height=4.0,
                  resolution=0.05, n_particles=8, max_scan_range=1.0,
                  integrate="fused", resample_neff_frac=1.0,
                  fused_resident=False)
    cfg_staged = gs.GridSlamConfig(**cfg_kw, resample_cow="staged")
    cfg_cow = gs.GridSlamConfig(**cfg_kw, resample_cow=False)
    angles = jnp.arange(B, dtype=jnp.float32) * (2 * np.pi / B)
    scan = Scan(angles=angles,
                distances=jnp.full((B,), 0.8, jnp.float32),
                strengths=jnp.ones((B,), jnp.float32),
                valid=jnp.ones((B,), bool),
                present=jnp.ones((B,), bool))
    odo = OdometryReading(jnp.float32(0.01), jnp.float32(0.012),
                          jnp.float32(0.1))
    s1 = gs.GridSlamState.init(cfg_staged)
    s2 = gs.GridSlamState.init(cfg_cow)
    key = jax.random.key(5)
    for _ in range(3):
        key, k = jax.random.split(key)
        s1, o1 = gs.update(s1, scan, odo, k, cfg_staged)
        s2, o2 = gs.update(s2, scan, odo, k, cfg_cow)
        np.testing.assert_array_equal(np.asarray(o1.pose),
                                      np.asarray(o2.pose))
        np.testing.assert_array_equal(np.asarray(o1.n_eff),
                                      np.asarray(o2.n_eff))
        np.testing.assert_array_equal(np.asarray(s1.poses),
                                      np.asarray(s2.poses))
        # s1 carries a PENDING lineage; materialize it for comparison
        mat = np.asarray(jnp.take(s1.grids, s1.ancestors, axis=0))
        np.testing.assert_array_equal(mat, np.asarray(s2.grids))


def test_gridslam_fused_hbm_deferred_path():
    """End-to-end gridslam update routing: fused_resident=False with
    resample_cow="deferred" (explicit opt-in — auto keeps staged CoW,
    which measured faster) on a full-width-window geometry must take
    the deferred-lineage kernel — ancestors come back PENDING (not
    identity) and the filter stays healthy across steps."""
    B2 = 360
    cfg = gs.GridSlamConfig(position_x=-2, position_y=-2, width=4.0,
                            height=4.0, resolution=0.05, n_particles=8,
                            max_scan_range=1.0, integrate="fused",
                            resample_neff_frac=1.0,  # force resampling
                            fused_resident=False, resample_cow="deferred")
    state = gs.GridSlamState.init(cfg)
    angles = jnp.arange(B2, dtype=jnp.float32) * (2 * np.pi / B2)
    scan = Scan(angles=angles,
                distances=jnp.full((B2,), 0.8, jnp.float32),
                strengths=jnp.ones((B2,), jnp.float32),
                valid=jnp.ones((B2,), bool),
                present=jnp.ones((B2,), bool))
    odo = OdometryReading(jnp.float32(0.01), jnp.float32(0.012),
                          jnp.float32(0.1))
    key = jax.random.key(3)
    saw_pending = False
    for _ in range(3):
        key, k = jax.random.split(key)
        state, out = gs.update(state, scan, odo, k, cfg)
        assert bool(out.resampled)
        assert np.isfinite(float(out.n_eff))
        saw_pending |= not np.array_equal(np.asarray(state.ancestors),
                                          np.arange(8))
    # resampling fired every step on 8 particles: at least one step must
    # have left a real (non-identity) pending lineage
    assert saw_pending
    assert float(jnp.abs(state.grids.astype(jnp.float32)).sum()) > 0


def test_resident_column_crop_matches_oracle():
    """resident=True with cols > 256 (config-2-class grids): the
    column-sliced + rolled 128-lane compute view must reproduce the
    full-width oracle, including the deferred-ancestor variant."""
    spec = GridSpec2D(-8.0, -8.0, 16.0, 16.0, 0.05)  # 320x320 -> 384 pad
    p = 4
    cols = (spec.cols + 127) // 128 * 128
    grids = jax.random.normal(jax.random.key(21), (p, spec.rows, cols),
                              jnp.float32) * 0.5
    grids = grids.at[:, ::3, ::2].set(0.0)
    poses = jnp.array([[0.1, -0.2, 0.3],
                       [-7.2, 0.0, 1.2],
                       [7.2, 0.3, -0.7],
                       [0.0, 7.2, 2.0]], jnp.float32)
    dist = jax.random.uniform(jax.random.key(22), (B,), jnp.float32,
                              0.1, 1.0)
    valid = jax.random.bernoulli(jax.random.key(23), 0.8, (B,))
    present = jnp.ones((B,), bool)
    a0 = jnp.float32(0.0)
    # max_range 1.0 -> crop128; max_range 3.0 -> disc_half 63: wc=256
    # column slice WITHOUT the 128-lane roll (the crop128=False sliced
    # branch) — both must match the full-width oracle
    for max_range, anc in ((1.0, None),
                           (1.0, jnp.array([2, 2, 0, 1], jnp.int32)),
                           (3.0, None)):
        g1, l1 = fused_update(grids, poses, a0, dist, valid, present,
                              spec, B, max_range, resident=True,
                              interpret=True, ancestors=anc)
        base = grids if anc is None else jnp.take(grids, anc, axis=0)
        g2, l2 = fused_update_reference(base, poses, a0, dist, valid,
                                        present, spec, B, max_range)
        diff = np.abs(np.asarray(g1) - np.asarray(g2))
        frac = float((diff > 0.01).mean())
        assert frac < 1e-4, \
            f"bin-flip fraction {frac} (range={max_range} anc={anc})"
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-5, atol=1e-4)


def test_gridslam_update_fused_runs():
    cfg = gs.GridSlamConfig(position_x=-2, position_y=-2, width=4.0,
                            height=4.0, resolution=0.05, n_particles=8,
                            max_scan_range=1.0, integrate="fused",
                            resample_neff_frac=0.5)
    state = gs.GridSlamState.init(cfg)
    assert state.grids.shape == (8, 80, 128)  # padded cols
    angles = jnp.arange(B, dtype=jnp.float32) * (2 * np.pi / B)
    scan = Scan(angles=angles,
                distances=jnp.full((B,), 0.8, jnp.float32),
                strengths=jnp.ones((B,), jnp.float32),
                valid=jnp.ones((B,), bool),
                present=jnp.ones((B,), bool))
    odo = OdometryReading(jnp.float32(0.01), jnp.float32(0.012),
                          jnp.float32(0.1))
    state2, out = gs.update(state, scan, odo, jax.random.key(0), cfg)
    assert np.isfinite(float(out.n_eff))
    assert state2.grids.dtype == state.grids.dtype
    # the map must have changed inside the scan disc
    assert float(jnp.abs(state2.grids).sum()) > 0

    prob = gs.estimated_probability_grid(state2, cfg)
    assert prob.shape == (80, 80)
    assert float(prob.min()) >= 0.0 and float(prob.max()) <= 1.0


def test_encode_beam_table_flags():
    d = jnp.array([0.5, 0.7, 0.0, 0.9], jnp.float32)
    valid = jnp.array([True, False, True, True])
    present = jnp.array([True, True, True, False])
    t = encode_beam_table(d, valid, present)[0]
    assert float(t[0]) == np.float32(0.5)        # valid hit
    assert float(t[1]) == float(np.float32(-0.7))  # invalid, present
    assert float(t[2]) > 0              # zero-distance valid -> epsilon
    assert float(t[3]) == 0.0 and np.signbit(float(t[3]))  # absent -> -0.0
    assert float(t[400]) == 0.0 and np.signbit(float(t[400]))  # padding


def test_window_rows_covers_disc():
    wr = window_rows(SPEC, 1.0)
    disc = 2 * (int(np.ceil(1.0 / SPEC.resolution)) + 3) + 1
    assert wr % 8 == 0 and wr >= min(disc, SPEC.rows)


def test_static_bin_pipeline_matches_traced():
    """The static-dphi bin-units pipeline (1/dphi folded into the atan2
    constants, floor-form rounding, clamp elision — ops/fused._cell_pass)
    must agree with the traced-dphi pipeline of the SAME spacing: bin
    assignments identical except ~ulp rounding-path boundary flips, and
    the endpoint likelihood (independent of the bin pipeline) tight."""
    grids, poses, dist, valid, present = _mk(p=4, seed=11)
    a0 = jnp.float32(0.1)
    dphi = 2 * np.pi / B
    g_s, l_s = fused_update(grids, poses, a0, dist, valid, present,
                            SPEC, B, 1.0, interpret=True, dphi=dphi)
    g_t, l_t = fused_update(grids, poses, a0, dist, valid, present,
                            SPEC, B, 1.0, interpret=True,
                            dphi=jnp.float32(dphi))
    flip = float((np.abs(np.asarray(g_s) - np.asarray(g_t)) > 0.01).mean())
    assert flip < 1e-4, f"static-vs-traced bin-flip fraction {flip}"
    np.testing.assert_allclose(np.asarray(l_s), np.asarray(l_t),
                               rtol=1e-5, atol=1e-4)
    # the traced path must ALSO still match the traced oracle (the
    # static branch must not rot the generic pipeline)
    g_o, l_o = fused_update_reference(grids, poses, a0, dist, valid,
                                      present, SPEC, B, 1.0,
                                      dphi=jnp.float32(dphi))
    flip_o = float((np.abs(np.asarray(g_t) - np.asarray(g_o)) > 0.01).mean())
    assert flip_o < 1e-4, f"traced-vs-oracle bin-flip fraction {flip_o}"
    np.testing.assert_allclose(np.asarray(l_t), np.asarray(l_o),
                               rtol=1e-5, atol=1e-4)
