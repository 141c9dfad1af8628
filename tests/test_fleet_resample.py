"""Sharded-fleet local-first resampling (VERDICT r3 task #2).

``parallel/resample.py`` must produce the SAME per-world particle
multiset as the slot-ordered ``take(ancestors)`` while moving only
spilled unique maps across devices — no full-grid all-gather on the hot
path.  Runs on the 8-device virtual CPU mesh.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slamrs_tpu.parallel.fleet import make_mesh
from slamrs_tpu.parallel.resample import _plan, resample_fleet

W, P, H, C = 2, 64, 8, 128  # worlds, particles, map rows/cols


def _state(seed=0):
    """Grids tagged by particle id (cell [0,0] = id) and poses carrying
    the id in every component — pairing must survive relabeling."""
    ids = jnp.arange(P, dtype=jnp.float32)
    grids = jnp.zeros((W, P, H, C), jnp.float32)
    grids = grids.at[:, :, 0, 0].set(ids[None, :] + 1000.0 * jnp.arange(
        W, dtype=jnp.float32)[:, None])
    grids = grids + jax.random.normal(jax.random.key(seed),
                                      (W, P, 1, 1)) * 1e-3
    poses = jnp.broadcast_to(grids[:, :, 0, 0][..., None], (W, P, 3))
    return grids, poses


def _multiset_check(new_grids, new_poses, grids, poses, ancestors):
    """Per world: relabeled multiset == take(ancestors) multiset, and
    each slot's pose matches its own grid (pairing preserved)."""
    ref_g = np.asarray(jax.vmap(lambda g, a: jnp.take(g, a, axis=0))(
        grids, ancestors))
    ng = np.asarray(new_grids)
    np_poses = np.asarray(new_poses)
    for w in range(W):
        np.testing.assert_array_equal(
            np.sort(ng[w, :, 0, 0]), np.sort(ref_g[w, :, 0, 0]),
            err_msg=f"world {w}: particle multiset differs")
        # full map contents move with the id
        order_new = np.argsort(ng[w, :, 0, 0], kind="stable")
        order_ref = np.argsort(ref_g[w, :, 0, 0], kind="stable")
        np.testing.assert_allclose(ng[w][order_new], ref_g[w][order_ref],
                                   err_msg=f"world {w}: map bytes differ")
        np.testing.assert_allclose(
            np_poses[w, :, 0], ng[w, :, 0, 0],
            err_msg=f"world {w}: pose/grid pairing broken")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, particle_axis=4)  # 2 world-shards x 4 p-shards


def test_identity_ancestors_noop(mesh):
    grids, poses = _state()
    anc = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (W, P))
    ng, npose = jax.jit(
        lambda g, q, a: resample_fleet(g, q, a, mesh))(grids, poses, anc)
    np.testing.assert_array_equal(np.asarray(ng), np.asarray(grids))
    np.testing.assert_array_equal(np.asarray(npose), np.asarray(poses))


def test_systematic_ancestors_multiset(mesh):
    from slamrs_tpu.ops.resample import systematic_resample

    grids, poses = _state()
    w = jax.nn.softmax(
        jax.random.normal(jax.random.key(3), (W, P)) * 2.0, axis=-1)
    anc = jax.vmap(systematic_resample)(
        jax.random.split(jax.random.key(4), W), w)
    ng, npose = jax.jit(
        lambda g, q, a: resample_fleet(g, q, a, mesh))(grids, poses, anc)
    _multiset_check(ng, npose, grids, poses, anc)


def test_degenerate_single_ancestor_broadcasts(mesh):
    grids, poses = _state()
    anc = jnp.full((W, P), 17, jnp.int32)
    ng, npose = jax.jit(
        lambda g, q, a: resample_fleet(g, q, a, mesh))(grids, poses, anc)
    _multiset_check(ng, npose, grids, poses, anc)


def test_overflow_falls_back_exactly(mesh):
    """spill_cap=1 with many-unique spill forces the guarded fallback."""
    from slamrs_tpu.ops.resample import systematic_resample

    grids, poses = _state()
    w = jax.nn.softmax(
        jax.random.normal(jax.random.key(9), (W, P)) * 3.0, axis=-1)
    anc = jax.vmap(systematic_resample)(
        jax.random.split(jax.random.key(10), W), w)
    ng, npose = jax.jit(lambda g, q, a: resample_fleet(
        g, q, a, mesh, spill_cap=1))(grids, poses, anc)
    _multiset_check(ng, npose, grids, poses, anc)


def test_plan_spill_is_contiguous_suffix():
    """Unit gate on the plan math: sorted systematic ancestors spill a
    contiguous suffix per shard, and all pool picks stay under the cap
    for peaked-but-sane weights."""
    from slamrs_tpu.ops.resample import systematic_resample

    p, s, cap = 64, 4, 16
    w = jax.nn.softmax(jax.random.normal(jax.random.key(1), (p,)) * 2.0)
    anc = systematic_resample(jax.random.key(2), w)
    local_src, use_pool, pool_sel, pool_base, overflow = _plan(
        anc, s, p // s, cap)
    assert not bool(overflow)
    counts = np.zeros(p, np.int64)
    np.testing.assert_array_equal(np.sort(np.asarray(anc)),
                                  np.asarray(anc))  # sorted premise
    # reconstruct the multiset from the plan and compare against counts
    for a in np.asarray(anc):
        counts[a] += 1
    got = np.zeros(p, np.int64)
    p_loc = p // s
    for t in range(s):
        for j in range(p_loc):
            if bool(use_pool[t, j]):
                flat = int(pool_sel[t, j])
                src_t, k = divmod(flat, cap)
                a = src_t * p_loc + int(pool_base[src_t]) + k
            else:
                a = t * p_loc + int(local_src[t, j])
            got[a] += 1
    np.testing.assert_array_equal(got, counts)


def test_hot_path_has_no_full_grid_all_gather(mesh):
    """HLO gate: with the fallback statically disabled, no all-gather in
    the program touches an array as large as the full per-shard grid
    block (the pool gathers are [cap]-sized)."""
    import slamrs_tpu.parallel.resample as R

    grids, poses = _state()
    anc = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (W, P))

    import functools

    body = functools.partial(R._resample_block, axis_name="particle",
                             n_shards=4, p_loc=P // 4, spill_cap=8)

    def local_only(g, q, a):
        from jax.sharding import PartitionSpec as Pn

        def block(gb, qb, ab):
            t = jax.lax.axis_index("particle")
            del t
            # call the local-first branch only (no cond)
            local_src, use_pool, pool_sel, pool_base, _ = jax.vmap(
                lambda aa: R._plan(aa, 4, P // 4, 8))(ab)
            cap = 8

            def window(gg, p_b):
                return jax.lax.dynamic_slice(gg, (p_b, 0, 0),
                                             (cap, *gg.shape[1:]))
            tt = jax.lax.axis_index("particle")
            mine = jax.vmap(window)(gb, pool_base[:, tt])
            pool = jax.lax.all_gather(mine, "particle", axis=1,
                                      tiled=False)
            pool = pool.reshape(pool.shape[0], 4 * cap, *gb.shape[2:])

            def pick(gg, pl_, ls, up, ps):
                return jnp.where(up[:, None, None],
                                 jnp.take(pl_, ps, axis=0),
                                 jnp.take(gg, ls, axis=0))
            return jax.vmap(pick)(gb, pool, local_src[:, tt],
                                  use_pool[:, tt], pool_sel[:, tt])

        return jax.shard_map(
            block, mesh=mesh,
            in_specs=(Pn("world", "particle", None, None),
                      Pn("world", "particle", None),
                      Pn("world", None)),
            out_specs=Pn("world", "particle", None, None),
            check_vma=False)(g, q, a)

    txt = jax.jit(local_only).lower(grids, poses, anc).compile().as_text()
    # every all-gather of grid-shaped data must be pool-sized: scan for
    # all-gather result shapes and bound their element count
    block_elems = (P // 4) * H * C  # full per-shard grid block
    for m in re.finditer(r"all-gather[^=]*=\s*\S*f32\[([\d,]+)\]", txt):
        dims = [int(d) for d in m.group(1).split(",")]
        elems = int(np.prod(dims))
        assert elems < block_elems, f"grid-sized all-gather: {m.group(0)}"
    del body
