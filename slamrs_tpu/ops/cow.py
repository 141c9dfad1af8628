"""Copy-on-write particle resampling: move only duplicated maps.

Parity surface: ``ParticleFilter::resample`` (slamrs/slam/src/grid/
particle.rs:78-105) clones ``(Pose, Map)`` for every surviving particle —
a full deep copy of the particle set.  The whole-set formulation on TPU
(``jnp.take`` by ancestor index) still moves every byte of every map
through HBM; for BASELINE config 3 (1,024 x ~2 MB maps = 2 GB) that
gather IS the step time (measured resample-gather-bound at 320 ticks/s
in round 2).

TPU-native design — a PF-specific allocator, not a gather:

* After systematic resampling, an ancestor with >= 1 child KEEPS its map
  in its own slot (zero bytes moved); ancestors with no children free
  their slots; each duplicated child takes a freed slot and only THOSE
  maps are copied (``grid[dst] <- grid[src]``).  Expected copy volume is
  ``(1 - unique_fraction) * P`` maps (~30-40% after a degenerate update,
  ZERO when the N_eff gate skips resampling — identity ancestors produce
  an empty copy list with no branching).
* Particle identity becomes slot-order-free: a particle filter is a
  weighted multiset, so relabeling slots is semantics-preserving (the
  resampled multiset is exactly the reference's).  The DDA parity path
  keeps the order-exact ``jnp.take`` so lineage-exact oracle tests stay
  byte-identical (tests/test_parity.py).
* The copies run in one Pallas kernel over P programs: program j issues
  an async whole-map DMA ``grids[src[j]] -> grids[dst[j]]`` (in-place
  aliased buffer — src slots are survivors, dst slots are freed, so the
  regions are disjoint and copies race-free), pipelined ``_DEPTH`` deep
  so HBM DMAs overlap instead of serializing issue+wait per map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_DEPTH = 16  # outstanding copy DMAs (also the staged write window)


def cow_plan(ancestors: Array) -> tuple[Array, Array, Array]:
    """Slot-preserving copy plan from ancestor indices.

    ancestors: i32[P] (systematic-resample output; identity when the
    N_eff gate skipped resampling).
    Returns (src, dst, n_copies): padded i32[P] copy lists — copies
    ``j < n_copies`` move map ``src[j]`` into freed slot ``dst[j]``;
    padding entries are identity self-writes on a surviving slot.
    """
    p = ancestors.shape[-1]
    j = jnp.arange(p, dtype=jnp.int32)
    counts = jnp.zeros((p,), jnp.int32).at[ancestors].add(1)
    extra = jnp.maximum(counts - 1, 0)
    bounds = jnp.cumsum(extra)
    n_copies = bounds[-1]
    # copy j's source: the ancestor whose extra-children range covers j
    src = jnp.searchsorted(bounds, j, side="right").astype(jnp.int32)
    src = jnp.clip(src, 0, p - 1)
    # copy j's destination: the j-th freed slot (ascending) — rank via
    # cumsum + scatter (an argsort here costs tens of us per scan)
    is_free = counts == 0
    rank = jnp.cumsum(is_free) - 1
    free_sorted = jnp.zeros((p,), jnp.int32).at[
        jnp.where(is_free, rank, p)].set(j, mode="drop")
    # padding: a guaranteed-survivor slot (ancestors[0] has >= 1 child),
    # self-write — never collides with a real copy's freed dst slot
    pad = ancestors[..., 0]
    live = j < n_copies
    src = jnp.where(live, src, pad)
    dst = jnp.where(live, free_sorted, pad)
    return src, dst, n_copies


def _cow_groups(src: Array, p: int) -> tuple[Array, Array]:
    """Per-copy staging metadata: ``fresh[k]`` = 1 where the (sorted)
    source changes, ``gs[k]`` = index of copy k's group start."""
    j = jnp.arange(p, dtype=jnp.int32)
    fresh = jnp.concatenate([jnp.ones((1,), bool), src[1:] != src[:-1]])
    gs = jax.lax.cummax(jnp.where(fresh, j, 0))
    return fresh.astype(jnp.int32), gs.astype(jnp.int32)


def _kernel_cow_staged(nc_ref, src_ref, dst_ref, fresh_ref, gs_ref,
                      grid_in, grid_out, stage, sem_f, sem_w, *,
                      ppb):
    """VMEM-staged copy fan-out: each UNIQUE source map is fetched into
    VMEM once and every duplicate writes out of the stage.

    The copy list is sorted by source (searchsorted construction), so
    with sharply peaked weights — the regime where resampling copies
    nearly the whole set — HBM traffic drops from (read+write) per copy
    to one read per unique source plus the writes: measured ~1.8x on
    BASELINE config 3.  Writes hit disjoint freed slots (race-free);
    the only hazard is overwriting the stage, so a fresh fetch first
    drains the previous group's outstanding writes.  Within a group,
    writes pipeline ``_DEPTH`` deep via slot-reuse waits; every write
    is waited exactly once (slot-reuse inside its group, group-drain
    otherwise)."""
    j = pl.program_id(0)
    n = pl.num_programs(0)
    nc = nc_ref[0]

    def wcopy(k):
        return pltpu.make_async_copy(
            stage, grid_out.at[dst_ref[k]], sem_w.at[k % _DEPTH])

    def drain(lo, hi):
        def body(k, carry):
            wcopy(lo + k).wait()
            return carry
        jax.lax.fori_loop(0, hi - lo, body, 0)

    for t in range(ppb):
        idx = j * ppb + t

        @pl.when(idx < nc)
        def _():
            gs = gs_ref[idx]

            @pl.when(fresh_ref[idx] == 1)
            def _():
                @pl.when(idx > 0)
                def _():
                    prev_gs = gs_ref[idx - 1]
                    drain(jnp.maximum(prev_gs, idx - _DEPTH), idx)
                f = pltpu.make_async_copy(
                    grid_in.at[src_ref[idx]], stage, sem_f)
                f.start()
                f.wait()

            @pl.when(idx - _DEPTH >= gs)
            def _():
                wcopy(idx - _DEPTH).wait()

            wcopy(idx).start()

    @pl.when((j == n - 1) & (nc > 0))
    def _():
        gs_last = gs_ref[nc - 1]
        drain(jnp.maximum(gs_last, nc - _DEPTH), nc)


def _kernel_cow(nc_ref, src_ref, dst_ref, grid_in, grid_out, sem, *,
                ppb, total):
    """``ppb`` copy slots per program: per-program dispatch costs
    ~0.3 us, so one program per potential copy made even a zero-copy
    resample (identity plan after an N_eff skip) cost ~300 us at 1,024
    particles; batched, the empty-plan kernel is ~40 programs of
    predicated no-ops."""
    j = pl.program_id(0)
    n = pl.num_programs(0)
    nc = nc_ref[0]

    def copy(k):
        return pltpu.make_async_copy(
            grid_in.at[src_ref[k]], grid_out.at[dst_ref[k]],
            sem.at[k % _DEPTH])

    for t in range(ppb):
        idx = j * ppb + t
        # wait for the copy whose semaphore slot this one reuses
        @pl.when((idx >= _DEPTH) & (idx - _DEPTH < nc))
        def _():
            copy(idx - _DEPTH).wait()

        @pl.when(idx < nc)
        def _():
            copy(idx).start()

    # drain the tail
    @pl.when(j == n - 1)
    def _():
        for k in range(_DEPTH):
            jj = total - _DEPTH + k
            if jj >= 0:
                @pl.when(jj < nc)
                def _():
                    copy(jj).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def cow_copy(grids: Array, src: Array, dst: Array, n_copies: Array,
             interpret: bool = False) -> Array:
    """Apply the copy plan in place: ``grids[dst[j]] = grids[src[j]]``
    for ``j < n_copies``.  grids [P, H, W] (any dtype), aliased in/out —
    only the duplicated maps move through memory, and when one map fits
    the VMEM stage, each unique source is read from HBM only once."""
    p, rows, cols = grids.shape
    # copy slots per program: the kernel is pure DMA orchestration, so
    # the only per-program cost is dispatch (~0.3 us) — batch deep to
    # make the EMPTY plan (N_eff-gated skip, the common case at the
    # bench operating points) nearly free: 32 slots -> 1024 particles =
    # 32 predicated no-op programs instead of 128.
    ppb = 32 if p % 32 == 0 else 8 if p % 8 == 0 else 1
    nc = jnp.reshape(n_copies, (1,)).astype(jnp.int32)
    src = src.astype(jnp.int32)
    dst = dst.astype(jnp.int32)
    map_bytes = rows * cols * grids.dtype.itemsize
    if map_bytes <= 8 * 1024 * 1024:
        fresh, gs = _cow_groups(src, p)
        return pl.pallas_call(
            functools.partial(_kernel_cow_staged, ppb=ppb),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,  # nc, src, dst, fresh, gs
                grid=(p // ppb,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((rows, cols), grids.dtype),  # stage
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA((_DEPTH,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct(grids.shape, grids.dtype),
            input_output_aliases={5: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(nc, src, dst, fresh, gs, grids)
    return pl.pallas_call(
        functools.partial(_kernel_cow, ppb=ppb, total=p),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # nc, src, dst
            grid=(p // ppb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_DEPTH,))],
        ),
        out_shape=jax.ShapeDtypeStruct(grids.shape, grids.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(nc, src.astype(jnp.int32), dst.astype(jnp.int32), grids)


def cow_resample(grids: Array, poses: Array, ancestors: Array,
                 interpret: bool = False) -> tuple[Array, Array]:
    """Slot-preserving resample of (poses [P,3], grids [P,H,W]).

    Returns the resampled (poses, grids): the same particle multiset as
    ``take(..., ancestors)`` in a different slot order, moving only
    duplicated maps.  NOT safe under vmap (the copy kernel's scalar
    prefetch is per-call) — batched fleets keep the gather formulation.
    """
    src, dst, n_copies = cow_plan(ancestors)
    grids = cow_copy(grids, src, dst, n_copies, interpret=interpret)
    poses = poses.at[dst].set(poses[src])
    return poses, grids
