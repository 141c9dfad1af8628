"""Tile-grained copy-on-write particle maps: resampling relabels a
band table instead of moving map bytes.

Parity surface: ``ParticleFilter::resample``'s per-survivor deep map
clone (slamrs/slam/src/grid/particle.rs:78-105) fused into
``GridMapSlam::update`` (slam.rs:45-75), at SUB-MAP granularity.

Motivation (BASELINE config 3: 1,024 particles x 50x50 m @ 0.05 m =
2 GB of maps): the staged copy-on-write resample (ops/cow.py) already
moves only duplicated maps, but a duplicated map is 2 MB and the copy
kernel was measured at 94% of HBM write bandwidth — the ~2 GB/resample
of duplicated-map bytes IS the step time (BENCH_CONFIG3_BOUND.json).
The only remaining lever is moving fewer bytes: particles that share an
ancestor share ALL map content except the bands their windows touched
since diverging.

TPU-native design — maps become views over a shared tile pool:

* The map set is a pool ``[n_phys, band_rows, W]`` of full-width row
  bands plus a per-particle band table ``i32[P, nb]`` (logical band b of
  particle i lives in pool tile ``table[i, b]``).  RESAMPLING RELABELS
  THE TABLE: ``table <- table[ancestors]`` — a [P, nb] integer gather,
  zero map bytes.
* Each SLAM update touches exactly TWO consecutive bands per particle
  (``band_rows >= wr - 1`` makes any scan-disc window fit a 2-band
  span; DMA sizes stay static by always moving both full-band column
  slices and computing on the 8-aligned [wr, wc] view inside them).
* Copy-on-WRITE, not copy-on-resample: before writing a band whose tile
  is shared (pool refcount > 1), the particle gets a fresh tile and the
  kernel copies the full band HBM-to-HBM under its own compute (the
  band-copy trick of ``_kernel_hbm_staged``; the window write-back
  overwrites the interior after the band lands).  A particle whose
  tiles are exclusively owned (refcount 1 — the steady state between
  resamples) writes IN PLACE: zero copy bytes.
  Per resampled frame the traffic is ``(# duplicated particles) x 2
  bands`` instead of ``x whole maps`` — at config 3 geometry
  (band_rows=56 of 1,000 rows) an ~18x reduction in resample bytes.
* Allocation is functional: refcounts are recomputed from the table
  each update (one scatter-add), free tiles are ranked with a cumsum,
  and dying tiles (no references after relabeling) return to the pool
  automatically.  ``n_phys = P*nb + 2*P`` guarantees allocation never
  fails (live tiles <= P*nb, one update requests <= 2P fresh).
  The initial state is ONE all-zero tile shared by every (particle,
  band) — the pool starts 1/16,000th materialized.

Write-hazard argument (the pool is input/output ALIASED, programs run
in particle order): a program writes only (a) fresh tiles — refcount 0,
referenced by nobody — or (b) exclusive tiles — referenced only by this
particle, whose own window DMA (issued at most one program earlier)
is the only read.  Sources read by band copies or window DMAs are
therefore never written by any other program.  ``tiled_plan`` allocates
distinct fresh tiles per request (cumsum ranks), so no two writes
overlap either.
"""

from __future__ import annotations

import functools
import math as pymath
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slamrs_tpu.ops.fused import (_SHAREWIN_SLOTS, _cell_pass,
                                  _pp_table, static_dphi,
                                  _lik_finish_batched,
                                  _lik_gather_fold_packed, _lik_prepare,
                                  _params, _window_compute,
                                  encode_beam_table, merge_segment_windows,
                                  pack3_quantum, shared_window_plan,
                                  window_rows)
from slamrs_tpu.ops.grid import ADDITIONAL_STEPS, GridSpec2D

Array = jnp.ndarray

# profiling-only ablation (benchmarks/prof_tiled.py): skip the fresh-tile
# band copies — OUTPUT IS WRONG outside window columns; timing isolates
# the copies' share of the tiled update
_NOBANDS = bool(os.environ.get("SLAMRS_TILES_NOBANDS"))
if _NOBANDS:
    print("WARNING: SLAMRS_TILES_NOBANDS active — tiled maps are "
          "INCORRECT outside window columns (profiling only)",
          flush=True)


def tile_geometry(spec: GridSpec2D, max_range_m: float,
                  band_rows: int | None = None) -> tuple[int, int, int]:
    """(band_rows, n_bands, padded_cols) for a tiled map at this spec.

    ``band_rows`` defaults to the kernel window height ``wr`` (8-aligned,
    >= the scan disc + overshoot) — the smallest band any window fits in
    a 2-band span (needs ``wr <= band_rows + 1``)."""
    wr = window_rows(spec, max_range_m)
    hb = band_rows if band_rows is not None else wr
    assert hb % 8 == 0, hb
    if wr <= hb + 1:
        nb = -(-spec.rows // hb)
        nb = max(nb, 2)  # the window always spans 2 bands
    else:
        # bands narrower than the window: the k-span cached kernel
        # (:func:`_kernel_tiled_cached`) serves this geometry
        _wr16, _kspan, nb = span_geometry(spec, max_range_m, hb)
    cols = (spec.cols + 127) // 128 * 128
    return hb, nb, cols


def span_geometry(spec: GridSpec2D, max_range_m: float,
                  hb: int) -> tuple[int, int, int]:
    """(wr, kspan, nb) for the k-band cached kernel.

    The window is the DENSE kernel's (8-divisible rows, 8-aligned
    origin — its +8 slack is exactly TIGHT against the scan disc under
    floor8), computed as a [wr, wc] view at in-span offset ``woff``
    inside the ``kspan``-band span.  (A band-ALIGNED variant — origin
    t0*hb, compute on the whole kspan*hb span, static stores, sharers
    skipping every in-DMA — measured 866 vs 730 us/update at 0.02 m:
    this kernel is COMPUTE-bound, so the 1.4x cell/gather/roll row
    scaling costs more than the static addressing and skipped DMAs
    save.)"""
    assert hb % 8 == 0, hb
    wr = window_rows(spec, max_range_m)
    assert wr <= spec.rows, (wr, spec.rows)
    kspan = -(-(hb - 8 + wr) // hb)  # max woff = hb - 8
    nb = -(-spec.rows // hb)
    # windows clip into band padding (rows_pad - wr like the 2-band
    # kernel; padded rows are masked) — grow nb until the span fits
    while ((nb * hb - wr) // 8 * 8) // hb + kspan > nb:
        nb += 1
    return wr, kspan, nb


def auto_band_rows(spec: GridSpec2D, max_range_m: float,
                   dtype=jnp.bfloat16) -> int | None:
    """Band height for the k-span cached kernel when that geometry pays,
    else None (keep the wr-band 2-span default).

    The 2-band span privatizes ``2*wr`` rows per written particle; when
    that exceeds the whole map (windows covering most rows — the
    0.02 m-class geometry) AND the cached kernel's requirements hold
    (full-width window, crop128-able disc, bf16 tiles), half-window
    bands win: only the ~wr written rows move, out-of-window bands stay
    shared forever."""
    wr = window_rows(spec, max_range_m)
    if 2 * wr <= spec.rows or dtype != jnp.bfloat16:
        return None
    cols = (spec.cols + 127) // 128 * 128
    disc_half = (int(pymath.ceil(max_range_m / spec.resolution))
                 + ADDITIONAL_STEPS + 1)
    wc = cols if (cols <= 256 or disc_half > 64) else 256
    crop128 = wc >= 256 and 2 * disc_half + 1 + 8 <= 128
    if wc != cols or not crop128:
        return None
    hb = max(16, (wr // 2) // 8 * 8)
    return hb if wr > hb + 1 else None


def init_tiled(p: int, spec: GridSpec2D, max_range_m: float,
               dtype=jnp.bfloat16, band_rows: int | None = None,
               n_phys: int | None = None) -> tuple[Array, Array]:
    """Fresh (pool, table): every band of every particle references the
    single all-zero tile 0 (log-odds prior = 0 everywhere, map.rs:56)."""
    if band_rows is None:
        band_rows = auto_band_rows(spec, max_range_m, dtype)
    hb, nb, cols = tile_geometry(spec, max_range_m, band_rows)
    wr = window_rows(spec, max_range_m)
    kspan = 2 if wr <= hb + 1 else span_geometry(spec, max_range_m, hb)[1]
    if n_phys is None:
        n_phys = p * nb + kspan * p
    pool = jnp.zeros((n_phys, hb, cols), dtype)
    table = jnp.zeros((p, nb), jnp.int32)
    return pool, table


def materialize(pool: Array, table: Array,
                spec: GridSpec2D | None = None) -> Array:
    """[P, nb*band_rows, W] dense maps (tests/viz; NOT the hot path).
    With ``spec``, rows are sliced to the logical grid."""
    maps = pool[table]  # [P, nb, hb, W]
    p, nb, hb, w = maps.shape
    dense = maps.reshape(p, nb * hb, w)
    if spec is not None:
        dense = dense[:, :spec.rows, :]
    return dense


def materialize_one(pool: Array, row: Array) -> Array:
    """One particle's dense map from its table row (the estimated-map
    read-out: gathers nb tiles, not P maps)."""
    maps = pool[row]  # [nb, hb, W]
    nb, hb, w = maps.shape
    return maps.reshape(nb * hb, w)


def tiled_plan(table: Array, t0: Array, n_phys: int, kspan: int = 2):
    """Copy-on-write plan for one update: which pool tile each particle
    reads and writes for its ``kspan`` touched bands.

    table: i32[P, nb] current band table.  t0: i32[P] first touched band
    (window spans t0 .. t0+kspan-1; caller clamps t0 <= nb-kspan).
    Returns (src i32[P,kspan], dst i32[P,kspan], new_table i32[P,nb]).
    ``dst == src`` where the tile is exclusively owned (in-place write);
    fresh tiles otherwise.  Requires ``n_phys >= live + kspan*P`` —
    guaranteed by the ``P*nb + kspan*P`` sizing since live <= P*nb."""
    p, nb = table.shape
    # static trace-time guarantee: the free list can always satisfy the
    # worst case (everything shared, every particle requesting kspan
    # fresh tiles).  Without it, an undersized pool would silently hand
    # out tile 0 (jnp.nonzero's fill_value) as a "fresh" destination and
    # corrupt live maps.
    assert n_phys >= p * nb + kspan * p, (n_phys, p, nb, kspan)
    bidx = t0[:, None] + jnp.arange(kspan, dtype=jnp.int32)[None, :]
    src = jnp.take_along_axis(table, bidx, axis=1)  # [P, kspan]
    rc = jnp.zeros((n_phys,), jnp.int32).at[table.reshape(-1)].add(1)
    fresh = rc[src] != 1  # shared (or self-shared zero tile): allocate
    rank = jnp.cumsum(fresh.reshape(-1).astype(jnp.int32)) - 1
    # ascending free list via cumsum+scatter (jnp.nonzero lowers to a
    # longer chain of small serial ops — on this chip per-op latency,
    # not op width, is what the plan pays for)
    fmask = rc == 0
    fpos = jnp.cumsum(fmask.astype(jnp.int32)) - 1
    free_idx = jnp.zeros((kspan * p,), jnp.int32).at[
        jnp.where(fmask, fpos, kspan * p)].set(
        jnp.arange(n_phys, dtype=jnp.int32), mode="drop")
    dst = jnp.where(fresh, free_idx[rank.reshape(p, kspan)], src)
    # masked select instead of a 2D scatter (elementwise fuses)
    off = jnp.arange(nb, dtype=jnp.int32)[None, :] - t0[:, None]
    dstb = jnp.take_along_axis(dst, jnp.clip(off, 0, kspan - 1), axis=1)
    new_table = jnp.where((off >= 0) & (off < kspan), dstb, table)
    return src, dst, new_table


def _window_groups(src: Array, r0: Array, u0: Array) -> Array:
    """i32[P] group ids for the shared-window cache: particles whose
    pre-update window is the SAME BYTES — identical source tiles for
    every spanned band (offspring of one ancestor share table rows
    verbatim after the resample relabel), same window row origin, same
    quantized lane roll.  Exclusive tiles appear in exactly one table
    row, so un-resampled particles form singleton groups and never
    share (same effect as the staged kernel's ``spos < 0`` exclusion)."""
    p, ks = src.shape
    mat = jnp.concatenate([src, r0[:, None], u0[:, None]],
                          axis=1).astype(jnp.int32)
    # lexsort: last key is primary; any total order groups equal rows
    order = jnp.lexsort(tuple(mat[:, c] for c in range(ks + 1, -1, -1)))
    ms = mat[order]
    first = jnp.concatenate([jnp.ones((1,), bool),
                             jnp.any(ms[1:] != ms[:-1], axis=1)])
    gid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    return jnp.zeros((p,), jnp.int32).at[order].set(gid_sorted)


def _kernel_tiled(src0_ref, src1_ref, dst0_ref, dst1_ref, off_ref,
                  woff_ref, coff_ref, uoff_ref, pp_ref, pv_ref, table_ref,
                  pool_in, lik_ref, pool_out, win, sem_in, sem_out,
                  sem_band, xi_s=None, yi_s=None, use_s=None, odds_s=None,
                  *, wr, hb, wc, num_beams, logical_rows, logical_cols,
                  ppb, crop128, qu=None, binu=None):
    """Per particle: DMA the two touched bands' [hb, wc] column slices
    into a [2*hb, wc] VMEM window, run the shared likelihood+integrate
    compute on the 8-aligned [wr, wc] view inside it, write both band
    slices back to the (possibly fresh) dst tiles; full-band
    HBM-to-HBM copies cover fresh tiles outside the window columns and
    land under compute, before the window write-back overwrites their
    interior.  Double-buffered at program granularity like
    ``_kernel_hbm``."""
    j = pl.program_id(0)
    n = pl.num_programs(0)
    slot = j % 2
    srcs = (src0_ref, src1_ref)
    dsts = (dst0_ref, dst1_ref)

    def in_copy(jj, s, k, half):
        i = jj * ppb + k
        cj = pl.multiple_of(coff_ref[i], 128)
        return pltpu.make_async_copy(
            pool_in.at[srcs[half][i], :, pl.ds(cj, wc)],
            win.at[s, k, pl.ds(half * hb, hb)], sem_in.at[s, k, half])

    def out_copy(jj, s, k, half):
        i = jj * ppb + k
        cj = pl.multiple_of(coff_ref[i], 128)
        return pltpu.make_async_copy(
            win.at[s, k, pl.ds(half * hb, hb)],
            pool_out.at[dsts[half][i], :, pl.ds(cj, wc)],
            sem_out.at[s, k, half])

    def band_copy(jj, s, k, half):
        i = jj * ppb + k
        return pltpu.make_async_copy(
            pool_in.at[srcs[half][i]], pool_out.at[dsts[half][i]],
            sem_band.at[s, k, half])

    def start_all(jj, s, k):
        for half in range(2):
            in_copy(jj, s, k, half).start()
            i = jj * ppb + k
            if _NOBANDS:  # profiling only (module-level warning)
                continue

            @pl.when(dsts[half][i] != srcs[half][i])
            def _():
                band_copy(jj, s, k, half).start()

    @pl.when(j == 0)
    def _():
        for k in range(ppb):
            start_all(0, 0, k)

    # slot (j+1)%2's window buffers were written back by program j-1;
    # those out-DMAs must land before the next in-DMAs overwrite them
    @pl.when(j >= 1)
    def _():
        for k in range(ppb):
            for half in range(2):
                out_copy(j - 1, (j - 1) % 2, k, half).wait()

    @pl.when(j + 1 < n)
    def _():
        for k in range(ppb):
            start_all(j + 1, (j + 1) % 2, k)

    scr = None if xi_s is None else (xi_s, yi_s, use_s, odds_s)
    scr = _lik_prepare(pv_ref, table_ref, scr, j, ppb=ppb, wr=wr, wc=wc,
                       crop128=crop128, num_beams=num_beams,
                       logical_rows=logical_rows, logical_cols=logical_cols)

    for k in range(ppb):
        i = j * ppb + k
        for half in range(2):
            in_copy(j, slot, k, half).wait()
        r0 = pl.multiple_of(off_ref[i], 8)  # grid row of the view start
        woff = pl.multiple_of(woff_ref[i], 8)
        c0 = pl.multiple_of(coff_ref[i], 128)  # window's grid-col offset
        view = win.at[slot, k, pl.ds(woff, wr)]
        _window_compute(view, view, i, k, r0, c0, uoff_ref, pp_ref,
                        table_ref, lik_ref, wr=wr, wc=wc,
                        num_beams=num_beams, logical_rows=logical_rows,
                        logical_cols=logical_cols, ppb=ppb,
                        crop128=crop128, lik_scratch=scr, qu=qu, binu=binu)
        for half in range(2):
            if not _NOBANDS:
                @pl.when(dsts[half][i] != srcs[half][i])
                def _():
                    band_copy(j, slot, k, half).wait()
            out_copy(j, slot, k, half).start()

    if scr is not None:
        _lik_finish_batched(odds_s, use_s, lik_ref)

    @pl.when(j == n - 1)
    def _():
        for k in range(ppb):
            for half in range(2):
                out_copy(j, slot, k, half).wait()


def _cached_body_span(w_out, i, kk, r0, woff, uoff_ref, pp_ref, table_ref,
                      lik_ref, wcache, cslot, fill, *, wr, num_beams,
                      logical_rows, logical_cols, lik_scratch, qu, binu):
    """Shared-window-cache compute on a k-band [ktot, wc] VMEM window
    whose [wr, wc] view starts at in-window row ``woff`` (8-aligned).

    Fillers (lowest particle index of a group, ``fill == 1``) bitcast
    their just-DMA'd [wr, wc] view (an 8-aligned bf16 ref slice) to i32
    sublane pairs and land the pre-rolled form in ``wcache[cslot]`` —
    one roll for the whole group.  Sharers skipped the MIDDLE band DMAs
    and the roll; their edge bands were DMA'd (out-of-view rows of the
    out-copies need the source bytes) and their middle bands — always
    fully inside the view, see :func:`_kernel_tiled_cached` — are
    covered by the view write-back.  (A first draft instead
    reconstructed the sharer's whole window from the cache with a
    roll(+u0): one full-window roll+store per sharer measured ~+500
    us/update at 1,024 particles — two hidden edge DMAs are far cheaper
    than any per-sharer whole-window ALU.)  Both then compute on the
    pair-space view slice and write the updated [wr, wc] view back.
    Same arithmetic as :func:`slamrs_tpu.ops.fused._cached_body`,
    bitwise."""
    u0 = uoff_ref[i]

    @pl.when(fill == 1)
    def _():
        # cache ONLY the [wr, wc] view (not the whole k-band window):
        # the 8-aligned bf16 ref slice keeps the pair bitcast legal,
        # and the cache read below stays a static whole-slot load
        pairs = pltpu.bitcast(w_out[pl.ds(woff, wr), :], jnp.int32)
        wcache[cslot] = pltpu.roll(pairs, -u0, 1)

    viewp = wcache[cslot]  # [wr//2, wc] i32 pre-rolled pairs
    w32 = pltpu.bitcast(viewp[:, :128], jnp.bfloat16).astype(jnp.float32)
    xi_s, yi_s, _use_s, odds_s = lik_scratch
    _lik_gather_fold_packed(viewp[:, :128], xi_s, yi_s, odds_s, kk,
                            wrp=wr // 2, num_beams=num_beams)
    params = _params(pp_ref, i)
    out = _cell_pass(w32, params, table_ref, wr=wr, cols=128,
                     num_beams=num_beams, r0=r0,
                     logical_rows=logical_rows, logical_cols=logical_cols,
                     c0=u0, qu=qu, binu=binu)
    out_p = pltpu.bitcast(out.astype(jnp.bfloat16), jnp.int32)
    w_out[pl.ds(woff, wr), :] = pltpu.bitcast(
        pltpu.roll(jnp.concatenate([out_p, viewp[:, 128:]], axis=1),
                   u0, 1), jnp.bfloat16)


def _kernel_tiled_cached(*refs, wr, hb, kspan, wc, num_beams,
                         logical_rows, logical_cols, ppb, qu, nw, binu):
    """K-band-span tiled kernel with the shared-window cache — the
    0.02 m-class formulation (full-width maps whose window covers most
    map rows, bands much narrower than the window).

    vs :func:`slamrs_tpu.ops.fused._kernel_hbm_staged`: the staged
    kernel materializes every offspring's FULL map each resampled frame
    — its out-of-window static band copies are the dominant HBM traffic
    (~168 MB/update at 0.02 m, a ~415 us DMA floor;
    benchmarks/prof_r4.py).  Here out-of-window bands are never touched
    at all (the resample relabeled the band table; they stay shared),
    every byte written passes through VMEM exactly once (full-width
    tiles: no HBM-to-HBM copies), and the shared-window cache dedups
    the window reads + rolls across same-ancestor offspring exactly as
    in the staged kernel.  MEASURED OUTCOME (benchmarks/README.md): the
    traffic cut does NOT pay at 0.02 m — 730 vs the staged kernel's
    546 us/update — because the staged kernel hides its compute under
    the DMA floor while this kernel's compute is fully exposed, and the
    exposed compute (cell pass + gathers + rolls) exceeds the staged
    kernel's total.  Kept opt-in (``resample_cow="tiled"``) for
    memory-bound geometries.

    Per particle: ``kspan`` band-slice DMAs in (middle bands fillers
    only), the cached pack2 compute on the [wr, wc] view at in-window
    offset ``woff``, ``kspan`` band-slice DMAs out (every particle —
    its dst tiles are fresh or exclusively owned, see the module's
    write-hazard argument).  Double-buffered at program granularity
    like the other HBM kernels."""
    srcs = refs[:kspan]
    dsts = refs[kspan:2 * kspan]
    (off_ref, woff_ref, uoff_ref, wsel_ref, wfill_ref,
     pp_ref, pv_ref, table_ref, pool_in, lik_ref, pool_out,
     win, sem_in, sem_out, xi_s, yi_s, use_s, odds_s,
     wcache) = refs[2 * kspan:]
    j = pl.program_id(0)
    n = pl.num_programs(0)
    slot = j % 2

    def in_copy(jj, s, kk, half):
        i = jj * ppb + kk
        return pltpu.make_async_copy(
            pool_in.at[srcs[half][i]],
            win.at[s, kk, pl.ds(half * hb, hb)], sem_in.at[s, kk, half])

    def out_copy(jj, s, kk, half):
        i = jj * ppb + kk
        return pltpu.make_async_copy(
            win.at[s, kk, pl.ds(half * hb, hb)],
            pool_out.at[dsts[half][i]], sem_out.at[s, kk, half])

    def start_in(jj, s, kk):
        i = jj * ppb + kk

        @pl.when(wfill_ref[i] == 1)
        def _():
            for half in range(1, kspan - 1):
                in_copy(jj, s, kk, half).start()

        # edge bands always DMA (sharers too): their out-of-view rows
        # must reach the out-copies.  Middle bands are always fully
        # inside the view (kspan <= wr/hb + 1 by construction, so bands
        # 1..kspan-2 lie in [hb, (kspan-1)*hb) <= [woff, woff+wr)) —
        # sharers get them from the view write-back and skip the DMA.
        in_copy(jj, s, kk, 0).start()
        in_copy(jj, s, kk, kspan - 1).start()

    @pl.when(j == 0)
    def _():
        for kk in range(ppb):
            start_in(0, 0, kk)

    # slot (j+1)%2's window buffers were written back by program j-1;
    # those out-DMAs must land before the next in-DMAs (or the sharers'
    # in-register write-backs) overwrite them
    @pl.when(j >= 1)
    def _():
        for kk in range(ppb):
            for half in range(kspan):
                out_copy(j - 1, (j - 1) % 2, kk, half).wait()

    @pl.when(j + 1 < n)
    def _():
        for kk in range(ppb):
            start_in(j + 1, (j + 1) % 2, kk)

    scr = (xi_s, yi_s, use_s, odds_s)
    scr = _lik_prepare(pv_ref, table_ref, scr, j, ppb=ppb, wr=wr, wc=wc,
                       crop128=True, num_beams=num_beams,
                       logical_rows=logical_rows, logical_cols=logical_cols)

    for kk in range(ppb):
        i = j * ppb + kk

        @pl.when(wfill_ref[i] == 1)
        def _():
            for half in range(1, kspan - 1):
                in_copy(j, slot, kk, half).wait()

        in_copy(j, slot, kk, 0).wait()
        in_copy(j, slot, kk, kspan - 1).wait()

        r0 = pl.multiple_of(off_ref[i], 8)
        woff = pl.multiple_of(woff_ref[i], 8)
        ws = wsel_ref[i]
        cslot = jnp.where(ws >= 0, ws, nw + kk)
        _cached_body_span(win.at[slot, kk], i, kk, r0, woff, uoff_ref,
                          pp_ref, table_ref, lik_ref, wcache, cslot,
                          wfill_ref[i], wr=wr, num_beams=num_beams,
                          logical_rows=logical_rows,
                          logical_cols=logical_cols, lik_scratch=scr,
                          qu=qu, binu=binu)
        for half in range(kspan):
            out_copy(j, slot, kk, half).start()

    _lik_finish_batched(odds_s, use_s, lik_ref)

    @pl.when(j == n - 1)
    def _():
        for kk in range(ppb):
            for half in range(kspan):
                out_copy(j, slot, kk, half).wait()


@functools.partial(jax.jit, static_argnames=("spec", "num_beams",
                                             "max_range_m", "interpret"))
def fused_update_tiled(pool: Array, table: Array, poses: Array,
                       angles0: Array, distances: Array, valid: Array,
                       present: Array, spec: GridSpec2D, num_beams: int,
                       max_range_m: float, dphi: Array | None = None,
                       interpret: bool = False,
                       ancestors: Array | None = None):
    """One RBPF grid update over tiled maps.

    Same observable semantics as ``fused_update`` on the materialized
    maps (likelihood on the pre-update window, cell-pass integrate),
    with copy-on-write tile privatization fused into the kernel's DMA
    schedule.  Returns (pool', table', log_lik [P]).

    ``ancestors`` is the PENDING resample lineage (i32[P]): the band
    table is relabeled ``table[ancestors]`` here (the tiled resample's
    only data movement), and the k-span kernel's shared-window groups
    key on it directly — segments of one ancestor share table rows
    verbatim, no content sort needed (the lexsort fallback measured
    ~5 extra 1,024-element sorts per update).
    """
    if ancestors is not None:
        table = jnp.take(table, ancestors.astype(jnp.int32), axis=0)
    p = table.shape[0]
    n_phys, hb, cols = pool.shape
    nb = table.shape[1]
    assert cols % 128 == 0
    assert num_beams <= 383
    if dphi is None:
        dphi = 2.0 * pymath.pi / num_beams
    binu = static_dphi(dphi)
    wr = window_rows(spec, max_range_m)
    assert hb % 8 == 0, hb
    if wr > hb + 1:
        # bands narrower than the window: k-span cached kernel
        return _fused_update_tiled_kspan(
            pool, table, poses, angles0, distances, valid, present,
            spec, num_beams, max_range_m, dphi, interpret, ancestors)
    dphi = jnp.asarray(dphi, jnp.float32)
    rows_pad = nb * hb

    # column windows + crop128 roll: same policy as fused_update
    disc_half = (int(pymath.ceil(max_range_m / spec.resolution))
                 + ADDITIONAL_STEPS + 1)
    wc = cols if (cols <= 256 or disc_half > 64) else 256
    crop128 = wc >= 256 and 2 * disc_half + 1 + 8 <= 128

    pos = jnp.array([spec.position_x, spec.position_y], jnp.float32)
    cxy = (poses[:, 0:2] - pos) / spec.resolution
    theta = poses[:, 2]
    pp = _pp_table(cxy, theta, angles0, dphi, p, binu)

    # window row offset within the padded grid (identical construction
    # to fused_update), then its 2-band span: bands t0/t0+1 with the
    # view at in-span offset woff
    r0 = jnp.round(cxy[:, 1]).astype(jnp.int32) - wr // 2
    r0 = jnp.clip(r0, 0, max(rows_pad - wr, 0))
    r0 = (r0 // 8) * 8
    t0 = jnp.clip(r0 // hb, 0, nb - 2)
    woff = r0 - t0 * hb  # in [0, 2*hb - wr], 8-aligned

    ccol = jnp.round(cxy[:, 0]).astype(jnp.int32)
    blk = ccol // 128
    c0 = (blk - jnp.where(ccol % 128 < 64, 1, 0)) * 128
    c0 = jnp.clip(c0, 0, max(cols - wc, 0))
    u0 = (jnp.clip(ccol - c0 - 64, 0, wc - 128) if crop128
          else jnp.zeros((p,), jnp.int32))

    ppb = 16 if (p % 16 == 0 and p >= 512) else 8 if p % 8 == 0 else 1

    ceff = (c0 + u0) if crop128 else c0
    zero = jnp.zeros((p,), jnp.float32)
    pv = jnp.stack([cxy[:, 0], cxy[:, 1],
                    jnp.cos(theta), jnp.sin(theta),
                    r0.astype(jnp.float32), ceff.astype(jnp.float32),
                    zero, zero], axis=-1)

    qu = (pack3_quantum(max_range_m / spec.resolution)
          if num_beams <= 381 else None)
    btab = encode_beam_table(distances / spec.resolution, valid, present,
                             angles0, dphi, pack_quantum=qu)

    src, dst, new_table = tiled_plan(table, t0, n_phys)

    kernel = functools.partial(
        _kernel_tiled, wr=wr, hb=hb, wc=wc, num_beams=num_beams,
        logical_rows=spec.rows, logical_cols=spec.cols, ppb=ppb,
        crop128=crop128, qu=qu, binu=binu)

    scratch = [
        pltpu.VMEM((2, ppb, 2 * hb, wc), pool.dtype),
        pltpu.SemaphoreType.DMA((2, ppb, 2)),
        pltpu.SemaphoreType.DMA((2, ppb, 2)),
        pltpu.SemaphoreType.DMA((2, ppb, 2)),
    ]
    if ppb >= 8:
        n_chunks = -(-num_beams // 128)
        scratch += [pltpu.VMEM((ppb, 128 * n_chunks), jnp.float32)
                    for _ in range(4)]

    prefetch = [src[:, 0], src[:, 1], dst[:, 0], dst[:, 1], r0, woff,
                c0, u0]
    n_pool_in = 3 + len(prefetch)

    if ppb >= 8:
        lik_spec = pl.BlockSpec((ppb, 128), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
    else:
        lik_spec = pl.BlockSpec((8, 128), lambda i, *_: (i // 8, 0),
                                memory_space=pltpu.VMEM)

    lik, pool_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=(p // ppb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # pp [P, 8]
                pl.BlockSpec(memory_space=pltpu.VMEM),   # pv [P, 8]
                pl.BlockSpec(memory_space=pltpu.VMEM),   # table [8, 512]
                pl.BlockSpec(memory_space=pl.ANY),       # pool
            ],
            out_specs=[
                lik_spec,
                pl.BlockSpec(memory_space=pl.ANY),       # pool out
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((p, 128), jnp.float32),
            jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        ],
        input_output_aliases={n_pool_in: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*prefetch, pp, pv, btab, pool)

    return pool_out, new_table, lik[:, 0]


def _fused_update_tiled_kspan(pool, table, poses, angles0, distances,
                              valid, present, spec: GridSpec2D,
                              num_beams: int, max_range_m: float,
                              dphi, interpret: bool, ancestors=None):
    """K-band-span dispatch of :func:`fused_update_tiled` (bands
    narrower than the window — the 0.02 m-class geometry; see
    :func:`_kernel_tiled_cached`).  Requires full-width windows, bf16
    tiles, a crop128-able disc and 16-divisible bands."""
    p = table.shape[0]
    n_phys, hb, cols = pool.shape
    nb = table.shape[1]
    binu = static_dphi(dphi)
    dphi = jnp.asarray(dphi, jnp.float32)
    wr, kspan, nb_need = span_geometry(spec, max_range_m, hb)
    assert nb >= nb_need, (nb, nb_need)
    assert pool.dtype == jnp.bfloat16, pool.dtype
    disc_half = (int(pymath.ceil(max_range_m / spec.resolution))
                 + ADDITIONAL_STEPS + 1)
    wc = cols if (cols <= 256 or disc_half > 64) else 256
    crop128 = wc >= 256 and 2 * disc_half + 1 + 8 <= 128
    assert wc == cols and crop128, (
        "k-span tiled kernel needs full-width windows and a "
        "128-lane-croppable disc", wc, cols, crop128)
    ppb = 16 if (p % 16 == 0 and p >= 512) else 8
    assert p % ppb == 0, (p, ppb)

    pos = jnp.array([spec.position_x, spec.position_y], jnp.float32)
    cxy = (poses[:, 0:2] - pos) / spec.resolution
    theta = poses[:, 2]
    pp = _pp_table(cxy, theta, angles0, dphi, p, binu)

    # window row origin: the dense kernel's 8/8 construction, clipped
    # into band padding like the 2-band kernel (masked rows stay 0)
    r0 = jnp.round(cxy[:, 1]).astype(jnp.int32) - wr // 2
    r0 = jnp.clip(r0, 0, max(nb * hb - wr, 0))
    r0 = (r0 // 8) * 8

    # full width: c0 = 0; u0 = quantized lane roll of the 128-lane view
    # (8-quantized so same-ancestor offspring share windows exactly —
    # output-neutral, see fused_update's sharewin note)
    ccol = jnp.round(cxy[:, 0]).astype(jnp.int32)
    u0 = jnp.clip(ccol - 64, 0, wc - 128)
    u0 = jnp.clip((u0 + 4) // 8 * 8, 0, wc - 128)
    if ancestors is not None:
        # collapse one ancestor's offspring to ONE window DMA + roll
        # (fused.merge_segment_windows: leader placement adopted when it
        # still covers the offspring's scan disc — output-neutral, same
        # argument as the staged kernel).  The band span (t0, below)
        # follows the merged r0, so merged offspring also touch — and
        # privatize — the SAME kspan bands as their leader.
        r0, u0 = merge_segment_windows(ancestors, r0, u0, cxy, disc_half,
                                       wr, spec.rows, spec.cols)
    t0 = r0 // hb
    woff = r0 - t0 * hb  # 8-aligned in [0, hb-8]

    zero = jnp.zeros((p,), jnp.float32)
    pv = jnp.stack([cxy[:, 0], cxy[:, 1],
                    jnp.cos(theta), jnp.sin(theta),
                    r0.astype(jnp.float32), u0.astype(jnp.float32),
                    zero, zero], axis=-1)

    qu = (pack3_quantum(max_range_m / spec.resolution)
          if num_beams <= 381 else None)
    btab = encode_beam_table(distances / spec.resolution, valid, present,
                             angles0, dphi, pack_quantum=qu)

    src, dst, new_table = tiled_plan(table, t0, n_phys, kspan=kspan)
    nw = _SHAREWIN_SLOTS
    if ancestors is not None:
        # group by pending lineage: same ancestor => identical table row
        # after the relabel => identical window bytes (with same r0/u0).
        # No content sort — same keying as the staged kernel's plan.
        gid = ancestors.astype(jnp.int32)
    else:
        gid = _window_groups(src, r0, u0)
    wsel, wfill = shared_window_plan(gid, r0, u0, nw)

    kernel = functools.partial(
        _kernel_tiled_cached, wr=wr, hb=hb, kspan=kspan, wc=wc,
        num_beams=num_beams, logical_rows=spec.rows,
        logical_cols=spec.cols, ppb=ppb, qu=qu, nw=nw, binu=binu)

    ktot = kspan * hb
    n_chunks = -(-num_beams // 128)
    scratch = [
        pltpu.VMEM((2, ppb, ktot, wc), pool.dtype),  # double-buffered
        pltpu.SemaphoreType.DMA((2, ppb, kspan)),
        pltpu.SemaphoreType.DMA((2, ppb, kspan)),
    ]
    scratch += [pltpu.VMEM((ppb, 128 * n_chunks), jnp.float32)
                for _ in range(4)]
    # pre-rolled i32 sublane-pair VIEW cache: nw shared slots + ppb
    # reserved private slots
    scratch.append(pltpu.VMEM((nw + ppb, wr // 2, wc), jnp.int32))
    scratch_bytes = (2 * ppb * ktot * wc * pool.dtype.itemsize
                     + 4 * ppb * 128 * n_chunks * 4
                     + (nw + ppb) * (wr // 2) * wc * 4)

    prefetch = ([src[:, c] for c in range(kspan)]
                + [dst[:, c] for c in range(kspan)]
                + [r0, woff, u0, wsel, wfill])
    n_pool_in = 3 + len(prefetch)

    lik_spec = pl.BlockSpec((ppb, 128), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    lik, pool_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=(p // ppb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # pp [P, 8]
                pl.BlockSpec(memory_space=pltpu.VMEM),   # pv [P, 8]
                pl.BlockSpec(memory_space=pltpu.VMEM),   # table [8, 512]
                pl.BlockSpec(memory_space=pl.ANY),       # pool
            ],
            out_specs=[
                lik_spec,
                pl.BlockSpec(memory_space=pl.ANY),       # pool out
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((p, 128), jnp.float32),
            jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        ],
        input_output_aliases={n_pool_in: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # tight cap: scratch + pipeline slack (a loose cap measurably
            # degrades Mosaic's pipelining, see fused_update's note)
            vmem_limit_bytes=scratch_bytes + 8 * 1024 * 1024),
        interpret=interpret,
    )(*prefetch, pp, pv, btab, pool)

    return pool_out, new_table, lik[:, 0]
