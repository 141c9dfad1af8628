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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slamrs_tpu.ops.fused import (_lik_finish_batched, _lik_prepare,
                                  _window_compute, encode_beam_table,
                                  pack3_quantum, window_rows)
from slamrs_tpu.ops.grid import ADDITIONAL_STEPS, GridSpec2D

Array = jnp.ndarray


def tile_geometry(spec: GridSpec2D, max_range_m: float,
                  band_rows: int | None = None) -> tuple[int, int, int]:
    """(band_rows, n_bands, padded_cols) for a tiled map at this spec.

    ``band_rows`` defaults to the kernel window height ``wr`` (8-aligned,
    >= the scan disc + overshoot) — the smallest band any window fits in
    a 2-band span (needs ``wr <= band_rows + 1``)."""
    wr = window_rows(spec, max_range_m)
    hb = band_rows if band_rows is not None else wr
    assert hb % 8 == 0 and wr <= hb + 1, (wr, hb)
    nb = -(-spec.rows // hb)
    nb = max(nb, 2)  # the window always spans 2 bands
    cols = (spec.cols + 127) // 128 * 128
    return hb, nb, cols


def init_tiled(p: int, spec: GridSpec2D, max_range_m: float,
               dtype=jnp.bfloat16, band_rows: int | None = None,
               n_phys: int | None = None) -> tuple[Array, Array]:
    """Fresh (pool, table): every band of every particle references the
    single all-zero tile 0 (log-odds prior = 0 everywhere, map.rs:56)."""
    hb, nb, cols = tile_geometry(spec, max_range_m, band_rows)
    if n_phys is None:
        n_phys = p * nb + 2 * p
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


def tiled_plan(table: Array, t0: Array, n_phys: int):
    """Copy-on-write plan for one update: which pool tile each particle
    reads and writes for its two touched bands.

    table: i32[P, nb] current band table.  t0: i32[P] first touched band
    (window spans t0, t0+1; caller clamps t0 <= nb-2).
    Returns (src i32[P,2], dst i32[P,2], new_table i32[P,nb]).
    ``dst == src`` where the tile is exclusively owned (in-place write);
    fresh tiles otherwise.  Requires ``n_phys >= live + 2P`` — guaranteed
    by the ``P*nb + 2P`` sizing since live <= P*nb."""
    p, nb = table.shape
    # static trace-time guarantee: the free list can always satisfy the
    # worst case (everything shared, every particle requesting 2 fresh
    # tiles).  Without it, an undersized pool would silently hand out
    # tile 0 (jnp.nonzero's fill_value) as a "fresh" destination and
    # corrupt live maps.
    assert n_phys >= p * nb + 2 * p, (n_phys, p, nb)
    rows = jnp.arange(p, dtype=jnp.int32)
    bidx = jnp.stack([t0, t0 + 1], axis=-1)  # [P, 2]
    src = jnp.take_along_axis(table, bidx, axis=1)  # [P, 2]
    rc = jnp.zeros((n_phys,), jnp.int32).at[table.reshape(-1)].add(1)
    fresh = rc[src] != 1  # shared (or self-shared zero tile): allocate
    rank = jnp.cumsum(fresh.reshape(-1).astype(jnp.int32)) - 1
    free_idx = jnp.nonzero(rc == 0, size=2 * p, fill_value=0)[0]
    free_idx = free_idx.astype(jnp.int32)
    dst = jnp.where(fresh, free_idx[rank.reshape(p, 2)], src)
    new_table = table.at[rows[:, None], bidx].set(dst)
    return src, dst, new_table


def _kernel_tiled(src0_ref, src1_ref, dst0_ref, dst1_ref, off_ref,
                  woff_ref, coff_ref, uoff_ref, pp_ref, pv_ref, table_ref,
                  pool_in, lik_ref, pool_out, win, sem_in, sem_out,
                  sem_band, xi_s=None, yi_s=None, use_s=None, odds_s=None,
                  *, wr, hb, wc, num_beams, logical_rows, logical_cols,
                  ppb, crop128, qu=None):
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
                        crop128=crop128, lik_scratch=scr, qu=qu)
        for half in range(2):
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


@functools.partial(jax.jit, static_argnames=("spec", "num_beams",
                                             "max_range_m", "interpret"))
def fused_update_tiled(pool: Array, table: Array, poses: Array,
                       angles0: Array, distances: Array, valid: Array,
                       present: Array, spec: GridSpec2D, num_beams: int,
                       max_range_m: float, dphi: Array | None = None,
                       interpret: bool = False):
    """One RBPF grid update over tiled maps.

    Same observable semantics as ``fused_update`` on the materialized
    maps (likelihood on the pre-update window, cell-pass integrate),
    with copy-on-write tile privatization fused into the kernel's DMA
    schedule.  Returns (pool', table', log_lik [P]).
    """
    p = table.shape[0]
    n_phys, hb, cols = pool.shape
    nb = table.shape[1]
    assert cols % 128 == 0
    assert num_beams <= 383
    if dphi is None:
        dphi = jnp.float32(2.0 * pymath.pi / num_beams)
    dphi = jnp.asarray(dphi, jnp.float32)
    wr = window_rows(spec, max_range_m)
    assert wr <= hb + 1 and hb % 8 == 0, (wr, hb)
    rows_pad = nb * hb

    # column windows + crop128 roll: same policy as fused_update
    disc_half = (int(pymath.ceil(max_range_m / spec.resolution))
                 + ADDITIONAL_STEPS + 1)
    wc = cols if (cols <= 256 or disc_half > 64) else 256
    crop128 = wc >= 256 and 2 * disc_half + 1 + 8 <= 128

    pos = jnp.array([spec.position_x, spec.position_y], jnp.float32)
    cxy = (poses[:, 0:2] - pos) / spec.resolution
    theta = poses[:, 2]
    pp = jnp.stack([cxy[:, 0], cxy[:, 1], theta,
                    theta + jnp.broadcast_to(
                        angles0, (p,)).astype(jnp.float32),
                    jnp.cos(theta), jnp.sin(theta),
                    jnp.broadcast_to(dphi, (p,)),
                    jnp.broadcast_to(1.0 / dphi, (p,))],
                   axis=-1)

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
        crop128=crop128, qu=qu)

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
