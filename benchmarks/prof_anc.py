"""Scratch profiling harness: deferred-lineage HBM kernel cost breakdown.

Isolates where the fused-lineage kernel (_kernel_hbm_anc) spends its time
vs the plain aliased window kernel + staged-CoW composition at the 0.02 m
bench point, with a realistic peaked ancestor vector (~11 unique
ancestors — the measured median N_eff there).

Variants:
  plain       aliased _kernel_hbm via fused_update (no lineage)
  anc         committed _kernel_hbm_anc via fused_update (bands + lineage)
  nobands     local copy of the anc kernel with band DMAs removed
              (WRONG out-of-window results; isolates band DMA cost)
  nowaitbatch bands started but waited once per program (not per particle)
  cow         plain kernel + ops.cow.cow_resample composition (status quo)

Usage: python benchmarks/prof_anc.py [variant ...]
"""

import functools
import math as pymath
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slamrs_tpu.ops.fused import (_window_compute, encode_beam_table,
                                  fused_update, window_rows)
from slamrs_tpu.ops.grid import ADDITIONAL_STEPS, GridSpec2D

P, RES, WIDTH = 1024, 0.02, 4.0
NB = 360
MAXR = 1.0
DT = jnp.bfloat16
N_UNIQUE = 11

spec = GridSpec2D(-WIDTH / 2, -WIDTH / 2, WIDTH, WIDTH, RES)
rows, cols = spec.rows, (spec.cols + 127) // 128 * 128

key = jax.random.key(0)
poses = jnp.concatenate([
    jax.random.uniform(key, (P, 2), jnp.float32, -0.3, 0.3),
    jax.random.uniform(jax.random.fold_in(key, 1), (P, 1), jnp.float32,
                       -3.0, 3.0)], axis=1)
angles0 = jnp.float32(0.0)
dphi = jnp.float32(2 * pymath.pi / NB)
dist = jax.random.uniform(jax.random.fold_in(key, 2), (NB,), jnp.float32,
                          0.2, 0.99)
valid = jnp.ones((NB,), bool)
present = jnp.ones((NB,), bool)

# realistic post-systematic-resample lineage: ~11 sorted runs
rng = np.random.default_rng(7)
uniq = np.sort(rng.choice(P, N_UNIQUE, replace=False))
counts = rng.multinomial(P, np.ones(N_UNIQUE) / N_UNIQUE)
anc_np = np.repeat(uniq, counts)[:P]
anc_np = np.concatenate([anc_np, np.full(P - len(anc_np), uniq[-1])])
ANC = jnp.asarray(np.sort(anc_np), jnp.int32)

wr = window_rows(spec, MAXR)
wr = min(wr, rows - rows % 8 if rows % 8 else rows)
disc_half = int(pymath.ceil(MAXR / spec.resolution)) + ADDITIONAL_STEPS + 1
wc = cols if (cols <= 256 or disc_half > 64) else 256
crop128 = wc >= 256 and 2 * disc_half + 1 + 8 <= 128
print(f"grid {rows}x{cols} P={P} wr={wr} wc={wc} crop128={crop128} "
      f"band={rows - wr}", file=sys.stderr)


def setup(poses):
    pos = jnp.array([spec.position_x, spec.position_y], jnp.float32)
    cxy = (poses[:, 0:2] - pos) / spec.resolution
    theta = poses[:, 2]
    pp = jnp.stack([cxy[:, 0], cxy[:, 1], theta,
                    theta + jnp.broadcast_to(angles0, (P,)).astype(
                        jnp.float32),
                    jnp.cos(theta), jnp.sin(theta),
                    jnp.broadcast_to(dphi, (P,)),
                    jnp.broadcast_to(1.0 / dphi, (P,))], axis=-1)
    r0 = jnp.round(cxy[:, 1]).astype(jnp.int32) - wr // 2
    r0 = jnp.clip(r0, 0, max(rows - wr, 0))
    r0 = (r0 // 8) * 8
    ccol = jnp.round(cxy[:, 0]).astype(jnp.int32)
    blk = ccol // 128
    c0 = (blk - jnp.where(ccol % 128 < 64, 1, 0)) * 128
    c0 = jnp.clip(c0, 0, max(cols - wc, 0))
    u0 = jnp.clip(ccol - c0 - 64, 0, wc - 128)
    table = encode_beam_table(dist / spec.resolution, valid, present,
                              angles0, dphi)
    return pp, r0, c0, u0, table


pp_h, r0_h, c0_h, u0_h, table_h = jax.jit(setup)(poses)


def _kernel_anc_v(anc_ref, off_ref, coff_ref, uoff_ref, pp_ref, table_ref,
                  grid_in, lik_ref, grid_out, win, sem_in, sem_out,
                  sem_band, *, ppb, bands, batch_wait):
    """Local variant of _kernel_hbm_anc with band DMAs switchable."""
    band = rows - wr
    j = pl.program_id(0)
    n = pl.num_programs(0)
    slot = j % 2

    def in_copy(jj, s, k):
        p_idx = jj * ppb + k
        a = anc_ref[p_idx]
        rj = pl.multiple_of(off_ref[p_idx], 8)
        return pltpu.make_async_copy(
            grid_in.at[a, pl.ds(rj, wr), :], win.at[s, k], sem_in.at[s, k])

    def band_copies(jj, s, k):
        p_idx = jj * ppb + k
        a = anc_ref[p_idx]
        return (
            pltpu.make_async_copy(grid_in.at[a, pl.ds(0, band), :],
                                  grid_out.at[p_idx, pl.ds(0, band), :],
                                  sem_band.at[s, k, 0]),
            pltpu.make_async_copy(grid_in.at[a, pl.ds(wr, band), :],
                                  grid_out.at[p_idx, pl.ds(wr, band), :],
                                  sem_band.at[s, k, 1]),
        )

    def out_copy(jj, s, k):
        p_idx = jj * ppb + k
        rj = pl.multiple_of(off_ref[p_idx], 8)
        return pltpu.make_async_copy(
            win.at[s, k], grid_out.at[p_idx, pl.ds(rj, wr), :],
            sem_out.at[s, k])

    def start_all(jj, s, k):
        in_copy(jj, s, k).start()
        if bands:
            ba, bb = band_copies(jj, s, k)
            ba.start()
            bb.start()

    @pl.when(j == 0)
    def _():
        for k in range(ppb):
            start_all(0, 0, k)

    @pl.when(j >= 1)
    def _():
        for k in range(ppb):
            out_copy(j - 1, (j - 1) % 2, k).wait()

    @pl.when(j + 1 < n)
    def _():
        for k in range(ppb):
            start_all(j + 1, (j + 1) % 2, k)

    for k in range(ppb):
        i = j * ppb + k
        in_copy(j, slot, k).wait()
        r0 = pl.multiple_of(off_ref[i], 8)
        _window_compute(win.at[slot, k], win.at[slot, k], i, k, r0, None,
                        uoff_ref, pp_ref, table_ref, lik_ref, wr=wr,
                        wc=wc, num_beams=NB, logical_rows=spec.rows,
                        logical_cols=spec.cols, ppb=ppb, crop128=crop128)
        if bands and not batch_wait:
            ba, bb = band_copies(j, slot, k)
            ba.wait()
            bb.wait()
        out_copy(j, slot, k).start()

    if bands and batch_wait:
        for k in range(ppb):
            ba, bb = band_copies(j, slot, k)
            ba.wait()
            bb.wait()

    @pl.when(j == n - 1)
    def _():
        for k in range(ppb):
            out_copy(j, slot, k).wait()


def anc_call(grids, anc, pp, r0, c0, u0, table, *, ppb, bands=True,
             batch_wait=False):
    kernel = functools.partial(_kernel_anc_v, ppb=ppb, bands=bands,
                               batch_wait=batch_wait)
    lik_spec = pl.BlockSpec((ppb, 128), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((2, ppb, wr, wc), grids.dtype),
        pltpu.SemaphoreType.DMA((2, ppb)),
        pltpu.SemaphoreType.DMA((2, ppb)),
        pltpu.SemaphoreType.DMA((2, ppb, 2)),
    ]
    lik, grids_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(P // ppb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[lik_spec, pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((P, 128), jnp.float32),
            jax.ShapeDtypeStruct(grids.shape, grids.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=False,
    )(anc, r0, c0, u0, pp, table, grids)
    return grids_out, lik[:, 0]


def marginal(run_factory, n1=30, n2=230, reps=3):
    r1, r2 = run_factory(n1), run_factory(n2)
    g0 = jnp.zeros((P, rows, cols), DT)
    float(r1(g0))
    float(r2(g0))
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(g0))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(r2(g0))
        tb = time.perf_counter() - t0
        diffs.append((tb - ta) / (n2 - n1))
    diffs.sort()
    return diffs[len(diffs) // 2]


def run_variant(name, step):
    def factory(n):
        @jax.jit
        def run(grids):
            def body(g, _):
                g2, lik = step(g)
                return g2, jnp.sum(lik)
            g, liks = jax.lax.scan(body, grids, None, length=n)
            return jnp.sum(liks) + jnp.float32(g[0, 0, 0])
        return run

    dt = marginal(factory)
    print(f"{name}: {dt * 1e6:.1f} us/update")
    return dt


def step_plain(g):
    return fused_update(g, poses, angles0, dist, valid, present, spec, NB,
                        MAXR, resident=False)


def step_anc(g):
    return fused_update(g, poses, angles0, dist, valid, present, spec, NB,
                        MAXR, resident=False, ancestors=ANC)


def step_cow(g):
    from slamrs_tpu.ops.cow import cow_resample
    g2, lik = fused_update(g, poses, angles0, dist, valid, present, spec,
                           NB, MAXR, resident=False)
    _, g3 = cow_resample(g2, poses, ANC)
    return g3, lik


def plain_call(grids, *, alias):
    """Committed _kernel_hbm shape, aliasing switchable."""
    from slamrs_tpu.ops.fused import _kernel_hbm
    ppb = 16
    kernel = functools.partial(_kernel_hbm, wr=wr, wc=wc, num_beams=NB,
                               logical_rows=spec.rows,
                               logical_cols=spec.cols, ppb=ppb,
                               crop128=crop128)
    lik_spec = pl.BlockSpec((ppb, 128), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((2, ppb, wr, wc), grids.dtype),
        pltpu.SemaphoreType.DMA((2, ppb)),
        pltpu.SemaphoreType.DMA((2, ppb)),
    ]
    lik, grids_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(P // ppb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[lik_spec, pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((P, 128), jnp.float32),
            jax.ShapeDtypeStruct(grids.shape, grids.dtype),
        ],
        input_output_aliases={5: 1} if alias else {},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=False,
    )(r0_h, c0_h, u0_h, pp_h, table_h, grids)
    return grids_out, lik[:, 0]


if __name__ == "__main__":
    variants = sys.argv[1:] or ["plain", "anc", "nobands", "cow"]
    for v in variants:
        if v == "plain":
            run_variant("plain aliased window kernel", step_plain)
        elif v == "anc":
            run_variant("anc kernel (committed, bands)", step_anc)
        elif v == "nobands":
            run_variant("anc kernel NO bands (wrong, timing only)",
                        lambda g: anc_call(g, ANC, pp_h, r0_h, c0_h, u0_h,
                                           table_h, ppb=16, bands=False))
        elif v == "batchwait":
            run_variant("anc kernel bands, batched waits",
                        lambda g: anc_call(g, ANC, pp_h, r0_h, c0_h, u0_h,
                                           table_h, ppb=16, bands=True,
                                           batch_wait=True))
        elif v == "plainalias":
            run_variant("plain shape, WITH aliasing (sanity)",
                        lambda g: plain_call(g, alias=True))
        elif v == "plainnoalias":
            run_variant("plain shape, NO aliasing",
                        lambda g: plain_call(g, alias=False))
        elif v == "identanc":
            import numpy as _np
            ident = jnp.asarray(_np.arange(P), jnp.int32)
            run_variant("anc kernel, IDENTITY ancestors (bands)",
                        lambda g: anc_call(g, ident, pp_h, r0_h, c0_h, u0_h,
                                           table_h, ppb=16, bands=True))
        elif v == "identnoband":
            import numpy as _np
            ident = jnp.asarray(_np.arange(P), jnp.int32)
            run_variant("anc kernel, IDENTITY ancestors, no bands",
                        lambda g: anc_call(g, ident, pp_h, r0_h, c0_h, u0_h,
                                           table_h, ppb=16, bands=False))
        elif v == "cow":
            run_variant("plain kernel + staged CoW pass", step_cow)
