"""Scratch profiling harness: 0.02 m-cell fused kernel cost breakdown.

Standalone pallas_call variants (NOT re-jits of fused_update — jax caches
on function identity) timed by value-fetch marginal between two scan
lengths.  Usage: python tmp_prof_002.py [variant ...]
"""

import functools
import math as pymath
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slamrs_tpu.ops.fused import (_cell_pass, _endpoint_lik, _params,
                                  encode_beam_table, window_rows)
from slamrs_tpu.ops.grid import ADDITIONAL_STEPS, GridSpec2D

P, RES, WIDTH = 1024, 0.02, 4.0
NB = 360
MAXR = 1.0
DT = jnp.bfloat16

spec = GridSpec2D(-WIDTH / 2, -WIDTH / 2, WIDTH, WIDTH, RES)
rows, cols = spec.rows, (spec.cols + 127) // 128 * 128
print(f"grid {rows}x{cols} cells, P={P}, {DT.__name__}", file=sys.stderr)

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

wr = window_rows(spec, MAXR)
wr = min(wr, rows - rows % 8 if rows % 8 else rows)
disc_half = int(pymath.ceil(MAXR / spec.resolution)) + ADDITIONAL_STEPS + 1
wc = cols if (cols <= 256 or disc_half > 64) else 256
crop128 = wc >= 256 and 2 * disc_half + 1 + 8 <= 128
print(f"wr={wr} wc={wc} crop128={crop128} disc_half={disc_half}",
      file=sys.stderr)


def setup(poses):
    pos = jnp.array([spec.position_x, spec.position_y], jnp.float32)
    cxy = (poses[:, 0:2] - pos) / spec.resolution
    theta = poses[:, 2]
    pp = jnp.stack([cxy[:, 0], cxy[:, 1], theta,
                    theta + jnp.broadcast_to(angles0, (P,)).astype(jnp.float32),
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


def _window_compute_v(w_in, w_out, i, k, r0, c0, uoff_ref, pp_ref,
                      table_ref, lik_ref, *, ppb, do_lik, do_cell):
    if crop128:
        u0 = uoff_ref[i]
        rolled = pltpu.roll(w_in[...].astype(jnp.float32), -u0, 1)
        w32 = rolled[:, :128]
        cw = 128
        ceff = u0 if c0 is None else c0 + u0
    else:
        w32 = w_in[...].astype(jnp.float32)
        cw = wc
        ceff = c0
    params = _params(pp_ref, i)
    if do_lik:
        lik = _endpoint_lik(w32, params, table_ref, wr=wr, cols=cw,
                            num_beams=NB, r0=r0, logical_rows=spec.rows,
                            logical_cols=spec.cols, c0=ceff)
    else:
        lik = jnp.float32(0.0)
    if do_cell:
        out = _cell_pass(w32, params, table_ref, wr=wr, cols=cw,
                         num_beams=NB, r0=r0, logical_rows=spec.rows,
                         logical_cols=spec.cols, c0=ceff)
    else:
        out = w32 + 1.0
    lik_ref[k, :] = jnp.full((128,), lik, jnp.float32)  # block rows = ppb
    if crop128:
        w_out[...] = pltpu.roll(
            jnp.concatenate([out, rolled[:, 128:]], axis=1), u0, 1
        ).astype(w_out.dtype)
    else:
        w_out[...] = out.astype(w_out.dtype)


def _kernel_hbm_v(off_ref, coff_ref, uoff_ref, pp_ref, table_ref, grid_in,
                  lik_ref, grid_out, win, sem_in, sem_out, *, ppb,
                  do_lik, do_cell):
    j = pl.program_id(0)
    n = pl.num_programs(0)
    slot = j % 2

    def in_copy(jj, s, k):
        p_idx = jj * ppb + k
        rj = pl.multiple_of(off_ref[p_idx], 8)
        cj = pl.multiple_of(coff_ref[p_idx], 128)
        return pltpu.make_async_copy(
            grid_in.at[p_idx, pl.ds(rj, wr), pl.ds(cj, wc)], win.at[s, k],
            sem_in.at[s, k])

    def out_copy(jj, s, k):
        p_idx = jj * ppb + k
        rj = pl.multiple_of(off_ref[p_idx], 8)
        cj = pl.multiple_of(coff_ref[p_idx], 128)
        return pltpu.make_async_copy(
            win.at[s, k], grid_out.at[p_idx, pl.ds(rj, wr), pl.ds(cj, wc)],
            sem_out.at[s, k])

    @pl.when(j == 0)
    def _():
        for k in range(ppb):
            in_copy(0, 0, k).start()

    @pl.when(j >= 1)
    def _():
        for k in range(ppb):
            out_copy(j - 1, (j - 1) % 2, k).wait()

    @pl.when(j + 1 < n)
    def _():
        for k in range(ppb):
            in_copy(j + 1, (j + 1) % 2, k).start()

    for k in range(ppb):
        i = j * ppb + k
        in_copy(j, slot, k).wait()
        r0 = pl.multiple_of(off_ref[i], 8)
        c0 = pl.multiple_of(coff_ref[i], 128)
        _window_compute_v(win.at[slot, k], win.at[slot, k], i, k, r0, c0,
                          uoff_ref, pp_ref, table_ref, lik_ref, ppb=ppb,
                          do_lik=do_lik, do_cell=do_cell)
        out_copy(j, slot, k).start()

    @pl.when(j == n - 1)
    def _():
        for k in range(ppb):
            out_copy(j, slot, k).wait()


def _kernel_compute_only(off_ref, coff_ref, uoff_ref, pp_ref, table_ref,
                         grid_in, lik_ref, grid_out, win, sem_in, sem_out,
                         *, ppb, do_lik, do_cell):
    """No DMAs at all: the full per-particle compute on a VMEM scratch
    window — isolates VPU+dispatch cost from DMA issue/traffic."""
    j = pl.program_id(0)
    for k in range(ppb):
        i = j * ppb + k
        r0 = pl.multiple_of(off_ref[i], 8)
        c0 = pl.multiple_of(coff_ref[i], 128)
        _window_compute_v(win.at[0, k], win.at[0, k], i, k, r0, c0,
                          uoff_ref, pp_ref, table_ref, lik_ref, ppb=ppb,
                          do_lik=do_lik, do_cell=do_cell)


def hbm_call(grids, pp, r0, c0, u0, table, *, ppb, do_lik=True,
             do_cell=True, compute_only=False):
    kernel = functools.partial(
        _kernel_compute_only if compute_only else _kernel_hbm_v,
        ppb=ppb, do_lik=do_lik, do_cell=do_cell)
    assert ppb % 8 == 0
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
        input_output_aliases={5: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=False,
    )(r0, c0, u0, pp, table, grids)
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


def run_variant(name, **kw):
    def factory(n):
        @jax.jit
        def run(grids):
            def body(g, _):
                g2, lik = hbm_call(g, pp_h, r0_h, c0_h, u0_h, table_h, **kw)
                return g2, jnp.sum(lik)
            g, liks = jax.lax.scan(body, grids, None, length=n)
            return jnp.sum(liks) + jnp.float32(g[0, 0, 0])
        return run

    dt = marginal(factory)
    print(f"{name}: {dt * 1e6:.1f} us/update")
    return dt


if __name__ == "__main__":
    variants = sys.argv[1:] or ["base8"]
    for v in variants:
        if v == "base8":
            run_variant("hbm ppb=8 full", ppb=8)
        elif v == "nolik":
            run_variant("hbm ppb=8 no-lik", ppb=8, do_lik=False)
        elif v == "nocell":
            run_variant("hbm ppb=8 no-cell", ppb=8, do_lik=True,
                        do_cell=False)
        elif v == "nocompute":
            run_variant("hbm ppb=8 copy-only", ppb=8, do_lik=False,
                        do_cell=False)
        elif v == "ppb16":
            run_variant("hbm ppb=16 full", ppb=16)
        elif v == "ppb32":
            run_variant("hbm ppb=32 full", ppb=32)
        elif v == "computeonly":
            run_variant("compute-only (no DMA)", ppb=8, compute_only=True)
        elif v == "dispatchonly":
            run_variant("dispatch-only (no DMA, no compute)", ppb=8,
                        compute_only=True, do_lik=False, do_cell=False)
