"""Scratch: auto-pipelined variant — Pallas grid pipeline streams whole
particle maps as blocks (8/block), kernel computes on the VMEM block.
Trades 1.67x bulk traffic (full maps vs windows) for zero manual DMA
descriptors and Mosaic's native double-buffered overlap."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slamrs_tpu.ops.fused import _window_compute
from benchmarks.prof_002 import (DT, NB, P, cols, crop128, pp_h, r0_h, c0_h, u0_h,
                          rows, spec, table_h, wc, wr)

PPB = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def _kernel_pipe(off_ref, coff_ref, uoff_ref, pp_ref, table_ref, blk_in,
                 lik_ref, blk_out, *, ppb):
    j = pl.program_id(0)
    for k in range(ppb):
        i = j * ppb + k
        r0 = pl.multiple_of(off_ref[i], 8)
        if wc == cols:
            c0 = None
            w_in = blk_in.at[k, pl.ds(r0, wr), :]
            w_out = blk_out.at[k, pl.ds(r0, wr), :]
        else:
            c0 = pl.multiple_of(coff_ref[i], 128)
            w_in = blk_in.at[k, pl.ds(r0, wr), pl.ds(c0, wc)]
            w_out = blk_out.at[k, pl.ds(r0, wr), pl.ds(c0, wc)]
        # rows outside the window pass through unchanged
        blk_out[k, : , :] = blk_in[k, :, :]
        _window_compute(w_in, w_out, i, k, r0, c0, uoff_ref, pp_ref,
                        table_ref, lik_ref, wr=wr, wc=wc, num_beams=NB,
                        logical_rows=spec.rows, logical_cols=spec.cols,
                        ppb=8, crop128=crop128)


def pipe_call(grids, pp, r0, c0, u0, table):
    kernel = functools.partial(_kernel_pipe, ppb=PPB)
    lik_spec = pl.BlockSpec((8, 128), lambda i, *_: (i * (PPB // 8), 0),
                            memory_space=pltpu.VMEM)
    lik, out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(P // PPB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((PPB, rows, cols), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                lik_spec,
                pl.BlockSpec((PPB, rows, cols), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((P, 128), jnp.float32),
            jax.ShapeDtypeStruct(grids.shape, grids.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(r0, c0, u0, pp, table, grids)
    return out, lik[:, 0]


def marginal(factory, state, n1=30, n2=230, reps=3):
    r1, r2 = factory(n1), factory(n2)
    float(r1(state))
    float(r2(state))
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(state))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(r2(state))
        tb = time.perf_counter() - t0
        diffs.append((tb - ta) / (n2 - n1))
    diffs.sort()
    return diffs[len(diffs) // 2]


if __name__ == "__main__":
    def factory(n):
        @jax.jit
        def run(grids):
            def body(g, _):
                g2, lik = pipe_call(g, pp_h, r0_h, c0_h, u0_h, table_h)
                return g2, jnp.sum(lik)
            g, liks = jax.lax.scan(body, grids, None, length=n)
            return jnp.sum(liks) + jnp.float32(g[0, 0, 0])
        return run

    g0 = jnp.zeros((P, rows, cols), DT)
    dt = marginal(factory, g0)
    print(f"auto-pipelined blocks (ppb={PPB}): {dt * 1e6:.1f} us/update")
