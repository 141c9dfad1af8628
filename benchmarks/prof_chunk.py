"""Scratch: chunked-VMEM formulation of the 0.02m fused kernel.

The [1024, 200, 256] bf16 grid set (100 MiB) cannot be VMEM-resident
(Mosaic counts aliased in+out twice), but a 256-particle chunk (25 MiB)
can: run 4 sequential pallas calls with VMEM-space grids (the RESIDENT
kernel body — vector slices, zero per-window DMAs) and let XLA move each
chunk HBM<->VMEM as two bulk contiguous copies.  Trades 200 MiB of bulk
traffic for the HBM kernel's 126 MiB of 2048 small window DMAs + their
issue overhead.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slamrs_tpu.ops.fused import _kernel_resident
from benchmarks.prof_002 import (DT, NB, P, cols, crop128, pp_h, r0_h, c0_h, u0_h,
                          rows, spec, table_h, wc, wr)

CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N_CHUNKS = P // CHUNK
PPB = 8


def chunk_call(grids_c, pp, r0, c0, u0, table):
    kernel = functools.partial(
        _kernel_resident, wr=wr, cols=cols, wc=wc, num_beams=NB,
        logical_rows=spec.rows, logical_cols=spec.cols, ppb=PPB,
        crop128=crop128)
    lik_spec = pl.BlockSpec((8, 128), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    lik, out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(CHUNK // PPB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # grids chunk
            ],
            out_specs=[lik_spec, pl.BlockSpec(memory_space=pltpu.VMEM)],
            scratch_shapes=[],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((CHUNK, 128), jnp.float32),
            jax.ShapeDtypeStruct(grids_c.shape, grids_c.dtype),
        ],
        input_output_aliases={5: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=(2 * grids_c.size * grids_c.dtype.itemsize
                              + 6 * 1024 * 1024),
        ),
    )(r0, c0, u0, pp, table, grids_c)
    return out, lik[:, 0]


def full_update(grids):
    outs = []
    liks = []
    for c in range(N_CHUNKS):
        sl = slice(c * CHUNK, (c + 1) * CHUNK)
        out, lik = chunk_call(grids[sl], pp_h[sl], r0_h[sl], c0_h[sl],
                              u0_h[sl], table_h)
        outs.append(out)
        liks.append(lik)
    return jnp.concatenate(outs, axis=0), jnp.concatenate(liks)


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
                g2, lik = full_update(g)
                return g2, jnp.sum(lik)
            g, liks = jax.lax.scan(body, grids, None, length=n)
            return jnp.sum(liks) + jnp.float32(g[0, 0, 0])
        return run

    g0 = jnp.zeros((P, rows, cols), DT)
    dt = marginal(factory, g0)
    print(f"chunked-VMEM (chunk={CHUNK}): {dt * 1e6:.1f} us/update")
