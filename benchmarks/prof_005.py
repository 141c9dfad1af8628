"""Scratch: 0.05m-cell RESIDENT kernel breakdown (headline/hard-mode shape).

[1024, 80, 128] bf16 grids, VMEM-resident, window [wr, 128] full width,
no rolls.  Variants: full / no-lik / no-cell / dispatch-only.
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

P, RES, WIDTH = 1024, 0.05, 4.0
NB = 360
MAXR = 1.0
DT = jnp.bfloat16
PPB = 16

spec = GridSpec2D(-WIDTH / 2, -WIDTH / 2, WIDTH, WIDTH, RES)
rows, cols = spec.rows, (spec.cols + 127) // 128 * 128
wr = window_rows(spec, MAXR)
wr = min(wr, rows - rows % 8 if rows % 8 else rows)
disc_half = int(pymath.ceil(MAXR / spec.resolution)) + ADDITIONAL_STEPS + 1
print(f"grid {rows}x{cols}, wr={wr}, disc_half={disc_half}", file=sys.stderr)

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
    table = encode_beam_table(dist / spec.resolution, valid, present,
                              angles0, dphi)
    return pp, r0, table


pp_h, r0_h, table_h = jax.jit(setup)(poses)


def _kernel_res_v(off_ref, pp_ref, table_ref, grid_in, lik_ref, grid_out,
                  *, do_lik, do_cell):
    j = pl.program_id(0)
    for k in range(PPB):
        i = j * PPB + k
        r0 = pl.multiple_of(off_ref[i], 8)
        w32 = grid_in.at[i][pl.ds(r0, wr), :].astype(jnp.float32)
        params = _params(pp_ref, i)
        if do_lik:
            lik = _endpoint_lik(w32, params, table_ref, wr=wr, cols=cols,
                                num_beams=NB, r0=r0, logical_rows=spec.rows,
                                logical_cols=spec.cols, c0=None)
        else:
            lik = jnp.float32(0.0)
        if do_cell:
            out = _cell_pass(w32, params, table_ref, wr=wr, cols=cols,
                             num_beams=NB, r0=r0, logical_rows=spec.rows,
                             logical_cols=spec.cols, c0=None)
        else:
            out = w32 + 1.0
        lik_ref[k, :] = jnp.full((128,), lik, jnp.float32)
        grid_out.at[i][pl.ds(r0, wr), :] = out.astype(grid_out.dtype)


def res_call(grids, pp, r0, table, *, do_lik=True, do_cell=True):
    kernel = functools.partial(_kernel_res_v, do_lik=do_lik, do_cell=do_cell)
    lik, grids_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(P // PPB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((PPB, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((P, 128), jnp.float32),
            jax.ShapeDtypeStruct(grids.shape, grids.dtype),
        ],
        input_output_aliases={3: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=(2 * grids.size * grids.dtype.itemsize
                              + 6 * 1024 * 1024)),
    )(r0, pp, table, grids)
    return grids_out, lik[:, 0]


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


def run_variant(name, **kw):
    def factory(n):
        @jax.jit
        def run(grids):
            def body(g, _):
                g2, lik = res_call(g, pp_h, r0_h, table_h, **kw)
                return g2, jnp.sum(lik)
            g, liks = jax.lax.scan(body, grids, None, length=n)
            return jnp.sum(liks) + jnp.float32(g[0, 0, 0])
        return run

    dt = marginal(factory, jnp.zeros((P, rows, cols), DT))
    print(f"{name}: {dt * 1e6:.1f} us/update")


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["full"]):
        if v == "full":
            run_variant("resident 0.05m full")
        elif v == "nolik":
            run_variant("resident 0.05m no-lik", do_lik=False)
        elif v == "nocell":
            run_variant("resident 0.05m no-cell", do_cell=False)
        elif v == "dispatch":
            run_variant("resident 0.05m dispatch-only", do_lik=False,
                        do_cell=False)
