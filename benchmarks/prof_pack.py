"""Scratch: phase breakdown of the batched-lik + pack2 resident kernel
(0.05 m, 1024p, ppb=16, bf16 grids).

Variants accumulate phases so deltas isolate costs:
  dispatch   load window, +1, write back (no lik, no cell, no pack)
  phasea     + batched endpoint index math (phase A)
  lik        + per-particle gather+fold (B) + batched tail (C)
  pack       dispatch + pack/unpack rolls+selects only
  packcell   pack + packed cell pass (no lik)
  full       everything (should match fused_update's kernel)

Usage: python benchmarks/prof_pack.py [variant ...]
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

from slamrs_tpu.ops.fused import (_cell_pass, _lik_finish_batched,
                                  _lik_gather_fold, _lik_idx_batched,
                                  encode_beam_table, window_rows)
from slamrs_tpu.ops.grid import ADDITIONAL_STEPS, GridSpec2D

P, RES, WIDTH = 1024, 0.05, 4.0
NB = 360
MAXR = 1.0
DT = jnp.bfloat16
PPB = 16
N_CHUNKS = -(-NB // 128)

spec = GridSpec2D(-WIDTH / 2, -WIDTH / 2, WIDTH, WIDTH, RES)
rows, cols = spec.rows, (spec.cols + 127) // 128 * 128
wr = window_rows(spec, MAXR)
wr = min(wr, rows - rows % 8 if rows % 8 else rows)
print(f"grid {rows}x{cols}, wr={wr}", file=sys.stderr)

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
                    theta + jnp.broadcast_to(angles0, (P,)).astype(
                        jnp.float32),
                    jnp.cos(theta), jnp.sin(theta),
                    jnp.broadcast_to(dphi, (P,)),
                    jnp.broadcast_to(1.0 / dphi, (P,))], axis=-1)
    r0 = jnp.round(cxy[:, 1]).astype(jnp.int32) - wr // 2
    r0 = jnp.clip(r0, 0, max(rows - wr, 0))
    r0 = (r0 // 8) * 8
    ccol = jnp.round(cxy[:, 0]).astype(jnp.int32)
    u0 = jnp.clip(ccol - 32, 0, 64)
    parity = (jnp.arange(P, dtype=jnp.int32) % 2)
    ceff = u0 - 64 * parity
    xlo = (64 * parity).astype(jnp.float32)
    zero = jnp.zeros((P,), jnp.float32)
    pv = jnp.stack([cxy[:, 0], cxy[:, 1], jnp.cos(theta), jnp.sin(theta),
                    r0.astype(jnp.float32), ceff.astype(jnp.float32),
                    xlo, zero], axis=-1)
    table = encode_beam_table(dist / spec.resolution, valid, present,
                              angles0, dphi)
    return pp, pv, r0, u0, table


pp_h, pv_h, r0_h, u0_h, table_h = jax.jit(setup)(poses)


def _kernel_v(off_ref, uoff_ref, pp_ref, pv_ref, table_ref, grid_in,
              lik_ref, grid_out, xi_s, yi_s, use_s, odds_s, *,
              do_phasea, do_lik, do_pack, do_cell):
    j = pl.program_id(0)
    if do_phasea or do_lik:
        i0 = pl.multiple_of(j * PPB, 8)
        _lik_idx_batched(pv_ref, table_ref, xi_s, yi_s, use_s, i0,
                         ppb=PPB, wr=wr, cw=128, num_beams=NB,
                         logical_rows=spec.rows, logical_cols=spec.cols)
    if do_pack:
        for k2 in range(PPB // 2):
            kA, kB = 2 * k2, 2 * k2 + 1
            iA, iB = j * PPB + kA, j * PPB + kB
            r0A = pl.multiple_of(off_ref[iA], 8)
            r0B = pl.multiple_of(off_ref[iB], 8)
            uA = uoff_ref[iA]
            uB = uoff_ref[iB]
            wA = grid_in.at[iA][pl.ds(r0A, wr), :].astype(jnp.float32)
            wB = grid_in.at[iB][pl.ds(r0B, wr), :].astype(jnp.float32)
            rollA = pltpu.roll(wA, -uA, 1)
            rollB = pltpu.roll(wB, 64 - uB, 1)
            l64 = jax.lax.broadcasted_iota(jnp.int32, (wr, 128), 1) < 64
            packed = jnp.where(l64, rollA, rollB)
            if do_lik:
                _lik_gather_fold(packed, xi_s, yi_s, odds_s, kA, wr=wr,
                                 cw=128, num_beams=NB)
                _lik_gather_fold(packed, xi_s, yi_s, odds_s, kB, wr=wr,
                                 cw=128, num_beams=NB)
            if do_cell:
                lrow = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) < 64

                def l2(a, b):
                    return jnp.where(lrow, a, b)

                params = (l2(pp_ref[iA, 0], pp_ref[iB, 0]),
                          l2(pp_ref[iA, 1], pp_ref[iB, 1]), None,
                          l2(pp_ref[iA, 3], pp_ref[iB, 3]), None, None,
                          pp_ref[iA, 6], pp_ref[iA, 7])
                gofs = l2(uA, uB - 64)
                r0v = l2(r0A, r0B)
                outp = _cell_pass(packed, params, table_ref, wr=wr,
                                  cols=128, num_beams=NB, r0=r0v,
                                  logical_rows=spec.rows,
                                  logical_cols=spec.cols, c0=gofs)
            else:
                outp = packed + 1.0
            outA = pltpu.roll(jnp.where(l64, outp, rollA), uA, 1)
            outB = pltpu.roll(jnp.where(l64, rollB, outp), uB - 64, 1)
            grid_out.at[iA][pl.ds(r0A, wr), :] = outA.astype(DT)
            grid_out.at[iB][pl.ds(r0B, wr), :] = outB.astype(DT)
    else:
        for k in range(PPB):
            i = j * PPB + k
            r0 = pl.multiple_of(off_ref[i], 8)
            w32 = grid_in.at[i][pl.ds(r0, wr), :].astype(jnp.float32)
            if do_lik:
                _lik_gather_fold(w32, xi_s, yi_s, odds_s, k, wr=wr,
                                 cw=128, num_beams=NB)
            grid_out.at[i][pl.ds(r0, wr), :] = (w32 + 1.0).astype(DT)
    if do_lik:
        _lik_finish_batched(odds_s, use_s, lik_ref)
    else:
        lik_ref[...] = jnp.zeros((PPB, 128), jnp.float32)


def call(grids, *, do_phasea=False, do_lik=False, do_pack=False,
         do_cell=False):
    kernel = functools.partial(_kernel_v, do_phasea=do_phasea,
                               do_lik=do_lik, do_pack=do_pack,
                               do_cell=do_cell)
    scratch = [pltpu.VMEM((PPB, 128 * N_CHUNKS), jnp.float32)
               for _ in range(4)]
    lik, grids_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(P // PPB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((PPB, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((P, 128), jnp.float32),
            jax.ShapeDtypeStruct(grids.shape, grids.dtype),
        ],
        input_output_aliases={5: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=(2 * grids.size * grids.dtype.itemsize
                              + 8 * 1024 * 1024)),
    )(r0_h, u0_h, pp_h, pv_h, table_h, grids)
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
                g2, lik = call(g, **kw)
                return g2, jnp.sum(lik)
            g, liks = jax.lax.scan(body, grids, None, length=n)
            return jnp.sum(liks) + jnp.float32(g[0, 0, 0])
        return run

    dt = marginal(factory, jnp.zeros((P, rows, cols), DT))
    print(f"{name}: {dt * 1e6:.1f} us/update")


if __name__ == "__main__":
    variants = sys.argv[1:] or ["dispatch", "phasea", "lik", "pack",
                                "packcell", "full"]
    for v in variants:
        if v == "dispatch":
            run_variant(v)
        elif v == "phasea":
            run_variant(v, do_phasea=True)
        elif v == "lik":
            run_variant(v, do_lik=True)
        elif v == "pack":
            run_variant(v, do_pack=True)
        elif v == "packcell":
            run_variant(v, do_pack=True, do_cell=True)
        elif v == "full":
            run_variant(v, do_pack=True, do_lik=True, do_cell=True)
