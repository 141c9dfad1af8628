"""Scratch: endpoint-likelihood formulation shootout (0.05 m resident).

Variants (all exact — same selected values, see notes):
  cur    committed _endpoint_lik (one-hot row select, per-particle
         [1,128] index math)
  fold   binary-fold row select (8-aligned halving selects + final
         one-hot over an [8,128] vreg) — same bitwise value, ~1/3 the
         [wr,128] vreg ops
  batch  fold select + ALL particle-indexed [1,128] endpoint math
         hoisted to [PPB,128] batched ops through VMEM scratch (one
         vreg op serves PPB particles), batched exp/log tail
Numerics: run `python benchmarks/prof_lik.py check` first (compares
lik outputs vs cur on random grids; fold must be bitwise, batch within
ulp — the final lane-sum order differs).
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

from slamrs_tpu.ops.fused import (_cell_pass, _endpoint_lik, _params,
                                  encode_beam_table, window_rows)
from slamrs_tpu.ops.grid import (ADDITIONAL_STEPS, SENSOR_MAXDIST, Z_HIT,
                                 GridSpec2D)

P, RES, WIDTH = 1024, 0.05, 4.0
NB = 360
MAXR = 1.0
DT = jnp.bfloat16
PPB = 16

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
    table = encode_beam_table(dist / spec.resolution, valid, present,
                              angles0, dphi)
    return pp, r0, table


pp_h, r0_h, table_h = jax.jit(setup)(poses)

N_CHUNKS = -(-NB // 128)
WF = 64 if wr <= 64 else 128  # fold domain (power of two >= wr)


def _fold_select(g, yi_f):
    """g [wr,128] f32, yi_f [1,128] f32 row index (in [0, wr)).
    Returns [1,128]: g[yi[l], l] per lane, bitwise-exact."""
    if WF > wr:
        g = jnp.concatenate(
            [g, jnp.zeros((WF - wr, 128), jnp.float32)], axis=0)
    yy = yi_f
    h = WF
    while h > 8:
        h //= 2
        sel = yy >= float(h)
        g = jnp.where(jnp.broadcast_to(sel, (h, 128)),
                      g[h:2 * h], g[:h])
        yy = yy - jnp.where(sel, float(h), 0.0)
    hot = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(
        jnp.float32) == jnp.broadcast_to(yy, (8, 128)))
    return jnp.sum(jnp.where(hot, g, 0.0), axis=0, keepdims=True)


def _lik_fold(w32, params, table_ref, *, r0):
    """Per-particle like _endpoint_lik but fold-select rows."""
    cx, cy, _t, _a0, ct, st, _dp, _idp = params
    lik_acc = jnp.zeros((1, 128), jnp.float32)
    for bc in range(N_CHUNKS):
        sl = slice(bc * 128, (bc + 1) * 128)
        d = table_ref[1:2, sl]
        ca = table_ref[2:3, sl]
        sa = table_ref[3:4, sl]
        use = table_ref[4:5, sl] > 0.5
        ex = cx + (ct * ca - st * sa) * d
        ey = cy + (st * ca + ct * sa) * d
        in_b = ((ex >= 0.0) & (ey >= 0.0) & (ex < float(spec.cols))
                & (ey < float(spec.rows)))
        use = use & in_b
        xi = jnp.floor(ex)
        yi = jnp.floor(ey) - r0.astype(jnp.float32)
        use = use & (yi >= 0.0) & (yi < wr) & (xi >= 0.0) & (xi < cols)
        xi = jnp.where(use, xi, 0.0)
        yi = jnp.where(use, yi, 0.0)
        sub = jnp.broadcast_to(xi, (wr, 128)).astype(jnp.int32)
        g = jnp.take_along_axis(w32, sub, axis=1)
        odds = _fold_select(g, yi)
        p = 1.0 - 1.0 / (1.0 + jnp.exp(odds))
        mix = Z_HIT * p + (1.0 - Z_HIT) / SENSOR_MAXDIST
        factor = jnp.where(odds == 0.0, 1.0 / SENSOR_MAXDIST, mix)
        lik_acc = lik_acc + jnp.where(use, jnp.log(factor), 0.0)
    return jnp.sum(lik_acc)


def _kernel_v(off_ref, pp_ref, table_ref, grid_in, lik_ref, grid_out,
              xi_s, yi_s, use_s, odds_s, *, mode):
    j = pl.program_id(0)

    if mode == "batch":
        # ---- batched endpoint index math: [PPB,128] per chunk ----
        i0 = j * PPB
        blk = pp_ref[pl.ds(i0, PPB), :]          # [PPB, 8] VMEM
        cx = blk[:, 0:1]
        cy = blk[:, 1:2]
        ct = blk[:, 4:5]
        st = blk[:, 5:6]
        r0v = off_ref[pl.ds(i0, PPB), :]         # [PPB, 1] f32
        for bc in range(N_CHUNKS):
            sl = slice(bc * 128, (bc + 1) * 128)
            d = table_ref[1:2, sl]
            ca = table_ref[2:3, sl]
            sa = table_ref[3:4, sl]
            use = table_ref[4:5, sl] > 0.5
            ex = cx + (ct * ca - st * sa) * d     # [PPB, 128]
            ey = cy + (st * ca + ct * sa) * d
            in_b = ((ex >= 0.0) & (ey >= 0.0) & (ex < float(spec.cols))
                    & (ey < float(spec.rows)))
            useb = jnp.broadcast_to(use, (PPB, 128)) & in_b
            xi = jnp.floor(ex)
            yi = jnp.floor(ey) - r0v
            useb = useb & (yi >= 0.0) & (yi < wr) & (xi >= 0.0) \
                & (xi < cols)
            xi_s[:, sl] = jnp.where(useb, xi, 0.0)
            yi_s[:, sl] = jnp.where(useb, yi, 0.0)
            use_s[:, sl] = useb.astype(jnp.float32)

        # ---- per-particle gather + fold ----
        for k in range(PPB):
            i = i0 + k
            r0 = pl.multiple_of(off_ref[i, 0].astype(jnp.int32), 8)
            w32 = grid_in.at[i][pl.ds(r0, wr), :].astype(jnp.float32)
            for bc in range(N_CHUNKS):
                sl = slice(bc * 128, (bc + 1) * 128)
                xi = xi_s[k:k + 1, sl]
                yi = yi_s[k:k + 1, sl]
                sub = jnp.broadcast_to(xi, (wr, 128)).astype(jnp.int32)
                g = jnp.take_along_axis(w32, sub, axis=1)
                odds_s[k:k + 1, sl] = _fold_select(g, yi)
            grid_out.at[i][pl.ds(r0, wr), :] = (w32 + 1.0).astype(
                grid_out.dtype)

        # ---- batched tail: exp/log/mix + lane-sum over [PPB, 384] ----
        odds = odds_s[...]
        p = 1.0 - 1.0 / (1.0 + jnp.exp(odds))
        mix = Z_HIT * p + (1.0 - Z_HIT) / SENSOR_MAXDIST
        factor = jnp.where(odds == 0.0, 1.0 / SENSOR_MAXDIST, mix)
        lf = jnp.where(use_s[...] > 0.5, jnp.log(factor), 0.0)
        lik_ref[...] = jnp.broadcast_to(
            jnp.sum(lf, axis=1, keepdims=True), (PPB, 128))
        return

    for k in range(PPB):
        i = j * PPB + k
        r0 = pl.multiple_of(off_ref[i, 0].astype(jnp.int32), 8)
        w32 = grid_in.at[i][pl.ds(r0, wr), :].astype(jnp.float32)
        params = _params(pp_ref, i)
        if mode == "cur":
            lik = _endpoint_lik(w32, params, table_ref, wr=wr, cols=cols,
                                num_beams=NB, r0=r0.astype(jnp.int32),
                                logical_rows=spec.rows,
                                logical_cols=spec.cols, c0=None)
        else:
            lik = _lik_fold(w32, params, table_ref,
                            r0=r0.astype(jnp.int32))
        lik_ref[k, :] = jnp.full((128,), lik, jnp.float32)
        grid_out.at[i][pl.ds(r0, wr), :] = (w32 + 1.0).astype(
            grid_out.dtype)


def call(grids, *, mode):
    kernel = functools.partial(_kernel_v, mode=mode)
    # batch mode reads pp/r0 as VMEM blocks ([P,8] f32 / [P,1] f32);
    # cur/fold read pp from SMEM.  Pass r0 as [P,1] f32 VMEM always and
    # read scalars via .astype — SMEM wants raw i32, so keep a parallel
    # prefetch in SMEM for the scalar uses.
    pp_space = pltpu.VMEM if mode == "batch" else pltpu.SMEM
    scratch = [
        pltpu.VMEM((PPB, 128 * N_CHUNKS), jnp.float32),
        pltpu.VMEM((PPB, 128 * N_CHUNKS), jnp.float32),
        pltpu.VMEM((PPB, 128 * N_CHUNKS), jnp.float32),
        pltpu.VMEM((PPB, 128 * N_CHUNKS), jnp.float32),
    ]
    lik, grids_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(P // PPB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # r0 [P,1] f32
                pl.BlockSpec(memory_space=pp_space),     # pp [P,8]
                pl.BlockSpec(memory_space=pltpu.VMEM),   # table
                pl.BlockSpec(memory_space=pltpu.VMEM),   # grids
            ],
            out_specs=[
                pl.BlockSpec((PPB, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((P, 128), jnp.float32),
            jax.ShapeDtypeStruct(grids.shape, grids.dtype),
        ],
        input_output_aliases={3: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=(2 * grids.size * grids.dtype.itemsize
                              + 8 * 1024 * 1024)),
    )(r0_h[:, None].astype(jnp.float32), pp_h, table_h, grids)
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


def run_variant(name, mode):
    def factory(n):
        @jax.jit
        def run(grids):
            def body(g, _):
                g2, lik = call(g, mode=mode)
                return g2, jnp.sum(lik)
            g, liks = jax.lax.scan(body, grids, None, length=n)
            return jnp.sum(liks) + jnp.float32(g[0, 0, 0])
        return run

    dt = marginal(factory, jnp.zeros((P, rows, cols), DT))
    print(f"lik {name}: {dt * 1e6:.1f} us/update")


def check():
    g = (jax.random.normal(jax.random.key(5), (P, rows, cols)) * 0.5
         ).astype(DT)
    _, l_cur = call(g, mode="cur")
    _, l_fold = call(g, mode="fold")
    _, l_batch = call(g, mode="batch")
    l_cur, l_fold, l_batch = map(np.asarray, (l_cur, l_fold, l_batch))
    print("fold max |d|:", np.abs(l_fold - l_cur).max())
    print("batch max |d|:", np.abs(l_batch - l_cur).max(),
          " rel:", (np.abs(l_batch - l_cur)
                    / np.maximum(1e-6, np.abs(l_cur))).max())
    assert np.array_equal(l_fold, l_cur), "fold must be bitwise"
    assert np.allclose(l_batch, l_cur, rtol=1e-5, atol=1e-3)
    print("numerics OK")


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["check", "cur", "fold", "batch"]):
        if v == "check":
            check()
        else:
            run_variant(v, v)
