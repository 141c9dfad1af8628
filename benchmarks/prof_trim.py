"""Scratch: cell-pass ALU trim experiments at the 0.02 m HBM bench point
(1024p, ppb=16, bf16, crop128 packed rolls, batched lik — mirrors the
CURRENT _kernel_hbm structure; standalone pallas_calls, never re-jits).

Variants:
  base    current formulation (should track fused_update's ~677 us)
  g2      beam-table gather with SHARED index math: one `bins & 127` and
          one `bins >> 7` for all 3 chunks + per-chunk eq/select
          (replaces per-chunk sub/&127 + two range compares + and)
  recip   atan2 divide -> rsqrt-square reciprocal + 1 Newton step
  both    g2 + recip

Usage: python -m benchmarks.prof_trim [variant ...]
"""

import functools
import math as pymath
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slamrs_tpu.ops.fused import (_fold_select, _lik_finish_batched,
                                  _lik_gather_fold, _lik_idx_batched,
                                  encode_beam_table, window_rows)
from slamrs_tpu.ops.grid import (ADDITIONAL_STEPS, L_FREE, L_OCCUPIED,
                                 SENSOR_MAXDIST, TOLERANCE_CELLS,
                                 GridSpec2D)

P, RES, WIDTH = 1024, 0.02, 4.0
NB = 360
MAXR = 1.0
DT = jnp.bfloat16
PPB = 16
N_CHUNKS = -(-NB // 128)

spec = GridSpec2D(-WIDTH / 2, -WIDTH / 2, WIDTH, WIDTH, RES)
rows, cols = spec.rows, (spec.cols + 127) // 128 * 128
wr = window_rows(spec, MAXR)
wr = min(wr, rows - rows % 8 if rows % 8 else rows)
disc_half = int(pymath.ceil(MAXR / spec.resolution)) + ADDITIONAL_STEPS + 1
wc = cols if (cols <= 256 or disc_half > 64) else 256
crop128 = wc >= 256 and 2 * disc_half + 1 + 8 <= 128
print(f"grid {rows}x{cols}, wr={wr} wc={wc} crop128={crop128}",
      file=sys.stderr)

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
    blk = ccol // 128
    c0 = (blk - jnp.where(ccol % 128 < 64, 1, 0)) * 128
    c0 = jnp.clip(c0, 0, max(cols - wc, 0))
    u0 = jnp.clip(ccol - c0 - 64, 0, wc - 128)
    ceff = c0 + u0
    zero = jnp.zeros((P,), jnp.float32)
    pv = jnp.stack([cxy[:, 0], cxy[:, 1], jnp.cos(theta), jnp.sin(theta),
                    r0.astype(jnp.float32), ceff.astype(jnp.float32),
                    zero, zero], axis=-1)
    table = encode_beam_table(dist / spec.resolution, valid, present,
                              angles0, dphi)
    return pp, pv, r0, c0, u0, table


pp_h, pv_h, r0_h, c0_h, u0_h, table_h = jax.jit(setup)(poses)


def _atan2_v(y, x, *, recip):
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    if recip:
        hs = jnp.maximum(hi, 1e-30)
        r = jax.lax.rsqrt(hs)
        r = r * r
        r = r * (2.0 - hs * r)   # 1 Newton step: ~1e-7 rel
        z = lo * r
    else:
        z = lo / jnp.maximum(hi, 1e-30)
    z2 = z * z
    a = z * (0.99997726 + z2 * (-0.33262347 + z2 * (
        0.19354346 + z2 * (-0.11643287 + z2 * (
            0.05265332 - z2 * 0.01172120)))))
    a = jnp.where(ay > ax, (pymath.pi / 2) - a, a)
    a = jnp.where(x < 0, pymath.pi - a, a)
    return jnp.where(y < 0, -a, a)


def _gather_beam_v(table_ref, bins, rr, cc, *, g2):
    if not g2:
        out = jnp.zeros((rr, cc), jnp.float32)
        for c in range(3):
            subs = []
            for jj in range(cc // 128):
                subs.append((bins[:, jj * 128:(jj + 1) * 128] - c * 128)
                            & 127)
            in_chunk = (bins >= c * 128) & (bins < (c + 1) * 128)
            tb = jnp.broadcast_to(table_ref[0:1, c * 128:(c + 1) * 128],
                                  (rr, 128))
            parts = [jnp.take_along_axis(tb, sub, axis=1) for sub in subs]
            v = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                 else parts[0])
            out = jnp.where(in_chunk, v, out)
        return out
    sub = bins & 127
    cid = jax.lax.shift_right_logical(bins, 7)
    out = jnp.zeros((rr, cc), jnp.float32)
    for c in range(3):
        tb = jnp.broadcast_to(table_ref[0:1, c * 128:(c + 1) * 128],
                              (rr, 128))
        v = jnp.take_along_axis(tb, sub, axis=1)
        out = jnp.where(cid == c, v, out)
    return out


def _pack3_row():
    """128-lane f32 row whose BITS pack 3 beams per lane: 10-bit fixed
    point d in 1/8-cell units; 0 = absent, bit 9 set = miss (d keeps
    bits 0-8).  Lane q holds beams 3q, 3q+1, 3q+2 at offsets 0/10/20."""
    d8 = jnp.clip(jnp.round(dist / spec.resolution * 8.0), 1, 511).astype(
        jnp.int32)
    hit = valid  # this harness: all valid are hits
    v = jnp.where(present, jnp.where(hit, d8, d8 | 512), 0)
    v = jnp.concatenate([v, jnp.zeros((384 - NB,), jnp.int32)])
    packed = v[0::3] | (v[1::3] << 10) | (v[2::3] << 20)
    return jax.lax.bitcast_convert_type(packed, jnp.float32)


def _gather_pack3(table_ref, bins_f, rr):
    """Single-chunk beam gather: idx=floor(bins/3) lane gather on the
    packed row 5 + in-register 10-bit field extract.  Returns
    d_enc-compatible f32 (sign = miss, 0 = absent, cells)."""
    third = jnp.float32(1.0 / 3.0)
    q_f = jnp.floor(bins_f * third)
    rem = bins_f - 3.0 * q_f
    tb = jnp.broadcast_to(table_ref[5:6, 0:128], (rr, 128))
    g = jnp.take_along_axis(tb, q_f.astype(jnp.int32), axis=1)
    gi = pltpu.bitcast(g, jnp.int32)
    v = jax.lax.shift_right_logical(
        gi, (rem * 10.0).astype(jnp.int32)) & 1023
    d = (v & 511).astype(jnp.float32) * 0.125
    return jnp.where(v >= 512, -d, d)  # v==0 -> d==0 == absent


table_h = table_h.at[5, 0:128].set(jax.jit(_pack3_row)())
# incroll variant: phase-A xi in RAW window coords (ceff = c0, cw = wc)
pv2_h = pv_h.at[:, 5].set(c0_h.astype(jnp.float32))


def _cell_pass_v(w32, params, table_ref, *, r0, c0, g2, recip,
                 nobins=False, nogather=False, nodecode=False,
                 nodens=False, wrap2=False, pack3=None,
                 return_inc=False):
    cx, cy, _t, ta, _ct, _st, dphi_, inv_dphi = params
    two_pi = 2.0 * pymath.pi
    cc = 128
    wy = jax.lax.broadcasted_iota(jnp.int32, (wr, cc), 0).astype(
        jnp.float32) + r0.astype(jnp.float32)
    wx = jax.lax.broadcasted_iota(jnp.int32, (wr, cc), 1).astype(
        jnp.float32) + c0.astype(jnp.float32)
    dx = wx + 0.5 - cx
    dy = wy + 0.5 - cy
    r2 = dx * dx + dy * dy
    if nobins == "cheap":
        # ablation: data-dependent but trivial bins (cannot be folded the
        # way the iota pattern can) — isolates atan2+wrap+round as
        # base - cheapbins while keeping the 3-chunk gather honest
        bins = r2.astype(jnp.int32) & 255
    elif nobins:
        # ablation: drop ALL angular math (atan2 + wrap + round); bins
        # become a lane pattern so the gather still runs
        bins = jax.lax.broadcasted_iota(jnp.int32, (wr, cc), 1) * 2
    else:
        phi = _atan2_v(dy, dx, recip=recip)
        rel = phi - ta
        if wrap2:
            # rel in (-2pi-eps, 2pi): one conditional add replaces the
            # mul/floor/mul/sub circle wrap; the >= NB-0.5 fold below
            # still maps the near-closing half-bin to beam 0
            nbf = two_pi * inv_dphi
            bins_f = jnp.round(rel * inv_dphi)
            bins_f = jnp.where(bins_f < 0.0, bins_f + nbf, bins_f)
            bins_f = jnp.where(bins_f >= nbf - 0.5, 0.0, bins_f)
        else:
            rel = rel - two_pi * jnp.floor(rel * (1.0 / two_pi))
            bins_f = jnp.round(rel * inv_dphi)
            bins_f = jnp.where(bins_f >= two_pi * inv_dphi - 0.5, 0.0,
                               bins_f)
        bins = None if pack3 else bins_f.astype(jnp.int32)
    if nogather:
        # ablation: one aligned load instead of the 3-chunk gather
        d_enc = jnp.broadcast_to(table_ref[0:1, 0:128], (wr, cc))
    elif pack3:
        d_enc = _gather_pack3(table_ref, bins_f, wr)
    else:
        d_enc = _gather_beam_v(table_ref, bins, wr, cc, g2=g2)
    if nodecode:
        return w32 + d_enc * 1e-6
    was_hit = d_enc > 0.0
    present_ = d_enc != 0.0
    d = jnp.abs(d_enc)
    half = TOLERANCE_CELLS / 2.0
    dm = jnp.maximum(d - half, 0.0)
    a_sq = jnp.where(was_hit, dm * dm, d * d)
    dp = d + half
    b_sq = jnp.where(was_hit, dp * dp, -1.0)
    inc = jnp.where(r2 < a_sq, L_FREE,
                    jnp.where(r2 <= b_sq, L_OCCUPIED, 0.0))
    if nodens:
        dens = 1.0
    else:
        dens = jnp.maximum(1.0, jax.lax.rsqrt(jnp.maximum(r2, 0.25))
                           * inv_dphi)
    in_bounds = (wy < float(spec.rows)) & (wx < float(spec.cols))
    inc = jnp.where(present_ & in_bounds, inc * dens, 0.0)
    if return_inc:
        return inc
    return w32 + inc


def _lik_gather_fold_pairs(pairs, xi_s, yi_s, odds_s, k):
    """Lik phase B straight off the PACKED bf16-pair window [wr//2, wc]
    i32: gather pair rows (half the fold height), extract the 16-bit
    half by yi&1, widen bf16 bits -> f32.  xi here is in RAW window
    coordinates (no roll)."""
    wr2 = pairs.shape[0]
    cw = pairs.shape[1]
    for bc in range(N_CHUNKS):
        sl = slice(bc * 128, (bc + 1) * 128)
        xi = xi_s[k:k + 1, sl]
        yi = yi_s[k:k + 1, sl]
        yi2 = jnp.floor(yi * 0.5)
        g = jnp.zeros((wr2, 128), jnp.int32)
        for b in range(cw // 128):
            subf = jnp.clip(xi - b * 128, 0.0, 127.0)
            m = (xi >= b * 128) & (xi < (b + 1) * 128)
            sub = jnp.broadcast_to(subf, (wr2, 128)).astype(jnp.int32)
            part = jnp.take_along_axis(pairs[:, b * 128:(b + 1) * 128],
                                       sub, axis=1)
            g = jnp.where(jnp.broadcast_to(m, (wr2, 128)), part, g) \
                if cw > 128 else part
        # fold over pair rows (f32 halving selects need f32 bits)
        gf = pltpu.bitcast(g, jnp.float32)
        vf = _fold_select(gf, yi2, wr=wr2)
        v = pltpu.bitcast(vf, jnp.int32)
        odd = (yi - 2.0 * yi2) > 0.5
        half = jnp.where(odd, jax.lax.shift_right_logical(v, 16), v)
        odds_s[k:k + 1, sl] = pltpu.bitcast(
            jax.lax.shift_left(half, 16), jnp.float32)


def _window_compute_v(w_in, w_out, i, k, r0, c0, uoff_ref, pp_ref,
                      table_ref, scr, *, g2, recip, nolikfold=False,
                      nocell=False, norolls=False, q8=False,
                      dslice=False, incroll=False, packadd=False,
                      **cellkw):
    if incroll:
        u0 = uoff_ref[i]
        pairs = pltpu.bitcast(w_in[...], jnp.int32)  # [wr//2, 256]
        xi_s, yi_s, _use_s, odds_s = scr
        if not nolikfold:
            _lik_gather_fold_pairs(pairs, xi_s, yi_s, odds_s, k)
        params = tuple(pp_ref[i, t] for t in range(8))
        inc = _cell_pass_v(None, params, table_ref, r0=r0, c0=c0 + u0,
                           g2=g2, recip=recip, return_inc=True, **cellkw)
        inc_p = pltpu.bitcast(inc.astype(jnp.bfloat16), jnp.int32)
        inc_pad = jnp.concatenate(
            [inc_p, jnp.zeros((inc_p.shape[0], 128), jnp.int32)], axis=1)
        inc_r = pltpu.roll(inc_pad, u0, 1)
        w_out[...] = (pltpu.bitcast(pairs, jnp.bfloat16)
                      + pltpu.bitcast(inc_r, jnp.bfloat16))
        return
    if packadd:
        # hybrid: keep both rolls, but lik gathers the ROLLED pairs
        # (60-row fold + 16-bit extract) and the update is a packed
        # bf16 add of inc on virtual coords -- no unpack/repack
        u0 = uoff_ref[i]
        pairs = pltpu.bitcast(w_in[...], jnp.int32)
        rolledp = pltpu.roll(pairs, -u0, 1)
        xi_s, yi_s, _use_s, odds_s = scr
        if not nolikfold:
            _lik_gather_fold_pairs(rolledp[:, :128], xi_s, yi_s,
                                   odds_s, k)
        params = tuple(pp_ref[i, t] for t in range(8))
        inc = _cell_pass_v(None, params, table_ref, r0=r0, c0=c0 + u0,
                           g2=g2, recip=recip, return_inc=True, **cellkw)
        inc_p = pltpu.bitcast(inc.astype(jnp.bfloat16), jnp.int32)
        out_p = pltpu.bitcast(
            pltpu.bitcast(rolledp[:, :128], jnp.bfloat16)
            + pltpu.bitcast(inc_p, jnp.bfloat16), jnp.int32)
        both = jnp.concatenate([out_p, rolledp[:, 128:]], axis=1)
        w_out[...] = pltpu.bitcast(pltpu.roll(both, u0, 1), jnp.bfloat16)
        return
    u0 = uoff_ref[i]
    if q8:
        u0 = pl.multiple_of(u0 & ~7, 8)
    pairs = pltpu.bitcast(w_in[...], jnp.int32)
    if norolls:
        rolledp = pairs  # WRONG results; timing ablation only
    elif dslice:
        rolledp = jax.lax.dynamic_slice_in_dim(pairs, u0, 128, 1)
    else:
        rolledp = pltpu.roll(pairs, -u0, 1)
    w32 = pltpu.bitcast(rolledp[:, :128], jnp.bfloat16).astype(jnp.float32)
    xi_s, yi_s, _use_s, odds_s = scr
    if not nolikfold:
        _lik_gather_fold(w32, xi_s, yi_s, odds_s, k, wr=wr, cw=128,
                         num_beams=NB)
    params = tuple(pp_ref[i, t] for t in range(8))
    if nocell:
        out = w32 + 1e-6
    else:
        out = _cell_pass_v(w32, params, table_ref, r0=r0, c0=c0 + u0,
                           g2=g2, recip=recip, **cellkw)
    out_p = pltpu.bitcast(out.astype(jnp.bfloat16), jnp.int32)
    if dslice and not norolls:
        w_out[...] = pltpu.bitcast(jax.lax.dynamic_update_slice_in_dim(
            pairs, out_p, u0, 1), jnp.bfloat16)
    else:
        both = jnp.concatenate([out_p, rolledp[:, 128:]], axis=1)
        w_out[...] = pltpu.bitcast(
            both if norolls else pltpu.roll(both, u0, 1), jnp.bfloat16)


def _kernel_v(off_ref, coff_ref, uoff_ref, pp_ref, pv_ref, table_ref,
              grid_in, lik_ref, grid_out, win, sem_in, sem_out,
              xi_s, yi_s, use_s, odds_s, *, g2, recip, noidx=False,
              sharewin=False, **wkw):
    j = pl.program_id(0)
    n = pl.num_programs(0)
    slot = j % 2

    def in_copy(jj, s, k):
        p_idx = jj * PPB + k
        rj = pl.multiple_of(off_ref[p_idx], 8)
        cj = pl.multiple_of(coff_ref[p_idx], 128)
        return pltpu.make_async_copy(
            grid_in.at[p_idx, pl.ds(rj, wr), pl.ds(cj, wc)], win.at[s, k],
            sem_in.at[s, k])

    def out_copy(jj, s, k):
        p_idx = jj * PPB + k
        rj = pl.multiple_of(off_ref[p_idx], 8)
        cj = pl.multiple_of(coff_ref[p_idx], 128)
        return pltpu.make_async_copy(
            win.at[s, k], grid_out.at[p_idx, pl.ds(rj, wr), pl.ds(cj, wc)],
            sem_out.at[s, k])

    if sharewin:
        # CEILING ablation (WRONG results): all ppb particles of a
        # program read ONE in-window (1 in-DMA + 1 in-roll per program
        # instead of ppb) — bounds the shared-unique-window redesign
        @pl.when(j == 0)
        def _():
            in_copy(0, 0, 0).start()

        @pl.when(j >= 1)
        def _():
            for k in range(PPB):
                out_copy(j - 1, (j - 1) % 2, k).wait()

        @pl.when(j + 1 < n)
        def _():
            in_copy(j + 1, (j + 1) % 2, 0).start()

        scr = (xi_s, yi_s, use_s, odds_s)
        i0 = pl.multiple_of(j * PPB, 8)
        _lik_idx_batched(pv_ref, table_ref, xi_s, yi_s, use_s, i0,
                         ppb=PPB, wr=wr, cw=128, num_beams=NB,
                         logical_rows=spec.rows, logical_cols=spec.cols)
        in_copy(j, slot, 0).wait()
        u0 = uoff_ref[j * PPB]
        pairs = pltpu.bitcast(win[slot, 0], jnp.int32)
        rolledp = pltpu.roll(pairs, -u0, 1)
        w32 = pltpu.bitcast(rolledp[:, :128], jnp.bfloat16).astype(
            jnp.float32)
        for k in range(PPB):
            i = j * PPB + k
            _lik_gather_fold(w32, xi_s, yi_s, odds_s, k, wr=wr, cw=128,
                             num_beams=NB)
            r0 = pl.multiple_of(off_ref[i], 8)
            c0 = pl.multiple_of(coff_ref[i], 128)
            params = tuple(pp_ref[i, t] for t in range(8))
            inc = _cell_pass_v(None, params, table_ref, r0=r0,
                               c0=c0 + u0, g2=False, recip=False,
                               return_inc=True, pack3=True)
            out_p = pltpu.bitcast(
                (w32 + inc).astype(jnp.bfloat16), jnp.int32)
            both = jnp.concatenate([out_p, rolledp[:, 128:]], axis=1)
            win[slot, k] = pltpu.bitcast(pltpu.roll(both, u0, 1),
                                         jnp.bfloat16)
            out_copy(j, slot, k).start()
        _lik_finish_batched(odds_s, use_s, lik_ref)

        @pl.when(j == n - 1)
        def _():
            for k in range(PPB):
                out_copy(j, slot, k).wait()
        return

    @pl.when(j == 0)
    def _():
        for k in range(PPB):
            in_copy(0, 0, k).start()

    @pl.when(j >= 1)
    def _():
        for k in range(PPB):
            out_copy(j - 1, (j - 1) % 2, k).wait()

    @pl.when(j + 1 < n)
    def _():
        for k in range(PPB):
            in_copy(j + 1, (j + 1) % 2, k).start()

    scr = (xi_s, yi_s, use_s, odds_s)
    i0 = pl.multiple_of(j * PPB, 8)
    if not noidx:
        _lik_idx_batched(pv_ref, table_ref, xi_s, yi_s, use_s, i0,
                         ppb=PPB, wr=wr,
                         cw=wc if wkw.get("incroll") else 128,
                         num_beams=NB,
                         logical_rows=spec.rows, logical_cols=spec.cols)

    for k in range(PPB):
        i = j * PPB + k
        in_copy(j, slot, k).wait()
        r0 = pl.multiple_of(off_ref[i], 8)
        c0 = pl.multiple_of(coff_ref[i], 128)
        _window_compute_v(win.at[slot, k], win.at[slot, k], i, k, r0, c0,
                          uoff_ref, pp_ref, table_ref, scr, g2=g2,
                          recip=recip, **wkw)
        out_copy(j, slot, k).start()

    _lik_finish_batched(odds_s, use_s, lik_ref)

    @pl.when(j == n - 1)
    def _():
        for k in range(PPB):
            out_copy(j, slot, k).wait()


def call(grids, *, g2=False, recip=False, **kw):
    kernel = functools.partial(_kernel_v, g2=g2, recip=recip, **kw)
    pv_use = pv2_h if kw.get("incroll") else pv_h
    scratch = [
        pltpu.VMEM((2, PPB, wr, wc), grids.dtype),
        pltpu.SemaphoreType.DMA((2, PPB)),
        pltpu.SemaphoreType.DMA((2, PPB)),
    ] + [pltpu.VMEM((PPB, 128 * N_CHUNKS), jnp.float32) for _ in range(4)]
    lik, grids_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(P // PPB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((PPB, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((P, 128), jnp.float32),
            jax.ShapeDtypeStruct(grids.shape, grids.dtype),
        ],
        input_output_aliases={6: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=64 * 1024 * 1024),
    )(r0_h, c0_h, u0_h, pp_h, pv_use, table_h, grids)
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
                g2_, lik = call(g, **kw)
                return g2_, jnp.sum(lik)
            g, liks = jax.lax.scan(body, grids, None, length=n)
            return jnp.sum(liks) + jnp.float32(g[0, 0, 0])
        return run

    dt = marginal(factory, jnp.zeros((P, rows, cols), DT))
    print(f"{name}: {dt * 1e6:.1f} us/update")


VARIANTS = {
    "base": {},
    "g2": dict(g2=True),
    "recip": dict(recip=True),
    "both": dict(g2=True, recip=True),
    # ablations (all on top of g2, the committed formulation):
    "nobins": dict(g2=True, nobins=True),      # - atan2/wrap/round
    "cheapbins": dict(g2=True, nobins="cheap"),  # gather kept honest
    "nogather": dict(g2=True, nogather=True),  # - 3-chunk beam gather
    "nodecode": dict(g2=True, nodecode=True),  # - ISM decode+dens+bounds
    "nodens": dict(g2=True, nodens=True),      # - density rsqrt only
    "nolikfold": dict(g2=True, nolikfold=True),  # - lik phase B
    "noidx": dict(g2=True, noidx=True),        # - lik phase A
    "nocell": dict(g2=True, nocell=True),      # - whole cell pass
    "wrap2": dict(g2=True, wrap2=True),        # cheaper circle wrap
    "pack3": dict(pack3=True),  # 3-beams-per-lane single-chunk gather
    "norolls": dict(pack3=True, norolls=True),  # timing-only ablation
    "dslice": dict(pack3=True, dslice=True),
    "q8": dict(pack3=True, q8=True),
    "q8dslice": dict(pack3=True, q8=True, dslice=True),
    # inc-roll restructure: no window roll/unpack at all; cell pass on
    # virtual coords -> pack inc, ONE roll, bf16 add; lik gathers the
    # packed pairs directly (pair-row fold + 16-bit extract)
    "incroll": dict(pack3=True, incroll=True),
    "incroll_nolik": dict(pack3=True, incroll=True, nolikfold=True),
    "pack3_nolik": dict(pack3=True, nolikfold=True),
    "packadd": dict(pack3=True, packadd=True),
    "sharewin": dict(sharewin=True),  # ceiling for unique-window dedupe
}

if __name__ == "__main__":
    variants = sys.argv[1:] or ["base", "g2", "recip", "both"]
    for v in variants:
        run_variant(v, **VARIANTS[v])
