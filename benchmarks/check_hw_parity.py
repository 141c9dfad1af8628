"""Real-TPU parity spot-check for the round's new kernel paths.

Interpret-mode tests gate every path bitwise on CPU, but Mosaic
semantics (rolls, bitcasts, gathers, DMA schedules) can differ from the
interpreter — run this ON HARDWARE after kernel changes (the round-3
tmp_check_crop practice, scripted).

Checks (all compiled, interpret=False):
  1. packed likelihood fold: fused_update bf16 pack2 vs pack2=False —
     lik must match bitwise, grids to fma-contraction tolerance.
  2. staged HBM kernel (sharewin) vs gather + plain kernel at 0.02 m
     geometry — bitwise.
  3. tiled maps vs dense HBM kernel at column-cropped (512-col)
     geometry across 3 update+resample rounds — bitwise.

Prints PASS/FAIL per check; exits nonzero on any FAIL.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from slamrs_tpu.ops.fused import fused_update
from slamrs_tpu.ops.grid import GridSpec2D
from slamrs_tpu.ops.tiles import fused_update_tiled, init_tiled, materialize

B = 360
failures = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}: {name} {detail}", flush=True)
    if not ok:
        failures.append(name)


def scan_input(seed):
    k = jax.random.key(seed)
    dist = jax.random.uniform(k, (B,), jnp.float32, 0.1, 1.0)
    valid = jax.random.bernoulli(jax.random.fold_in(k, 1), 0.8, (B,))
    present = jnp.ones((B,), bool).at[350:].set(False)
    return dist, valid, present


def poses_for(seed, p, x, y):
    k = jax.random.key(seed)
    return jnp.stack([
        jax.random.uniform(k, (p,), jnp.float32, -x, x),
        jax.random.uniform(jax.random.fold_in(k, 1), (p,), jnp.float32,
                           -y, y),
        jax.random.uniform(jax.random.fold_in(k, 2), (p,), jnp.float32,
                           -3.0, 3.0)], axis=-1)


def main():
    a0 = jnp.float32(0.0)

    # 1) pack2 + packed lik fold vs unpacked (bf16, 0.05 m resident)
    spec = GridSpec2D(-2.0, -2.0, 4.0, 4.0, 0.05)
    grids = (jax.random.normal(jax.random.key(1), (16, 80, 128),
                               jnp.float32) * 0.5)
    grids = grids.at[:, ::3, ::2].set(0.0).astype(jnp.bfloat16)
    poses = poses_for(2, 16, 1.3, 1.3)
    dist, valid, present = scan_input(3)
    g1, l1 = fused_update(grids, poses, a0, dist, valid, present, spec,
                          B, 1.0, pack2=True)
    g2, l2 = fused_update(grids, poses, a0, dist, valid, present, spec,
                          B, 1.0, pack2=False)
    lik_eq = bool((np.asarray(l1) == np.asarray(l2)).all())
    d1, d2 = np.asarray(g1, np.float32), np.asarray(g2, np.float32)
    frac_eq = float((d1 == d2).mean())
    check("pack2 packed-lik vs unpacked", lik_eq and frac_eq > 0.999,
          f"(lik bitwise={lik_eq}, grid exact-frac={frac_eq:.6f})")

    # 2) staged sharewin kernel vs gather + plain HBM kernel (0.02 m)
    spec2 = GridSpec2D(-2.0, -2.0, 4.0, 4.0, 0.02)
    p = 64
    g0 = (jax.random.normal(jax.random.key(4), (p, 200, 256),
                            jnp.float32) * 0.5)
    g0 = g0.at[:, ::3, ::2].set(0.0).astype(jnp.bfloat16)
    centers = poses_for(5, 8, 1.2, 1.2)
    jit = jax.random.uniform(jax.random.key(6), (p, 3), jnp.float32,
                             -0.05, 0.05)
    poses2 = centers[jnp.arange(p) % 8] + jit
    anc = jnp.sort(jax.random.randint(jax.random.key(7), (p,), 0, p)
                   ).astype(jnp.int32)
    dist2, valid2, present2 = scan_input(8)
    s1, sl1 = fused_update(g0, poses2, a0, dist2, valid2, present2,
                           spec2, B, 1.0, resident=False, ancestors=anc,
                           hbm_lineage="staged")
    s2, sl2 = fused_update(jnp.take(g0, anc, axis=0), poses2, a0, dist2,
                           valid2, present2, spec2, B, 1.0,
                           resident=False)
    eq_g = bool((np.asarray(s1, np.float32)
                 == np.asarray(s2, np.float32)).all())
    eq_l = bool((np.asarray(sl1) == np.asarray(sl2)).all())
    check("staged sharewin vs gather+plain (0.02m)", eq_g and eq_l,
          f"(grids={eq_g}, lik={eq_l})")

    # 3) tiled maps vs dense at column-cropped 512-col geometry
    wide = GridSpec2D(-12.8, -6.4, 25.6, 12.8, 0.05)
    p3 = 16
    pool, table = init_tiled(p3, wide, 1.0, dtype=jnp.bfloat16)
    dense = jnp.zeros((p3, wide.rows, pool.shape[2]), jnp.bfloat16)
    rng = np.random.default_rng(9)
    ok = True
    detail = ""
    for step in range(3):
        poses3 = poses_for(10 + step, p3, 12.2, 5.9)
        poses3 = poses3.at[0, 0].set(-12.7).at[1, 0].set(12.7)
        dist3, valid3, present3 = scan_input(20 + step)
        pool, table, lt = fused_update_tiled(
            pool, table, poses3, a0, dist3, valid3, present3, wide, B,
            1.0)
        dense, ld = fused_update(dense, poses3, a0, dist3, valid3,
                                 present3, wide, B, 1.0, resident=False)
        mat = np.asarray(materialize(pool, table, wide), np.float32)
        dn = np.asarray(dense, np.float32)
        if not (mat == dn).all() or not (
                np.asarray(lt) == np.asarray(ld)).all():
            ok = False
            detail = (f"step {step}: grid diff "
                      f"{float(np.abs(mat - dn).max())}")
            break
        anc3 = jnp.asarray(np.sort(rng.integers(0, p3, size=p3)),
                           jnp.int32)
        table = jnp.take(table, anc3, axis=0)
        dense = jnp.take(dense, anc3, axis=0)
    check("tiled vs dense (512-col, 3 rounds)", ok, detail)

    # 4) K-SPAN tiled kernel (93eb616) vs dense at 0.02 m-class geometry
    # (bands narrower than the window; shared-window cache keyed on the
    # pending lineage) — the r4 path BENCH ran but never hw-gated
    pool4, table4 = init_tiled(p, spec2, 1.0, dtype=jnp.bfloat16)
    assert pool4.shape[1] < 120, "geometry must select the k-span kernel"
    dense4 = jnp.zeros((p, table4.shape[1] * pool4.shape[1],
                        pool4.shape[2]), jnp.bfloat16)
    rng4 = np.random.default_rng(31)
    ok4, detail4 = True, ""
    anc4 = anc
    for step in range(3):
        poses4 = centers[jnp.arange(p) % 8] + jit * (step + 1)
        dist4, valid4, present4 = scan_input(40 + step)
        pool4, table4, lt4 = fused_update_tiled(
            pool4, table4, poses4, a0, dist4, valid4, present4, spec2, B,
            1.0, ancestors=anc4)
        dense4, ld4 = fused_update(
            jnp.take(dense4, anc4, axis=0), poses4, a0, dist4, valid4,
            present4, spec2, B, 1.0, resident=False, ancestors=None)
        mat4 = np.asarray(materialize(pool4, table4), np.float32)
        dn4 = np.asarray(dense4, np.float32)
        if not (mat4 == dn4).all() or not (
                np.asarray(lt4) == np.asarray(ld4)).all():
            ok4 = False
            detail4 = (f"step {step}: grid diff "
                       f"{float(np.abs(mat4 - dn4).max())}")
            break
        anc4 = jnp.asarray(np.sort(rng4.integers(0, p, size=p)), jnp.int32)
    check("kspan tiled vs dense (0.02m, 3 lineage rounds)", ok4, detail4)

    # 5) static bin-units pipeline (r5) on hardware: kernel(static dphi)
    # vs kernel(traced dphi of the same value) — bin assignments may
    # differ on ~ulp rounding-path boundaries only — and vs the pure-XLA
    # oracle mirror (gates Mosaic's compiled lowering of the new
    # pipeline, not just the interpreter's)
    from slamrs_tpu.ops.fused import fused_update_reference

    dphi_s = float(np.radians(1.0))
    g5a, l5a = fused_update(g0, poses2, a0, dist2, valid2, present2,
                            spec2, B, 1.0, resident=False, dphi=dphi_s)
    g5b, l5b = fused_update(g0, poses2, a0, dist2, valid2, present2,
                            spec2, B, 1.0, resident=False,
                            dphi=jnp.float32(dphi_s))
    d5a = np.asarray(g5a, np.float32)
    d5b = np.asarray(g5b, np.float32)
    flip_ab = float((np.abs(d5a - d5b) > 0.01).mean())
    go, lo = jax.jit(lambda g, q, A, d, v, pr: fused_update_reference(
        g, q, A, d, v, pr, spec2, B, 1.0, dphi=dphi_s))(
            g0, poses2, a0, dist2, valid2, present2)
    flip_o = float((np.abs(d5a - np.asarray(go, np.float32)) > 0.01).mean())
    lik_close = bool(np.allclose(np.asarray(l5a), np.asarray(lo),
                                 rtol=2e-4, atol=2e-4))
    check("static bin-units pipeline (vs traced + vs oracle)",
          flip_ab < 1e-4 and flip_o < 1e-4 and lik_close,
          f"(flip_vs_traced={flip_ab:.2e}, flip_vs_oracle={flip_o:.2e}, "
          f"lik_close={lik_close})")

    print("ALL PASS" if not failures else f"FAILURES: {failures}",
          flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
