"""Round-4 fused-kernel phase decomposition on the REAL kernel.

Unlike prof_002/prof_005 (standalone pallas_call variants that predate
the batched likelihood, pack3 gather, pack2 lane packing and the
staged-lineage/shared-window kernels), this times the CURRENT
``ops.fused.fused_update`` at a named operating point and ablates
phases via the env-frozen ``SLAMRS_FUSED_ABLATE`` hook — each ablation
runs in its own subprocess (the flag is read at import), so jax's
function-identity compile cache cannot alias variants.

Usage:
  python benchmarks/prof_r4.py 002            # run all ablations
  python benchmarks/prof_r4.py 005 nolik      # one point, one ablation
  python benchmarks/prof_r4.py 003t           # tiled config-3 kernel

Points: 002 = 0.02 m staged-lineage HBM kernel, 1,024 particles,
concentrated lineage (the 10k-ticks/s target's kernel); 005 = 0.05 m
resident pack2 kernel (the scan-every-tick target's kernel); 003t =
config-3 tiled kernel (50 m @ 0.05 m tile pool); 002k = 0.02 m k-span
cached TILED kernel (same operating point as 002, tile-pool maps).

Timing is value-fetch marginal between two chained-update scan lengths
(the tunnel's block_until_ready does not block), median of 5 reps.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POINTS = ("002", "005", "003t", "002k")
ABLATIONS = ("none", "nolik", "nocell", "noatan", "nogather", "nodens")


def run_point(point: str) -> None:
    import jax
    import jax.numpy as jnp

    from slamrs_tpu.ops.grid import GridSpec2D

    p = 1024
    nb = 360
    maxr = 1.0
    if point in ("002", "002k"):
        spec = GridSpec2D(-2.0, -2.0, 4.0, 4.0, 0.02)
        resident = False
    elif point == "005":
        spec = GridSpec2D(-2.0, -2.0, 4.0, 4.0, 0.05)
        resident = True
    elif point == "003t":
        spec = GridSpec2D(-25.0, -25.0, 50.0, 50.0, 0.05)
        resident = False
    else:
        raise SystemExit(f"unknown point {point}")

    rows = spec.rows
    cols = (spec.cols + 127) // 128 * 128
    key = jax.random.key(0)
    # poses clustered near the center like a converged filter
    poses = jnp.concatenate([
        jax.random.uniform(key, (p, 2), jnp.float32, -0.05, 0.05),
        jax.random.uniform(jax.random.fold_in(key, 1), (p, 1),
                           jnp.float32, -3.0, 3.0)], axis=1)
    angles0 = jnp.float32(0.0)
    dist = jax.random.uniform(jax.random.fold_in(key, 2), (nb,),
                              jnp.float32, 0.2, 0.99)
    valid = jnp.ones((nb,), bool)
    present = jnp.ones((nb,), bool)
    # concentrated lineage: 11 unique ancestors (the 0.02 m median),
    # sorted like systematic-resample output
    src = jnp.linspace(0, p - 1, 11).astype(jnp.int32)
    anc = jnp.sort(src[jnp.arange(p) % 11])

    if point in ("003t", "002k"):
        from slamrs_tpu.ops.tiles import fused_update_tiled, init_tiled

        pool, table = init_tiled(p, spec, maxr, dtype=jnp.bfloat16)

        def make_run(n):
            @jax.jit
            def run(state, _key):
                def body(c, _):
                    pool, table = c
                    # pending lineage applied in-call (the tiled
                    # resample's relabel + the kernel's window groups)
                    pool, table, lik = fused_update_tiled(
                        pool, table, poses, angles0, dist, valid,
                        present, spec, nb, maxr, ancestors=anc)
                    return (pool, table), jnp.sum(lik)
                c, liks = jax.lax.scan(body, state, None, length=n)
                return (jnp.float32(c[0][1, 0, 0]) + jnp.sum(liks))
            return run

        state0 = (pool, table)
    else:
        from slamrs_tpu.ops.fused import fused_update

        grids = jnp.zeros((p, rows, cols), jnp.bfloat16)

        def make_run(n):
            @jax.jit
            def run(state, _key):
                def body(g, _):
                    g2, lik = fused_update(
                        g, poses, angles0, dist, valid, present, spec,
                        nb, maxr, resident=resident, ancestors=anc)
                    return g2, jnp.sum(lik)
                g, liks = jax.lax.scan(body, state, None, length=n)
                return jnp.float32(g[0, 0, 0]) + jnp.sum(liks)
            return run

        state0 = grids

    n1, n2 = 20, 220
    r1, r2 = make_run(n1), make_run(n2)
    float(r1(state0, None))
    float(r2(state0, None))
    diffs = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(r1(state0, None))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(r2(state0, None))
        tb = time.perf_counter() - t0
        diffs.append((tb - ta) / (n2 - n1))
    diffs.sort()
    us = diffs[len(diffs) // 2] * 1e6
    ab = os.environ.get("SLAMRS_FUSED_ABLATE", "") or "none"
    print(f"point={point} ablate={ab}: {us:.1f} us/update", flush=True)


def main() -> None:
    args = sys.argv[1:]
    point = args[0] if args else "002"
    if len(args) > 1 or os.environ.get("SLAMRS_FUSED_ABLATE") is not None:
        # child mode: one measurement in this process
        if len(args) > 1 and args[1] != "none":
            os.environ["SLAMRS_FUSED_ABLATE"] = args[1]
        run_point(point)
        return
    for ab in ABLATIONS:
        env = dict(os.environ)
        if ab != "none":
            env["SLAMRS_FUSED_ABLATE"] = ab
        else:
            env["SLAMRS_FUSED_ABLATE"] = ""
        subprocess.run([sys.executable, os.path.abspath(__file__), point,
                        ab], env=env, check=False)


if __name__ == "__main__":
    main()
