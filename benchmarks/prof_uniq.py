"""Staged-lineage kernel time vs unique-ancestor count (0.02 m point).

The e2e frame at 0.02 m (674 us, prof_e2e) runs ~105 us above the
concentrated-lineage prof_r4 reading (546 us at 11 uniques).  Real
resampled lineages are long-tailed (median ~11 uniques, p90 ~100,
tail ~300): this sweeps the unique count to attribute that gap to the
stage prologue / window fills / cache spill.

Usage: python benchmarks/prof_uniq.py [11 33 100 300 ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from slamrs_tpu.ops.fused import fused_update
    from slamrs_tpu.ops.grid import GridSpec2D

    uniqs = [int(a) for a in sys.argv[1:]] or [11, 33, 100, 300, 1024]
    p, nb, maxr = 1024, 360, 1.0
    spec = GridSpec2D(-2.0, -2.0, 4.0, 4.0, 0.02)
    cols = (spec.cols + 127) // 128 * 128
    key = jax.random.key(0)
    poses = jnp.concatenate([
        jax.random.uniform(key, (p, 2), jnp.float32, -0.05, 0.05),
        jax.random.uniform(jax.random.fold_in(key, 1), (p, 1),
                           jnp.float32, -3.0, 3.0)], axis=1)
    angles0 = jnp.float32(0.0)
    dist = jax.random.uniform(jax.random.fold_in(key, 2), (nb,),
                              jnp.float32, 0.2, 0.99)
    valid = jnp.ones((nb,), bool)
    present = jnp.ones((nb,), bool)
    grids = jnp.zeros((p, spec.rows, cols), jnp.bfloat16)

    for nu in uniqs:
        src = jnp.linspace(0, p - 1, nu).astype(jnp.int32)
        anc = jnp.sort(src[jnp.arange(p) % nu])

        def make_run(n, anc=anc):
            @jax.jit
            def run(state, _key):
                def body(g, _):
                    g2, lik = fused_update(
                        g, poses, angles0, dist, valid, present, spec,
                        nb, maxr, resident=False, ancestors=anc)
                    return g2, jnp.sum(lik)
                g, liks = jax.lax.scan(body, state, None, length=n)
                return jnp.float32(g[0, 0, 0]) + jnp.sum(liks)
            return run

        n1, n2 = 20, 220
        r1, r2 = make_run(n1), make_run(n2)
        float(r1(grids, None))
        float(r2(grids, None))
        diffs = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(r1(grids, None))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(r2(grids, None))
            tb = time.perf_counter() - t0
            diffs.append((tb - ta) / (n2 - n1))
        diffs.sort()
        print(f"uniques={nu:5d}: {diffs[len(diffs) // 2] * 1e6:.1f} "
              "us/update", flush=True)


if __name__ == "__main__":
    main()
