"""Systematic-resample formulation shootout (real TPU, P=1024).

``ancestors_m = #{i: cum_i < u_m}`` is a pure function of the values,
so any exact algorithm returns bitwise-identical ancestors — the
formulation is purely a cost choice:

  matrix : the committed comparison matrix (cum[None,:] < u[:,None]
           -> [P, P] bool, sum) — one big op, ~4 MB of traffic at 1024.
  bsearch: branchless binary search, 10 rounds of gather+compare on
           [P]-vectors (exactly the same < predicate on the same cum).

Each variant is timed inside a 200-step scan (value-fetch marginal);
equality of outputs is asserted on 50 random weight vectors first.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    p = 1024

    def anc_matrix(weights, u01):
        n = weights.shape[-1]
        r = u01 / n
        u = r + jnp.arange(n, dtype=weights.dtype) / n
        cum = jnp.cumsum(weights, axis=-1)
        idx = jnp.sum((cum[..., None, :] < u[..., :, None]), axis=-1)
        return jnp.clip(idx, 0, n - 1).astype(jnp.int32)

    def anc_bsearch(weights, u01):
        n = weights.shape[-1]
        r = u01 / n
        u = r + jnp.arange(n, dtype=weights.dtype) / n
        cum = jnp.cumsum(weights, axis=-1)
        lo = jnp.zeros((n,), jnp.int32)  # count of cum_i < u_m
        step = n
        while step > 1:
            step //= 2
            probe = lo + step - 1  # check whether count can grow by step
            ok = jnp.take(cum, jnp.minimum(probe, n - 1)) < u
            lo = jnp.where(ok, lo + step, lo)
        return jnp.clip(lo, 0, n - 1).astype(jnp.int32)

    # equality gate
    for s in range(50):
        k = jax.random.key(s)
        w = jax.random.dirichlet(k, jnp.full((p,), 0.05))
        u01 = jax.random.uniform(jax.random.fold_in(k, 1), (1,))
        a = jax.jit(anc_matrix)(w, u01)
        b = jax.jit(anc_bsearch)(w, u01)
        if not bool(jnp.all(a == b)):
            raise SystemExit(f"MISMATCH at seed {s}")
    print("equality: 50/50 bitwise identical", flush=True)

    key = jax.random.key(7)
    w0 = jax.random.dirichlet(key, jnp.full((p,), 0.05))

    def timed(fn, name):
        def make(n):
            @jax.jit
            def run(w, _):
                def body(c, i):
                    u01 = jnp.float32(0.3) + 1e-9 * i[None].astype(
                        jnp.float32)
                    a = fn(c, u01)
                    c2 = jnp.take(c, a)  # consume like the update does
                    return c2 / jnp.sum(c2), jnp.sum(a)
                c, outs = jax.lax.scan(body, w, jnp.arange(n), length=n)
                return jnp.sum(outs) + c[0]
            return run

        n1, n2 = 50, 1050
        r1, r2 = make(n1), make(n2)
        float(r1(w0, None)); float(r2(w0, None))
        diffs = []
        for _ in range(5):
            t0 = time.perf_counter(); float(r1(w0, None))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter(); float(r2(w0, None))
            tb = time.perf_counter() - t0
            diffs.append((tb - ta) / (n2 - n1))
        diffs.sort()
        print(f"{name}: {diffs[len(diffs) // 2] * 1e6:.2f} us/step",
              flush=True)

    timed(anc_matrix, "matrix ")
    timed(anc_bsearch, "bsearch")


if __name__ == "__main__":
    main()
