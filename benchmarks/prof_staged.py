"""Staged-lineage HBM kernel ablations at the 0.02 m bench point.

Times the LIVE ``ops.fused.fused_update`` staged path under a realistic
concentrated lineage (median N_eff ~11/1,024 at 0.02 m) and ablates one
mechanism per run by monkeypatching BEFORE the first trace — so each
variant must run in its own process:

  python -m benchmarks.prof_staged live      # the shipping path
  python -m benchmarks.prof_staged nostage   # cnt forced 0: no prologue
                                             # (reads stage garbage —
                                             # timing-only, values junk)
  python -m benchmarks.prof_staged nocache   # _SHAREWIN_SLOTS = 0
  python -m benchmarks.prof_staged identity  # all-lone lineage (cnt=0
                                             # legitimately; no bands)

Timing is value-fetch marginal between two scan lengths (the TPU tunnel's
block_until_ready does not block).
"""

import math as pymath
import sys

import jax
import jax.numpy as jnp
import numpy as np

variant = sys.argv[1] if len(sys.argv) > 1 else "live"
N_UNIQ = int(sys.argv[2]) if len(sys.argv) > 2 else 11

from slamrs_tpu.ops import fused  # noqa: E402
from slamrs_tpu.ops.grid import GridSpec2D  # noqa: E402

if variant == "nostage":
    _orig_plan = fused.staged_lineage_plan

    def _plan_cnt0(ancestors):
        spos, usrc, cnt = _orig_plan(ancestors)
        return spos, usrc, cnt * 0

    fused.staged_lineage_plan = _plan_cnt0
elif variant == "nocache":
    # every particle private: cache plumbed, never shared (wsel=-1 makes
    # each particle use its reserved per-buffer slot and do its own
    # DMA + roll)
    def _plan_private(spos, r0, u0, nw):
        p = spos.shape[0]
        return (jnp.full((p,), -1, jnp.int32), jnp.ones((p,), jnp.int32))

    fused.shared_window_plan = _plan_private

P, RES, WIDTH, NB, MAXR = 1024, 0.02, 4.0, 360, 1.0
spec = GridSpec2D(-WIDTH / 2, -WIDTH / 2, WIDTH, WIDTH, RES)
rows, cols = spec.rows, (spec.cols + 127) // 128 * 128

key = jax.random.key(0)
if variant == "identity":
    anc = jnp.arange(P, dtype=jnp.int32)
else:
    # concentrated lineage: N_UNIQ unique ancestors, systematic-style
    # (non-decreasing, contiguous segments)
    uniq = np.sort(np.random.RandomState(0).choice(P, N_UNIQ,
                                                   replace=False))
    seg = np.sort(np.random.RandomState(1).multinomial(
        P - N_UNIQ, np.ones(N_UNIQ) / N_UNIQ) + 1)
    anc = jnp.asarray(np.repeat(uniq, seg), jnp.int32)

# offspring poses: ancestor pose + ~a-cell jitter (so the shared-window
# plan groups them like the real filter does)
anc_pose = jnp.concatenate([
    jax.random.uniform(key, (P, 2), jnp.float32, -0.3, 0.3),
    jax.random.uniform(jax.random.fold_in(key, 1), (P, 1), jnp.float32,
                       -3.0, 3.0)], axis=1)[anc]
jit_pose = jax.random.normal(jax.random.fold_in(key, 2), (P, 3)) * \
    jnp.array([0.01, 0.01, 0.02])
poses = anc_pose + jit_pose

dist = jax.random.uniform(jax.random.fold_in(key, 3), (NB,), jnp.float32,
                          0.2, 0.99)
valid = jnp.ones((NB,), bool)
present = jnp.ones((NB,), bool)
grids = jnp.zeros((P, rows, cols), jnp.bfloat16)


def factory(n):
    @jax.jit
    def run(g):
        def body(g, _):
            g2, lik = fused.fused_update(
                g, poses, jnp.float32(0.0), dist, valid, present, spec,
                NB, MAXR, resident=False, ancestors=anc)
            return g2, jnp.sum(lik)
        g, liks = jax.lax.scan(body, g, None, length=n)
        return jnp.nansum(liks) + jnp.float32(g[0, 0, 0])
    return run


def marginal(n1=30, n2=230, reps=5):
    import time
    r1, r2 = factory(n1), factory(n2)
    float(jnp.asarray(r1(grids)))  # compile
    float(jnp.asarray(r2(grids)))
    ds = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.asarray(r1(grids)))
        t1 = time.perf_counter()
        float(jnp.asarray(r2(grids)))
        t2 = time.perf_counter()
        ds.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    ds.sort()
    return ds[len(ds) // 2]


dt = marginal()
print(f"staged 0.02m {variant} uniq={N_UNIQ}: {dt * 1e6:.1f} us/update")
