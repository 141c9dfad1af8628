"""Per-op VPU cost probes for the fused kernel's hot arithmetic (v5e).

Times a chain of N identical vector ops over a [wr, 128] f32 domain in a
standalone pallas kernel (value-fetch marginal between two chain
lengths), and checks the ACCURACY of the approximate primitives
(pl.reciprocal approx, with/without one Newton step) against exact.

Usage:  python benchmarks/prof_ops.py [accuracy|cost]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WR, COLS, P = 56, 128, 64  # one window's domain, P programs


def _chain(op, n, x):
    for _ in range(n):
        x = op(x)
    return x


OPS = {
    "fma": lambda x: x * 1.0000001 + 0.1,
    "div": lambda x: 1.7 / (jnp.abs(x) + 1.0),
    "recip_exact": lambda x: pl.reciprocal(jnp.abs(x) + 1.0, approx=False),
    "recip_approx": lambda x: pl.reciprocal(jnp.abs(x) + 1.0, approx=True),
    "recip_approx_nr": lambda x: (lambda h, r: r * (2.0 - h * r))(
        jnp.abs(x) + 1.0,
        pl.reciprocal(jnp.abs(x) + 1.0, approx=True)),
    "rsqrt": lambda x: jax.lax.rsqrt(jnp.abs(x) + 0.5),
    "sqrt": lambda x: jnp.sqrt(jnp.abs(x) + 0.5),
    "exp": lambda x: jnp.exp(-jnp.abs(x) * 0.1),
    "log": lambda x: jnp.log(jnp.abs(x) + 0.5),
    "round": lambda x: jnp.round(x * 0.731) * 0.5,
    "floor": lambda x: jnp.floor(x * 0.731) * 0.5,
    "cmpsel": lambda x: jnp.where(x > 0.5, x * 0.3, x + 0.25),
    "max": lambda x: jnp.maximum(x * 0.731, 0.21),
    "i32cvt": lambda x: (x.astype(jnp.int32) & 511).astype(jnp.float32)
    * 0.731 + 0.3,
    "shiftand": lambda x: (
        (jax.lax.shift_right_logical(x.astype(jnp.int32), 2) & 255)
        .astype(jnp.float32) * 0.0731 + 0.3),
}


def make_kernel(op_name, n):
    op = OPS[op_name]

    def kernel(x_ref, o_ref):
        o_ref[...] = _chain(op, n, x_ref[...])

    return kernel


def run_chain(op_name, n, x):
    f = pl.pallas_call(
        make_kernel(op_name, n),
        grid=(P,),
        in_specs=[pl.BlockSpec((WR, COLS), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((WR, COLS), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((WR, COLS), jnp.float32),
    )
    return f(x)


def time_op(op_name, reps=5):
    x = jax.random.uniform(jax.random.key(0), (WR, COLS), jnp.float32,
                           0.1, 2.0)
    n1, n2 = 8, 168

    @jax.jit
    def r1(x):
        return jnp.sum(run_chain(op_name, n1, x))

    @jax.jit
    def r2(x):
        return jnp.sum(run_chain(op_name, n2, x))

    float(r1(x))
    float(r2(x))
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(x))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(r2(x))
        tb = time.perf_counter() - t0
        diffs.append((tb - ta) / (n2 - n1))
    diffs.sort()
    # ns per op per [WR,128] granule-set across P programs
    per = diffs[len(diffs) // 2] / P * 1e9
    print(f"{op_name:16s}: {per:8.1f} ns per [{WR},{COLS}] op")


def accuracy():
    x = jnp.concatenate([
        jnp.linspace(1e-3, 2.0, 4096, dtype=jnp.float32),
        jnp.linspace(2.0, 100.0, 4096, dtype=jnp.float32)])
    x = jnp.reshape(x, (64, 128))

    def k_approx(x_ref, o_ref):
        o_ref[...] = pl.reciprocal(x_ref[...], approx=True)

    def k_nr(x_ref, o_ref):
        h = x_ref[...]
        r = pl.reciprocal(h, approx=True)
        o_ref[...] = r * (2.0 - h * r)

    for name, k in (("approx", k_approx), ("approx+newton", k_nr)):
        y = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        )(x)
        exact = 1.0 / x.astype(jnp.float64)
        rel = jnp.abs(y.astype(jnp.float64) - exact) / jnp.abs(exact)
        print(f"recip {name}: max rel err {float(jnp.max(rel)):.3e}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "cost"
    if mode == "accuracy":
        accuracy()
    else:
        for name in (sys.argv[2:] or list(OPS)):
            time_op(name)
