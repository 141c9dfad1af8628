"""Scratch: is bf16 elementwise vector ALU 2x f32 on this v5e?
Dummy Pallas kernel: K rounds of fma-ish ops on a [120, 128] tile."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROUNDS = 64
P = 1024
PPB = 8


def _kernel(x_ref, o_ref, *, dtype):
    j = pl.program_id(0)
    del j
    for k in range(PPB):
        v = x_ref[k].astype(dtype)
        c1 = jnp.asarray(1.000001, dtype)
        c2 = jnp.asarray(0.999999, dtype)
        for _ in range(ROUNDS):
            v = v * c1 + c2
            v = jnp.maximum(v * c2, v)
        o_ref[k] = v.astype(o_ref.dtype)


def call(x, dtype):
    return pl.pallas_call(
        functools.partial(_kernel, dtype=dtype),
        grid=(P // PPB,),
        in_specs=[pl.BlockSpec((PPB, 120, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((PPB, 120, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 120, 128), jnp.float32),
    )(x)


def marginal(factory, state, n1=20, n2=120, reps=3):
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


if __name__ == "__main__":
    x0 = jnp.ones((P, 120, 128), jnp.float32) * 0.5
    for dtype in (jnp.float32, jnp.bfloat16):
        def factory(n, dtype=dtype):
            @jax.jit
            def run(x):
                def body(v, _):
                    return call(v, dtype), 0.0
                v, _ = jax.lax.scan(body, x, None, length=n)
                return jnp.float32(v[0, 0, 0])
            return run
        dt = marginal(factory, x0)
        ops = P * 120 * 128 * ROUNDS * 3
        print(f"{dtype.__name__}: {dt*1e6:.1f} us/iter "
              f"({ops/dt/1e12:.2f} Tops/s)")
