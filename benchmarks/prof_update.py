"""Scratch: time the FULL gs.update at 0.02m shapes (vs kernel-only 688us),
then the cadence frame, to localize the ~425us/frame of non-kernel cost."""

import math as pymath
import sys
import time

import jax
import jax.numpy as jnp

from slamrs_tpu.core.types import Command, OdometryReading, Scan
from slamrs_tpu.models import gridslam as gs

P = 1024
cfg = gs.GridSlamConfig(position_x=-2.0, position_y=-2.0, width=4.0,
                        height=4.0, resolution=0.02, n_particles=P,
                        max_scan_range=1.0, resample_neff_frac=0.5,
                        integrate="fused", grid_dtype="bfloat16")
NB = 360

key = jax.random.key(0)
ang = jnp.deg2rad(jnp.arange(NB, dtype=jnp.float32))
dist = jax.random.uniform(jax.random.fold_in(key, 2), (NB,), jnp.float32,
                          0.2, 0.99)
scan = Scan(angles=ang, distances=dist, strengths=jnp.ones((NB,)),
            valid=jnp.ones((NB,), bool), present=jnp.ones((NB,), bool))
odo = OdometryReading(jnp.float32(0.01), jnp.float32(0.013),
                      jnp.float32(0.1))


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


def time_update(name, cfg):
    state = gs.GridSlamState.init(cfg)

    def factory(n):
        @jax.jit
        def run(state):
            def body(st, k):
                st2, out = gs.update(st, scan, odo, k, cfg)
                return st2, out.n_eff
            st, neffs = jax.lax.scan(body, state,
                                     jax.random.split(jax.random.key(1), n))
            return (jnp.sum(neffs) + jnp.float32(st.grids[0, 0, 0])
                    + st.poses[0, 0])
        return run

    dt = marginal(factory, state)
    print(f"{name}: {dt * 1e6:.1f} us/update")


def time_cadence(name, **kw):
    from slamrs_tpu.graph.compile import make_fused
    from slamrs_tpu.models.simulator import SimParams

    fw = make_fused(params=SimParams.make(update_period=0.2),
                    grid_config=cfg, num_beams=NB, **kw)
    state = fw.init()

    def factory(n):
        cmds = Command(jnp.full((n,), 0.05, jnp.float32),
                       jnp.full((n,), 0.08, jnp.float32))

        @jax.jit
        def run(state):
            c, outs = fw.rollout_cadence(state, n, seed=0, commands=cmds,
                                         initial_timer=0.0)
            return (jnp.sum(outs.n_eff) + jnp.float32(c.grid.grids[0, 0, 0])
                    + c.pose[0])
        return run

    dt = marginal(factory, state)
    print(f"{name}: {dt * 1e6:.1f} us/tick -> per frame "
          f"{dt * 1e6 * 6.706:.1f} us (x6.71 cadence)")


if __name__ == "__main__":
    which = sys.argv[1:] or ["update"]
    for w in which:
        if w == "update":
            time_update("full gs.update (cow auto)", cfg)
        elif w == "nocow":
            import dataclasses
            time_update("gs.update resample_cow=False",
                        dataclasses.replace(cfg, resample_cow=False))
        elif w == "cadence":
            time_cadence("cadence rollout")
