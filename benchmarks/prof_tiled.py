"""Config-3 tiled-update decomposition (VERDICT r4 #5): where do the
~570 us/frame between the tiled 4,246 ticks/s and the never-resample
ceiling 6,679 go?

Legs (each bench in its own subprocess — ablation env hooks freeze at
import):

  ceiling   dense resample_cow=True, neff=0.0   (the 6,679 reference)
  tnever    tiled, neff=0.0                     doubled-window-DMA + plan
                                                overhead vs ceiling
  tfull     tiled, neff=0.5                     the headline 4,246 point
  tnobands  tiled, neff=0.5, SLAMRS_TILES_NOBANDS=1
                                                tfull - tnobands = fresh-
                                                tile band-copy cost
  tnocell   tiled, neff=0.5, SLAMRS_FUSED_ABLATE=nocell
                                                kernel cell-pass share
  plan      standalone jit of tiled_plan + window groups + table relabel
            at config-3 shapes (pure XLA, no kernel)

Usage: python benchmarks/prof_tiled.py [leg ...]   (default: all)
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

_BENCH_CHILD = r"""
import sys
sys.path.insert(0, {root!r})
from bench import bench_grid_slam, ticks_per_frame
v = bench_grid_slam(particles=1024, width=50.0, resolution=0.05,
                    grid_dtype="bfloat16", resample_cow={cow!r},
                    neff={neff}, n1=10, n2=110, reps=5)
us = ticks_per_frame(0.2, 110) / v * 1e6
print("TICKS", v, "USFRAME", us)
"""

def run_bench(cow, neff, env_extra=None) -> tuple[float, float]:
    env = dict(os.environ)
    env.pop("SLAMRS_TILES_NOBANDS", None)
    env.pop("SLAMRS_FUSED_ABLATE", None)
    env.update(env_extra or {})
    code = _BENCH_CHILD.format(root=ROOT, cow=cow, neff=neff)
    res = subprocess.run([sys.executable, "-c", code], env=env, cwd=ROOT,
                         capture_output=True, text=True, timeout=2400)
    if res.returncode != 0:
        print(res.stderr[-2000:], file=sys.stderr)
        raise SystemExit("bench leg failed")
    parts = [ln for ln in res.stdout.splitlines()
             if ln.startswith("TICKS")][0].split()
    return float(parts[1]), float(parts[3])


def run_plan() -> float:
    code = r"""
import sys, time
sys.path.insert(0, %r)
import jax, jax.numpy as jnp
from slamrs_tpu.ops.tiles import tiled_plan, _window_groups, init_tiled
from slamrs_tpu.ops.grid import GridSpec2D

spec = GridSpec2D(-25.0, -25.0, 50.0, 50.0, 0.05)
p = 1024
pool, table = init_tiled(p, spec, 1.0)
n_phys = pool.shape[0]
key = jax.random.key(0)
t0 = jax.random.randint(key, (p,), 0, table.shape[1] - 2, jnp.int32)
anc = jnp.sort(jax.random.randint(jax.random.fold_in(key, 1), (p,),
                                  0, p, jnp.int32))
r0 = jax.random.randint(jax.random.fold_in(key, 2), (p,), 0, 40,
                        jnp.int32) * 8
u0 = jax.random.randint(jax.random.fold_in(key, 3), (p,), 0, 3,
                        jnp.int32) * 8

def make(n):
    @jax.jit
    def run(table):
        def body(tb, _):
            tb = jnp.take(tb, anc, axis=0)
            src, dst, new_tb = tiled_plan(tb, t0, n_phys)
            gid = _window_groups(src, r0, u0)
            return new_tb, jnp.sum(gid) + jnp.sum(dst)
        tb, outs = jax.lax.scan(body, table, None, length=n)
        return jnp.sum(outs) + jnp.sum(tb)
    return run

r1, r2 = make(30), make(230)
float(r1(table)); float(r2(table))
diffs = []
for _ in range(5):
    t0_ = time.perf_counter(); float(r1(table)); ta = time.perf_counter() - t0_
    t0_ = time.perf_counter(); float(r2(table)); tb = time.perf_counter() - t0_
    diffs.append((tb - ta) / 200)
diffs.sort()
print("US_PER_PLAN", diffs[len(diffs) // 2] * 1e6)
""" % ROOT
    res = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                         capture_output=True, text=True, timeout=1200)
    if res.returncode != 0:
        print(res.stderr[-2000:], file=sys.stderr)
        raise SystemExit("plan leg failed")
    return float([ln for ln in res.stdout.splitlines()
                  if ln.startswith("US_PER_PLAN")][0].split()[1])


def main() -> None:
    legs = sys.argv[1:] or ["ceiling", "tnever", "tfull", "tnobands",
                            "tnocell", "plan"]
    out = {}
    for leg in legs:
        if leg == "ceiling":
            out[leg] = run_bench(True, 0.0)
        elif leg == "tnever":
            out[leg] = run_bench("tiled", 0.0)
        elif leg == "tfull":
            out[leg] = run_bench("tiled", 0.5)
        elif leg == "tnobands":
            out[leg] = run_bench("tiled", 0.5,
                                 {"SLAMRS_TILES_NOBANDS": "1"})
        elif leg == "tnocell":
            out[leg] = run_bench("tiled", 0.5,
                                 {"SLAMRS_FUSED_ABLATE": "nocell"})
        elif leg == "plan":
            out[leg] = ("-", run_plan())
        print(f"{leg}: {out[leg]}", flush=True)
    if {"tfull", "tnobands"} <= out.keys():
        print(f"band-copy cost: "
              f"{out['tfull'][1] - out['tnobands'][1]:.1f} us/frame")
    if {"tfull", "tnocell"} <= out.keys():
        print(f"cell-pass share: "
              f"{out['tfull'][1] - out['tnocell'][1]:.1f} us/frame")
    if {"ceiling", "tnever"} <= out.keys():
        print(f"tiled structural overhead (2-band DMA + plan) vs dense "
              f"never-resample: "
              f"{out['tnever'][1] - out['ceiling'][1]:.1f} us/frame")


if __name__ == "__main__":
    main()
