"""Measure merge_segment_windows directly (VERDICT r4 #3): does the
window-variant merge actually reduce the staged kernel's per-frame
window fills, and does that move the 0.02 m e2e number?

Two sub-measurements, each in its own subprocess (the A/B hooks are
frozen at import):

1. FILLS: run a real 0.02 m rollout with SLAMRS_FUSED_DEBUG_GROUPS=1
   and parse the per-frame plan sizes (window fills = DMAs+rolls the
   kernel performs, staged unique maps) — merge ON vs OFF.  Merging is
   output-neutral on simulator scans (all d <= max_range), so both runs
   see the identical trajectory and the fill counts are directly
   comparable frame by frame.
2. E2E: bench_grid_slam at the 0.02 m point, merge ON vs OFF
   (SLAMRS_FUSED_NOMERGE=1), 5 reps each.

Usage: python benchmarks/prof_merge.py [fills|e2e|all]
"""

import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

_FILLS_CHILD = r"""
import jax, jax.numpy as jnp
from slamrs_tpu.core.types import Command
from slamrs_tpu.graph.compile import make_fused
from slamrs_tpu.models.gridslam import GridSlamConfig
from slamrs_tpu.models.simulator import SimParams

cfg = GridSlamConfig(position_x=-2.0, position_y=-2.0, width=4.0,
                     height=4.0, resolution=0.02, n_particles=1024,
                     max_scan_range=1.0, resample_neff_frac=0.5,
                     integrate="fused", grid_dtype="bfloat16")
fw = make_fused(params=SimParams.make(update_period=0.2), grid_config=cfg)
state = fw.init()
n = 400  # ~60 scan frames at the 0.2 s cadence
cmds = Command(jnp.full((n,), 0.05, jnp.float32),
               jnp.full((n,), 0.08, jnp.float32))
final, outs = jax.jit(lambda s: fw.rollout_cadence(
    s, n, seed=0, commands=cmds, initial_timer=0.0))(state)
print("sum_neff", float(jnp.sum(outs.n_eff)))
"""


def run_fills(nomerge: bool) -> list[tuple[int, int]]:
    env = dict(os.environ)
    env["SLAMRS_FUSED_DEBUG_GROUPS"] = "1"
    env.pop("SLAMRS_FUSED_NOMERGE", None)
    if nomerge:
        env["SLAMRS_FUSED_NOMERGE"] = "1"
    res = subprocess.run([sys.executable, "-c", _FILLS_CHILD], env=env,
                         cwd=ROOT, capture_output=True, text=True,
                         timeout=1800)
    if res.returncode != 0:
        print(res.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"fills child rc={res.returncode}")
    rows = []
    for m in re.finditer(r"window_fills=(\d+) staged_maps=(\d+)",
                         res.stdout + res.stderr):
        rows.append((int(m.group(1)), int(m.group(2))))
    return rows


def stats(xs):
    xs = sorted(xs)
    n = len(xs)
    return (f"n={n} mean={sum(xs)/max(n,1):.1f} med={xs[n//2]} "
            f"p90={xs[int(n*0.9)]} max={xs[-1]}") if n else "n=0"


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("fills", "all"):
        for label, nomerge in (("merge ON ", False), ("merge OFF", True)):
            rows = run_fills(nomerge)
            fills = [f for f, _ in rows]
            staged = [s for _, s in rows]
            print(f"{label}: fills   {stats(fills)}")
            print(f"{label}: staged  {stats(staged)}")
    if what in ("e2e", "all"):
        for label, env_extra in (("merge ON ", {}),
                                 ("merge OFF", {"SLAMRS_FUSED_NOMERGE": "1"})):
            env = dict(os.environ)
            env.pop("SLAMRS_FUSED_NOMERGE", None)
            env.update(env_extra)
            code = ("import sys; sys.path.insert(0, %r); "
                    "from bench import bench_grid_slam; "
                    "print('ticks/s', bench_grid_slam(resolution=0.02, "
                    "grid_dtype='bfloat16', n2=1050, reps=5))" % ROOT)
            res = subprocess.run([sys.executable, "-c", code], env=env,
                                 cwd=ROOT, capture_output=True, text=True,
                                 timeout=3600)
            out = [ln for ln in res.stdout.splitlines() if "ticks/s" in ln]
            print(f"{label}: {out[-1] if out else res.stderr[-500:]}")


if __name__ == "__main__":
    main()
