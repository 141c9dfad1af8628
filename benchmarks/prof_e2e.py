"""End-to-end frame-time decomposition of a bench point (real TPU).

Runs bench.bench_grid_slam at a given operating point with the profiling
stubs (SLAMRS_STUB_KERNEL / SLAMRS_STUB_RESAMPLE) controlled per
invocation, and prints ticks/s + us per SCAN FRAME so kernel / resample /
everything-else costs can be read off by subtraction.

Usage:
  python benchmarks/prof_e2e.py 0.02 0.2   [stub_kernel|stub_resample]
  python benchmarks/prof_e2e.py 0.05 0.0   [stub_kernel|stub_resample]

The stubs are read at trace time inside models.gridslam.update, so each
variant must run in its own process (this script sets the env var before
importing anything from slamrs_tpu).
"""

import os
import sys

res = float(sys.argv[1])
period = float(sys.argv[2])
stub = sys.argv[3] if len(sys.argv) > 3 else ""
if stub == "stub_kernel":
    os.environ["SLAMRS_STUB_KERNEL"] = "1"
elif stub == "stub_resample":
    os.environ["SLAMRS_STUB_RESAMPLE"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import bench_grid_slam, ticks_per_frame  # noqa: E402

n2 = 1050
v = bench_grid_slam(resolution=res, update_period=period,
                    grid_dtype="bfloat16", n2=n2, reps=5)
us = ticks_per_frame(period, n2) / v * 1e6
print(f"res={res} period={period} stub={stub or 'none'}: "
      f"{v:,.1f} ticks/s  ({us:.1f} us/scan-frame)")
