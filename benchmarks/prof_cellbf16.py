"""A/B the bf16 cell-pass tail (SLAMRS_FUSED_CELL_BF16) at the two open
perf points (VERDICT r4 #1a/#2): 0.02 m staged HBM kernel and the 0.05 m
scan-every-tick resident kernel.

The hook freezes at import, so each variant runs in its own subprocess
(the prof_merge e2e pattern).  Timing = bench.bench_grid_slam (median
marginal, 5 reps).  Usage: python benchmarks/prof_cellbf16.py [002|tick|all]
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

POINTS = {
    "002": ("from bench import bench_grid_slam; "
            "print('ticks/s', bench_grid_slam(resolution=0.02, "
            "grid_dtype='bfloat16', n2=1050, reps=5))"),
    "tick": ("from bench import bench_grid_slam; "
             "print('ticks/s', bench_grid_slam(update_period=0.0, "
             "n2=1050, reps=5))"),
}


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    points = POINTS if what == "all" else {what: POINTS[what]}
    for name, code in points.items():
        for label, bf16 in (("f32 tail ", False), ("bf16 tail", True)):
            env = dict(os.environ)
            env.pop("SLAMRS_FUSED_CELL_BF16", None)
            if bf16:
                env["SLAMRS_FUSED_CELL_BF16"] = "1"
            res = subprocess.run(
                [sys.executable, "-c",
                 "import sys; sys.path.insert(0, %r); %s" % (ROOT, code)],
                env=env, cwd=ROOT, capture_output=True, text=True,
                timeout=3600)
            out = [ln for ln in res.stdout.splitlines() if "ticks/s" in ln]
            print(f"{name} {label}: "
                  f"{out[-1] if out else res.stderr[-500:]}", flush=True)


if __name__ == "__main__":
    main()
