"""Per-phase roofline of the fused kernel at the two open perf points
(VERDICT r4 #1: "assertion by decomposition, with numbers").

Measures each compute phase by ablation (SLAMRS_FUSED_ABLATE, frozen at
import -> one subprocess per variant) and tabulates measured us against
the phase's analytic op/byte count and the MEASURED chip peaks:

  VPU f32      3.38 Tops/s   (benchmarks/prof_bf16.py, this chip)
  VPU bf16     5.09 Tops/s   (same)
  HBM copy     633  GB/s     (BENCH_CONFIG3_BOUND.json, 94% of peak)
  DMA issue    ~1 us/DMA, program dispatch ~0.35 us  (prof_anc/prof_002)

Points:
  A: 0.05 m resident pack2 kernel (scan-every-tick; target <= ~153 us)
  B: 0.02 m staged-lineage HBM kernel at a REAL lineage spread
     (~180 effective uniques, prof_uniq back-solve; 10k ticks/s target)

Op counts are per CELL PASS EVALUATION; at 0.05 m pack2 runs ONE
evaluation per particle PAIR ([wr,128] shared), at 0.02 m one per
particle.  Counts audited against ops/fused._cell_pass (static
bin-units pipeline, the production path):

  coords   dx,dy,r2                                   5
  atan2    abs2 max min div(~6) z2 poly(11) oct(9)   ~31
  bin      sub, mul, floor, mul, sub, floor            6
  pack3    floor-div decode + 1 lane-gather + field  ~14
  ism      interval compares/selects + bounds + add  ~15
  dens     max, rsqrt(~4), mul, max, mul             ~8
                                         total       ~79 vector ops/cell
  (traced-dphi pipeline: +5 — two extra muls, round-vs-floor select,
   close-the-circle compare+select; gather clamps +2)

Usage: python benchmarks/prof_roofline.py [A|B|both]
Writes BENCH_ROOFLINE.json and prints the markdown table.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

VPU_F32_TOPS = 3.38e12
HBM_GBPS = 633e9
DMA_ISSUE_US = 1.0

_CHILD = r"""
import math, os, sys, time
import jax, jax.numpy as jnp
from slamrs_tpu.ops.fused import fused_update
from slamrs_tpu.ops.grid import GridSpec2D

point = sys.argv[1]
# SLAMRS_ROOFLINE_TRACED=1: pass dphi as a traced f32 so the kernel runs
# the TRACED bin pipeline — the direct A/B of the static-dphi rewrite
dphi_arg = (jnp.float32(2 * math.pi / 360)
            if os.environ.get("SLAMRS_ROOFLINE_TRACED") else None)
p, nb, maxr = 1024, 360, 1.0
res = 0.05 if point == "A" else 0.02
spec = GridSpec2D(-2.0, -2.0, 4.0, 4.0, res)
cols = (spec.cols + 127) // 128 * 128
key = jax.random.key(0)
poses = jnp.concatenate([
    jax.random.uniform(key, (p, 2), jnp.float32, -0.05, 0.05),
    jax.random.uniform(jax.random.fold_in(key, 1), (p, 1), jnp.float32,
                       -3.0, 3.0)], axis=1)
dist = jax.random.uniform(jax.random.fold_in(key, 2), (nb,), jnp.float32,
                          0.2, 0.99)
valid = jnp.ones((nb,), bool)
present = jnp.ones((nb,), bool)
grids = jnp.zeros((p, spec.rows, cols), jnp.bfloat16)

if point == "A":
    anc = None          # resident pack2 path (every-tick regime)
else:
    nu = 180            # the prof_e2e back-solved effective lineage
    src = jnp.linspace(0, p - 1, nu).astype(jnp.int32)
    anc = jnp.sort(src[jnp.arange(p) % nu])

def make_run(n):
    @jax.jit
    def run(g, _k):
        def body(g, _):
            g2, lik = fused_update(g, poses, jnp.float32(0.0), dist,
                                   valid, present, spec, nb, maxr,
                                   resident=(point == "A"),
                                   ancestors=anc, dphi=dphi_arg)
            return g2, jnp.sum(lik)
        g, liks = jax.lax.scan(body, g, None, length=n)
        return jnp.sum(liks) + jnp.float32(g[0, 0, 0])
    return run

n1, n2 = 30, 230
r1, r2 = make_run(n1), make_run(n2)
float(r1(grids, 0)); float(r2(grids, 0))
diffs = []
for _ in range(5):
    t0 = time.perf_counter(); float(r1(grids, 0)); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); float(r2(grids, 0)); tb = time.perf_counter() - t0
    diffs.append((tb - ta) / (n2 - n1))
diffs.sort()
print("US_PER_UPDATE", diffs[len(diffs) // 2] * 1e6)
"""

ABLATIONS = ["", "nolik", "nocell", "noatan", "nogather", "nodens"]


def run_point(point: str) -> dict:
    out = {}
    for ab in ABLATIONS:
        env = dict(os.environ)
        env.pop("SLAMRS_FUSED_ABLATE", None)
        if ab:
            env["SLAMRS_FUSED_ABLATE"] = ab
        res = subprocess.run([sys.executable, "-c", _CHILD, point],
                             env=env, cwd=ROOT, capture_output=True,
                             text=True, timeout=1800)
        if res.returncode != 0:
            print(res.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"point {point} ablate={ab!r} failed")
        us = float([ln for ln in res.stdout.splitlines()
                    if ln.startswith("US_PER_UPDATE")][0].split()[1])
        out[ab or "full"] = us
        print(f"  point {point} ablate={ab or 'none':9s}: {us:7.1f} us",
              file=sys.stderr, flush=True)
    return out


def table(point: str, m: dict) -> list[str]:
    """Markdown roofline rows: each ablation is INDEPENDENT (one env var
    per subprocess), so a phase's cost is full - m[ablate]; the base
    (dispatch + rolls + DMA) is what remains of nocell after removing
    the likelihood's share."""
    from slamrs_tpu.ops.fused import window_rows
    from slamrs_tpu.ops.grid import GridSpec2D

    res = 0.05 if point == "A" else 0.02
    spec = GridSpec2D(-2.0, -2.0, 4.0, 4.0, res)
    p = 1024
    wr = min(window_rows(spec, 1.0), spec.rows - spec.rows % 8
             if spec.rows % 8 else spec.rows)
    evals = p // 2 if point == "A" else p  # pack2 halves evaluations
    cells = evals * wr * 128
    full = m["full"]
    lik = full - m["nolik"]
    cell = full - m["nocell"]
    atan = full - m["noatan"]
    gather = full - m["nogather"]
    dens = full - m["nodens"]
    phases = [
        ("likelihood", lik, 40),
        ("atan2+bin", atan, 37),
        ("beam gather+decode", gather, 14),
        ("density (rsqrt)", dens, 8),
        ("ism+coords+integrate", cell - atan - gather - dens, 20),
        ("dispatch+rolls+DMA (base)", full - lik - cell, None),
    ]
    rows = [f"Point {point}: full kernel {full:.1f} us "
            f"({cells / 1e6:.1f}M cell-lanes/update)",
            "| phase | us | ops/cell | Gops/s | % VPU f32 peak |",
            "|---|---|---|---|---|"]
    for name, us, opc in phases:
        if opc is None or us <= 0:
            rows.append(f"| {name} | {us:.1f} | - | - | - |")
            continue
        gops = cells * opc / (us * 1e-6)
        rows.append(f"| {name} | {us:.1f} | ~{opc} | {gops / 1e9:,.0f} "
                    f"| {gops / VPU_F32_TOPS * 100:.0f}% |")
    return rows


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    results = {}
    for point in ("A", "B") if which == "both" else (which,):
        results[point] = run_point(point)
    lines = []
    for point, m in results.items():
        lines += table(point, m) + [""]
    print("\n".join(lines))
    with open(os.path.join(ROOT, "BENCH_ROOFLINE.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
