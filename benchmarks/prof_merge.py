"""Measure merge_segment_windows directly (VERDICT r4 #3): does the
window-variant merge actually reduce the staged kernel's per-frame
window fills, and does that move the 0.02 m e2e number?

Two sub-measurements:

1. FILLS (CPU): record the REAL lineage/pose sequence of a 0.02 m
   rollout ONCE (a fused_update wrapper captures each scan frame's
   pending ancestors + update poses via jax.debug.callback — works on
   CPU; the axon TPU tunnel has no host callbacks), then compute the
   staged kernel's plan sizes OFFLINE for every variant (merge on/off,
   window-row slack +8/+16) from the same recorded sequence.  Merging
   and row slack are output-neutral on simulator scans (all
   d <= max_range), so one trajectory serves all variants; the offline
   placement math replicates ops/fused.py:1653-1754 and is
   cross-checked frame-by-frame against fused_update's own
   SLAMRS_FUSED_DEBUG_GROUPS prints from the recording run.
2. E2E (TPU): bench_grid_slam at the 0.02 m point, merge ON vs OFF
   (SLAMRS_FUSED_NOMERGE=1), 5 reps each, own subprocess per variant
   (the hooks freeze at import).

Usage: python benchmarks/prof_merge.py [fills|e2e|all]
"""

import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
REC_NPZ = "/tmp/lineage_rec.npz"

_RECORD_CHILD = r"""
import jax
# CPU on purpose: the recording callback cannot run through the axon
# TPU tunnel (no host callbacks), and plan sizes are a host-side
# property anyway.  The counter-update must precede first backend init
# (CLAUDE.md); fused kernels auto-interpret on CPU (gridslam.py).
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import slamrs_tpu.ops.fused as F

REC = []
_orig = F.fused_update

def _rec_fused(grids, poses, *a, **kw):
    if kw.get("ancestors") is not None:
        jax.debug.callback(
            lambda an, po: REC.append((np.array(an), np.array(po))),
            kw["ancestors"], poses)
    return _orig(grids, poses, *a, **kw)

F.fused_update = _rec_fused

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
step = jax.jit(lambda s, cmd, k: fw.step(s, cmd, k))
key = jax.random.key(0)
cmd = Command(jnp.float32(0.05), jnp.float32(0.08))
n = 270  # ~40 scan frames at the 0.2 s cadence
for t in range(n):
    key, sub = jax.random.split(key)
    state, outs = step(state, cmd, sub)
jax.block_until_ready(state.pose)
anc = np.stack([a for a, _ in REC])
pos = np.stack([p for _, p in REC])
np.savez(%(npz)r, anc=anc, poses=pos)
print("RECORDED_FRAMES", len(REC))
"""


def run_record() -> None:
    env = dict(os.environ)
    env["SLAMRS_FUSED_DEBUG_GROUPS"] = "1"  # cross-check prints
    for k in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
              "PALLAS_AXON_TPU_GEN", "SLAMRS_FUSED_NOMERGE",
              "SLAMRS_FUSED_WRPLUS"):
        env.pop(k, None)
    res = subprocess.run([sys.executable, "-c",
                          _RECORD_CHILD % {"npz": REC_NPZ}], env=env,
                         cwd=ROOT, capture_output=True, text=True,
                         timeout=7200)
    if res.returncode != 0:
        print(res.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"record child rc={res.returncode}")
    printed = [(int(m.group(1)), int(m.group(2))) for m in re.finditer(
        r"window_fills=(\d+) staged_maps=(\d+)",
        res.stdout + res.stderr)]
    with open(REC_NPZ + ".printed.json", "w") as f:
        json.dump(printed, f)


def plan_sizes(anc, poses, *, wrplus: int = 0, merge: bool = True):
    """Staged-kernel plan sizes for one recorded frame — replicates the
    placement math of ops/fused.py:1653-1754 (r0/c0/u0 derivation,
    sharewin 8-rounding, optional merge) on the recorded inputs, then
    runs the real plan functions.  Returns (window_fills, staged_maps,
    inplace)."""
    import jax.numpy as jnp
    from slamrs_tpu.ops.fused import (_SHAREWIN_SLOTS,
                                      merge_segment_windows,
                                      shared_window_plan,
                                      staged_lineage_plan, window_rows)
    from slamrs_tpu.ops.grid import ADDITIONAL_STEPS, GridSpec2D

    spec = GridSpec2D(-2.0, -2.0, 4.0, 4.0, 0.02)
    rows = spec.rows
    cols = (spec.cols + 127) // 128 * 128
    max_range_m = 1.0
    wr = window_rows(spec, max_range_m)
    wr = min(wr, rows - rows % 8 if rows % 8 else rows)
    if wrplus:
        wr = min(wr + wrplus, rows - rows % 8 if rows % 8 else rows)
    import math
    disc_half = (int(math.ceil(max_range_m / spec.resolution))
                 + ADDITIONAL_STEPS + 1)
    wc = cols if (cols <= 256 or disc_half > 64) else 256

    anc = jnp.asarray(anc, jnp.int32)
    poses = jnp.asarray(poses, jnp.float32)
    pos0 = jnp.array([spec.position_x, spec.position_y], jnp.float32)
    cxy = (poses[:, 0:2] - pos0) / spec.resolution
    r0 = jnp.round(cxy[:, 1]).astype(jnp.int32) - wr // 2
    r0 = jnp.clip(r0, 0, max(rows - wr, 0))
    r0 = (r0 // 8) * 8
    ccol = jnp.round(cxy[:, 0]).astype(jnp.int32)
    blk = ccol // 128
    c0 = (blk - jnp.where(ccol % 128 < 64, 1, 0)) * 128
    c0 = jnp.clip(c0, 0, max(cols - wc, 0))
    u0 = jnp.clip(ccol - c0 - 64, 0, wc - 128)
    u0 = jnp.clip((u0 + 4) // 8 * 8, 0, wc - 128)  # sharewin rounding
    if merge:
        r0, u0 = merge_segment_windows(anc, r0, u0, cxy, disc_half, wr,
                                       spec.rows, spec.cols)
    spos, _usrc, cnt = staged_lineage_plan(anc)
    _wsel, wfill = shared_window_plan(spos, r0, u0, _SHAREWIN_SLOTS)
    return (int(jnp.sum(wfill)), int(cnt[0]), int(jnp.sum(spos < 0)))


def stats(xs):
    xs = sorted(xs)
    n = len(xs)
    return (f"n={n} mean={sum(xs)/max(n,1):.1f} med={xs[n//2]} "
            f"p90={xs[int(n*0.9)]} max={xs[-1]}") if n else "n=0"


def run_fills() -> None:
    import numpy as np
    if not os.path.exists(REC_NPZ):
        run_record()
    rec = np.load(REC_NPZ)
    anc, poses = rec["anc"], rec["poses"]
    variants = [("merge OFF       ", dict(merge=False, wrplus=0)),
                ("merge ON        ", dict(merge=True, wrplus=0)),
                ("merge ON  wr+8  ", dict(merge=True, wrplus=8)),
                ("merge ON  wr+16 ", dict(merge=True, wrplus=16)),
                ("merge ON  wr+24 ", dict(merge=True, wrplus=24))]
    for label, kw in variants:
        rows = [plan_sizes(anc[i], poses[i], **kw)
                for i in range(anc.shape[0])]
        print(f"{label}: fills   {stats([r[0] for r in rows])}")
        print(f"{label}: staged  {stats([r[1] for r in rows])}")
    # cross-check the replicated placement math against fused_update's
    # own DEBUG_GROUPS prints from the recording run (same frames)
    pj = REC_NPZ + ".printed.json"
    if os.path.exists(pj):
        printed = json.load(open(pj))
        ours = sorted(plan_sizes(anc[i], poses[i])[0]
                      for i in range(anc.shape[0]))
        theirs = sorted(f for f, _ in printed)
        print("cross-check (merge ON fills, sorted): "
              + ("MATCH" if ours == theirs else
                 f"MISMATCH ours={ours[:5]}.. theirs={theirs[:5]}.."))


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("fills", "all"):
        run_fills()
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
