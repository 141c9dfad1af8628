"""Benchmarks: sim+SLAM throughput on one chip, across the BASELINE matrix.

Prints ONE JSON line (the headline metric) to stdout; the full config
matrix goes to stderr and BENCH_DETAIL.json.

Headline: full sim+RBPF-SLAM pipeline ticks/s at the reference's own
operating point — 30 Hz ticks with the lidar firing every
``update_period = 0.2 s`` (the simulator default, sim.rs:56), 360 beams,
1,024 particles, 4x4 m world at the 0.05 m cell size of BASELINE configs
2-3, N_eff-gated systematic resampling.  Every tick runs the diff-drive
integrator, accumulators and timers; each scan tick additionally runs
the full RBPF update (motion sampling, fused likelihood+integrate Pallas
kernel, resampling policy) for all 1,024 particles.  The matrix also
reports the harder every-tick-scan variant and the other BASELINE
configs.

Timing is honest against this machine's TPU tunnel:
``jax.block_until_ready`` does NOT reliably block through the remote
runtime, so every measurement fetches a value derived from the full
computation and uses marginal cost between two scan lengths (per-execution
RPC overhead is tens of ms and cancels in the difference).
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

TARGET = 10_000.0


def ticks_per_frame(update_period: float, n: int = 1050) -> float:
    """Average ticks per scan frame at a cadence: replicates
    rollout_cadence's f32 accumulator unroll (the true value is NOT
    period/dt — f32 rounding + remainder carry make 0.2 s ~6.7, not 6)."""
    if update_period <= 0:
        return 1.0
    import numpy as np

    timer, fired = np.float32(0.0), 0
    for _ in range(n):
        timer = np.float32(timer + np.float32(1.0 / 30.0))
        if timer > np.float32(update_period):
            fired += 1
            timer = np.float32(timer - np.float32(update_period))
    return n / max(fired, 1)


def _marginal(make_run, state, n1, n2, reps=3):
    """Marginal seconds/step between two jitted scan lengths.

    MEDIAN of the per-rep differences, not min: a single anomalously
    slow short run makes (tb - ta) too small, and min-of-reps AMPLIFIES
    that into a 2x+ too-fast reading (observed 41.8k vs a stable
    ~17.5k headline through the tunnel); the median is robust to one
    outlier on either side."""
    r1, r2 = make_run(n1), make_run(n2)
    float(r1(state, jax.random.key(1)))
    float(r2(state, jax.random.key(1)))
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(state, jax.random.key(2)))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(r2(state, jax.random.key(2)))
        tb = time.perf_counter() - t0
        diffs.append((tb - ta) / (n2 - n1))
    diffs.sort()
    return max(diffs[len(diffs) // 2], 1e-9)


def bench_grid_slam(particles=1024, width=4.0, resolution=0.05,
                    num_beams=360, update_period=0.2, neff=0.5,
                    integrate="fused", grid_dtype="bfloat16",
                    resample_cow=None, n1=50, n2=2050, reps=3):
    from slamrs_tpu.core.types import Command
    from slamrs_tpu.graph.compile import make_fused
    from slamrs_tpu.models.gridslam import GridSlamConfig
    from slamrs_tpu.models.simulator import SimParams

    grid_cfg = GridSlamConfig(
        position_x=-width / 2, position_y=-width / 2, width=width,
        height=width, resolution=resolution, n_particles=particles,
        max_scan_range=1.0, resample_neff_frac=neff, integrate=integrate,
        grid_dtype=grid_dtype, resample_cow=resample_cow)
    fw = make_fused(params=SimParams.make(update_period=update_period),
                    grid_config=grid_cfg, num_beams=num_beams)
    state = fw.init()

    def make_run(n):
        cmds = Command(jnp.full((n,), 0.05, jnp.float32),
                       jnp.full((n,), 0.08, jnp.float32))

        @jax.jit
        def run(state, key):
            if update_period > 0:
                c, outs = fw.rollout_cadence(state, n, seed=0, commands=cmds,
                                             initial_timer=0.0)
            else:
                c, outs = fw.rollout(state, n, seed=0, commands=cmds)
            return (jnp.sum(outs.n_eff) + jnp.float32(c.grid.grids[0, 0, 0])
                    + c.pose[0])
        return run

    dt = _marginal(make_run, state, n1, n2, reps=reps)
    return 1.0 / dt


def bench_icp(batch=2048, beams=360, iterations=10, n1=5, n2=55):
    """ICP iterations/sec per chip (BASELINE config 1 half-metric):
    batched point-to-normal scan matching, 10 iterations per solve."""
    import numpy as np

    from slamrs_tpu.ops.icp import icp_point_to_normal

    rng = np.random.default_rng(0)
    ang = np.linspace(0, 2 * np.pi, beams, endpoint=False)
    q = np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
    q = q * rng.uniform(0.5, 1.0, (beams, 1)).astype(np.float32)
    qb = jnp.asarray(np.tile(q[None], (batch, 1, 1)))
    # p = q rotated/translated a little, per problem
    dx = rng.uniform(-0.05, 0.05, (batch, 1, 2)).astype(np.float32)
    pb = jnp.asarray(q[None] + dx)
    mask = jnp.ones((batch, beams), bool)
    count = jnp.full((batch,), beams, jnp.int32)
    x0 = jnp.zeros((batch, 3), jnp.float32)

    def make_run(n):
        @jax.jit
        def run(_, key):
            def body(c, k):
                res = jax.vmap(lambda p, m, q, qc, x: icp_point_to_normal(
                    p, m, q, qc, x, iterations=iterations))(
                        pb + c * 1e-6, mask, qb, count, x0)
                return c + 1e-7, jnp.sum(res.transformation)
            c, outs = jax.lax.scan(body, jnp.float32(key[0] if False else 0.0),
                                   jax.random.split(key, n))
            return jnp.sum(outs) + c
        return run

    dt = _marginal(make_run, jnp.float32(0.0), n1, n2)
    return batch * iterations / dt


def bench_fleet(worlds=256, particles=10, width=4.0, resolution=0.02,
                update_period=0.2, integrate="fused", n1=20, n2=220):
    """BASELINE config 5: vmapped raycast+SLAM rollouts over 256 worlds
    (fused kernel batches over worlds x particles; grids stream HBM
    windows under vmap)."""
    from slamrs_tpu.core.types import Command
    from slamrs_tpu.graph.compile import make_fused
    from slamrs_tpu.models.gridslam import GridSlamConfig
    from slamrs_tpu.models.simulator import SimParams

    grid_cfg = GridSlamConfig(
        position_x=-width / 2, position_y=-width / 2, width=width,
        height=width, resolution=resolution, n_particles=particles,
        max_scan_range=1.0, resample_neff_frac=0.5, integrate=integrate)
    fw = make_fused(params=SimParams.make(update_period=update_period),
                    grid_config=grid_cfg)
    state = fw.init((worlds,))

    def make_run(n):
        @jax.jit
        def run(state, key):
            def body(c, k):
                s, outs = fw.step(
                    c, Command(jnp.float32(0.05), jnp.float32(0.08)), k)
                return s, jnp.sum(outs.n_eff)
            keys = jax.random.split(key, n)
            c, neffs = jax.lax.scan(body, state, keys)
            return (jnp.sum(neffs) + jnp.float32(c.grid.grids[0, 0, 0, 0])
                    + c.pose[0, 0])
        return run

    dt = _marginal(make_run, state, n1, n2)
    return worlds / dt  # world-ticks per second


def bench_config3_cow_bandwidth(particles=1024, width=50.0,
                                resolution=0.05, dup_frac=0.5,
                                n1=5, n2=35):
    """Config 3 resample-write bound (VERDICT r3 #6): measured staged-CoW
    copy throughput on the real 2 GB map set.

    Crafts a resample plan with ``dup_frac`` duplicated maps (half as
    many unique sources — the staged kernel reads each unique source
    once and fans the writes out of VMEM), applies it repeatedly, and
    reports effective GB/s over the bytes actually moved.  Together with
    the neff=1.0-vs-0.0 step-time delta this turns the README's
    "irreducible without tile sharing" claim into numbers: the resample
    cost equals the copy DMA time at measured HBM throughput.
    """
    import numpy as np

    from slamrs_tpu.ops.cow import cow_copy, cow_plan

    rows = int(round(width / resolution))
    cols = (rows + 127) // 128 * 128
    map_bytes = rows * cols * 2
    k = int(particles * dup_frac)
    uniq = max(k // 2, 1)
    anc = np.arange(particles)
    anc[particles - k:] = np.arange(k) % uniq
    anc.sort()
    src, dst, n_copies = jax.jit(cow_plan)(jnp.asarray(anc, jnp.int32))
    assert int(n_copies) == k

    g0 = jnp.zeros((particles, rows, cols), jnp.bfloat16)

    def make_run(n):
        @jax.jit
        def run(g, key):
            def body(c, _):
                return cow_copy(c, src, dst, n_copies), jnp.float32(0.0)
            g2, _ = jax.lax.scan(body, g, None, length=n)
            return jnp.float32(g2[0, 0, 0]) + key[0] * 0.0
        return run

    def mk(n):
        r = make_run(n)
        return lambda s, key: r(s, jnp.zeros((2,), jnp.float32))

    dt = _marginal(mk, g0, n1, n2)
    bytes_moved = (k + uniq) * map_bytes  # writes + deduped reads
    return bytes_moved / dt / 1e9, k * map_bytes / 1e6


def _require_responsive_backend(timeout_s: int = 240) -> None:
    """Fail FAST (rc 3, no stdout) when the TPU backend hangs.

    The axon tunnel's failure mode is a client that blocks forever in
    backend init rather than erroring; a hung bench gives the driver a
    timeout with no diagnosis.  Probe from a SUBPROCESS (an in-process
    SIGALRM can't interrupt a blocked extension call) and exit with a
    clear message instead.  Skipped on the CPU backend (tests)."""
    import os
    import subprocess

    # only an EXPLICIT cpu pin skips the probe: on this machine the TPU
    # backend is selected by the axon sitecustomize even when the env
    # var is unset, and a genuine CPU-only box answers the probe in ~2 s
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return
    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as j;"
             "print(float(j.sum(j.ones((8, 128)))))"],
            timeout=timeout_s, capture_output=True, check=True)
    except subprocess.TimeoutExpired:
        print(f"TPU backend unresponsive after {timeout_s}s (tunnel "
              "down?) — refusing to hang the bench", file=sys.stderr)
        sys.exit(3)
    except subprocess.CalledProcessError as e:
        print("TPU backend probe failed:\n"
              + e.stderr.decode(errors="replace")[-2000:], file=sys.stderr)
        sys.exit(3)


def main() -> None:
    headline_only = "--headline-only" in sys.argv
    detail = {}
    _require_responsive_backend()

    def note(name, value, unit):
        detail[name] = {"value": round(value, 2), "unit": unit}
        print(f"  {name}: {value:,.1f} {unit}", file=sys.stderr, flush=True)

    print("benchmarking (honest tunnel timing, marginal method)...",
          file=sys.stderr, flush=True)

    if "--config3-bound" in sys.argv:
        # one-off proof mode (results recorded in README/BENCH_DETAIL):
        # measured CoW copy bandwidth + the always-vs-never resample
        # step delta at the config 3 operating point
        bw, wbytes = bench_config3_cow_bandwidth()
        note("config3_cow_copy_bandwidth_GBps", bw, "GB/s")
        note("config3_resample_write_MB_at_50pct_dup", wbytes, "MB")
        v_never = bench_grid_slam(particles=1024, width=50.0,
                                  resolution=0.05, neff=0.0,
                                  grid_dtype="bfloat16", resample_cow=True,
                                  n1=10, n2=110)
        v_always = bench_grid_slam(particles=1024, width=50.0,
                                   resolution=0.05, neff=1.0,
                                   grid_dtype="bfloat16", resample_cow=True,
                                   n1=10, n2=110)
        note("config3_ticks_per_s_never_resample", v_never, "ticks/s")
        note("config3_ticks_per_s_always_resample", v_always, "ticks/s")
        r_us = (1.0 / v_always - 1.0 / v_never) * ticks_per_frame(0.2) * 1e6
        note("config3_resample_cost_us_per_scan_frame", r_us, "us")
        with open("BENCH_CONFIG3_BOUND.json", "w") as f:
            json.dump(detail, f, indent=1)
        print(json.dumps({"metric": "config3 bound probe", "value": bw,
                          "unit": "GB/s", "vs_baseline": 0}))
        return

    # ---- headline (bf16 log-odds grids: identical map quality to f32
    # vs the DDA oracle — 5.2 mm pose RMSE, 94.8% cell agreement — at
    # half the VMEM traffic; see tests/test_path_deviation.py).  Extra
    # reps: the tunnel occasionally produces one wild reading ----------
    headline = bench_grid_slam(reps=5)
    note("grid_slam_ticks_per_s_ref_cadence_1024p_0.05m", headline,
         "ticks/s")

    if not headline_only:
        try:
            # strict reference semantics: resample EVERY update
            # (slam.rs:74 has no N_eff gate) — the reference-faithful
            # number next to the gated headline (VERDICT r4 #7)
            v = bench_grid_slam(neff=1.0, n2=2050)
            note("grid_slam_ticks_per_s_ref_cadence_1024p_0.05m_always_resample",
                 v, "ticks/s")
        except Exception as e:
            print(f"  always-resample bench failed: {e}", file=sys.stderr)
        try:
            v = bench_grid_slam(grid_dtype="float32", n2=2050)
            note("grid_slam_ticks_per_s_ref_cadence_1024p_0.05m_f32", v,
                 "ticks/s")
        except Exception as e:
            print(f"  f32 bench failed: {e}", file=sys.stderr)
        try:
            # reps=5: round-target metric — tunnel noise must not decide
            # a 7% claim (CLAUDE.md: trust agreeing runs, not one)
            v = bench_grid_slam(update_period=0.0, n2=1050, reps=5)
            note("grid_slam_steps_per_s_scan_every_tick_1024p_0.05m", v,
                 "steps/s")
        except Exception as e:  # pragma: no cover
            print(f"  every-tick bench failed: {e}", file=sys.stderr)
        try:
            v = bench_grid_slam(resolution=0.02, grid_dtype="bfloat16",
                                n2=1050, reps=5)
            note("grid_slam_ticks_per_s_ref_cadence_1024p_0.02m_bf16", v,
                 "ticks/s")
        except Exception as e:
            print(f"  0.02m bench failed: {e}", file=sys.stderr)
        try:
            v = bench_grid_slam(particles=100, width=20.0, resolution=0.05,
                                grid_dtype="bfloat16", n2=1050)
            note("grid_slam_ticks_per_s_config2_100p_20m_0.05m", v,
                 "ticks/s")
        except Exception as e:
            print(f"  config2 bench failed: {e}", file=sys.stderr)
        try:
            # resample_cow=True pins the dense whole-map CoW formulation:
            # auto (None) now selects TILED storage at this geometry
            # (gridslam.auto_tiled — the 2 GB set is CoW-bandwidth-bound)
            # and this leg records the dense comparison point
            v = bench_grid_slam(particles=1024, width=50.0, resolution=0.05,
                                grid_dtype="bfloat16", resample_cow=True,
                                n1=10, n2=110)
            note("grid_slam_ticks_per_s_config3_1024p_50m_0.05m_2GB", v,
                 "ticks/s")
        except Exception as e:
            print(f"  config3 bench failed: {e}", file=sys.stderr)
        try:
            # config 3 with TILE-POOL maps (ops/tiles.py): resampling
            # relabels a band table; only written bands privatize
            v = bench_grid_slam(particles=1024, width=50.0, resolution=0.05,
                                grid_dtype="bfloat16", resample_cow="tiled",
                                n1=10, n2=110)
            note("grid_slam_ticks_per_s_config3_tiled_1024p_50m", v,
                 "ticks/s")
        except Exception as e:
            print(f"  config3 tiled bench failed: {e}", file=sys.stderr)
        try:
            # the exact reference-parity scatter path (fidelity gates run
            # on this formulation; see tests/test_parity.py)
            v = bench_grid_slam(integrate="dda", update_period=0.2,
                                n1=5, n2=35)
            note("grid_slam_ticks_per_s_dda_parity_path_1024p_0.05m", v,
                 "ticks/s")
        except Exception as e:
            print(f"  dda bench failed: {e}", file=sys.stderr)
        try:
            v = bench_icp()
            note("icp_iterations_per_s_batch2048", v, "iters/s")
        except Exception as e:
            print(f"  icp bench failed: {e}", file=sys.stderr)
        try:
            v = bench_fleet()
            note("fleet_world_ticks_per_s_256worlds_10p_0.02m", v,
                 "world-ticks/s")
        except Exception as e:
            print(f"  fleet bench failed: {e}", file=sys.stderr)

        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=1)

    print(json.dumps({
        "metric": "sim+SLAM pipeline ticks/sec (360-beam lidar, 1024 "
                  "particles, RBPF grid SLAM, reference scan cadence "
                  "update_period=0.2s, 4x4m @ 0.05m, one chip)",
        "value": round(headline, 2),
        "unit": "ticks/s",
        "vs_baseline": round(headline / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
