"""Benchmark: fused sim+SLAM throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline config (BASELINE.json): 360-beam lidar + RBPF occupancy-grid
SLAM with 1,024 particles, full pipeline every step (motion sampling,
per-particle likelihood gather, DDA scatter integrate, systematic
resample with map gather).  ``vs_baseline`` is value / 10,000 steps/s
(the driver-set target; the Rust reference publishes no numbers and runs
single-threaded at a 30 Hz wall clock — see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def bench_grid_slam(particles: int = 1024, width: float = 4.0,
                    resolution: float = 0.02, num_beams: int = 360,
                    steps: int = 100, warmup: int = 0) -> float:
    from slamrs_tpu.core.types import Command
    from slamrs_tpu.graph.compile import make_fused
    from slamrs_tpu.models.gridslam import GridSlamConfig
    from slamrs_tpu.models.simulator import SimParams

    grid_cfg = GridSlamConfig(
        position_x=-width / 2, position_y=-width / 2, width=width,
        height=width, resolution=resolution, n_particles=particles,
        max_scan_range=1.0, integrate="dense")
    fw = make_fused(params=SimParams.make(update_period=0.0),
                    grid_config=grid_cfg, num_beams=num_beams)
    state = fw.init()

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def run(state, key, n):
        def body(carry, k):
            s, _ = fw.step(carry, Command(jnp.float32(0.05),
                                          jnp.float32(0.08)), k)
            return s, None
        keys = jax.random.split(key, n)
        state, _ = jax.lax.scan(body, state, keys)
        return state

    # warmup / compile with the SAME static trip count as the measured run
    del warmup
    state_w = run(state, jax.random.key(1), steps)
    jax.block_until_ready(state_w)

    t0 = time.perf_counter()
    out = run(state, jax.random.key(2), steps)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return steps / dt


def main() -> None:
    steps_per_s = bench_grid_slam()
    print(json.dumps({
        "metric": "sim+SLAM steps/sec (360-beam lidar, 1024 particles, "
                  "RBPF grid SLAM, one chip)",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 10000.0, 4),
    }))


if __name__ == "__main__":
    main()
