"""Simulator semantics tests (sim.rs:96-220 parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slamrs_tpu.core import motion
from slamrs_tpu.core.types import Command
from slamrs_tpu.models import simulator as S


def box_scene():
    return S.Scene.build(rects=[(-1, -1, 2, 2)],
                         landmarks=[(0.5, 0.0), (5.0, 5.0)])


def test_motion_model_exact():
    # sim.rs:214-220: theta += (sr-sl)/base, then advance along NEW theta
    pose = jnp.array([1.0, 2.0, 0.5])
    sl, sr, base = 0.02, 0.04, 0.1
    out = np.asarray(motion.integrate_exact(pose, sl, sr, base))
    theta = 0.5 + (sr - sl) / base
    sbar = (sr + sl) / 2
    np.testing.assert_allclose(
        out, [1.0 + sbar * np.cos(theta), 2.0 + sbar * np.sin(theta), theta],
        rtol=1e-6)


def test_lidar_scan_semantics():
    scan = S.lidar_scan(jnp.zeros(3), box_scene(), jnp.float32(1.5))
    # inside a unit box with 1.5 m range: every beam hits and is valid
    assert bool(scan.present.all()) and bool(scan.valid.all())
    # distance along +x is exactly 1.0
    assert float(scan.distances[0]) == pytest.approx(1.0, abs=1e-5)
    assert float(scan.distances[45]) == pytest.approx(np.sqrt(2), abs=1e-4)

    # short range: hits beyond range are clamped + invalid (sim.rs:150-156)
    scan2 = S.lidar_scan(jnp.zeros(3), box_scene(), jnp.float32(0.5))
    assert bool(scan2.present.all())
    assert not bool(scan2.valid.any())
    np.testing.assert_allclose(np.asarray(scan2.distances), 0.5, atol=1e-6)


def test_lidar_miss_is_absent():
    # no geometry westward: scene with one east wall only
    scene = S.Scene.build(lines=[(1.0, -5.0, 1.0, 5.0)])
    scan = S.lidar_scan(jnp.zeros(3), scene, jnp.float32(10.0))
    assert bool(scan.present[0])  # +x hits the wall
    assert not bool(scan.present[180])  # -x misses entirely


def test_landmark_range_gate_uses_squared_distance():
    # sim.rs:182-184 compares dist_sq against (non-squared) range — kept.
    scene = S.Scene.build(landmarks=[(0.9, 0.0), (1.05, 0.0)])
    params = S.SimParams.make(scanner_range=1.0, angle_uncertainty=0.0,
                              distance_uncertainty=0.0)
    lm = S.landmark_scan(jax.random.key(0), jnp.zeros(3), scene, params)
    valid = np.asarray(lm.valid)
    assert valid[0] and not valid[1]  # 0.81 <= 1.0 < 1.1025
    assert float(lm.distances[0]) == pytest.approx(0.9, abs=1e-5)
    assert int(lm.association[0]) == 0


def test_scan_timer_cadence():
    # update_period=0.2, dt=1/30: fires at ticks 7, 13, 19, 25... (the
    # reference accumulator's 7-6-6 pattern)
    params = S.SimParams.make(update_period=0.2)
    scene = box_scene()
    state = S.SimState.init()
    fired_at = []
    key = jax.random.key(0)
    for i in range(1, 26):
        key, k = jax.random.split(key)
        state, out = S.tick(state, Command.make(0.0, 0.0), k, params, scene)
        if bool(out.fired):
            fired_at.append(i)
    assert fired_at == [7, 13, 19, 25]


def test_odometry_accumulates_between_scans():
    params = S.SimParams.make(update_period=0.2, wheel_base=0.1)
    scene = box_scene()
    state = S.SimState.init()
    key = jax.random.key(0)
    cmd = Command.make(0.03, 0.06)
    total_l = 0.0
    for i in range(1, 8):
        key, k = jax.random.split(key)
        state, out = S.tick(state, cmd, k, params, scene)
        total_l += 0.03 / 30.0
    assert bool(out.fired)
    assert float(out.odometry.distance_left) == pytest.approx(total_l,
                                                              rel=1e-4)
    # accumulator resets after the scan
    assert float(state.wheel_accum_left) == 0.0


def test_batched_worlds():
    params = S.SimParams.make()
    scene = box_scene()
    state = S.SimState.init((4,))
    cmd = Command(jnp.full((4,), 0.05), jnp.full((4,), 0.08))
    state, out = S.tick(state, cmd, jax.random.key(0), params, scene)
    assert state.pose.shape == (4, 3)
    assert out.scan.distances.shape == (4, 360)
    assert out.landmarks.angles.shape == (4, 2)
