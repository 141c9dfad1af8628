"""Long-horizon committed gates (VERDICT r2 #5).

The short parity/deviation tests (tests/test_parity.py: 6 updates,
3 Neato frames; tests/test_path_deviation.py: 6 updates) gate the math;
these gate the long-run claims previously only cited in comments
(ops/grid.py LOGODDS_CLAMP note, README stability numbers):

* the FULL out.bin capture (71 frames) through the DDA path vs the
  line-by-line oracle, and
* a 500-update fused-vs-DDA rollout with bounded pose deviation and
  ground-truth tracking error.

Runtime is ~1-2 minutes (the oracle is deliberately pure python), so the
module is gated behind ``SLAMRS_LONGRUN=1`` — run via ``make longrun``.
Each test prints its measured values; thresholds gate regressions, not
noise (recorded run: oracle parity exact over all 71 frames; 500-update
map agreement 0.825 bf16-fused vs f32-dda).
"""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slamrs_tpu.core import motion
from slamrs_tpu.core.types import OdometryReading, Scan
from slamrs_tpu.models import gridslam as gs
from slamrs_tpu.models import simulator as sim_model

DATA = Path("/root/reference/slamrs/baseui/data")

pytestmark = pytest.mark.skipif(
    not os.environ.get("SLAMRS_LONGRUN"),
    reason="long-horizon gates: set SLAMRS_LONGRUN=1 (make longrun)")


@pytest.mark.skipif(not DATA.exists(), reason="reference recordings absent")
def test_longrun_neato_full_capture_oracle_parity():
    """All 71 out.bin frames through the DDA parity path vs the oracle —
    the same gates as tests/test_parity.py held over the whole capture."""
    import parity_oracle as oracle
    from slamrs_tpu.io.neato import load_neato_binary

    frames = load_neato_binary(DATA / "out.bin")
    assert len(frames) == 71
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

    def scan_dict(scan):
        return {"angles": np.asarray(scan.angles, np.float64),
                "distances": np.asarray(scan.distances, np.float64),
                "valid": np.asarray(scan.valid),
                "present": np.asarray(scan.present)}

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
        orc.update(scan_dict(scan), 0.0, 0.0, 0.2,
                   np.asarray(sampled, np.float64), r)
        np.testing.assert_allclose(
            np.asarray(out.pose, np.float64), orc.best_pose, atol=1e-3,
            err_msg=f"best pose diverges at frame {t}/71")

    grids_impl = np.asarray(state.grids, np.float64)
    grids_orc = np.stack([m.odds for m in orc.maps])
    delta = np.abs(grids_impl - grids_orc)
    agree = (delta <= 5e-3).mean()
    assert agree >= 0.999, f"occupancy-cell agreement {agree}"
    touched = np.abs(grids_orc) > 1e-6
    cls = (np.sign(grids_impl[touched]) == np.sign(grids_orc[touched]))
    assert cls.mean() >= 0.999, f"classification agreement {cls.mean()}"


def _drive(t):
    """Varied drive plan: arcs both ways + straights, staying in-bounds."""
    phase = (t // 40) % 4
    return [(0.004, 0.0065), (0.006, 0.006), (0.0065, 0.004),
            (0.005, 0.005)][phase]


def _rollout_longrun(integrate: str, T: int, p: int = 8, seed: int = 7,
                     grid_dtype: str = "float32"):
    cfg = gs.GridSlamConfig(position_x=-2.0, position_y=-2.0, width=4.0,
                            height=4.0, resolution=0.05, n_particles=p,
                            max_scan_range=1.0, integrate=integrate,
                            resample_neff_frac=0.5, grid_dtype=grid_dtype)
    scene = sim_model.Scene.build(
        rects=[(-1.0, -1.0, 2.0, 2.0), (-0.1, -0.4, 0.5, 0.1),
               (-0.6, 0.4, 0.2, 0.5)],
        lines=[(-0.6, -0.4, 0.2, 0.4)])
    state = gs.GridSlamState.init(cfg)
    pose = jnp.zeros(3)
    key = jax.random.key(seed)

    upd = jax.jit(lambda st, sc, od, k: gs.update(st, sc, od, k, cfg))
    scan_fn = jax.jit(lambda q: sim_model.lidar_scan(q, scene, 1.0, 360))

    best, true = [], []
    for t in range(T):
        sl, sr = _drive(t)
        pose = motion.integrate_exact(pose, jnp.float32(sl),
                                      jnp.float32(sr), 0.1)
        scan = scan_fn(pose)
        odo = OdometryReading(jnp.float32(sl), jnp.float32(sr),
                              jnp.float32(0.1))
        key, k = jax.random.split(key)
        state, out = upd(state, scan, odo, k)
        best.append(np.asarray(out.pose))
        true.append(np.asarray(pose))
    prob = gs.estimated_probability_grid(state, cfg)
    return np.stack(best), np.stack(true), np.asarray(prob, np.float32)


def test_longrun_fused_vs_dda_500_updates():
    """500 consecutive scan updates: the fused Pallas path must stay
    within rasterization-noise deviation of the exact DDA path, and BOTH
    must track ground truth.  Recorded run at seed 7 (printed for
    re-recording): dda tail drift 86.1 mm, fused 98.6 mm, path RMSE
    76.1 mm, map agreement 0.825.  Tail drift is CHAOTIC, not a path
    property — a 5-seed study (seeds 3/5/7/11/13) measured dda
    86-317 mm (mean 175) vs fused 34-387 mm (mean 166), fully
    overlapping distributions — so the thresholds gate divergence
    blow-ups at the pinned seed, not mm-level quality shifts."""
    T = 500
    best_d, true_d, grid_d = _rollout_longrun("dda", T)
    best_f, true_f, grid_f = _rollout_longrun("fused", T,
                                              grid_dtype="bfloat16")
    np.testing.assert_allclose(true_d, true_f)  # identical ground truth

    # both paths keep tracking over the full horizon
    err_d = np.linalg.norm(best_d[:, :2] - true_d[:, :2], axis=1)
    err_f = np.linalg.norm(best_f[:, :2] - true_f[:, :2], axis=1)

    # path-vs-path deviation stays at rasterization-noise level
    rmse = float(np.sqrt(((best_f[:, :2] - best_d[:, :2]) ** 2).mean()))

    # final maps classify the world consistently (bf16 fused vs f32 dda:
    # saturated-cell freezing makes mature cells differ near boundaries)
    def cls(g):
        return np.where(g > 0.6, 1, np.where(g < 0.4, -1, 0))
    a, b = cls(grid_d), cls(grid_f[:grid_d.shape[0], :grid_d.shape[1]])
    touched = (a != 0) | (b != 0)
    agree = float((a[touched] == b[touched]).mean())

    print(f"longrun 500: dda tail drift {err_d[-100:].mean() * 1000:.1f} mm"
          f", fused {err_f[-100:].mean() * 1000:.1f} mm, path RMSE "
          f"{rmse * 1000:.1f} mm, map agreement {agree:.3f}")
    assert err_d[-100:].mean() <= 0.10, f"dda drift {err_d[-100:].mean()}"
    assert err_f[-100:].mean() <= 0.15, f"fused drift {err_f[-100:].mean()}"
    assert rmse <= 0.10, f"fused-vs-dda trajectory RMSE {rmse:.4f} m"
    assert agree >= 0.80, f"occupancy agreement {agree:.3f}"


@pytest.mark.skipif(not DATA.exists(), reason="reference recordings absent")
def test_longrun_neato_capture_fused_vs_dda():
    """All 98 out2.bin frames (the reference's own long-range capture,
    scans out to 5.4 m) through ``integrate="fused"`` vs ``"dda"``
    under identical injected randomness.

    This is the data that actually triggers the fused kernel's one
    documented semantic deviation (ops/fused.py module docstring): a
    valid beam whose endpoint lies beyond the kernel window — here the
    window spans the whole 8x8 m grid, so beyond-the-grid endpoints —
    contributes neither free-space carving nor likelihood, while DDA
    carves the in-grid prefix of the ray.  The printed off-grid beam
    fraction proves the condition fires; the bounds gate that the net
    effect stays at rasterization-noise level (VERDICT r3 #5).

    Recorded run (seed 11): off-grid beam fraction 0.029, pose
    deviation mean 16.9 mm / max 47.9 mm, map agreement 0.850.
    """
    from slamrs_tpu.io.neato import load_neato_binary

    frames = load_neato_binary(DATA / "out2.bin")
    assert len(frames) == 98
    odo = OdometryReading(jnp.float32(0.0), jnp.float32(0.0),
                          jnp.float32(0.2))

    def run(integrate):
        cfg = gs.GridSlamConfig(position_x=-4.0, position_y=-4.0,
                                width=8.0, height=8.0, resolution=0.05,
                                n_particles=8, max_scan_range=5.0,
                                integrate=integrate,
                                resample_neff_frac=0.5)
        state = gs.GridSlamState.init(cfg)
        key = jax.random.key(11)
        upd = jax.jit(lambda st, sc, k: gs.update(st, sc, odo, k, cfg))
        best = []
        for f in frames:
            angles, dist, strength, valid, present = f.to_scan_arrays()
            scan = Scan(jnp.asarray(angles), jnp.asarray(dist),
                        jnp.asarray(strength), jnp.asarray(valid),
                        jnp.asarray(present))
            key, k = jax.random.split(key)
            state, out = upd(state, scan, k)
            best.append(np.asarray(out.pose))
        prob = gs.estimated_probability_grid(state, cfg)
        return np.stack(best), np.asarray(prob, np.float32)

    best_d, grid_d = run("dda")
    best_f, grid_f = run("fused")

    # the deviation condition must actually fire: fraction of valid
    # beams whose endpoint lands outside the 8x8 m grid
    offgrid, valid_total = 0, 0
    for t, f in enumerate(frames):
        angles, dist, _, valid, present = f.to_scan_arrays()
        ok = np.asarray(valid) & np.asarray(present)
        x = best_d[t, 0] + np.asarray(dist) * np.cos(best_d[t, 2]
                                                     + np.asarray(angles))
        y = best_d[t, 1] + np.asarray(dist) * np.sin(best_d[t, 2]
                                                     + np.asarray(angles))
        out_b = (x < -4.0) | (x >= 4.0) | (y < -4.0) | (y >= 4.0)
        offgrid += int((ok & out_b).sum())
        valid_total += int(ok.sum())
    frac = offgrid / max(valid_total, 1)

    dev = np.linalg.norm(best_f[:, :2] - best_d[:, :2], axis=1)

    def cls(g):
        return np.where(g > 0.6, 1, np.where(g < 0.4, -1, 0))
    a, b = cls(grid_d), cls(grid_f)
    touched = (a != 0) | (b != 0)
    agree = float((a[touched] == b[touched]).mean())

    print(f"capture fused-vs-dda: off-grid beam frac {frac:.3f}, "
          f"pose dev mean {dev.mean() * 1000:.1f} mm / max "
          f"{dev.max() * 1000:.1f} mm, map agreement {agree:.3f}")
    assert frac > 0.0, "capture never exercises the out-of-window path"
    assert dev.mean() <= 0.10, f"mean fused-vs-dda deviation {dev.mean()}"
    assert agree >= 0.80, f"occupancy agreement {agree:.3f}"
