"""Occupancy-grid op tests: DDA traversal vs a pure-python port of the
reference iterator, inverse sensor model bands, integrate/likelihood
semantics, dense-vs-DDA agreement."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slamrs_tpu.models import simulator as S
from slamrs_tpu.ops import grid as g


def reference_grid_ray(x0, y0, x1, y1, size_x, size_y, additional_steps=2):
    """Pure-python port of GridRayIterator (slam/src/grid/ray.rs:5-111),
    used as the test oracle for traverse_ray."""
    dx, dy = abs(x1 - x0), abs(y1 - y0)
    x, y = int(math.floor(x0)), int(math.floor(y0))
    n = 1 + additional_steps
    if dx == 0.0:
        x_inc, error = 0, float("inf")
    elif x1 > x0:
        x_inc = 1
        n += int(math.floor(x1) - x)
        error = (math.floor(x0) + 1.0 - x0) * dy
    else:
        x_inc = -1
        n += x - int(math.floor(x1))
        error = (x0 - math.floor(x0)) * dy
    if dy == 0.0:
        y_inc = 0
        error -= float("inf")
    elif y1 > y0:
        y_inc = 1
        n += int(math.floor(y1)) - y
        error -= (math.floor(y0) + 1.0 - y0) * dx
    else:
        y_inc = -1
        n += y - int(math.floor(y1))
        error -= (y0 - math.floor(y0)) * dx

    cells = []
    while n > 0 and 0 <= x < size_x and 0 <= y < size_y:
        cells.append((x, y))
        if error > 0.0:  # NaN compares false, same as Rust
            y += y_inc
            error -= dx
        else:
            x += x_inc
            error += dy
        n -= 1
    return cells


@pytest.mark.parametrize("seed", range(8))
def test_traverse_matches_reference(seed):
    rng = np.random.RandomState(seed)
    x0, y0 = rng.uniform(0, 20, 2)
    x1, y1 = x0 + rng.uniform(-15, 15), y0 + rng.uniform(-15, 15)
    ref = reference_grid_ray(x0, y0, x1, y1, 20, 20)
    xs, ys, centers, mask = g.traverse_ray(x0, y0, x1, y1, 20, 20, 64)
    got = list(zip(np.asarray(xs)[np.asarray(mask)].tolist(),
                   np.asarray(ys)[np.asarray(mask)].tolist()))
    assert got == ref
    # centers are cell centers (+0.5)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(centers)[m][:, 0],
                               np.asarray(xs)[m] + 0.5)


def test_traverse_degenerate_same_cell():
    # start == end: 1 + additional_steps emissions of the same cell
    xs, ys, _, mask = g.traverse_ray(2.5, 3.5, 2.5, 3.5, 10, 10, 8)
    m = np.asarray(mask)
    assert m.sum() == 3  # 1 + ADDITIONAL_STEPS
    assert (np.asarray(xs)[m] == 2).all() and (np.asarray(ys)[m] == 3).all()


def test_inverse_sensor_model_bands():
    # map.rs:148-172: hit -> free below d-1, occupied within ±1, prior above
    ism = g.inverse_sensor_model_log_odds
    assert float(ism(5.0, 10.0, True)) == pytest.approx(g.L_FREE)
    assert float(ism(9.5, 10.0, True)) == pytest.approx(g.L_OCCUPIED)
    assert float(ism(10.5, 10.0, True)) == pytest.approx(g.L_OCCUPIED)
    assert float(ism(12.0, 10.0, True)) == pytest.approx(g.L_PRIOR)
    # miss -> free below measured, prior beyond
    assert float(ism(5.0, 10.0, False)) == pytest.approx(g.L_FREE)
    assert float(ism(10.5, 10.0, False)) == pytest.approx(g.L_PRIOR)


def _scan_one_beam(distance, valid=True):
    """Single-beam scan pointing along +x."""
    return dict(angles=jnp.zeros(1), distances=jnp.full((1,), distance),
                valid=jnp.array([valid]), present=jnp.array([True]))


def test_integrate_marks_free_and_occupied():
    spec = g.GridSpec2D(0.0, 0.0, 1.0, 1.0, 0.1)  # 10x10
    grid = spec.new_grid()
    beam = _scan_one_beam(0.55)
    pose = jnp.array([0.05, 0.55, 0.0])  # in cell (0, 5), beam along +x
    out = np.asarray(g.grid_integrate(grid, spec, pose, **beam,
                                      max_steps=spec.max_ray_steps(1.0)))
    row = out[5]
    assert (row[0:4] < 0).all()  # free along the beam
    assert row[5] > 0 or row[6] > 0  # occupied near the endpoint
    assert (out[0] == 0).all()  # untouched rows stay prior


def test_integrate_invalid_beam_is_free_space_only():
    spec = g.GridSpec2D(0.0, 0.0, 1.0, 1.0, 0.1)
    grid = spec.new_grid()
    beam = _scan_one_beam(1.0, valid=False)
    pose = jnp.array([0.05, 0.55, 0.0])
    out = np.asarray(g.grid_integrate(grid, spec, pose, **beam,
                                      max_steps=spec.max_ray_steps(1.0)))
    assert (out <= 0).all()  # no occupied cells anywhere
    assert (out[5, 0:8] < 0).all()  # free along the ray


def test_likelihood_untouched_is_uniform():
    # map.rs:134-140: untouched endpoint cell -> factor 1/maxdist == 1.0
    spec = g.GridSpec2D(0.0, 0.0, 1.0, 1.0, 0.1)
    grid = spec.new_grid()
    beam = _scan_one_beam(0.5)
    pose = jnp.array([0.05, 0.55, 0.0])
    ll = float(g.grid_log_likelihood(grid, spec, pose, **beam))
    assert ll == pytest.approx(0.0)  # log(1.0)


def test_likelihood_prefers_consistent_pose():
    spec = g.GridSpec2D(0.0, 0.0, 2.0, 2.0, 0.05)
    scene = S.Scene.build(rects=[(0.1, 0.1, 1.8, 1.8)])
    pose = jnp.array([1.0, 1.0, 0.3])
    scan = S.lidar_scan(pose, scene, 1.0)
    grid = g.grid_integrate(spec.new_grid(), spec, pose, scan.angles,
                            scan.distances, scan.valid, scan.present,
                            spec.max_ray_steps(1.0))
    ll_true = float(g.grid_log_likelihood(grid, spec, pose, scan.angles,
                                          scan.distances, scan.valid,
                                          scan.present))
    shifted = pose + jnp.array([0.12, -0.1, 0.05])
    ll_shift = float(g.grid_log_likelihood(grid, spec, shifted, scan.angles,
                                           scan.distances, scan.valid,
                                           scan.present))
    assert ll_true > ll_shift


def test_dense_matches_dda_classification():
    spec = g.GridSpec2D(-2.0, -2.0, 4.0, 4.0, 0.02)
    scene = S.Scene.build(rects=[(-1, -1, 2, 2), (-0.1, -0.4, 0.5, 0.1)],
                          lines=[(-0.6, -0.4, 0.2, 0.4)])
    pose = jnp.array([0.3, -0.2, 0.7])
    scan = S.lidar_scan(pose, scene, 1.0)
    kw = dict(angles=scan.angles, distances=scan.distances,
              valid=scan.valid, present=scan.present)
    gd = np.asarray(g.grid_integrate(spec.new_grid(), spec, pose, **kw,
                                     max_steps=spec.max_ray_steps(1.0)))
    ge = np.asarray(g.grid_integrate_dense(
        spec.new_grid(), spec, pose, **kw,
        window=g.dense_window_for(spec, 1.0)))
    touched = (gd != 0) | (ge != 0)
    cls = lambda a: np.where(a > 0.5, 1, np.where(a < -0.5, -1, 0))
    agreement = (cls(gd)[touched] == cls(ge)[touched]).mean()
    assert agreement > 0.95
