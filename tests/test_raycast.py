"""Ray/segment intersection tests.

Mirrors simulator/src/scene/ray.rs:174-223 (made assertive) plus edge
cases: parallel rays, behind-origin hits, masking, closest-hit selection.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from slamrs_tpu.ops import raycast as rc


def seg(x1, y1, x2, y2):
    return jnp.array([[x1, y1, x2, y2]], jnp.float32)


# NO_HIT is a python float (1e30); the kernel returns its float32
# rounding, so compare against the f32 value.
NO_HIT_F32 = float(np.float32(rc.NO_HIT))


def test_simple_intersection():
    # ray.rs:179-196: ray (0,0)->(1,1) vs segment (1,2)-(2,-2)
    u = rc.segment_intersect(jnp.array([0.0, 0.0]),
                             jnp.array([1.0, 1.0]), seg(1.0, 2.0, 2.0, -2.0))
    # intersection point at u*(1,1) on the segment
    u = float(u[0])
    assert u < rc.NO_HIT
    p = np.array([u, u])
    # verify the point lies on the segment: param t in [0,1]
    t = (p[0] - 1.0) / (2.0 - 1.0)
    assert 0.0 <= t <= 1.0
    np.testing.assert_allclose(p[1], 2.0 + t * (-4.0), atol=1e-5)


def test_scene_min_u():
    # ray.rs:198-222: two segments, closest hit wins
    segs = jnp.array([[2.0, 2.0, 2.0, -2.0],
                      [1.0, 2.0, 2.0, -2.0]], jnp.float32)
    dist, hit = rc.raycast(jnp.array([0.0, 0.0]), jnp.array([0.0]), segs)
    assert bool(hit[0])
    assert float(dist[0]) == pytest.approx(1.5, abs=1e-5)


def test_parallel_ray_misses():
    u = rc.segment_intersect(jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]),
                             seg(0.0, 1.0, 5.0, 1.0))
    assert float(u[0]) == NO_HIT_F32


def test_behind_origin_is_no_hit():
    # u > 0 strict (ray.rs:78)
    u = rc.segment_intersect(jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]),
                             seg(-1.0, -1.0, -1.0, 1.0))
    assert float(u[0]) == NO_HIT_F32


def test_segment_bounds():
    # t must lie within [0, 1]: ray passes beyond the segment end
    u = rc.segment_intersect(jnp.array([0.0, 5.0]), jnp.array([1.0, 0.0]),
                             seg(2.0, 0.0, 2.0, 1.0))
    assert float(u[0]) == NO_HIT_F32


def test_mask_excludes_padded_segments():
    segs = jnp.array([[1.0, -1.0, 1.0, 1.0],
                      [0.5, -1.0, 0.5, 1.0]], jnp.float32)
    mask = jnp.array([True, False])
    dist, hit = rc.raycast(jnp.array([0.0, 0.0]), jnp.array([0.0]), segs,
                           mask)
    assert float(dist[0]) == pytest.approx(1.0, abs=1e-6)


def test_batched_fan():
    # 4 beams from origin inside a unit box
    segs = jnp.array([[1, -1, 1, 1], [-1, -1, -1, 1],
                      [-1, 1, 1, 1], [-1, -1, 1, -1]], jnp.float32)
    angles = jnp.deg2rad(jnp.array([0.0, 90.0, 180.0, 270.0]))
    dist, hit = rc.raycast(jnp.zeros(2), angles, segs)
    assert bool(hit.all())
    np.testing.assert_allclose(np.asarray(dist), 1.0, atol=1e-5)
