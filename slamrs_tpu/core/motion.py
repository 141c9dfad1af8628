"""Differential-drive odometry motion model as pure functions.

Parity surface: ``Odometry`` in slamrs/common/src/robot.rs:114-184 —
the exact noise law is reproduced:

* ``delta_center = (l + r) / 2``, ``delta_theta = (r - l) / wheel_base``
* ``center_std = (0.01 + |delta_center| * 0.05) / 2``
* ``theta_std  = radians(5) + 0.1 * |delta_theta|``
* ``sample``: draw theta' ~ N(theta + delta_theta, theta_std) first, then
  advance the position along the NEW heading by d ~ N(delta_center,
  center_std) (robot.rs:170-183 — note the reference also uses the sampled
  new theta for the cos/sin).
* ``log_prob``: density of the *unsigned* euclidean displacement under the
  center distribution times the density of the angle difference under the
  theta distribution (robot.rs:152-167; the reference knowingly uses pdf
  values as probabilities — kept, since PF weights only need relative
  values).

Every function broadcasts over arbitrary leading batch axes, so a single
call serves ``[worlds]`` or ``[worlds, particles]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slamrs_tpu.core import math as m

Array = jnp.ndarray

_MIN_CENTER_STD = 0.01
_CENTER_STD_RATE = 0.05
# Python float (not jnp) to keep package import free of backend init.
_THETA_STD_BASE = 5.0 * 3.141592653589793 / 180.0
_THETA_STD_RATE = 0.1


def deltas(distance_left: Array, distance_right: Array, wheel_base: Array):
    """(delta_center, delta_theta) per robot.rs:133-134."""
    delta_center = (distance_left + distance_right) * 0.5
    delta_theta = (distance_right - distance_left) / wheel_base
    return delta_center, delta_theta


def stds(delta_center: Array, delta_theta: Array):
    """(center_std, theta_std) per robot.rs:138-139."""
    center_std = (_MIN_CENTER_STD + jnp.abs(delta_center) * _CENTER_STD_RATE) * 0.5
    theta_std = _THETA_STD_BASE + _THETA_STD_RATE * jnp.abs(delta_theta)
    return center_std, theta_std


def sample(key: Array, pose: Array, distance_left: Array, distance_right: Array,
           wheel_base: Array, eps: tuple[Array, Array] | None = None) -> Array:
    """Draw a successor pose from the motion model (robot.rs:170-183).

    pose: f32[..., 3]; wheel inputs broadcast against pose's batch shape.
    ``eps`` optionally supplies the two standard-normal draws
    ``(eps_c, eps_t)`` (each of the broadcast batch shape, exactly the
    draws this function would make from ``key``) so rollouts can hoist
    the RNG out of the sequential step chain.
    """
    dc, dt = deltas(distance_left, distance_right, wheel_base)
    c_std, t_std = stds(dc, dt)
    batch = jnp.broadcast_shapes(pose.shape[:-1], jnp.shape(dc))
    if eps is None:
        k1, k2 = jax.random.split(key)
        eps_c = jax.random.normal(k1, batch, pose.dtype)
        eps_t = jax.random.normal(k2, batch, pose.dtype)
    else:
        eps_c, eps_t = eps
        eps_c = jnp.broadcast_to(eps_c, batch).astype(pose.dtype)
        eps_t = jnp.broadcast_to(eps_t, batch).astype(pose.dtype)
    center = dc + c_std * eps_c
    theta = pose[..., 2] + dt + t_std * eps_t
    x = pose[..., 0] + jnp.cos(theta) * center
    y = pose[..., 1] + jnp.sin(theta) * center
    return jnp.stack([x, y, theta], axis=-1)


def log_prob(initial_pose: Array, new_pose: Array, distance_left: Array,
             distance_right: Array, wheel_base: Array) -> Array:
    """Log "probability" (really: log pdf product) of a transition.

    Parity: Odometry::probabiliy_of (robot.rs:152-167): the center factor is
    evaluated at the unsigned displacement norm; the theta factor at
    angle_diff(initial.theta, new.theta).
    """
    dc, dt = deltas(distance_left, distance_right, wheel_base)
    c_std, t_std = stds(dc, dt)
    center_distance = jnp.sqrt(
        (initial_pose[..., 0] - new_pose[..., 0]) ** 2
        + (initial_pose[..., 1] - new_pose[..., 1]) ** 2
    )
    angle_distance = m.angle_diff(initial_pose[..., 2], new_pose[..., 2])
    return m.normal_logpdf(center_distance, dc, c_std) + m.normal_logpdf(
        angle_distance, dt, t_std
    )


def integrate_exact(pose: Array, sl: Array, sr: Array, wheel_base: Array) -> Array:
    """Noise-free differential-drive kinematic update.

    Parity: Simulator::motion_model (simulator/src/sim.rs:214-220):
    theta += (sr - sl)/base; then x,y advance along the NEW theta by the
    mean wheel travel.  sl/sr are wheel travel distances for this tick.
    """
    sbar = (sr + sl) * 0.5
    theta = pose[..., 2] + (sr - sl) / wheel_base
    x = pose[..., 0] + sbar * jnp.cos(theta)
    y = pose[..., 1] + sbar * jnp.sin(theta)
    return jnp.stack([x, y, theta], axis=-1)
