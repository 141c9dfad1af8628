"""Pure-python/numpy oracle of the reference SLAM core, for fidelity gates.

Line-by-line ports (no JAX) of:

* ``GridRayIterator``            slamrs/slam/src/grid/ray.rs:5-111
* ``inverse_sensor_model``       slamrs/slam/src/grid/map.rs:148-172
* ``Map::integrate``             map.rs:71-106
* ``Map::probability_of``        map.rs:113-145
* ``ParticleFilter::resample``   slamrs/slam/src/grid/particle.rs:78-105
* ``Odometry`` noise law + pdf   slamrs/common/src/robot.rs:131-167
* ``GridMapSlam::update``        slamrs/slam/src/grid/slam.rs:45-75
* ``icp_point_to_normal``        slamrs/slam/src/icp.rs:82-128 (brute-force
  NN instead of the kd-tree — identical correspondences modulo distance
  ties)

Stochastic elements (motion sampling, the resample offset) are INJECTED so
the oracle can be driven with the exact same draws as the JAX
implementation; given identical draws the two must agree to float32
precision — that is the fidelity gate BASELINE.md requires (pose RMSE
<= 1e-3, occupancy-cell agreement).

Known reference quirk excluded on purpose (documented in SURVEY §7): the
reference reads the argmax index computed *before* resampling out of the
*resampled* array (slam.rs:77-81 after particle.rs:39-47); both the oracle
and the implementation use the intended pre-resample argmax.
"""

from __future__ import annotations

import math

import numpy as np

P_FREE = 0.30
P_OCCUPIED = 0.9
Z_HIT = 0.9
SENSOR_MAXDIST = 1.0
L_FREE = math.log(P_FREE / (1 - P_FREE))
L_OCC = math.log(P_OCCUPIED / (1 - P_OCCUPIED))


def grid_ray(x0, y0, x1, y1, size_x, size_y, additional_steps=2):
    """GridRayIterator port: yields (cell_x, cell_y, center_x, center_y)."""
    dx, dy = abs(x1 - x0), abs(y1 - y0)
    x, y = int(math.floor(x0)), int(math.floor(y0))
    n = 1 + additional_steps
    if dx == 0.0:
        x_inc, error = 0, float("inf")
    elif x1 > x0:
        x_inc = 1
        n += int(math.floor(x1)) - x
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

    while n > 0 and 0 <= x < size_x and 0 <= y < size_y:
        yield x, y, x + 0.5, y + 0.5
        if error > 0.0:
            y += y_inc
            error -= dx
        else:
            x += x_inc
            error += dy
        n -= 1


def inverse_sensor_model(distance, measured, was_hit, tolerance=2.0):
    """map.rs:148-172, returned as log-odds."""
    if not was_hit:
        return L_FREE if distance < measured else 0.0
    if distance < measured - tolerance / 2.0:
        return L_FREE
    if distance > measured + tolerance / 2.0:
        return 0.0
    return L_OCC


class Map:
    """Log-odds occupancy grid (map.rs), numpy float64, [rows, cols]
    indexed [y, x] (the implementation's layout; the reference's
    size.y-stride indexing is identical for its square grids)."""

    def __init__(self, position_x, position_y, width, height, resolution):
        self.px, self.py, self.res = position_x, position_y, resolution
        self.cols = int(math.ceil(width / resolution))
        self.rows = int(math.ceil(height / resolution))
        self.odds = np.zeros((self.rows, self.cols), np.float64)

    def clone(self):
        m = Map.__new__(Map)
        m.px, m.py, m.res = self.px, self.py, self.res
        m.cols, m.rows = self.cols, self.rows
        m.odds = self.odds.copy()
        return m

    def world_to_grid(self, x, y):
        return (x - self.px) / self.res, (y - self.py) / self.res

    def integrate(self, scan, pose):
        """map.rs:71-106.  scan: dict with angles/distances/valid/present
        numpy arrays; pose: (x, y, theta).  Geometry in float32, exactly
        like the reference (Vector2<f32>); occasional boundary-cell
        differences vs any other float width are inherent."""
        f = np.float32
        sx = f((f(pose[0]) - f(self.px)) / f(self.res))
        sy = f((f(pose[1]) - f(self.py)) / f(self.res))
        for a, d, v, pr in zip(scan["angles"], scan["distances"],
                               scan["valid"], scan["present"]):
            if not pr:
                continue
            ex = f(pose[0]) + np.cos(f(pose[2]) + f(a), dtype=f) * f(d)
            ey = f(pose[1]) + np.sin(f(pose[2]) + f(a), dtype=f) * f(d)
            gx = f((ex - f(self.px)) / f(self.res))
            gy = f((ey - f(self.py)) / f(self.res))
            measured_cells = f(f(d) / f(self.res))
            for cx, cy, ccx, ccy in grid_ray(f(sx), f(sy), gx, gy,
                                             self.cols, self.rows):
                dist = np.sqrt(f(ccx - sx) ** 2 + f(ccy - sy) ** 2,
                               dtype=f)
                self.odds[cy, cx] += inverse_sensor_model(
                    float(dist), float(measured_cells), bool(v))

    def probability_of(self, scan, pose):
        """map.rs:113-145 -> log probability."""
        log_p = 0.0
        for a, d, v, pr in zip(scan["angles"], scan["distances"],
                               scan["valid"], scan["present"]):
            if not pr or not v:
                continue
            f = np.float32
            ex = f(pose[0]) + np.cos(f(pose[2]) + f(a), dtype=f) * f(d)
            ey = f(pose[1]) + np.sin(f(pose[2]) + f(a), dtype=f) * f(d)
            gx = f((ex - f(self.px)) / f(self.res))
            gy = f((ey - f(self.py)) / f(self.res))
            if gx < 0 or gy < 0 or int(gx) >= self.cols or int(gy) >= self.rows:
                continue
            odds = self.odds[int(gy), int(gx)]
            prob = 1.0 - 1.0 / (1.0 + math.exp(odds))
            if odds == 0.0:
                log_p += math.log(1.0 / SENSOR_MAXDIST)
            else:
                log_p += math.log(Z_HIT * prob
                                  + (1.0 - Z_HIT) / SENSOR_MAXDIST)
        return log_p


def odometry_stats(dl, dr, wheel_base):
    """robot.rs:131-150: (mean_c, std_c, mean_t, std_t)."""
    delta_center = (dl + dr) / 2.0
    delta_theta = (dr - dl) / wheel_base
    std_c = (0.01 + abs(delta_center) * 0.05) / 2.0
    std_t = math.radians(5.0) + 0.1 * abs(delta_theta)
    return delta_center, std_c, delta_theta, std_t


def _norm_pdf(x, mu, std):
    return math.exp(-0.5 * ((x - mu) / std) ** 2) / (std * math.sqrt(2 * math.pi))


def angle_diff(a, b):
    d = math.fmod(b - a + math.pi, 2 * math.pi)
    if d < 0:
        d += 2 * math.pi
    d -= math.pi
    if d < -math.pi:
        d += 2 * math.pi
    return d


def odometry_log_prob(initial, new, dl, dr, wheel_base):
    """robot.rs:152-167 (pdf used as probability — reference quirk kept),
    in log space."""
    mc, sc, mt, st = odometry_stats(dl, dr, wheel_base)
    center_dist = math.hypot(initial[0] - new[0], initial[1] - new[1])
    ang = angle_diff(initial[2], new[2])
    return (math.log(_norm_pdf(center_dist, mc, sc))
            + math.log(_norm_pdf(ang, mt, st)))


def systematic_resample(weights, r):
    """particle.rs:78-105 with the uniform draw injected (r in [0, 1/N))."""
    n = len(weights)
    out = []
    c = weights[0]
    i = 0
    for m in range(1, n + 1):
        u = r + (m - 1.0) / n
        while u > c:
            i += 1
            c += weights[i]
        out.append(i)
    return np.array(out, np.int64)


class GridMapSlam:
    """slam.rs:27-97 with injected randomness."""

    def __init__(self, position_x, position_y, width, height, resolution,
                 n_particles):
        self.poses = [np.zeros(3) for _ in range(n_particles)]
        self.maps = [Map(position_x, position_y, width, height, resolution)
                     for _ in range(n_particles)]
        self.weights = np.full(n_particles, 1.0 / n_particles)
        self.best_idx = 0

    def update(self, scan, dl, dr, wheel_base, sampled_poses, resample_r):
        """One update.  ``sampled_poses`` [P, 3] replaces u.sample() draws;
        ``resample_r`` replaces the uniform resample offset."""
        n = len(self.poses)
        log_w = np.zeros(n)
        for i in range(n):
            new_pose = np.asarray(sampled_poses[i], np.float64)
            log_w[i] = (self.maps[i].probability_of(scan, new_pose)
                        + odometry_log_prob(self.poses[i], new_pose,
                                            dl, dr, wheel_base))
            self.maps[i].integrate(scan, new_pose)
            self.poses[i] = new_pose
        # normalize (particle.rs:49-56) in log space for stability
        log_w -= log_w.max()
        w = np.exp(log_w)
        w /= w.sum()
        self.weights = w
        self.best_idx = int(np.argmax(w))
        self.best_pose = self.poses[self.best_idx].copy()
        # resample every update (slam.rs:74)
        anc = systematic_resample(w, resample_r)
        self.poses = [self.poses[a].copy() for a in anc]
        self.maps = [self.maps[a].clone() for a in anc]
        self.weights = np.full(n, 1.0 / n)
        return w, anc


# ---------------------------------------------------------------- ICP ----

def icp_point_to_normal(points, reference_points, initial_pose,
                        iterations=10, step_threshold=None):
    """icp.rs:82-128 (numpy f64, brute-force NN).

    points/reference_points: [N, 2]; returns final pose [3]."""
    p = np.asarray(points, np.float64)
    q = np.asarray(reference_points, np.float64)
    x = np.asarray(initial_pose, np.float64).copy()

    # compute_normals (icp.rs:226-254)
    nq = np.zeros_like(q)
    if q.shape[0] > 2:
        diff = q[2:] - q[:-2]
        nrm = np.stack([-diff[:, 1], diff[:, 0]], -1)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        nq[1:-1] = nrm

    def rot(t):
        return np.array([[math.cos(t), -math.sin(t)],
                         [math.sin(t), math.cos(t)]])

    def drot(t):
        return np.array([[-math.sin(t), -math.cos(t)],
                         [math.cos(t), -math.sin(t)]])

    for _ in range(iterations):
        pc = p @ rot(x[2]).T + x[:2]
        d2 = ((pc[:, None, :] - q[None, :, :]) ** 2).sum(-1)
        corr = d2.argmin(1)

        H = np.zeros((3, 3))
        g = np.zeros(3)
        for i, j in enumerate(corr):
            e2 = rot(x[2]) @ p[i] + x[:2] - q[j]
            e = nq[j] @ e2
            w = 1.0
            if step_threshold is not None and e * e >= step_threshold ** 2:
                w = 0.0
            J = nq[j] @ np.column_stack(
                [np.eye(2), (drot(x[2]) @ p[i])[:, None]])
            H += w * np.outer(J, J)
            g += w * J * e
        dx, *_ = np.linalg.lstsq(H, -g, rcond=1e-8)
        x += dx
        x[2] = math.atan2(math.sin(x[2]), math.cos(x[2]))
    return x


# ---------------------------------------------------------- EKF SLAM ----

class EKFLandmarkSlam:
    """slamrs/slam/src/landmark/ekf.rs:17-244 VERBATIM in float32 (the
    reference is f32 throughout) — including its unnormalized measurement
    Jacobian (ekf.rs:149-160 omits the textbook 1/q factor; compare
    against the implementation's ``reference_jacobian=True`` mode)."""

    def __init__(self, num_landmarks=10, initial_landmark_variance=1000.0):
        n = num_landmarks
        self.n = n
        self.mean = np.zeros(3 + 2 * n, np.float32)
        self.cov = np.eye(3 + 2 * n, dtype=np.float32) * np.float32(
            initial_landmark_variance)
        self.cov[:3, :3] = 0.0  # zero pose block (ekf.rs:22-31)
        self.seen = [False] * n

    def update(self, landmarks, dl, dr, wheel_base):
        """landmarks: list of (distance, angle, association|None)."""
        f = np.float32
        dl, dr, wheel_base = f(dl), f(dr), f(wheel_base)
        d = 3 + 2 * self.n
        omega_dt = f((dr - dl) / wheel_base)
        v_dt = f((dl + dr) / f(2.0))
        theta = self.mean[2]
        if omega_dt != 0.0:
            vo = f(v_dt / omega_dt)
            g_xyt = np.array([
                -vo * np.sin(theta) + vo * np.sin(theta + omega_dt),
                vo * np.cos(theta) - vo * np.cos(theta + omega_dt),
                omega_dt], np.float32)
            gx = np.eye(3, dtype=np.float32)
            gx[0, 2] = -vo * np.cos(theta) + vo * np.cos(theta + omega_dt)
            gx[1, 2] = -vo * np.sin(theta) + vo * np.sin(theta + omega_dt)
        else:
            g_xyt = np.array([v_dt * np.cos(theta),
                              v_dt * np.sin(theta), 0.0], np.float32)
            gx = np.eye(3, dtype=np.float32)
            gx[0, 2] = -v_dt * np.sin(theta)
            gx[1, 2] = v_dt * np.cos(theta)

        mu = self.mean.copy()
        mu[0] += g_xyt[0]
        mu[1] += g_xyt[1]
        mu[2] = _wrap(mu[2] + g_xyt[2])

        g = np.eye(d, dtype=np.float32)
        g[:3, :3] = gx
        sigma = np.array([0.02, 0.02, math.radians(5.0)], np.float32)
        cov = (g @ self.cov @ g.T).astype(np.float32)
        cov[:3, :3] += np.diag(sigma * sigma)

        for dist, ang, assoc in landmarks:
            if assoc is None:
                continue
            dist, ang = f(dist), f(ang)
            j = int(assoc)
            if not self.seen[j]:
                self.seen[j] = True
                mu[3 + 2 * j] = mu[0] + dist * np.cos(mu[2] + ang)
                mu[3 + 2 * j + 1] = mu[1] + dist * np.sin(mu[2] + ang)
            dx = mu[3 + 2 * j] - mu[0]
            dy = mu[3 + 2 * j + 1] - mu[1]
            q = f(dx * dx + dy * dy)
            sq = np.sqrt(q, dtype=f)
            z_bar = np.array([sq, np.arctan2(dy, dx) - mu[2]], np.float32)
            z = np.array([dist, ang], np.float32)
            h_low = np.array([[-sq * dx, -sq * dy, 0.0, sq * dx, sq * dy],
                              [dy, -dx, -q, -dy, dx]], np.float32)
            fxj = np.zeros((5, d), np.float32)
            fxj[0, 0] = fxj[1, 1] = fxj[2, 2] = 1.0
            fxj[3, 3 + 2 * j] = 1.0
            fxj[4, 3 + 2 * j + 1] = 1.0
            h = h_low @ fxj
            so = np.array([0.03, math.radians(3.0)], np.float32)
            qm = np.diag(so * so)
            k = (cov @ h.T @ np.linalg.inv(
                (h @ cov @ h.T + qm).astype(np.float32))).astype(np.float32)
            diff = (z - z_bar).astype(np.float32)
            diff[1] = _wrap(diff[1])
            mu = (mu + k @ diff).astype(np.float32)
            mu[2] = _wrap(mu[2])
            cov = ((np.eye(d, dtype=np.float32) - k @ h)
                   @ cov).astype(np.float32)

        self.mean = mu
        self.cov = cov


def _wrap(a):
    """na::wrap(angle, -pi, pi)."""
    while a >= math.pi:
        a -= 2 * math.pi
    while a < -math.pi:
        a += 2 * math.pi
    return a
