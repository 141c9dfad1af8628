"""Algorithm models: pure jittable `step(state, ...) -> (state, outputs)`.

* :mod:`slamrs_tpu.models.simulator` — diff-drive robot + lidar + landmark sensor
* :mod:`slamrs_tpu.models.gridslam`  — RBPF occupancy-grid SLAM
* :mod:`slamrs_tpu.models.icp_mapper` — ICP scan-to-map odometry frontend
* :mod:`slamrs_tpu.models.ekf`       — EKF landmark SLAM
"""

from slamrs_tpu.models import simulator, gridslam, icp_mapper, ekf  # noqa: F401
