from slamrs_tpu.core.types import (  # noqa: F401
    Command,
    LandmarkScan,
    OdometryReading,
    Pose2,
    Scan,
)
from slamrs_tpu.core import math  # noqa: F401
from slamrs_tpu.core import motion  # noqa: F401
