from slamrs_tpu.graph.nodes.sim import SimulatorNodeConfig  # noqa: F401
from slamrs_tpu.graph.nodes.slam import (  # noqa: F401
    EKFLandmarkSlamNodeConfig,
    GridMapSlamNodeConfig,
    IcpPointMapperNodeConfig,
)
from slamrs_tpu.graph.nodes.util import (  # noqa: F401
    ControlsNodeConfig,
    GamepadNodeConfig,
    GaussianTestNodeConfig,
    MousePositionNodeConfig,
    ShapeTestNodeConfig,
    SplitterNodeConfig,
)
from slamrs_tpu.graph.nodes.viz import VisualizerNodeConfig  # noqa: F401
from slamrs_tpu.graph.nodes.robot import (  # noqa: F401
    FileLoaderNodeConfig,
    RobotConnectionNodeConfig,
)
