"""Host-side orchestration: typed pub/sub topics, the Node contract, the
declarative YAML config system, and the graph compiler that fuses
simulator+SLAM node chains into a single jitted rollout.

Parity surface: ``slamrs/pubsub`` (typed topics + ticker),
``slamrs/common/src/node.rs`` (Node / NodeConfig), ``slamrs/baseui/src/
config.rs`` (YAML ``!Tag`` node vocabulary), ``baseui/src/app.rs`` (the
update loop).
"""

from slamrs_tpu.graph.pubsub import PubSub, Publisher, Subscription  # noqa: F401
from slamrs_tpu.graph.node import Node, NodeConfig  # noqa: F401
from slamrs_tpu.graph.config import Config, load_config  # noqa: F401
from slamrs_tpu.graph.app import App  # noqa: F401
