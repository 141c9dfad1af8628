"""Utility / teleop / debug nodes.

Parity surface: baseui/src/node/{splitter,controls,gamepad,mouse_position,
shape_rendering,gaussian}.rs — same YAML vocabulary.  Headless behavior:

* Splitter: identical semantics (tuple topic -> two topics).
* Controls: the reference reads WASD keys; headless adds an optional
  scripted drive plan (list of [until_t, left, right] rows) and publishes
  on change only (controls.rs:48-163's publish-on-change).
* Gamepad / MousePosition / ShapeTest / GaussianTest: config-compatible
  stubs (no gamepad/mouse/GL in the framework core).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from slamrs_tpu.core.types import Command
from slamrs_tpu.graph.node import (LandmarkOdometry, Node, NodeConfig,
                                   ScanOdometry)


@dataclasses.dataclass
class SplitterNodeConfig(NodeConfig):
    splits: list = dataclasses.field(default_factory=list)

    def instantiate(self, pubsub) -> "SplitterNode":
        return SplitterNode(self, pubsub)


class _OneToTwoSplit:
    """Parity: OneToTwoSplitter (splitter.rs:20-36)."""

    def __init__(self, pubsub, input_topic, out1, out2, extract):
        self.sub = pubsub.subscribe(input_topic)
        self.pub1 = pubsub.publish(out1)
        self.pub2 = pubsub.publish(out2)
        self.extract = extract

    def update(self):
        while True:
            msg = self.sub.try_recv()
            if msg is None:
                return
            a, b = self.extract(msg)
            self.pub1.publish(a)
            self.pub2.publish(b)


class SplitterNode(Node):
    def __init__(self, config: SplitterNodeConfig, pubsub):
        self.splitters = []
        for s in config.splits:
            tag, fields = s if isinstance(s, tuple) else (s.get("_tag"), s)
            if tag == "ScannerOdometry":
                ex = lambda m: (m.scan, m.odometry)
            elif tag == "LandmarkOdometry":
                ex = lambda m: (m.landmarks, m.odometry)
            else:
                raise ValueError(f"unknown split {tag!r}")
            out1 = fields.get("scanner") or fields.get("landmark")
            self.splitters.append(_OneToTwoSplit(
                pubsub, fields["input"], out1, fields["odometry"], ex))

    def update(self):
        for s in self.splitters:
            s.update()


@dataclasses.dataclass
class ControlsNodeConfig(NodeConfig):
    topic_command: str
    keyboard_enabled: bool = True
    max_speed: float = 0.1
    # headless extension: rows [until_time_s, speed_left, speed_right]
    script: list = dataclasses.field(default_factory=list)

    def instantiate(self, pubsub) -> "ControlsNode":
        return ControlsNode(self, pubsub)


class ControlsNode(Node):
    def __init__(self, config: ControlsNodeConfig, pubsub):
        self.config = config
        self.pub = pubsub.publish(config.topic_command, Command)
        self.time = 0.0
        self.last: Optional[tuple] = None

    def advance(self, dt: float) -> None:
        self.time += dt

    def set_command(self, left: float, right: float) -> None:
        """Programmatic teleop (the keyboard path of controls.rs)."""
        self._publish(left, right)

    def _publish(self, left, right):
        if self.last != (left, right):  # publish-on-change
            self.last = (left, right)
            self.pub.publish(Command.make(left, right))

    def update(self) -> None:
        for row in self.config.script:
            until, left, right = row
            if self.time <= until:
                self._publish(float(left), float(right))
                return


@dataclasses.dataclass
class GamepadNodeConfig(NodeConfig):
    topic_command: str
    max_speed: float = 0.2

    def instantiate(self, pubsub) -> Node:
        # gamepad hardware is host tooling; accept the config, publish nothing
        pubsub.publish(self.topic_command, Command)
        return Node()


@dataclasses.dataclass
class MousePositionNodeConfig(NodeConfig):
    def instantiate(self, pubsub) -> Node:
        return Node()


@dataclasses.dataclass
class ShapeTestNodeConfig(NodeConfig):
    def instantiate(self, pubsub) -> Node:
        return Node()


@dataclasses.dataclass
class GaussianTestNodeConfig(NodeConfig):
    def instantiate(self, pubsub) -> Node:
        return Node()
