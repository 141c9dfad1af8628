"""Utility / teleop / debug nodes.

Parity surface: baseui/src/node/{splitter,controls,gamepad,mouse_position,
shape_rendering,gaussian}.rs — same YAML vocabulary.  Headless behavior:

* Splitter: identical semantics (tuple topic -> two topics).
* Controls: the reference reads WASD keys; headless adds an optional
  scripted drive plan (list of [until_t, left, right] rows) and publishes
  on change only (controls.rs:48-163's publish-on-change).
* Gamepad: the stick -> differential-drive conversion with turn damping
  is the reference's math verbatim (gamepad.rs:79-103), publish-on-change;
  the gilrs hardware event source is replaced by a ``set_stick(x, y)``
  input seam (no gamepad hardware in the framework core).
* ShapeTest / GaussianTest: drive the shape renderer through the ``draw``
  hook like the reference debug nodes (shape_rendering.rs:23-56,
  gaussian.rs); GaussianTest also publishes its Gaussian2D.
* MousePosition: config-accepted no-op (a window reporting the hovered
  world coordinate has no headless equivalent — mouse_position.rs:1-27).
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
        # script is immutable config: sort once (same selection rule as
        # FusedWorld.commands_for), not per 30 Hz frame
        self._sorted_script = sorted(config.script,
                                     key=lambda r: float(r[0]))
        self._external = False  # set_command seen: the script yields

    def advance(self, dt: float) -> None:
        self.time += dt

    def set_command(self, left: float, right: float) -> None:
        """Programmatic teleop (the keyboard path of controls.rs).

        The first call suspends the drive script for good: without
        this, update() republishes the matching script row on the very
        next 30 Hz frame and every keypress is reverted within ~33 ms.
        (The reference has no script at all — keyboard IS the source.)
        """
        self._external = True
        self._publish(left, right)

    def _publish(self, left, right):
        if self.last != (left, right):  # publish-on-change
            self.last = (left, right)
            self.pub.publish(Command.make(left, right))

    def update(self) -> None:
        # earliest matching row wins (rows sorted by until_t — the same
        # selection rule FusedWorld.commands_for applies, so the node
        # graph and the compiled rollout agree on out-of-order scripts)
        if self._external:
            return
        for row in self._sorted_script:
            until, left, right = row
            if self.time <= until:
                self._publish(float(left), float(right))
                return


@dataclasses.dataclass
class GamepadNodeConfig(NodeConfig):
    topic_command: str
    max_speed: float = 0.2

    def instantiate(self, pubsub) -> "GamepadNode":
        return GamepadNode(self, pubsub)


class GamepadNode(Node):
    """Stick-to-differential teleop (gamepad.rs:41-110).

    The hardware event pump is replaced by :meth:`set_stick`; everything
    downstream — the polar decomposition, square-to-circle magnitude
    normalization, turn damping of 3.0, speed scaling and
    publish-on-change — matches gamepad.rs:79-108.
    """

    TURN_DAMPING = 3.0  # gamepad.rs:92

    def __init__(self, config: GamepadNodeConfig, pubsub):
        self.pub = pubsub.publish(config.topic_command, Command)
        self.target_speed = config.max_speed
        self.x = 0.0
        self.y = 0.0
        self.last: Optional[tuple] = None

    def set_stick(self, x: float, y: float) -> None:
        """Feed a stick sample (gilrs AxisChanged, gamepad.rs:55-59)."""
        self.x = float(x)
        self.y = float(y)

    def update(self) -> None:
        import math

        r = math.hypot(self.x, self.y)
        if r > 0.0:
            angle = math.atan2(self.y, self.x)
            # square-pad normalization: max attainable r for this angle
            max_r = r / max(abs(self.x), abs(self.y))
            magnitude = r / max_r
            left = magnitude * (math.sin(angle)
                                + math.cos(angle) / self.TURN_DAMPING)
            right = magnitude * (math.sin(angle)
                                 - math.cos(angle) / self.TURN_DAMPING)
            cmd = (left * self.target_speed, right * self.target_speed)
        else:
            cmd = (0.0, 0.0)
        if cmd != self.last:  # publish-on-change, gamepad.rs:105-108
            self.pub.publish(Command.make(*cmd))
            self.last = cmd


@dataclasses.dataclass
class MousePositionNodeConfig(NodeConfig):
    def instantiate(self, pubsub) -> Node:
        # headless n/a: the reference only shows the hovered world
        # coordinate in a window (mouse_position.rs:1-27)
        return Node()


@dataclasses.dataclass
class ShapeTestNodeConfig(NodeConfig):
    # color-field rect count per axis (255 in shape_rendering.rs:26; the
    # YAML can shrink it for cheap smoke tests)
    grid_steps: int = 255

    def instantiate(self, pubsub) -> "ShapeTestNode":
        return ShapeTestNode(self)


class ShapeTestNode(Node):
    """Renderer smoke test (shape_rendering.rs:23-56): an RGB rect field
    plus line/filled circles and arrows at the reference's positions."""

    def __init__(self, config: ShapeTestNodeConfig):
        self.n = config.grid_steps
        self._cached = None  # the scene is static: build once, replay

    def draw(self, viz=None) -> None:
        if viz is None:
            return
        target = viz.sr if hasattr(viz, "sr") else viz
        if self._cached is not None:
            target._calls.extend(self._cached)
            return
        import math

        from slamrs_tpu.viz.shapes import Color, PrimitiveType

        sr = viz
        n = self.n
        calls_before = len(target._calls)
        sr.begin(PrimitiveType.FILLED)
        for x in range(n):
            for y in range(n):
                c = Color(x / 255.0, y / 255.0, 128 / 255.0)
                sr.rect(x / 255.0, y / 255.0, 1 / 255.0, 1 / 255.0, c)
        sr.end()
        sr.begin(PrimitiveType.LINE)
        sr.circle(0.1, -0.1, 0.05, Color.RED)
        sr.end()
        sr.begin(PrimitiveType.FILLED)
        sr.circle(-0.1, -0.1, 0.05, Color.GREEN)
        sr.end()
        sr.begin(PrimitiveType.LINE)
        sr.arrow(-0.1, 0.1, math.pi + math.pi / 3, 0.1, Color.RED)
        sr.end()
        sr.begin(PrimitiveType.FILLED)
        sr.arrow(0.1, 0.1, math.pi / 6, 0.1, Color.GREEN)
        sr.end()
        self._cached = list(target._calls[calls_before:])


@dataclasses.dataclass
class GaussianTestNodeConfig(NodeConfig):
    topic: str = "gaussian"

    def instantiate(self, pubsub) -> "GaussianTestNode":
        return GaussianTestNode(self, pubsub)


class GaussianTestNode(Node):
    """Interactive Gaussian publisher (gaussian.rs): holds a mutable
    Gaussian2D (the reference's DragValue widgets become direct attribute
    mutation), publishes it and draws the covariance ellipse."""

    def __init__(self, config: GaussianTestNodeConfig, pubsub):
        from slamrs_tpu.core.types import Gaussian2D

        self.gaussian = Gaussian2D()
        self.pub = pubsub.publish(config.topic, Gaussian2D)

    def update(self) -> None:
        self.pub.publish(self.gaussian)

    def draw(self, viz=None) -> None:
        if viz is None:
            return
        from slamrs_tpu.viz.shapes import Color, PrimitiveType

        viz.begin(PrimitiveType.LINE)
        viz.gaussian2d(self.gaussian.mean, self.gaussian.covariance,
                       Color.BLUE)
        viz.end()
