"""Real-robot and replay nodes.

Parity surface: ``FileLoader`` (neato/src/fileloader.rs:40-84) and
``RobotConnection`` (neato/src/connection.rs) — same YAML topics.  The
FileLoader here auto-plays frames (one per app frame by default) instead
of a UI slider; a ``frame_index`` can also be set programmatically.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from slamrs_tpu.core.types import Command, OdometryReading, Scan
from slamrs_tpu.graph.node import Node, NodeConfig, PoseMsg, ScanOdometry
from slamrs_tpu.io import neato as neato_io
from slamrs_tpu.io.connection import (WHEEL_BASE, RobotLink,
                                      TcpMedium, open_medium)


def _frame_to_scan(frame: neato_io.NeatoFrame) -> Scan:
    angles, dist, strength, valid, present = frame.to_scan_arrays()
    return Scan(angles=angles, distances=dist, strengths=strength,
                valid=valid, present=present)


@dataclasses.dataclass
class FileLoaderNodeConfig(NodeConfig):
    topic_observation: str
    topic_pose: Optional[str] = None
    path: Optional[str] = None  # .bin recording; reference uses a dialog
    autoplay: bool = True

    def instantiate(self, pubsub) -> "FileLoaderNode":
        return FileLoaderNode(self, pubsub)


class FileLoaderNode(Node):
    """Replays recorded Neato logs; publishes the selected frame + identity
    pose (fileloader.rs:60-80)."""

    def __init__(self, config: FileLoaderNodeConfig, pubsub):
        self.config = config
        self.frames = (neato_io.load_neato_binary(config.path)
                       if config.path else [])
        self.frame_index = 0
        self._published = -1
        self.pub_obs = pubsub.publish(config.topic_observation)
        self.pub_pose = (pubsub.publish(config.topic_pose, PoseMsg)
                         if config.topic_pose else None)

    def update(self) -> None:
        if not self.frames:
            return
        if self.config.autoplay and self._published >= 0:
            self.frame_index = min(self.frame_index + 1, len(self.frames) - 1)
        if self.frame_index != self._published:
            self._published = self.frame_index
            self.pub_obs.publish(_frame_to_scan(self.frames[self.frame_index]))
            if self.pub_pose:
                self.pub_pose.publish(PoseMsg(np.zeros(3, np.float32)))

    @property
    def done(self) -> bool:
        return not self.frames or self.frame_index >= len(self.frames) - 1


@dataclasses.dataclass
class RobotConnectionNodeConfig(NodeConfig):
    topic_observation: str
    topic_command: Optional[str] = None
    host: str = "robot"
    port: int = 8080
    # serial device path (e.g. /dev/ttyUSB0 at 115200 baud); when set it
    # takes precedence over host/port (the reference's port picker offers
    # both transports, connection.rs:202-241)
    serial: Optional[str] = None
    downsampling: int = 2

    def instantiate(self, pubsub) -> "RobotConnectionNode":
        return RobotConnectionNode(self, pubsub)


class RobotConnectionNode(Node):
    """Streams (Scan, Odometry) from the robot over TCP; forwards Drive
    commands (connection.rs:206-320)."""

    def __init__(self, config: RobotConnectionNodeConfig, pubsub):
        self.config = config
        self.pub_obs = pubsub.publish(config.topic_observation, ScanOdometry)
        self.sub_cmd = (pubsub.subscribe(config.topic_command, Command)
                        if config.topic_command else None)
        self._pending: list[ScanOdometry] = []
        self._link: Optional[RobotLink] = None

    def connect(self) -> None:
        if self.config.serial:
            medium = open_medium(self.config.serial)
        else:
            medium = TcpMedium(self.config.host, self.config.port)
        self._link = RobotLink(medium, self._on_scan,
                               self.config.downsampling)

    def _on_scan(self, scan_data: bytes, odometry, rpm: int) -> None:
        frame = neato_io.parse_frame(scan_data)
        odo = OdometryReading.make(odometry[0], odometry[1], WHEEL_BASE)
        self._pending.append(ScanOdometry(_frame_to_scan(frame), odo))

    @property
    def state(self) -> str:
        """Connection lifecycle: "idle" | "running" (the reference's
        ConnectionState, connection.rs:40-47, 135-139)."""
        return "running" if self._link is not None else "idle"

    def set_motor_pi_params(self, kp: float, ki: float) -> None:
        """Live PI-gain mutation on the RUNNING link — the reference's
        kp/ki sliders (connection.rs:151-180) sending
        ``CommandMessage::SetMotorPiParams`` to the firmware."""
        if self._link is None:
            raise RuntimeError("not connected")
        self._link.set_motor_pi_params(float(kp), float(ki))

    def set_neato(self, on: bool) -> None:
        """Lidar motor on/off toggle (same UI block, connection.rs:151-180)."""
        if self._link is None:
            raise RuntimeError("not connected")
        self._link.set_neato(bool(on))

    def update(self) -> None:
        pending, self._pending = self._pending, []
        for msg in pending:
            self.pub_obs.publish(msg)
        if self._link is not None and not self._link.alive:
            # stream thread died (decode error / remote close): return to
            # Idle like the reference's handle.is_finished() check
            # (connection.rs:135-139)
            import logging

            logging.getLogger(__name__).error(
                "robot connection thread ended; returning to idle")
            self._link.close()
            self._link = None
        if self._link is not None and self.sub_cmd is not None:
            cmd = self.sub_cmd.latest()
            if cmd is not None:
                self._link.drive(float(cmd.speed_left), float(cmd.speed_right))

    def terminate(self) -> None:
        if self._link is not None:
            self._link.close()
            self._link = None
