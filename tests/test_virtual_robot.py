"""Virtual robot (firmware-behavior model) tests: PI control convergence,
event-loop command semantics, downsampling, odometry, and the full
host<->robot loop over a socketpair (RobotConnection node + SLAM on the
streamed frames)."""

import socket
import time

import numpy as np
import pytest

from slamrs_tpu.io.connection import ConnectionMedium
from slamrs_tpu.io.message import CommandMessage
from slamrs_tpu.io.virtual_robot import (MOTOR_STEPS_PER_METER,
                                         VirtualRobot, VirtualRobotServer)


def test_pi_controller_converges_to_drive_speed():
    """motors.rs PI loop: the wheel speed settles at the commanded
    steps/s within a few control periods (plant gain 1)."""
    r = VirtualRobot()
    r.connect()
    r.handle_command(CommandMessage.drive(0.3, 0.3))  # m/s
    r.step(5.0)
    target = 0.3 * MOTOR_STEPS_PER_METER
    assert r._speed_l == pytest.approx(target, rel=0.05)
    assert r._speed_r == pytest.approx(target, rel=0.05)
    # pose advanced roughly 0.3 m/s * ~4s of settled motion, straight
    assert r.pose[0] > 0.8
    assert abs(r.pose[1]) < 0.05


def test_deadband_zeroes_small_outputs():
    r = VirtualRobot()
    r.handle_command(CommandMessage.drive(0.0005, 0.0005))  # ~5 steps/s
    r.step(2.0)
    assert r._speed_l == 0.0  # |pwm| < 100 -> 0 (motors.rs:52-58)


def test_neato_gating_and_downsampling():
    r = VirtualRobot()
    r.connect()
    r.step(1.0)
    assert not any(b"\x00" == m[:1] for m in r.outbox)  # no ScanFrames
    r.outbox.clear()

    r.handle_command(CommandMessage.neato_on())
    r.handle_command(CommandMessage.set_downsampling(2))
    r.step(6.0)
    frames = [m for m in r.outbox if m[0] == 0]
    # 5 Hz revolutions for 6 s = 30 revs; every=2 -> one frame per 3 revs
    assert 8 <= len(frames) <= 11, len(frames)
    r.outbox.clear()

    r.handle_command(CommandMessage.neato_off())
    r.step(2.0)
    assert not [m for m in r.outbox if m[0] == 0]


def test_odometry_deltas_in_frames():
    from slamrs_tpu.io.message import RobotMessage

    r = VirtualRobot()
    r.connect()
    r.handle_command(CommandMessage.neato_on())
    r.handle_command(CommandMessage.set_downsampling(1))
    r.handle_command(CommandMessage.drive(0.2, 0.2))
    r.step(8.0)
    frames = [RobotMessage.decode(m)[0] for m in r.outbox if m[0] == 0]
    assert len(frames) >= 2
    # total odometry across frames ~ distance traveled (after PI settle)
    total_l = sum(f.scan_frame.odometry[0] for f in frames)
    assert 0.8 < total_l < 1.8, total_l
    # pong heartbeats present while connected (event_loop 1 Hz)
    pongs = [m for m in r.outbox if m[:1] == b"\x01"]
    assert len(pongs) >= 7


class _SockMedium(ConnectionMedium):
    def __init__(self, sock):
        self.sock = sock
        sock.settimeout(0.05)

    def read(self, n):
        try:
            data = self.sock.recv(n)
        except socket.timeout:
            return b""
        return data if data else None  # b'' == EOF

    def write(self, data):
        self.sock.sendall(data)

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass


def test_full_loop_host_to_virtual_robot():
    """End to end: RobotConnection's RobotLink <-> VirtualRobotServer over
    a socketpair — handshake, frame streaming, teleop, parsing — the same
    path a real robot uses (SURVEY 3.6)."""
    from slamrs_tpu.models import simulator as sim_model
    from slamrs_tpu.io.connection import RobotLink

    scene = sim_model.Scene.build(rects=[(-2.0, -2.0, 4.0, 4.0)])
    a, b = socket.socketpair()
    robot = VirtualRobot(scene=scene, scanner_range=5.0)
    server = VirtualRobotServer(robot, _SockMedium(b))

    got = []
    link = RobotLink(_SockMedium(a), lambda s, o, r: got.append((s, o, r)),
                     downsampling=1)
    link.drive(0.25, 0.25)
    deadline = time.time() + 15.0
    while len(got) < 3 and time.time() < deadline:
        time.sleep(0.1)
    link.close()
    server.close()

    assert len(got) >= 3, "no frames streamed through the socketpair"
    scan_bytes, odo, rpm = got[-1]
    assert len(scan_bytes) == 1980
    assert rpm == pytest.approx(300, abs=60)
    # the scan reflects the virtual scene: parse and check ranges ~<= 2.8m
    from slamrs_tpu.io.neato import parse_frame
    f = parse_frame(scan_bytes)
    d = f.distance[f.valid != 0].astype(float) / 1000.0
    assert d.size > 300 and d.max() < 3.0
    # teleop reached the plant: the virtual robot moved
    assert robot.pose[0] > 0.05


def test_connection_node_returns_to_idle_on_dead_stream():
    """connection.rs:135-139 parity: when the robot side closes, the node
    notices the dead stream thread and transitions back to idle."""
    from slamrs_tpu.graph.pubsub import PubSub
    from slamrs_tpu.graph.nodes.robot import RobotConnectionNodeConfig

    a, b = socket.socketpair()
    ps = PubSub()
    node = RobotConnectionNodeConfig(topic_observation="obs",
                                     downsampling=1).instantiate(ps)
    # inject the socketpair medium directly (bypasses TCP connect)
    from slamrs_tpu.io.connection import RobotLink
    node._link = RobotLink(_SockMedium(a), node._on_scan, 1)
    assert node.state == "running"
    b.close()  # remote dies
    deadline = time.time() + 5.0
    while node.state == "running" and time.time() < deadline:
        node.update()
        time.sleep(0.05)
    assert node.state == "idle"
