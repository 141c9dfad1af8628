"""USB-CDC bridge analog (tasks/usb.rs:7-81) + terminal teleop
(controls.rs keyboard path) — the round-3 verdict's last partial
inventory row and missing #4.
"""

import os
import time

from slamrs_tpu.io.connection import RobotLink, SerialMedium
from slamrs_tpu.io.teleop import StdinTeleop, key_to_command
from slamrs_tpu.io.virtual_robot import UsbCdcServer, VirtualRobot


def _wait(cond, deadline_s=10.0):
    deadline = time.time() + deadline_s
    while not cond() and time.time() < deadline:
        time.sleep(0.02)
    return cond()


def test_cdc_session_full_cycle():
    """Host session over the pty: DTR-connect on first bytes, scan frames
    stream, DTR-disconnect on close, server re-arms for a second session."""
    robot = VirtualRobot()  # no scene: canned 1500 mm scan
    server = UsbCdcServer(robot, realtime=False)
    try:
        assert not robot.connected  # no DTR until a host opens + writes

        received = []
        medium = SerialMedium(server.path)
        link = RobotLink(medium, lambda d, o, r: received.append((d, o, r)))
        # handshake bytes (NeatoOn + SetDownsampling) assert "DTR"
        assert _wait(lambda: robot.connected)
        assert _wait(lambda: len(received) >= 2)
        dist0 = received[0][0][4] | ((received[0][0][5] & 0x3F) << 8)
        assert dist0 == 1500  # the canned scan round-tripped the XV11 codec
        link.close()
        assert _wait(lambda: not robot.connected)  # hangup observed

        # second session (re-plug): the pty is re-armed
        received2 = []
        medium2 = SerialMedium(server.path)
        link2 = RobotLink(medium2, lambda d, o, r: received2.append(1))
        assert _wait(lambda: robot.connected)
        assert _wait(lambda: len(received2) >= 1)
        link2.close()
    finally:
        server.close()


def test_cdc_commands_reach_the_firmware_model():
    robot = VirtualRobot()
    server = UsbCdcServer(robot, realtime=False)
    try:
        medium = SerialMedium(server.path)
        link = RobotLink(medium, lambda d, o, r: None, downsampling=3)
        assert _wait(lambda: robot.downsampling == 3)
        link.set_motor_pi_params(0.9, 1.1)  # f32 on the wire
        assert _wait(lambda: abs(robot.kp - 0.9) < 1e-6
                     and abs(robot.ki - 1.1) < 1e-6)
        link.drive(0.1, 0.2)
        assert _wait(lambda: robot.target_left > 0
                     and robot.target_right > robot.target_left)
        link.close()
    finally:
        server.close()


def test_key_mapping_matches_reference_table():
    """controls.rs:120-157 speed table at target_speed s."""
    s = 0.3
    assert key_to_command("w", s) == (s, s)
    assert key_to_command("a", s) == (-s, s)
    assert key_to_command("d", s) == (s, -s)
    assert key_to_command("s", s) == (-s, -s)
    left, right = key_to_command("q", s)
    assert abs(left - s / 3.0) < 1e-9 and right == s
    assert key_to_command(" ", s) == (0.0, 0.0)
    assert key_to_command("\x1b[A", s) == (s, s)  # arrow up
    assert key_to_command("\x1b[D", s) == (-s, s)  # arrow left
    assert key_to_command("p", s) is None


def test_stdin_teleop_over_pipe():
    rd, wr = os.pipe()
    cmds = []
    teleop = StdinTeleop(lambda l, r: cmds.append((l, r)),
                         target_speed=0.2, fd=rd)
    os.write(wr, b"w")
    assert _wait(lambda: cmds == [(0.2, 0.2)])
    os.write(wr, b"\x1b[C")  # arrow right
    assert _wait(lambda: len(cmds) == 2)
    assert cmds[1] == (0.2, -0.2)
    os.close(wr)  # EOF -> stop command + reader exit
    assert _wait(lambda: not teleop.alive)
    assert cmds[-1] == (0.0, 0.0)
    teleop.stop()
    os.close(rd)
