"""Wire-protocol codec tests (slamrs-message bincode-standard format)."""

import struct

import pytest

from slamrs_tpu.io.message import (CommandMessage, RobotMessage, ScanFrame,
                                   decode_varint, encode_varint)


def test_varint_thresholds():
    assert encode_varint(0) == b"\x00"
    assert encode_varint(250) == b"\xfa"
    assert encode_varint(251) == b"\xfb\xfb\x00"
    assert encode_varint(65535) == b"\xfb\xff\xff"
    assert encode_varint(65536) == b"\xfc\x00\x00\x01\x00"
    for v in (0, 7, 250, 251, 300, 65535, 65536, 2**31):
        decoded, pos = decode_varint(encode_varint(v), 0)
        assert decoded == v


@pytest.mark.parametrize("msg,expected_head", [
    (CommandMessage.ping(), b"\x00"),
    (CommandMessage.neato_on(), b"\x01"),
    (CommandMessage.neato_off(), b"\x02"),
    (CommandMessage.set_downsampling(2), b"\x03\x02"),
])
def test_command_known_encodings(msg, expected_head):
    assert msg.encode() == expected_head


def test_command_drive_encoding():
    enc = CommandMessage.drive(0.25, -1.0).encode()
    assert enc[0] == 4
    assert struct.unpack("<ff", enc[1:]) == (0.25, -1.0)


def test_command_roundtrip():
    for msg in (CommandMessage.ping(), CommandMessage.neato_on(),
                CommandMessage.neato_off(), CommandMessage.set_downsampling(7),
                CommandMessage.drive(0.125, -0.25),  # exact in f32
                CommandMessage.set_motor_pi_params(0.5, 2.0)):
        out, pos = CommandMessage.decode(msg.encode())
        assert out == msg
        assert pos == len(msg.encode())


def test_robot_message_roundtrip():
    frame = ScanFrame(bytes(range(256)) * 7 + bytes(188), (0.5, -0.25), 300)
    msg = RobotMessage.from_scan(frame)
    enc = msg.encode()
    assert enc[0] == 0  # ScanFrame variant
    assert len(enc) == 1 + 1980 + 8 + 3  # rpm 300 -> varint 3 bytes
    out, pos = RobotMessage.decode(enc)
    assert pos == len(enc)
    assert out.scan_frame.scan_data == frame.scan_data
    assert out.scan_frame.odometry == frame.odometry
    assert out.scan_frame.rpm == 300

    pong = RobotMessage.pong().encode()
    assert pong == b"\x01"


def test_partial_buffer_raises_eof():
    frame = ScanFrame(bytes(1980), (0.0, 0.0), 299)
    enc = RobotMessage.from_scan(frame).encode()
    with pytest.raises((EOFError, IndexError)):
        RobotMessage.decode(enc[:100])


def test_scan_frame_size_validation():
    with pytest.raises(ValueError):
        ScanFrame(bytes(100), (0.0, 0.0), 0)
