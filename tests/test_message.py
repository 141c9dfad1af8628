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


def test_native_wire_codec_matches_python():
    """The C++ wire codec (native/wire_codec.cpp) must drain a
    RobotMessage stream byte-identically to the python codec, including
    Pong interleave, split frames, and garbage resync."""
    import numpy as np
    import pytest

    from slamrs_tpu.io.message import (CommandMessage, RobotMessage,
                                       ScanFrame, SCAN_DATA_BYTES)
    from slamrs_tpu.native import wire_native

    if wire_native is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(3)

    def frame(i):
        data = rng.integers(0, 256, SCAN_DATA_BYTES, dtype=np.uint8)
        return RobotMessage.from_scan(
            ScanFrame(data.tobytes(), (0.25 * i, -0.5 * i), 300 + i))

    stream = (b"\xff\xfe"                       # garbage -> resync
              + frame(1).encode()
              + RobotMessage.pong().encode()
              + frame(2).encode())
    partial = frame(3).encode()
    stream += partial[:100]                      # split frame at the tail

    frames, consumed = wire_native.decode_scan_frames(stream)
    assert len(frames) == 2
    assert consumed == len(stream) - 100
    for i, (scan, odo, rpm) in enumerate(frames, start=1):
        ref, _ = RobotMessage.decode(frame(0).encode(), 0)  # shape only
        assert len(scan) == SCAN_DATA_BYTES
        assert rpm == 300 + i
        assert odo == pytest.approx((0.25 * i, -0.5 * i))

    # encode parity for every CommandMessage variant
    cases = [
        (CommandMessage.ping(), (0, 0, 0.0, 0.0, 0.0, 0.0)),
        (CommandMessage.neato_on(), (1, 0, 0.0, 0.0, 0.0, 0.0)),
        (CommandMessage.neato_off(), (2, 0, 0.0, 0.0, 0.0, 0.0)),
        (CommandMessage.set_downsampling(7), (3, 7, 0.0, 0.0, 0.0, 0.0)),
        (CommandMessage.drive(0.1, -0.2), (4, 0, 0.1, -0.2, 0.0, 0.0)),
        (CommandMessage.set_motor_pi_params(0.5, 2.0),
         (5, 0, 0.0, 0.0, 0.5, 2.0)),
    ]
    for msg, args in cases:
        assert wire_native.encode_command(*args) == msg.encode()


def test_decode_truncated_streams_wait_for_more():
    """Review regression: every truncation point must read as 'need more
    bytes' (EOFError), never struct.error — a split TCP read previously
    killed the drain thread when rpm >= 251 (3-byte varint) or a Drive
    payload straddled the boundary."""
    import numpy as np
    import pytest

    from slamrs_tpu.io.message import (CommandMessage, RobotMessage,
                                       ScanFrame, SCAN_DATA_BYTES)

    frame = RobotMessage.from_scan(ScanFrame(
        bytes(SCAN_DATA_BYTES), (0.1, 0.2), 300)).encode()
    assert len(frame) > SCAN_DATA_BYTES + 8 + 1  # rpm took a 3-byte varint
    for cut in (1, SCAN_DATA_BYTES, len(frame) - 2, len(frame) - 1):
        with pytest.raises((EOFError, IndexError)):
            RobotMessage.decode(frame[:cut])

    drive = CommandMessage.drive(0.1, -0.2).encode()
    for cut in range(1, len(drive)):
        with pytest.raises((EOFError, IndexError)):
            CommandMessage.decode(drive[:cut])
