"""Neato protocol tests (neato/src/frame.rs parity), hardware-free: packets
are synthesized with valid checksums (the VecReader-style fake strategy of
the reference's parser tests, library/src/parse_at.rs:225-351)."""

import numpy as np
import pytest

from slamrs_tpu.io import neato


def build_packet(index: int, speed: int, readings):
    """Forge a 22-byte packet with a correct checksum (frame.rs:85-122)."""
    b = bytearray(22)
    b[0] = 0xFA
    b[1] = 0xA0 + index
    b[2] = speed & 0xFF
    b[3] = speed >> 8
    for j, (dist, strength, valid) in enumerate(readings):
        o = 4 + 4 * j
        b[o] = dist & 0xFF
        b[o + 1] = ((dist >> 8) & 0x3F) | (0 if valid else 0x80)
        b[o + 2] = strength & 0xFF
        b[o + 3] = strength >> 8
    # checksum over first 20 bytes as 10 LE words
    chk32 = 0
    for i in range(10):
        chk32 = (chk32 << 1) + (b[2 * i] | (b[2 * i + 1] << 8))
    checksum = ((chk32 & 0x7FFF) + (chk32 >> 15)) & 0x7FFF
    b[20] = checksum & 0xFF
    b[21] = checksum >> 8
    return bytes(b)


def build_frame(base_distance=1000):
    return b"".join(
        build_packet(i, 300, [(base_distance + i * 4 + j, 100 + j, True)
                              for j in range(4)])
        for i in range(90))


def test_parse_frame_layout():
    frame = neato.parse_frame(build_frame())
    assert frame.distance.shape == (360,)
    np.testing.assert_array_equal(frame.distance[:4], [1000, 1001, 1002,
                                                       1003])
    assert frame.distance[359] == 1000 + 89 * 4 + 3
    assert (frame.valid == 1).all()
    np.testing.assert_array_equal(frame.strength[:4], [100, 101, 102, 103])


def test_invalid_flag_bit():
    pkt = build_packet(0, 300, [(500, 10, False), (500, 10, True),
                                (500, 10, True), (500, 10, True)])
    raw = pkt + build_frame()[22:]
    frame = neato.parse_frame(raw)
    assert frame.valid[0] == 0 and frame.valid[1] == 1


def test_checksum():
    pkt = np.frombuffer(build_packet(3, 299, [(100, 5, True)] * 4),
                        np.uint8)[None]
    assert neato.checksum_valid(pkt)[0]
    corrupted = pkt.copy()
    corrupted[0, 5] ^= 0xFF
    assert not neato.checksum_valid(corrupted)[0]


def test_stream_resync_and_revolutions():
    # two revolutions with junk in between; parse_packets must resync and
    # emit the first revolution on index wrap (frame.rs:136-201)
    stream = (b"\x12\x34" + build_frame(1000) + b"\xfa\x00garbage"
              + build_frame(2000))
    frames = neato.parse_packets(stream)
    # the trailing revolution is not emitted until the NEXT wrap (reference
    # behavior) -> only revolution 1 is complete
    assert len(frames) == 1
    assert frames[0].distance[0] == 1000


def test_bad_checksum_packets_skipped():
    good = build_frame(1500)
    bad = bytearray(build_packet(5, 300, [(123, 1, True)] * 4))
    bad[7] ^= 0xFF  # corrupt a data byte -> checksum mismatch
    stream = bytes(bad) + good + build_frame(2500)[:22]  # wrap to emit
    frames = neato.parse_packets(stream)
    assert len(frames) == 1
    assert frames[0].distance[20] == 1500 + 5 * 4  # index-5 packet is good


def test_to_scan_arrays():
    # From<NeatoFrame> for Observation (frame.rs:212-230): mm -> m,
    # per-degree radians
    frame = neato.parse_frame(build_frame(1000))
    angles, dist, strength, valid, present = frame.to_scan_arrays()
    assert angles[90] == pytest.approx(np.pi / 2, abs=1e-6)
    assert dist[0] == pytest.approx(1.0, abs=1e-6)  # 1000 mm
    assert present.all() and valid.all()


def test_python_and_native_agree():
    from slamrs_tpu.io.neato import _native, _parse_packets_py
    data = build_frame(1200) + build_frame(1300) + build_frame(1400)
    py_frames = _parse_packets_py(data)
    native = _native()
    if native is None:
        pytest.skip("native parser not built")
    nat_frames = native.parse_packets(data)
    assert len(py_frames) == len(nat_frames)
    for a, b in zip(py_frames, nat_frames):
        np.testing.assert_array_equal(a.distance, b.distance)
        np.testing.assert_array_equal(a.strength, b.strength)
        np.testing.assert_array_equal(a.valid, b.valid)
