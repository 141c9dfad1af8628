"""Native (C++) runtime components, loaded via ctypes.

Build with ``make native`` (or let :func:`build` compile lazily).  All
native components have pure-python/numpy fallbacks — the framework is
fully functional without the shared library, just slower on bulk host-side
paths (log replay).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_LIB = _DIR / "libslamrs_native.so"
_SOURCES = [_DIR / "neato_parser.cpp", _DIR / "wire_codec.cpp"]


def build(force: bool = False) -> Path:
    """Compile the native library with g++ (idempotent)."""
    if _LIB.exists() and not force:
        newest_src = max(s.stat().st_mtime for s in _SOURCES)
        if _LIB.stat().st_mtime >= newest_src:
            return _LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_LIB)] + [str(s) for s in _SOURCES]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load():
    # build() is idempotent and mtime-aware — always route through it so
    # an outdated .so (older than any .cpp) never loads silently
    build()
    return ctypes.CDLL(str(_LIB))


class _NeatoNative:
    """ctypes facade matching slamrs_tpu.io.neato's python API."""

    def __init__(self):
        lib = _load()
        self._lib = lib
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.neato_parse_packets.restype = ctypes.c_long
        lib.neato_parse_packets.argtypes = [u8p, ctypes.c_long, u16p, u16p,
                                            u8p, ctypes.c_long]
        lib.neato_parse_frame.restype = None
        lib.neato_parse_frame.argtypes = [u8p, u16p, u16p, u8p]
        lib.neato_checksum_valid.restype = ctypes.c_int
        lib.neato_checksum_valid.argtypes = [u8p]

    def parse_packets(self, data: bytes):
        import numpy as np
        from slamrs_tpu.io.neato import BEAMS, NeatoFrame

        buf = np.frombuffer(data, np.uint8)
        ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        n = self._lib.neato_parse_packets(ptr, len(buf), None, None, None, 0)
        if n <= 0:
            return []
        dist = np.zeros((n, BEAMS), np.uint16)
        stren = np.zeros((n, BEAMS), np.uint16)
        val = np.zeros((n, BEAMS), np.uint8)
        got = self._lib.neato_parse_packets(
            ptr, len(buf),
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            stren.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            val.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
        assert got == n, (got, n)
        return [NeatoFrame(dist[i], stren[i], val[i]) for i in range(n)]

    def parse_frame(self, data: bytes):
        import numpy as np
        from slamrs_tpu.io.neato import BEAMS, FRAME_BYTES, NeatoFrame

        buf = np.frombuffer(data, np.uint8)
        if buf.size != FRAME_BYTES:
            raise ValueError(f"frame must be {FRAME_BYTES} bytes")
        dist = np.zeros(BEAMS, np.uint16)
        stren = np.zeros(BEAMS, np.uint16)
        val = np.zeros(BEAMS, np.uint8)
        self._lib.neato_parse_frame(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            stren.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            val.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return NeatoFrame(dist, stren, val)


class _WireNative:
    """ctypes facade over the native bincode wire codec (wire_codec.cpp)."""

    def __init__(self):
        lib = _load()
        self._lib = lib
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        f32p = ctypes.POINTER(ctypes.c_float)
        lp = ctypes.POINTER(ctypes.c_long)
        lib.wire_decode_scan_frames.restype = ctypes.c_long
        lib.wire_decode_scan_frames.argtypes = [
            u8p, ctypes.c_long, u8p, f32p, u16p, ctypes.c_long, lp]
        lib.wire_encode_command.restype = ctypes.c_long
        lib.wire_encode_command.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, u8p]
        # reused output buffers for the robot-link hot path; wire_native
        # is a module singleton, so a lock serializes concurrent readers
        # (e.g. two RobotConnection threads) against the shared buffers
        import threading

        self._scans_buf = None
        self._odo_buf = None
        self._rpm_buf = None
        self._buf_frames = 0
        self._buf_lock = threading.Lock()

    def decode_scan_frames(self, data: bytes, max_frames: int = 64):
        """Returns ([(scan_bytes, (ol, or), rpm), ...], consumed)."""
        import numpy as np

        buf = np.frombuffer(data, np.uint8)
        with self._buf_lock:
            return self._decode_locked(np, buf, max_frames)

    def _decode_locked(self, np, buf, max_frames):
        if max_frames > self._buf_frames:
            self._scans_buf = np.zeros((max_frames, 1980), np.uint8)
            self._odo_buf = np.zeros((max_frames, 2), np.float32)
            self._rpm_buf = np.zeros(max_frames, np.uint16)
            self._buf_frames = max_frames
        scans = self._scans_buf
        odo = self._odo_buf
        rpm = self._rpm_buf
        consumed = ctypes.c_long(0)
        n = self._lib.wire_decode_scan_frames(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
            scans.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            odo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rpm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            max_frames, ctypes.byref(consumed))
        out = [(scans[i].tobytes(), (float(odo[i, 0]), float(odo[i, 1])),
                int(rpm[i])) for i in range(n)]
        return out, int(consumed.value)

    def encode_command(self, kind: int, every: int = 0, left: float = 0.0,
                       right: float = 0.0, kp: float = 0.0,
                       ki: float = 0.0) -> bytes:
        out = (ctypes.c_uint8 * 16)()
        n = self._lib.wire_encode_command(kind, every, left, right, kp, ki,
                                          out)
        return bytes(out[:n])


try:
    neato_native = _NeatoNative()
except Exception:  # toolchain missing / build failure -> python fallback
    neato_native = None

try:
    wire_native = _WireNative()
except Exception:
    wire_native = None
