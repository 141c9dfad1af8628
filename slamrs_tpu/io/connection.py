"""Real-robot link: TCP (and optional serial) bincode stream client.

Parity surface: ``neato/src/connection.rs`` — a background stream thread
that (on connect) sends ``NeatoOn`` + ``SetDownsampling{every:2}``
(connection.rs:250-262), decodes ``RobotMessage`` frames, converts
``ScanFrame`` odometry with wheel base 0.2 m (connection.rs:25,
``WHEEL_BASE``), forwards ``CommandMessage::Drive`` teleop, and on close
best-effort sends ``NeatoOff`` + ``Drive{0,0}`` (connection.rs:300-313).

The transport seam (:class:`ConnectionMedium`) mirrors the reference's
trait (connection.rs:322-338) so tests inject an in-memory stream.
"""

from __future__ import annotations

import socket
import threading
from typing import Callable, Optional

from slamrs_tpu.io.message import CommandMessage, RobotMessage, SCAN_DATA_BYTES

WHEEL_BASE = 0.2  # meters; connection.rs:25
DEFAULT_DOWNSAMPLING = 2  # connection.rs:253


class ConnectionMedium:
    """Transport seam (connection.rs:322-338)."""

    def read(self, n: int) -> bytes:
        raise NotImplementedError

    def write(self, data: bytes) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class TcpMedium(ConnectionMedium):
    def __init__(self, host: str, port: int = 8080, timeout: float = 0.2):
        self.sock = socket.create_connection((host, port), timeout=5.0)
        self.sock.settimeout(timeout)  # 200 ms read timeout (connection.rs:291)

    def read(self, n: int) -> bytes:
        try:
            return self.sock.recv(n)
        except socket.timeout:
            return b""

    def write(self, data: bytes) -> None:
        self.sock.sendall(data)

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class RobotLink:
    """Decoded-message pump over a ConnectionMedium.

    ``on_scan(scan_data: bytes, odometry: (l, r), rpm: int)`` is invoked on
    the reader thread for every ScanFrame.
    """

    def __init__(self, medium: ConnectionMedium,
                 on_scan: Callable[[bytes, tuple, int], None],
                 downsampling: int = DEFAULT_DOWNSAMPLING):
        self.medium = medium
        self.on_scan = on_scan
        self._stop = threading.Event()
        self._buf = bytearray()
        medium.write(CommandMessage.neato_on().encode())
        medium.write(CommandMessage.set_downsampling(downsampling).encode())
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def drive(self, left: float, right: float) -> None:
        self.medium.write(CommandMessage.drive(left, right).encode())

    def set_motor_pi_params(self, kp: float, ki: float) -> None:
        self.medium.write(CommandMessage.set_motor_pi_params(kp, ki).encode())

    def _run(self) -> None:
        while not self._stop.is_set():
            chunk = self.medium.read(4096)
            if chunk:
                self._buf.extend(chunk)
                self._drain()

    def _drain(self) -> None:
        while True:
            try:
                msg, consumed = RobotMessage.decode(bytes(self._buf))
            except (EOFError, IndexError):
                return  # need more bytes
            except ValueError:
                # decode error: reference logs and drops the stream
                # (connection.rs:294-296); here we resync by skipping a byte
                del self._buf[:1]
                continue
            del self._buf[:consumed]
            if msg.kind == "scan_frame":
                f = msg.scan_frame
                self.on_scan(f.scan_data, f.odometry, f.rpm)

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2.0)
        try:  # best-effort shutdown (connection.rs:300-313)
            self.medium.write(CommandMessage.neato_off().encode())
            self.medium.write(CommandMessage.drive(0.0, 0.0).encode())
        except Exception:
            pass
        self.medium.close()

    @property
    def alive(self) -> bool:
        return self._thread.is_alive()
