"""Robot-link tests over an in-memory transport (the ConnectionMedium seam,
connection.rs:322-338)."""

import threading
import time

from slamrs_tpu.io.connection import ConnectionMedium, RobotLink
from slamrs_tpu.io.message import CommandMessage, RobotMessage, ScanFrame


class FakeMedium(ConnectionMedium):
    """In-memory stream: feeds canned robot bytes, records writes."""

    def __init__(self, incoming: bytes, chunk: int = 997):
        self.incoming = incoming
        self.pos = 0
        self.chunk = chunk
        self.writes = []
        self.closed = False
        self._lock = threading.Lock()

    def read(self, n):
        with self._lock:
            if self.pos >= len(self.incoming):
                time.sleep(0.001)
                return b""
            end = min(self.pos + min(n, self.chunk), len(self.incoming))
            out = self.incoming[self.pos:end]
            self.pos = end
            return out

    def write(self, data):
        self.writes.append(bytes(data))

    def close(self):
        self.closed = True


def test_handshake_and_scan_stream():
    frames = [
        RobotMessage.from_scan(
            ScanFrame(bytes([i]) * 1980, (0.1 * i, 0.2 * i), 300 + i)
        ).encode()
        for i in range(3)
    ]
    medium = FakeMedium(b"".join(frames))
    received = []
    link = RobotLink(medium, lambda d, o, r: received.append((d[0], o, r)))

    # generous deadline: under a full-suite run the reader thread
    # competes with XLA compile threads for the GIL and 5 s flaked
    deadline = time.time() + 60.0
    while len(received) < 3 and time.time() < deadline:
        time.sleep(0.01)
    link.close()

    # handshake: NeatoOn + SetDownsampling{2} (connection.rs:250-262)
    assert medium.writes[0] == CommandMessage.neato_on().encode()
    assert medium.writes[1] == CommandMessage.set_downsampling(2).encode()
    assert len(received) == 3
    assert received[1][0] == 1
    assert received[2][2] == 302
    # shutdown: NeatoOff + Drive{0,0} best-effort (connection.rs:300-313)
    assert CommandMessage.neato_off().encode() in medium.writes
    assert medium.closed


def test_reader_thread_exits_on_clean_eof():
    """Review regression: an orderly peer close (read() -> None) must end
    the reader thread like a stream error does — previously b'' from a
    closed socket was indistinguishable from a timeout and the thread
    spun forever, so the node never returned to idle."""

    class EofMedium(ConnectionMedium):
        def __init__(self):
            self.writes = []

        def read(self, n):
            return None  # EOF immediately

        def write(self, data):
            self.writes.append(bytes(data))

    link = RobotLink(EofMedium(), lambda *a: None)
    link._thread.join(timeout=2.0)
    assert not link._thread.is_alive()


def test_drive_forwarding():
    medium = FakeMedium(b"")
    link = RobotLink(medium, lambda *a: None)
    link.drive(0.1, -0.1)
    msg, _ = CommandMessage.decode(medium.writes[-1])
    assert msg.kind == "drive"
    link.close()
