"""Buffer pool tests — ports of the reference's own unit tests
(library/src/pool.rs:144-196 acquire/exhaust/shared-refcount/send,
util.rs:33-48 base-10 formatter)."""

import threading

import pytest

from slamrs_tpu.io.pool import (BufferPool, Event, EventKind,
                                format_base_10)


def test_acquire_and_exhaust():
    pool = BufferPool(16, 2)
    a = pool.acquire()
    b = pool.acquire()
    assert a is not None and b is not None
    assert pool.acquire() is None  # exhausted (pool.rs test_exhaust)
    a.release()
    assert pool.acquire() is not None


def test_owned_write_then_share_refcount():
    pool = BufferPool(8, 1)
    a = pool.acquire()
    a.data[:3] = b"abc"
    s = a.shared()
    assert s.data[:3] == b"abc"
    s2 = s.clone()
    assert pool.free_count() == 0
    s.release()
    assert pool.free_count() == 0  # clone still holds the slot
    s2.release()
    assert pool.free_count() == 1  # all references dropped -> slot free


def test_owned_buffer_cannot_be_used_after_share():
    pool = BufferPool(8, 1)
    a = pool.acquire()
    a.shared()
    with pytest.raises(AssertionError):
        _ = a.data


def test_shared_across_threads():
    pool = BufferPool(4, 1)
    a = pool.acquire()
    a.data[:] = b"ping"
    s = a.shared()
    seen = []

    def consumer(buf):
        seen.append(bytes(buf.data))
        buf.release()

    t = threading.Thread(target=consumer, args=(s.clone(),))
    t.start()
    t.join()
    assert seen == [b"ping"]
    s.release()
    assert pool.free_count() == 1


def test_format_base_10():
    buf = bytearray(10)
    assert format_base_10(1234, buf) == 4 and buf[:4] == b"1234"
    assert format_base_10(1000, buf) == 4 and buf[:4] == b"1000"
    assert format_base_10(0, buf) == 1 and buf[:1] == b"0"
    with pytest.raises(ValueError):
        format_base_10(12345, bytearray(3))


def test_event_types():
    e = Event(EventKind.CONNECTED)
    assert e.kind is EventKind.CONNECTED and e.command is None
