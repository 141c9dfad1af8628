"""Pub/sub tests (pubsub/src/lib.rs semantics)."""

import pytest

from slamrs_tpu.graph.pubsub import PubSub, Ticker, TopicTypeError


def test_publish_subscribe_fanout():
    ps = PubSub()
    s1 = ps.subscribe("t")
    s2 = ps.subscribe("t")
    pub = ps.publish("t")
    pub.publish(42)
    assert s1.try_recv() is None  # not distributed until tick
    ps.tick()
    assert s1.try_recv() == 42
    assert s2.try_recv() == 42
    assert s1.try_recv() is None


def test_type_pinning():
    # lib.rs:116-131: first use pins the type; mismatch panics -> raises
    ps = PubSub()
    ps.publish("t", int)
    with pytest.raises(TopicTypeError):
        ps.subscribe("t", str)
    pub = ps.publish("t", int)
    with pytest.raises(TopicTypeError):
        pub.publish("not an int")


def test_latest_drops_backlog():
    ps = PubSub()
    sub = ps.subscribe("t")
    pub = ps.publish("t")
    for i in range(5):
        pub.publish(i)
    ps.tick()
    assert sub.latest() == 4
    assert sub.try_recv() is None


def test_ticker_background():
    import time
    ps = PubSub()
    sub = ps.subscribe("t")
    pub = ps.publish("t")
    ticker = Ticker(ps, interval_s=0.001)
    pub.publish("hello")
    time.sleep(0.05)
    ticker.stop()
    assert sub.try_recv() == "hello"


def test_waker_called():
    ps = PubSub()
    calls = []
    ps.set_waker(lambda: calls.append(1))
    sub = ps.subscribe("t")
    ps.publish("t").publish(1)
    ps.tick()
    assert calls == [1]
    ps.tick()  # nothing pending -> no wake
    assert calls == [1]
