"""AT-parser tests mirroring the reference's chunked-stream fakes
(library/src/parse_at.rs:225-351)."""

from slamrs_tpu.io.atparser import AtParser


def feed_chunks(parser, chunks):
    out = []
    for c in chunks:
        out.extend(parser.consume(c))
    return out


def test_line_messages():
    p = AtParser()
    msgs = p.consume(b"ready\r\nOK\r\nWIFI CONNECTED\r\nERROR\r\n")
    assert [m.kind for m in msgs] == ["ready", "ok", "wifi_connected",
                                      "error"]


def test_ipd_payload():
    # parse_at.rs IPD tests: binary payload after +IPD,<link>,<len>:
    p = AtParser()
    msgs = p.consume(b"+IPD,0,5:hello")
    assert len(msgs) == 1
    assert msgs[0].kind == "data" and msgs[0].link == 0
    assert msgs[0].payload == b"hello"


def test_ipd_then_excess_line():
    p = AtParser()
    msgs = p.consume(b"+IPD,2,3:abcOK\r\n")
    assert [m.kind for m in msgs] == ["data", "ok"]
    assert msgs[0].link == 2 and msgs[0].payload == b"abc"


def test_chunk_split_messages():
    # the reference's WouldBlock-boundary test: messages split arbitrarily
    p = AtParser()
    msgs = feed_chunks(p, [b"+IP", b"D,0,", b"8:abc", b"defgh",
                           b"0,CONN", b"ECT\r\n", b"SEND OK\r\n"])
    assert [m.kind for m in msgs] == ["data", "connect", "send_ok"]
    assert msgs[0].payload == b"abcdefgh"
    assert msgs[1].link == 0


def test_connect_closed_links():
    p = AtParser()
    msgs = p.consume(b"1,CONNECT\r\n1,CLOSED\r\n")
    assert msgs[0].kind == "connect" and msgs[0].link == 1
    assert msgs[1].kind == "closed" and msgs[1].link == 1


def test_unknown_lines_pass_through():
    p = AtParser()
    msgs = p.consume(b"AT+CWMODE=1\r\n")
    assert msgs[0].kind == "line"
    assert "CWMODE" in msgs[0].text


def test_binary_payload_with_newlines():
    # payload bytes must NOT be interpreted as lines
    p = AtParser()
    payload = b"ab\r\ncd"
    msgs = p.consume(b"+IPD,0,6:" + payload + b"OK\r\n")
    assert [m.kind for m in msgs] == ["data", "ok"]
    assert msgs[0].payload == payload
