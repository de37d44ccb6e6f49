"""WebSocket bridge tests: RFC6455 handshake, binary hop round trip with
parity vs the direct runtime, HTML page serving, ping."""

import base64
import hashlib
import os
import socket
import struct

import numpy as np
import pytest

import jax.numpy as jnp

from deepfilternet_tpu.enhance import init_df
from deepfilternet_tpu.serve import StreamServer
from deepfilternet_tpu.serve_ws import WsBridge, _WS_GUID
from deepfilternet_tpu.streaming import StreamingRuntime

HOP = 480


@pytest.fixture(scope="module")
def bridge():
    model, df_state, _ = init_df()
    srv = StreamServer(model, df_state, port=0)
    srv.start()
    ws = WsBridge(srv, port=0)
    # bind an ephemeral port by hand since WsBridge uses create_server
    ws._sock = socket.create_server(("127.0.0.1", 0))
    ws._sock.settimeout(0.5)
    import threading

    threading.Thread(target=ws._accept_loop, daemon=True).start()
    port = ws._sock.getsockname()[1]
    yield model, df_state, port
    ws.stop()
    srv.stop()


def _ws_connect(port):
    s = socket.create_connection(("127.0.0.1", port))
    key = base64.b64encode(os.urandom(16)).decode()
    s.sendall((f"GET / HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
               f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
               f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += s.recv(4096)
    assert b"101" in resp.split(b"\r\n")[0]
    expect = base64.b64encode(
        hashlib.sha1((key + _WS_GUID).encode()).digest())
    assert expect in resp
    return s


def _send_masked(s, payload: bytes, opcode=0x2):
    mask = os.urandom(4)
    m = (mask * (len(payload) // 4 + 1))[: len(payload)]
    masked = bytes(a ^ b for a, b in zip(payload, m))
    ln = len(payload)
    if ln < 126:
        hdr = bytes([0x80 | opcode, 0x80 | ln])
    else:
        hdr = bytes([0x80 | opcode, 0x80 | 126]) + struct.pack(">H", ln)
    s.sendall(hdr + mask + masked)


def _recv_frame(s):
    hdr = b""
    while len(hdr) < 2:
        hdr += s.recv(2 - len(hdr))
    op = hdr[0] & 0xF
    ln = hdr[1] & 0x7F
    if ln == 126:
        ext = b""
        while len(ext) < 2:
            ext += s.recv(2 - len(ext))
        ln = struct.unpack(">H", ext)[0]
    buf = b""
    while len(buf) < ln:
        buf += s.recv(ln - len(buf))
    return op, buf


class TestWsBridge:
    def test_round_trip_parity(self, bridge, rng):
        model, df_state, port = bridge
        s = _ws_connect(port)
        audio = (rng.standard_normal((1, HOP * 4)) * 0.1).astype(np.float32)
        outs = []
        for i in range(4):
            _send_masked(s, audio[0, i * HOP : (i + 1) * HOP].tobytes())
            op, payload = _recv_frame(s)
            assert op == 0x2
            outs.append(np.frombuffer(payload, "<f4"))
        _send_masked(s, b"", opcode=0x8)
        s.close()
        got = np.concatenate(outs)
        rt = StreamingRuntime(model, df_state)
        carry = rt.init(1)
        _, expected = rt.process(carry, jnp.asarray(audio))
        np.testing.assert_allclose(got, np.asarray(expected)[0], atol=1e-5)

    def test_ping_pong(self, bridge):
        _, _, port = bridge
        s = _ws_connect(port)
        _send_masked(s, b"hello", opcode=0x9)
        op, payload = _recv_frame(s)
        assert op == 0xA and payload == b"hello"
        s.close()

    def test_serves_demo_page(self, bridge):
        _, _, port = bridge
        s = socket.create_connection(("127.0.0.1", port))
        s.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        resp = b""
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break
            resp += chunk
        s.close()
        assert b"200 OK" in resp and b"DeepFilterNet" in resp
        assert b"WebSocket" in resp
