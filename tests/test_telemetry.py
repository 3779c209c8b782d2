"""Loopback tests for the telemetry network transports (VERDICT r1 #9):
HTTP POST + one-shot WebSocket sinks carrying the reference's GNSS_IMU_DATA
envelope (`sensor_recorder.cpp:321-472`). Servers run on localhost threads —
zero egress."""
import base64
import hashlib
import json
import socket
import struct
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

from fastliosam_tpu.runtime import (
    HttpSink,
    RecorderConfig,
    SensorRecorder,
    WebSocketSink,
    make_envelope,
    multi_sink,
)

PAYLOAD = {
    "timestamp": 1723190400.4,
    "gnss": {"lat": 22.3, "lon": 114.1, "alt": 10.0, "status": 0},
    "imu": {"gyro": [0.0, 0.0, 0.1], "accel": [0.0, 0.0, 9.8]},
}


def test_envelope_matches_reference_shape():
    env = make_envelope(PAYLOAD)
    # sensor_recorder.cpp:421-428 field-for-field
    assert set(env) == {"message_id", "message_type", "sender", "message"}
    assert env["message_type"] == "GNSS_IMU_DATA"
    assert env["sender"] == "gnss_imu_sensor"
    assert env["message"]["timestamp"] == 1723190400  # rounded int
    assert env["message"]["gnss_data"]["lat"] == 22.3
    assert env["message"]["imu_data"]["accel"][2] == 9.8
    assert env["message_id"] != make_envelope(PAYLOAD)["message_id"]


def test_http_sink_loopback():
    received = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append(
                (self.path, self.headers["Content-Type"],
                 json.loads(self.rfile.read(n)))
            )
            self.send_response(201)  # the reference expects 201
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/api/ops/socket-message/"
        sink = HttpSink(url)
        sink(PAYLOAD)
        sink(PAYLOAD)
        assert sink.sent == 2 and sink.failed == 0
        assert sink.last_status == 201
        path, ctype, body = received[0]
        assert path == "/api/ops/socket-message/"
        assert ctype == "application/json"
        assert body["message_type"] == "GNSS_IMU_DATA"
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_sink_counts_failures():
    sink = HttpSink("http://127.0.0.1:9/nothing", timeout=0.3)
    sink(PAYLOAD)
    assert sink.failed == 1 and sink.sent == 0


def _ws_server(sock, frames, errors):
    """Minimal RFC 6455 server: handshake + read one text frame."""
    try:
        conn, _ = sock.accept()
        conn.settimeout(5.0)
        req = b""
        while b"\r\n\r\n" not in req:
            req += conn.recv(4096)
        key = None
        for line in req.decode().split("\r\n"):
            if line.lower().startswith("sec-websocket-key:"):
                key = line.split(":", 1)[1].strip()
        accept = base64.b64encode(
            hashlib.sha1(
                (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()
            ).digest()
        ).decode()
        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
            ).encode()
        )
        buf = b""
        while len(buf) < 2:
            buf += conn.recv(4096)
        fin_op, ln = buf[0], buf[1]
        assert ln & 0x80, "client frames must be masked"
        n = ln & 0x7F
        off = 2
        if n == 126:
            while len(buf) < 4:
                buf += conn.recv(4096)
            n = struct.unpack(">H", buf[2:4])[0]
            off = 4
        need = off + 4 + n
        while len(buf) < need:
            buf += conn.recv(4096)
        mask = buf[off:off + 4]
        data = bytes(
            b ^ mask[i % 4] for i, b in enumerate(buf[off + 4:need])
        )
        frames.append((fin_op & 0x0F, data))
        conn.close()
    except Exception as e:  # pragma: no cover
        errors.append(e)


def test_websocket_sink_loopback():
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    frames, errors = [], []
    t = threading.Thread(
        target=_ws_server, args=(srv, frames, errors), daemon=True
    )
    t.start()
    sink = WebSocketSink("127.0.0.1", port, "/ws")
    sink(PAYLOAD)
    t.join(timeout=10)
    srv.close()
    assert not errors, errors
    assert sink.sent == 1 and sink.failed == 0
    opcode, data = frames[0]
    assert opcode == 0x1  # text
    body = json.loads(data)
    assert body["message_type"] == "GNSS_IMU_DATA"
    assert body["message"]["gnss_data"]["lon"] == 114.1


def test_recorder_with_network_sink(tmp_path):
    """The recorder fans telemetry to local JSONL AND a network sink, like
    the reference writes the JSON file and uploads it."""
    received = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append(json.loads(self.rfile.read(n)))
            self.send_response(201)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cfg = RecorderConfig(out_dir=str(tmp_path), save_images=False,
                             save_clouds=False)
        rec = SensorRecorder(cfg)
        http = HttpSink(f"http://127.0.0.1:{srv.server_port}/t")
        rec._sink = multi_sink(rec._default_sink, http)
        for k in range(30):
            rec.on_imu(
                1000.0 + 0.1 * k,
                {"angular_velocity": np.zeros(3),
                 "linear_acceleration": np.array([0, 0, 9.8])},
            )
        rec.close()
        assert http.sent >= 2
        local = [
            json.loads(line)
            for line in open(tmp_path / "telemetry.jsonl")
        ]
        assert len(local) == http.sent
        assert received[0]["message"]["imu_data"]["accel"][2] == 9.8
    finally:
        srv.shutdown()
        srv.server_close()
