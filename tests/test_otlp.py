"""OTLP/HTTP metrics exporter tests — a local collector stub receives
real ExportMetricsServiceRequest JSON (monitoring/otlp.rs parity)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from bitnet_tpu.obs.otlp import OTLPExporter, encode_metrics


class _Collector(BaseHTTPRequestHandler):
    received: list = []

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        type(self).received.append((self.path, json.loads(body)))
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *a):
        pass


@pytest.fixture()
def collector():
    _Collector.received = []
    srv = HTTPServer(("127.0.0.1", 0), _Collector)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", _Collector.received
    srv.shutdown()


class TestEncode:
    def test_gauges_and_sums(self):
        req = encode_metrics({"active_slots": 3.0, "tokens_total": 42.0},
                             {"service.name": "x"})
        rm = req["resourceMetrics"][0]
        assert rm["resource"]["attributes"][0]["key"] == "service.name"
        metrics = {m["name"]: m for m in rm["scopeMetrics"][0]["metrics"]}
        assert "gauge" in metrics["bitnet.active_slots"]
        s = metrics["bitnet.tokens_total"]["sum"]
        assert s["isMonotonic"] and s["aggregationTemporality"] == 2
        assert s["dataPoints"][0]["asDouble"] == 42.0


class TestExporter:
    def test_push_to_collector(self, collector):
        endpoint, received = collector
        exp = OTLPExporter(lambda: {"queue_depth": 2.0,
                                    "requests_total": 7.0},
                           endpoint=endpoint)
        assert exp.enabled
        assert exp.export_once()
        assert exp.exported == 1
        path, body = received[0]
        assert path == "/v1/metrics"
        names = [m["name"] for m in
                 body["resourceMetrics"][0]["scopeMetrics"][0]["metrics"]]
        assert "bitnet.queue_depth" in names
        assert "bitnet.requests_total" in names

    def test_disabled_without_endpoint(self, monkeypatch):
        monkeypatch.delenv("OTEL_EXPORTER_OTLP_ENDPOINT", raising=False)
        exp = OTLPExporter(lambda: {})
        assert not exp.enabled
        assert exp.export_once() is False
        exp.start()          # no-op
        assert exp._thread is None

    def test_failure_counted_not_raised(self):
        exp = OTLPExporter(lambda: {"x": 1.0},
                           endpoint="http://127.0.0.1:1",   # nothing there
                           timeout_s=0.5)
        assert exp.export_once() is False
        assert exp.failed == 1

    def test_background_loop(self, collector):
        endpoint, received = collector
        exp = OTLPExporter(lambda: {"x": 1.0}, endpoint=endpoint,
                           interval_s=0.05)
        exp.start()
        import time
        deadline = time.time() + 5
        while not received and time.time() < deadline:
            time.sleep(0.02)
        exp.stop()
        assert received

    def test_env_endpoint(self, monkeypatch, collector):
        endpoint, received = collector
        monkeypatch.setenv("OTEL_EXPORTER_OTLP_ENDPOINT", endpoint)
        exp = OTLPExporter(lambda: {"y": 2.0})
        assert exp.enabled and exp.export_once()
