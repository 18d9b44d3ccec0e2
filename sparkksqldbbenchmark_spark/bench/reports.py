"""Report emitters (SURVEY.md §2.1 S14-S16): text report, JSON metrics,
Prometheus exposition text. Driver-side formatting over already-aggregated
scalars — the only place in the engine that touches Python string building,
after the heavy lifting finished on the executors."""

from __future__ import annotations

import json

from sparkksqldbbenchmark_spark.bench.latency import LatencyMetrics


def text_report(m: LatencyMetrics, *, title: str = "LATENCY REPORT") -> str:
    """S14 — the monitor's formatted report
    (LatencyMonitor.scala:304-392). %.2f formatting done correctly — the
    reference's committed reports are corrupted by a broken format string
    (BASELINE.md note)."""
    q = m.quality()
    lines = [
        "=" * 50,
        title,
        "=" * 50,
        f"Valid samples:    {m.sample_count}",
        f"Average latency:  {m.avg_ms:.2f} ms   [{q['avg']}]",
        f"Median (P50):     {m.p50_ms:.2f} ms",
        f"P95 latency:      {m.p95_ms:.2f} ms",
        f"P99 latency:      {m.p99_ms:.2f} ms   [{q['p99']}]",
        f"Min latency:      {m.min_ms:.2f} ms",
        f"Max latency:      {m.max_ms:.2f} ms",
        f"Std deviation:    {m.stddev_ms:.2f} ms   [{q['stddev']}]",
        "=" * 50,
    ]
    return "\n".join(lines)


def json_report(m: LatencyMetrics) -> str:
    """S16 — JSON metrics export (MetricsExporter.scala:89-117)."""
    return json.dumps(
        {
            "sample_count": m.sample_count,
            "avg_ms": round(m.avg_ms, 2),
            "p50_ms": m.p50_ms,
            "p95_ms": m.p95_ms,
            "p99_ms": m.p99_ms,
            "min_ms": m.min_ms,
            "max_ms": m.max_ms,
            "stddev_ms": round(m.stddev_ms, 2),
            "quality": m.quality(),
        }
    )


def prometheus_text(m: LatencyMetrics, *, prefix: str = "benchmark") -> str:
    """S15 — Prometheus exposition format (MetricsExporter.scala:16-84
    serves the same gauges over HTTP; serving is deployment glue, the
    format is the contract)."""
    gauges = {
        "latency_avg_ms": m.avg_ms,
        "latency_p50_ms": m.p50_ms,
        "latency_p95_ms": m.p95_ms,
        "latency_p99_ms": m.p99_ms,
        "latency_min_ms": m.min_ms,
        "latency_max_ms": m.max_ms,
        "latency_stddev_ms": m.stddev_ms,
        "sample_count": float(m.sample_count),
    }
    out = []
    for name, val in gauges.items():
        out.append(f"# TYPE {prefix}_{name} gauge")
        out.append(f"{prefix}_{name} {val}")
    return "\n".join(out) + "\n"


def resources_prometheus_text(
    summary: dict, *, prefix: str = "benchmark"
) -> str:
    """A11's exporter half: the resource-sampler summary
    (bench/resources.py — reference BenchmarkRunner.scala:96-146 gauge
    averaging) as Prometheus gauges."""
    out = []
    for name in (
        "cpu_avg_pct",
        "cpu_peak_pct",
        "rss_avg_mb",
        "rss_peak_mb",
        "samples",
    ):
        out.append(f"# TYPE {prefix}_resource_{name} gauge")
        out.append(f"{prefix}_resource_{name} {float(summary[name])}")
    return "\n".join(out) + "\n"


class MetricsServer:
    """S15's serving half (MetricsExporter.scala:16-84): a stdlib
    http.server thread exposing the current Prometheus exposition text
    at /metrics (and a liveness 200 at /). The payload is a callable so
    the bench harness can re-point it at fresh metrics between queries
    without restarting the server; everything served is an
    already-formatted string — no Spark objects cross this thread.

    Usage:
        srv = MetricsServer(lambda: prometheus_text(metrics))
        port = srv.start()          # OS-assigned free port by default
        ... curl :port/metrics ...
        srv.stop()
    """

    def __init__(self, payload, *, host: str = "127.0.0.1", port: int = 0):
        self._payload = payload
        self._host = host
        self._port = port
        self._httpd = None
        self._thread = None

    def start(self) -> int:
        import http.server
        import threading

        payload = self._payload

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib casing)
                if self.path not in ("/metrics", "/"):
                    self.send_error(404)
                    return
                if self.path == "/":
                    body = b"ok\n"
                    ctype = "text/plain"
                else:
                    body = payload().encode("utf-8")
                    ctype = "text/plain; version=0.0.4; charset=utf-8"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # silence per-request stderr
                pass

        self._httpd = http.server.ThreadingHTTPServer(
            (self._host, self._port), Handler
        )
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._thread.join(timeout=5)
            self._httpd = None
            self._thread = None

    def __enter__(self) -> "MetricsServer":
        self.start()
        return self

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def __exit__(self, *exc) -> None:
        self.stop()
