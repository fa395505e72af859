"""Prometheus metrics endpoint over Spark streaming-query progress.

The reference plans "Prometheus metrics endpoint; latency/throughput
metrics" (MILESTONES.md M4 Observability) on top of its pipeline metrics
module (src/core/util/pipeline/metrics.rs). Spark already produces the
numbers — every micro-batch emits a StreamingQueryProgress — so the
Spark-first build is a listener that snapshots the newest progress per
query plus a stdlib HTTP server rendering them in the Prometheus text
exposition format (text/plain; version=0.0.4). No dependencies.

Usage::

    ep = start_metrics(spark)         # ep.port -> scrape target
    ...run streaming queries...
    # GET http://127.0.0.1:{ep.port}/metrics
    ep.stop()

Exported per query (labels: query name or id):

- engine_spark_input_rows_total          (counter)
- engine_spark_batches_total             (counter)
- engine_spark_input_rows_per_second     (gauge, newest batch)
- engine_spark_processed_rows_per_second (gauge, newest batch)
- engine_spark_batch_duration_ms         (gauge, newest triggerExecution)
- engine_spark_state_rows               (gauge, summed over state operators)
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _fmt(v) -> str:
    try:
        f = float(v)
    except (TypeError, ValueError):
        return "0"
    return repr(int(f)) if f.is_integer() else repr(f)


class MetricsEndpoint:
    """StreamingQueryListener + /metrics HTTP server."""

    def __init__(self, spark, host: str = "127.0.0.1", port: int = 0):
        from pyspark.sql.streaming import StreamingQueryListener

        self._lock = threading.Lock()
        #: query label -> {"rows": cumulative, "batches": n, "last": dict}
        self._q: dict[str, dict] = {}
        ep = self

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                label = p.name or str(p.id)
                with ep._lock:
                    st = ep._q.setdefault(
                        label, {"rows": 0, "batches": 0, "last": {}}
                    )
                    st["rows"] += int(p.numInputRows or 0)
                    st["batches"] += 1
                    st["last"] = {
                        "input_rps": p.inputRowsPerSecond or 0.0,
                        "processed_rps": p.processedRowsPerSecond or 0.0,
                        "duration_ms": (p.durationMs or {}).get(
                            "triggerExecution", 0
                        ),
                        "state_rows": sum(
                            (s.numRowsTotal or 0)
                            for s in (p.stateOperators or [])
                        ),
                    }

            def onQueryTerminated(self, event):
                pass

            def onQueryIdle(self, event):
                pass

        self._listener = _Listener()
        self._spark = spark
        spark.streams.addListener(self._listener)

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: D102 - silence stderr
                pass

            def do_GET(self):
                if self.path not in ("/metrics", "/"):
                    self.send_response(404)
                    self.end_headers()
                    return
                body = ep.render().encode("utf-8")
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._srv = ThreadingHTTPServer((host, port), _Handler)
        self.port = self._srv.server_address[1]
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()

    def render(self) -> str:
        """Prometheus text exposition of the current snapshot."""
        lines = []

        def metric(name, mtype, help_, per_query):
            lines.append(f"# HELP {name} {help_}")
            lines.append(f"# TYPE {name} {mtype}")
            with self._lock:
                for label, st in self._q.items():
                    lines.append(
                        f'{name}{{query="{label}"}} {_fmt(per_query(st))}'
                    )

        metric("engine_spark_input_rows_total", "counter",
               "Cumulative input rows across batches",
               lambda st: st["rows"])
        metric("engine_spark_batches_total", "counter",
               "Completed micro-batches",
               lambda st: st["batches"])
        metric("engine_spark_input_rows_per_second", "gauge",
               "Newest batch input rate",
               lambda st: st["last"].get("input_rps", 0))
        metric("engine_spark_processed_rows_per_second", "gauge",
               "Newest batch processing rate",
               lambda st: st["last"].get("processed_rps", 0))
        metric("engine_spark_batch_duration_ms", "gauge",
               "Newest batch triggerExecution duration",
               lambda st: st["last"].get("duration_ms", 0))
        metric("engine_spark_state_rows", "gauge",
               "Stateful-operator rows, newest batch",
               lambda st: st["last"].get("state_rows", 0))
        return "\n".join(lines) + "\n"

    def stop(self) -> None:
        try:
            self._spark.streams.removeListener(self._listener)
        except Exception:  # noqa: BLE001 - session may already be stopped
            pass
        self._srv.shutdown()
        self._srv.server_close()


def start_metrics(spark, host: str = "127.0.0.1",
                  port: int = 0) -> MetricsEndpoint:
    """Attach the listener and serve /metrics; returns the endpoint
    (``.port`` is the bound scrape target, ``.stop()`` detaches)."""
    return MetricsEndpoint(spark, host, port)
