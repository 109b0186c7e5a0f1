"""Pipeline telemetry (reference: service/telemetry publishes per-stage
metrics over a socket). Spark-side: a StreamingQueryListener that
collects per-query progress — rows/sec, batch durations, state size —
into an in-memory ring the host app can export."""

from __future__ import annotations

from collections import deque

from pyspark.sql.streaming import StreamingQueryListener


class TelemetryListener(StreamingQueryListener):
    def __init__(self, keep: int = 256):
        self.progress: deque = deque(maxlen=keep)
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.progress.append(
            {
                "id": p.id,
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_second": p.inputRowsPerSecond,
                "duration_ms": dict(p.durationMs) if p.durationMs else {},
            }
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(event.id)

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass

    def summary(self) -> dict:
        rows = sum(p["num_input_rows"] for p in self.progress)
        return {"queries_started": len(self.started), "total_rows": rows, "batches": len(self.progress)}
