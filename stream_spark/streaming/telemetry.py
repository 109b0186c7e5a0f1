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


def observe_counts(df, name: str, *, flag_cols: dict | None = None):
    """Batch-side pipeline accounting via ``df.observe``: row count plus
    one SUM per 0/1 flag column, collected DURING the action (no
    second scan — the metrics ride the same pass, which at 100 TB is
    the difference between free accounting and doubling the job).
    Returns (observed_df, Observation); read ``obs.get`` after an
    action. The telemetry counterpart of the reference's per-stage
    metrics for batch pipelines — e.g. per-rule rejection rates from
    gopher_rules flags without a second aggregation job.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for out_name, col in (flag_cols or {}).items():
        metrics.append(F.sum(F.col(col).cast("long")).alias(out_name))
    return df.observe(obs, *metrics), obs
