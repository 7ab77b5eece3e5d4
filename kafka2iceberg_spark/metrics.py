"""Streaming observability (X3): per-batch throughput/watermark/state metrics.

The sink already records data lineage (per-partition offset ranges + counts
per snapshot, sink.py); this module adds the runtime side: a
``StreamingQueryListener`` capturing each micro-batch's input rows,
processing rate, event-time watermark, and state-store rows — optionally
appended as JSON lines next to the table so operators can trend ingest
throughput without scraping driver logs.

Usage:
    listener = ThroughputListener(path="/warehouse/tbl/_metrics.jsonl")
    spark.streams.addListener(listener)
    ... run queries ...
    listener.records  # in-memory list of dicts, newest last
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ThroughputListener(StreamingQueryListener):
    """Collects per-progress metrics; thread-safe, bounded memory."""

    def __init__(self, path: str | None = None, keep_last: int = 1000) -> None:
        self.path = path
        self.keep_last = keep_last
        self.records: list[dict] = []
        self._lock = threading.Lock()

    # -- listener callbacks --------------------------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        self._emit(
            {"event": "started", "query_id": str(event.id), "name": event.name}
        )

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state = []
        for op in p.stateOperators or []:
            state.append(
                {
                    "operator": op.operatorName,
                    "rows_total": op.numRowsTotal,
                    "rows_updated": op.numRowsUpdated,
                    "rows_dropped_by_watermark": op.numRowsDroppedByWatermark,
                }
            )
        observed = {}
        try:
            for name, row in (p.observedMetrics or {}).items():
                observed[name] = row.asDict()
        except Exception:  # noqa: BLE001 - observedMetrics shape varies
            pass
        self._emit(
            {
                "event": "progress",
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "input_rows": p.numInputRows,
                "rows_per_sec": p.processedRowsPerSecond,
                "batch_duration_ms": (p.durationMs or {}).get("triggerExecution"),
                "watermark": (p.eventTime or {}).get("watermark"),
                "state": state,
                "observed": observed,
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self._emit(
            {
                "event": "terminated",
                "query_id": str(event.id),
                "exception": event.exception,
            }
        )

    # -- internals -----------------------------------------------------------

    def _emit(self, rec: dict) -> None:
        with self._lock:
            self.records.append(rec)
            if len(self.records) > self.keep_last:
                del self.records[: -self.keep_last]
            if self.path:
                os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
                with open(self.path, "a") as fh:
                    fh.write(json.dumps(rec, default=str) + "\n")

    # -- summaries -----------------------------------------------------------

    def throughput(self) -> dict:
        """Aggregate turns/sec over all progress records (0-safe)."""
        prog = [r for r in self.records if r["event"] == "progress"]
        rows = sum(r["input_rows"] or 0 for r in prog)
        ms = sum(r["batch_duration_ms"] or 0 for r in prog)
        return {
            "batches": len(prog),
            "rows": rows,
            "wall_ms": ms,
            "rows_per_sec": round(rows * 1000 / ms, 1) if ms else 0.0,
        }
