"""Stateful streaming: watermarked session-window aggregation.

The engine's batch sessionizer (operators/split.py sessionize) assigns
events to gap-based sessions with window functions; on a STREAM the
same semantics need state. Spark's native ``session_window`` +
watermark is the idiomatic form (SURVEY §2.10 / driver brief: prefer
built-in windowed aggregation over applyInPandasWithState when the
semantics fit — session windows are exactly the built-in case): state
is managed by the engine, late events within the watermark merge into
their session, and sessions finalize when the watermark passes their
close.

The same expression runs in BATCH mode unchanged, which is the
correctness anchor: ``stream == batch`` over any replay (tested with
an availableNow drain).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """events(user, ts, ...) → one row per finalized session:
    (user, session_start, session_end, n_events). On a streaming
    input the watermark bounds state: sessions older than
    ``watermark`` behind the max event time are emitted and dropped
    from the store — the knob that keeps state finite at 10^12
    events. On a batch input the same plan computes all sessions."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
