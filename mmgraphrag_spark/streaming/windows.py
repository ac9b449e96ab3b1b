"""Event-time streaming operators: watermarked windowed aggregation and a
custom stateful counter (SURVEY.md §2.10 extension; round instructions:
"watermarks + windowed aggs for late data; applyInPandasWithState for custom
stateful operators").

The batch reference has no streaming surface; these are the Spark-idiomatic
building blocks an always-on ingest deployment of the KG pipeline needs:

- ``windowed_ingest_stats`` — documents/events arriving continuously, counted
  per (event-time window, source). The watermark bounds state AND drops
  late-beyond-watermark rows, so the sink sees each finalized window exactly
  once in append mode.
- ``running_source_totals`` — applyInPandasWithState: per-source cumulative
  counters that survive across micro-batches (the streaming analogue of the
  reference's already_processed progress counters), with a processing-time
  timeout that finalizes idle keys.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def windowed_ingest_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "source",
    value_col: str = "n_chars",
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window ingest statistics.

    Rows later than ``watermark_delay`` behind the max observed event time are
    DROPPED (not silently mis-aggregated), and window state is evicted once
    the watermark passes the window end — bounded state at any volume. Output
    (append mode): one finalized row per (window, key)."""
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_docs",
            "total_value",
        )
    )


_TOTALS_STATE = StructType([StructField("total", LongType())])
_TOTALS_OUT = StructType(
    [
        StructField("source", StringType()),
        StructField("total", LongType()),
        StructField("batch_rows", LongType()),
    ]
)


def _make_update_totals(idle_timeout_ms: int | None):
    def update_totals(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle key: emit a final marker row and drop the state
            (total,) = state.get
            state.remove()
            yield pd.DataFrame(
                {"source": [key[0]], "total": [total], "batch_rows": [-1]}
            )
            return
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += batch_rows
        state.update((total,))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"source": [key[0]], "total": [total], "batch_rows": [batch_rows]}
        )

    return update_totals


def running_source_totals(
    stream: DataFrame,
    key_col: str = "source",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key cumulative
    row counts that persist across micro-batches in the state store. Update
    output mode: one row per key per batch.

    ``idle_timeout_ms`` set -> ProcessingTimeTimeout: an idle key emits a
    final row (batch_rows = -1) and frees its state — but the query then
    keeps scheduling no-data batches to fire timeouts, so an availableNow
    drain never self-terminates. Leave it None (NoTimeout) for bounded
    backfills; set it only on genuinely always-on streams."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _make_update_totals(idle_timeout_ms),
            outputStructType=_TOTALS_OUT,
            stateStructType=_TOTALS_STATE,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
