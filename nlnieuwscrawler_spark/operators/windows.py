"""Time-window operators: tumbling / sliding / session (batch + streaming).

Batch sessionization uses the gaps-and-islands composition (lag + cumsum
over an ordered window) — same semantics as streaming ``session_window``,
but SQL-expressible so the DuckDB oracle can check it. The streaming forms
live in nlnieuwscrawler_spark/streaming/stream.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts_col: str, width: str = "1 hour") -> Column:
    return F.window(F.col(ts_col), width)


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a session_id per key: a new session starts when the gap from
    the previous event exceeds ``gap_seconds`` (gaps-and-islands).

    Scale shape: one shuffle (window partitionBy key); co-partitioned with
    any downstream per-session aggregate, so sessionize→agg is one exchange.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col))
    # NTZ-safe epoch seconds (parquet timestamps read as TIMESTAMP_NTZ in
    # Spark 4; session TZ is pinned UTC so the LTZ cast preserves values)
    ts_sec = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(ts_col).over(w)
    gap = ts_sec - prev.cast("timestamp").cast("double")
    is_new = F.when(prev.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session stats: events, span seconds (crawl-session shape O18)."""
    s = sessionize(df, key_col, ts_col, gap_seconds)
    return (
        s.groupBy(key_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (
                F.max(F.col(ts_col)).cast("timestamp").cast("double")
                - F.min(F.col(ts_col)).cast("timestamp").cast("double")
            ).alias("span_sec"),
        )
    )
