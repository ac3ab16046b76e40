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


def detect_bursts(
    df: DataFrame,
    key_cols: list,
    ord_col: str = "bucket",
    val_col: str = "n",
    trail: int = 3,
    factor: float = 2.0,
) -> DataFrame:
    """Trailing-window burst detection per key → (keys…, ord, val,
    trail_mean, burst): flag observations more than ``factor``× the
    mean of the previous ``trail`` observations of the SAME key — the
    crawl-monitoring alarm ("this host suddenly serves 5× the pages":
    a template explosion, a calendar trap, or an rss-loop; on the
    politeness side, OUR OWN fetch counts bursting means the scheduler
    broke). First observation of a key has no history → NULL
    trail_mean/burst.

    trail_mean = round(sum(prev ``trail`` vals) / count, 6) over a ROWS
    BETWEEN ``trail`` PRECEDING AND 1 PRECEDING frame — integer sums,
    one IEEE division, identical in DuckDB.

    100 TB shape: the input is an already-aggregated (key, bucket,
    count) table — |keys|×|buckets| rows, tiny next to the corpus — and
    the op is ONE window over it, partitioned by key (bounded buckets
    per key → no hot partitions). Nothing else moves.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ord_col)
        .rowsBetween(-trail, -1)
    )
    cnt = F.count(F.col(val_col)).over(w)
    mean = F.when(cnt == 0, F.lit(None).cast("double")).otherwise(
        F.round(F.sum(F.col(val_col)).over(w).cast("double") / cnt, 6)
    )
    out = df.select(
        *key_cols,
        F.col(ord_col),
        F.col(val_col),
        mean.alias("trail_mean"),
    )
    return out.withColumn(
        "burst",
        F.when(F.col("trail_mean").isNull(), F.lit(None).cast("boolean"))
        .otherwise(
            F.col(val_col).cast("double") > F.lit(factor) * F.col("trail_mean")
        ),
    )
