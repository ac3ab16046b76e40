"""Recrawl scheduling: per-source change-rate estimation → revisit policy.

The reference crawler refreshes everything on a fixed cadence (its
scheduler re-runs the whole crawl per invocation; see SURVEY §1 [R-crawl]
— nlnieuwscrawler has no per-page revisit model). At web scale a crawler
budgets revisits per host from an estimated CHANGE RATE (Cho &
Garcia-Molina, "Synchronizing a database to improve freshness", 2000):
sources that change often are recrawled often, static archives rarely.

``recrawl_schedule`` estimates the change rate from an observation log —
ordered samples ``(key, ts, value)`` where a value different from the
previous observation of the same key counts as one detected change — and
derives a clamped revisit interval:

    rate          = n_changes / span_hours        (changes per hour)
    revisit_hours = clamp(span_hours / n_changes, min_hours, max_hours)
    (no change ever observed → max_hours — the "static page" cadence)

100 TB shape: one window pass partitioned by key (lag over (ts, ord) —
parallel across keys, no global sort) feeding one map-side-combined
aggregation; output is |keys| rows. The observation log is the natural
input partitioning (a fetch log partitioned by host); nothing wide moves.
Determinism: the change flag is an exact value comparison, the span is
exact timestamp arithmetic (epoch seconds, the session_stats convention),
and the two divisions are single IEEE ops on identical operands in both
engines; only terminal outputs are rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_schedule(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    ord_col: str = "event_id",
    min_hours: float = 1.0,
    max_hours: float = 168.0,
) -> DataFrame:
    """Per-key change-rate + clamped revisit interval (hours).

    Returns (key, n_obs, n_changes, span_hours, change_rate,
    revisit_hours); ``ord_col`` breaks ts ties so the lag is a total
    order.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, ord_col)
    prev = F.lag(val_col).over(w)
    marked = df.select(
        key_col,
        ts_col,
        (prev.isNotNull() & (F.col(val_col) != prev))
        .cast("long")
        .alias("__chg"),
    )
    span_sec = F.max(F.col(ts_col)).cast("timestamp").cast("double") - F.min(
        F.col(ts_col)
    ).cast("timestamp").cast("double")
    agg = marked.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("__chg").cast("long").alias("n_changes"),
        (span_sec / F.lit(3600.0)).alias("__span_h"),
    )
    rate = F.when(
        (F.col("n_changes") > 0) & (F.col("__span_h") > 0.0),
        F.col("n_changes").cast("double") / F.col("__span_h"),
    ).otherwise(F.lit(0.0))
    revisit = F.when(
        (F.col("n_changes") > 0) & (F.col("__span_h") > 0.0),
        F.least(
            F.lit(float(max_hours)),
            F.greatest(
                F.lit(float(min_hours)),
                F.col("__span_h") / F.col("n_changes").cast("double"),
            ),
        ),
    ).otherwise(F.lit(float(max_hours)))
    return agg.select(
        key_col,
        "n_obs",
        "n_changes",
        F.round("__span_h", 4).alias("span_hours"),
        F.round(rate, 6).alias("change_rate"),
        F.round(revisit, 4).alias("revisit_hours"),
    )
