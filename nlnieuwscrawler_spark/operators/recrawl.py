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


def snapshot_delta(
    df: DataFrame,
    key_cols: list[str] | str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    ord_col: str = "event_id",
) -> DataFrame:
    """Crawl-snapshot diff: what changed between the two halves of the
    observation window — the signal an incremental crawler acts on.

    The window splits at the integer epoch midpoint ``(min+max) div 2``
    (exact bigint arithmetic, identical in any engine). Per key, the
    latest observation (by ts, then ``ord_col``) on each side yields:

        new       — first observed after the split (freshly discovered)
        stale     — not observed since the split (recrawl overdue)
        changed   — observed both sides, latest values differ
        unchanged — observed both sides, same value

    100 TB shape: ONE map-side-combined aggregation over the log — the
    split bound is a 1-row broadcast, both sides' latest values come
    from FILTERed ``max_by`` in the same groupBy, and there is no join
    of two snapshot tables at all; output is |keys| rows. ``max_by`` on
    a (ts, ord) struct is a total order, so values carry over exactly
    (no float arithmetic — statuses compare raw stored doubles).
    """
    # NTZ fixture timestamps reject a direct long cast — route via
    # timestamp (the session_stats convention); epoch seconds stay exact
    ep = F.col(ts_col).cast("timestamp").cast("long")
    bounds = df.agg(
        F.floor((F.min(ep) + F.max(ep)) / F.lit(2)).cast("long").alias("__split")
    )
    old_v = F.expr(
        f"max_by({val_col}, struct({ts_col}, {ord_col})) "
        f"FILTER (WHERE cast(cast({ts_col} as timestamp) as long) <= __split)"
    )
    new_v = F.expr(
        f"max_by({val_col}, struct({ts_col}, {ord_col})) "
        f"FILTER (WHERE cast(cast({ts_col} as timestamp) as long) > __split)"
    )
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    agg = (
        df.crossJoin(F.broadcast(bounds))
        .groupBy(*keys)
        .agg(old_v.alias("old_value"), new_v.alias("new_value"))
    )
    status = (
        F.when(F.col("old_value").isNull(), F.lit("new"))
        .when(F.col("new_value").isNull(), F.lit("stale"))
        .when(F.col("old_value") != F.col("new_value"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return agg.select(*keys, "old_value", "new_value",
                      status.alias("status"))


def revision_diff(
    df: DataFrame,
    page_col: str = "page",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Consecutive-snapshot text diff per page → (page, ts, n_tokens,
    word_jaccard, changed): for every crawl snapshot, the word-set
    Jaccard against the SAME page's previous snapshot. This is the
    content-level change signal behind recrawl scheduling —
    ``snapshot_delta`` answers "did the fingerprint move", this answers
    "HOW MUCH moved" (a timestamp-only edit scores ~1.0, a rewrite ~0),
    which is what Cho/Garcia-Molina-style revisit policies actually
    want to threshold on. First snapshot of a page → NULL jaccard/
    changed; two empty snapshots are identical (jaccard 1.0).

    Tokens are the repo convention (lowercase, whitespace split,
    empties dropped) deduplicated per snapshot; jaccard =
    round(|A∩B| / (|A|+|B|−|A∩B|), 6); ``changed`` = jaccard < 1.

    100 TB shape: ONE window shuffle keyed by page (a page has a
    handful of snapshots — no hot partitions), carrying the
    deduplicated token array; the set arithmetic is codegen
    higher-order functions. At extreme scale the array can be
    pre-hashed to 64-bit tokens to shrink the exchange (xxhash64 per
    token) — kept as raw tokens here for cross-engine exactness.
    """
    toks = F.array_distinct(
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda x: x != "",
        )
    )
    w = Window.partitionBy(page_col).orderBy(ts_col)
    t = df.select(
        F.col(page_col), F.col(ts_col), toks.alias("__t")
    ).withColumn("__p", F.lag("__t").over(w))
    inter = F.size(F.array_intersect(F.col("__t"), F.col("__p")))
    union = F.size("__t") + F.size("__p") - inter
    jacc = F.when(F.col("__p").isNull(), F.lit(None).cast("double")).otherwise(
        F.when(union == 0, F.lit(1.0)).otherwise(
            F.round(inter.cast("double") / union, 6)
        )
    )
    return t.select(
        F.col(page_col),
        F.col(ts_col),
        F.size("__t").cast("long").alias("n_tokens"),
        jacc.alias("word_jaccard"),
        F.when(F.col("__p").isNull(), F.lit(None).cast("boolean"))
        .otherwise(jacc < 1.0)
        .alias("changed"),
    )
