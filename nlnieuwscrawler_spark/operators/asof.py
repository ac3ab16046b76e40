"""As-of join (O11 fetch simulation + a general time-series operator).

Spark has no native as-of join; the idiomatic composition (SURVEY §2 O11) is
an equi-join on the key plus a descending ``row_number() = 1`` window over
the time column — Catalyst plans the join as SMJ/shuffled-hash with AQE skew
splitting, and the window co-partitions with the join key so no extra
shuffle. For the fetch path the right side is pre-reduced per key first
(``latest_snapshot``) so the join carries ONE row per url instead of every
warc snapshot — at 100 TB that's the difference between joining the corpus
and joining a per-url index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot(
    df: DataFrame, key: str, ts_col: str, asof_ts=None
) -> DataFrame:
    """One row per key: the latest ts_col (≤ asof_ts when given).

    Two-pass: (1) tiny agg of max(ts) per key — only (key, ts) flows through
    aggregation buffers; (2) semi-join the full rows back. The fat payload
    columns (html, text) never enter an agg buffer or a struct copy — at
    corpus scale the single-pass max(struct(..., html)) variant buffers
    hundreds of MB per task and falls over (GC overhead OOM, measured).

    PRECONDITION: (key, ts_col) pairs are unique (a WARC-style corpus never
    records two captures of one url at the same instant). Violations would
    surface as duplicate keys in the output, not silent wrong answers.
    """
    src = df if asof_ts is None else df.filter(F.col(ts_col) <= asof_ts)
    latest = src.groupBy(key).agg(F.max(ts_col).alias(ts_col))
    others = [c for c in src.columns if c not in (key, ts_col)]
    return src.join(latest, on=[key, ts_col], how="left_semi").select(
        key, ts_col, *others
    )


def latest_snapshot_clustered(
    df: DataFrame, key: str, ts_col: str, fp_col, n_partitions: int
) -> DataFrame:
    """One row per key, output hash-CLUSTERED and sorted by ``fp_col`` —
    the fetch-index variant of :func:`latest_snapshot`.

    ONE corpus shuffle instead of two: ``latest_snapshot`` + an fp
    repartition moves the fat payload twice (measured at 200k pages:
    469 MiB through the semi-join's (key, ts) exchange + 515 MiB through
    the fp repartition — together more than every per-epoch shuffle of a
    whole crawl combined). Here the corpus repartitions by the 8-byte
    fingerprint ONCE; the per-key latest pick is a ``row_number`` window
    over (fp, key) — ``HashPartitioning(fp)`` satisfies the window's
    ``ClusteredDistribution(fp, key)`` (partitioning exprs ⊆ clustering
    exprs), so no second exchange, and the window's (fp, key, ts) sort
    leaves the output ordered by fp for downstream sort-merge reuse.

    Same precondition as latest_snapshot: (key, ts_col) pairs unique.
    ``fp_col`` may be a Column expression (computed fingerprint).
    """
    part = df.withColumn("__fp", fp_col).repartition(n_partitions, "__fp")
    w = Window.partitionBy("__fp", key).orderBy(F.col(ts_col).desc())
    return (
        part.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """For each left row: the right row with max right_ts ≤ left_ts (per key).

    General-purpose (events-style) as-of: join on the key, keep right rows
    not after the left timestamp, pick the latest via a descending
    row_number partitioned by a generated LEFT-ROW id — so duplicate left
    rows sharing (on, left_ts) each keep their own match (partitioning on
    (on, left_ts) would collapse them to one survivor). The unique id also
    makes the window shuffle skew-free: every partition is one left row's
    match set, so a hot join key can't serialize the rank stage.
    Deterministic tie-break on right columns is the caller's job if
    right_ts ties are possible.
    """
    lid = "__asof_lid"
    lcols = left.columns
    rcols = [c for c in right.columns if c != on]
    r = right.select(
        F.col(on),
        *[F.col(c).alias(c + suffix if c in lcols else c) for c in rcols],
    )
    rts = right_ts + suffix if right_ts in lcols else right_ts
    l = left.withColumn(lid, F.monotonically_increasing_id())
    if how == "left":
        # Single-reference plan: monotonically_increasing_id is
        # NONdeterministic, so ``l`` must be evaluated exactly ONCE. An
        # earlier version branched (rank window + anti-join for misses)
        # and pinned the ids with an eager localCheckpoint — which ran a
        # job at plan-construction time and leaked executor storage for
        # the session lifetime (never unpersisted). Instead: one LEFT
        # OUTER join, rank with qualifying matches first, keep rn=1, and
        # null out the right side when the kept row doesn't qualify. The
        # id is then only ever consumed inside the same single evaluation
        # (the window partitioning), exactly like the inner path.
        renamed = [c + suffix if c in lcols else c for c in rcols]
        joined = l.join(r, on=on, how="left")
        ok = F.coalesce(F.col(rts) <= F.col(left_ts), F.lit(False))
        w = Window.partitionBy(lid).orderBy(
            ok.desc(), F.col(rts).desc_nulls_last()
        )
        best = (
            joined.withColumn("__ok", ok)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
        )
        # non-qualifying survivor → typed-null pad (the column keeps its
        # own type through F.when, so the schema never drifts to NullType)
        for c in renamed:
            best = best.withColumn(
                c, F.when(F.col("__ok"), F.col(c))
            )
        return best.drop("__ok", "__rn", lid)
    joined = l.join(r, on=on, how="inner").filter(F.col(rts) <= F.col(left_ts))
    w = Window.partitionBy(lid).orderBy(F.col(rts).desc())
    best = joined.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")
    return best.drop(lid)
