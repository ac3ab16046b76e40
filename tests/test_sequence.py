"""global_sequence ≡ single-window row_number (exact, any partitioning)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nlnieuwscrawler_spark.operators.sequence import global_sequence

SF = "/root/testdata/sf0.001"


def test_matches_window_row_number(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    want = e.withColumn(
        "seq", (F.row_number().over(Window.orderBy(*order)) + 100).cast("long")
    ).select("event_id", "seq")
    got = global_sequence(e, order, base=100).select("event_id", "seq")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_partitioning_invariance(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    a = global_sequence(e.repartition(1), order, num_partitions=3).select("event_id", "seq")
    b = global_sequence(e.repartition(11), order, num_partitions=7).select("event_id", "seq")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_empty_input(spark):
    e = spark.createDataFrame([], "event_id long, ts timestamp")
    out = global_sequence(e, [F.col("ts").asc(), F.col("event_id").asc()])
    assert out.count() == 0


def test_global_running_sum_matches_window(spark):
    """Parallel prefix sum ≡ SUM() OVER (ORDER BY …) exactly, any input
    partitioning."""
    from nlnieuwscrawler_spark.operators.sequence import global_running_sum

    e = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", (F.col("event_id") % 37).alias("v")
    )
    order = [F.col("event_id").asc()]
    want = e.withColumn(
        "running",
        F.sum(F.col("v").cast("long")).over(
            Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).select("event_id", "running")
    for parts in (1, 7):
        got = global_running_sum(
            e.repartition(parts), order, "v", sum_col="running"
        ).select("event_id", "running")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


def test_shard_pack_invariants(spark):
    """Manifest order is the md5 draw; running is the exact inclusive
    prefix sum; every interior shard's token mass lands in
    [shard_tokens - max_doc + 1, shard_tokens + max_doc - 1] (a doc
    straddles at most one boundary)."""
    from nlnieuwscrawler_spark.functions.text import token_count_ws
    from nlnieuwscrawler_spark.operators.sampling import shard_pack

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", token_count_ws(F.col("text")).alias("n_tokens")
    )
    st = 1500
    out = shard_pack(d, shard_tokens=st).toPandas()
    out = out.sort_values("running").reset_index(drop=True)
    assert (out["running"].diff().dropna() == out["n_tokens"][1:].values).all()
    assert (out["shard_id"].diff().dropna() >= 0).all()  # contiguous runs
    assert ((out["running"] - out["n_tokens"]) // st == out["shard_id"]).all()
    per = out.groupby("shard_id")["n_tokens"].sum()
    mx = int(out["n_tokens"].max())
    interior = per.iloc[:-1]  # last shard may be short
    assert (interior >= st - mx + 1).all() and (interior <= st + mx - 1).all()


def test_ntile_from_rank_matches_sql_ntile(spark):
    """Closed-form NTILE ≡ SQL ntile() for awkward N % k remainders."""
    from nlnieuwscrawler_spark.operators.sequence import ntile_from_rank

    for n, k in [(10, 4), (7, 3), (12, 5), (5, 5), (3, 7), (100, 1)]:
        df = spark.range(1, n + 1).select(
            F.col("id").alias("__rk"), F.lit(n).cast("long").alias("__n")
        )
        got = df.select(
            "__rk", ntile_from_rank("__rk", "__n", k).alias("b")
        )
        want = df.select(
            "__rk",
            F.ntile(k).over(Window.orderBy("__rk")).cast("long").alias("b"),
        )
        assert got.exceptAll(want).count() == 0, (n, k)
        assert want.exceptAll(got).count() == 0, (n, k)


def test_ntile_buckets_plan_has_no_global_window(spark):
    """VERDICT r5 #2: the registry's global-NTILE query must carry NO
    unpartitioned WindowExec — the rank is global_sequence's
    range-partitioned parallel sort, the bucket closed-form arithmetic."""
    from nlnieuwscrawler_spark.queries import q_ntile_buckets

    out = q_ntile_buckets(spark, SF)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
