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
