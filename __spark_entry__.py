"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: a multi-epoch crawl of the deterministic
Common-Crawl-style fixture corpus (BASELINE.json input_hint shape) through
the full engine (canonicalize → fingerprint → Bloom URL-seen → robots →
politeness rank → fetch as-of join → extraction UDF → lang gate), joined
with a scan of the driver's sf0.001 documents table. Returns the per-host
crawl summary (rows > 0, stable schema).

``queries()`` / ``oracle_sql()`` — operator registry checked against
DuckDB at sf0.01 (see nlnieuwscrawler_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from nlnieuwscrawler_spark.plans.crawler import Crawler, CrawlConfig
    from nlnieuwscrawler_spark.sources import fixtures

    pages = fixtures.gen_pages_spark(spark, 600, partitions=8)
    crawler = Crawler(
        spark,
        pages,
        fixtures.robots_df(spark),
        store=None,
        config=CrawlConfig(
            max_epochs=3,
            use_bloom=True,
            bloom_partitions=8,
            bloom_expected_keys=1 << 14,
            checkpoint=False,
        ),
    )
    crawler.run(seeds=fixtures.seeds_df(spark))
    log = crawler.crawl_log()

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    doc_stats = docs.agg(F.count("*").alias("sf_docs"))

    summary = (
        log.groupBy("host")
        .agg(
            F.count("*").alias("attempted"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("fetched_ok"),
            F.min("seq").alias("first_seq"),
            F.max("seq").alias("last_seq"),
            F.max("depth").alias("max_depth"),
        )
        .crossJoin(F.broadcast(doc_stats))
        .orderBy("host")
    )
    return summary


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from nlnieuwscrawler_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every SQL-expressible query."""
    from nlnieuwscrawler_spark.queries import ORACLE

    return dict(ORACLE)
