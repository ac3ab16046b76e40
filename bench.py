#!/usr/bin/env python3
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR + crawl throughput.

Prints ONE JSON line:
  {"metric": "total_headline_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "crawl": {"frontier_urls_per_sec": ..., "attempted": ..., "epochs": ...}}

Flags:
  --scaling   run the crawl at local[8] AND local[32] on identical input and
              report throughput + scaling efficiency (north_rule evidence);
              writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _bench_pages_path(n_pages: int) -> str:
    return f"/tmp/nlnc_bench_pages_{n_pages}"


def _ensure_bench_corpus(spark, n_pages: int) -> str:
    """Generate (once) the deterministic pages corpus used for crawl bench."""
    path = _bench_pages_path(n_pages)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from nlnieuwscrawler_spark.sources import fixtures

        fixtures.gen_pages_spark(spark, n_pages).write.mode("overwrite").parquet(path)
    return path


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    from nlnieuwscrawler_spark.queries import QUERIES

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0
    return timings


def run_crawl(spark, n_pages: int, epochs: int = 3) -> dict:
    from nlnieuwscrawler_spark.plans.crawler import Crawler, CrawlConfig
    from nlnieuwscrawler_spark.sources import fixtures

    pages = spark.read.parquet(_ensure_bench_corpus(spark, n_pages))
    t0 = time.perf_counter()
    c = Crawler(
        spark,
        pages,
        fixtures.robots_df(spark),
        store=None,
        config=CrawlConfig(
            max_epochs=epochs,
            use_bloom=True,
            salt=4,
            bloom_partitions=32,
            bloom_expected_keys=max(1 << 16, n_pages * 16),
            checkpoint=False,
        ),
    )
    c.run(seeds=fixtures.seeds_df(spark))
    # frontier URLs processed = attempted + candidates still carried
    processed = sum(m["attempted"] for m in c.metrics_rows)
    frontier_rows = c.frontier.count()
    wall = time.perf_counter() - t0
    total_flow = processed + frontier_rows  # URLs that moved through the pipeline
    return {
        "attempted": processed,
        "frontier_end": frontier_rows,
        "epochs": c.epoch,
        "wall_sec": round(wall, 3),
        "frontier_urls_per_sec": round(total_flow / wall, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = _sf_from_dir(sf_dir)
    n_pages = max(2000, int(200_000 * sf))

    from nlnieuwscrawler_spark.session import get_spark

    if "--scaling" in sys.argv:
        results = {}
        for cores in (8, 32):
            spark = get_spark(
                f"nlnc-bench-{cores}", master=f"local[{cores}]",
                shuffle_partitions=cores,
            )
            crawl = run_crawl(spark, n_pages, epochs=4)
            results[cores] = crawl
            spark.stop()
        t8 = results[8]["frontier_urls_per_sec"]
        t32 = results[32]["frontier_urls_per_sec"]
        eff = round((t32 / t8) / 4.0, 3)
        out = {
            "metric": "scaling_efficiency_8_to_32",
            "value": eff,
            "unit": "ratio",
            "local8": results[8],
            "local32": results[32],
            "sf": sf,
        }
        print(json.dumps(out))
        return

    spark = get_spark("nlnc-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    timings = run_queries(spark, sf_dir)
    crawl = run_crawl(spark, n_pages)
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "crawl": crawl,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
