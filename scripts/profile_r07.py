#!/usr/bin/env python3
"""Round-7 optimization profiler (guide §1): isolate phases of the heavy
registry queries at sf0.1 so changes target measured cost, not guesses.

Usage: python scripts/profile_r07.py [phase ...]
Phases: components, novelty, semdedup, curate, queries (default: all).
Prints one timing line per probe; reps are run back-to-back in ONE
session, so rep-1 includes codegen/worker warmup and rep-2+ shows the
steady-state cost.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nlnieuwscrawler_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn, reps=3):
    outs = []
    for i in range(reps):
        t0 = time.perf_counter()
        fn()
        outs.append(round(time.perf_counter() - t0, 3))
    print(f"{label:48s} {outs}", flush=True)
    return outs


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    phases = set(sys.argv[1:]) or {"components", "novelty", "semdedup", "curate", "queries"}
    spark = get_spark("r07-profile", master="local[32]", shuffle_partitions=32)
    spark.range(1000).select(F.xxhash64("id")).count()  # JVM warm
    load = lambda name: spark.read.parquet(f"{SF}/{name}.parquet")  # noqa: E731

    if "components" in phases:
        from nlnieuwscrawler_spark.operators.dedup import (
            dedup_components,
            ngram_jaccard_pairs,
        )

        d = load("documents")
        t("jaccard_pairs(0.7) alone", lambda: ngram_jaccard_pairs(d, threshold=0.7))
        pairs = ngram_jaccard_pairs(d, threshold=0.7)
        print("  pairs rows:", pairs.count())
        stats = {}
        t("components loop (pairs precomputed)",
          lambda: noop(dedup_components(pairs, stats=stats)))
        print("  rounds:", stats.get("rounds"), stats.get("round_secs"))

    if "novelty" in phases:
        from nlnieuwscrawler_spark.functions.text import ngram_novelty

        d = load("documents")
        t("ngram_novelty", lambda: noop(ngram_novelty(d)))

    if "semdedup" in phases:
        from nlnieuwscrawler_spark.operators.clustering import (
            _assign,
            _fit_centroids,
            kmeans_embeddings,
            semdedup,
        )

        e = load("embeddings")
        base = e.select("vec_id", "embedding")
        t("kmeans fit (k=8, iters=3)",
          lambda: _fit_centroids(base, 8, 3, "embedding", "vec_id"))
        cents = _fit_centroids(base, 8, 3, "embedding", "vec_id")
        t("assign projection only", lambda: noop(_assign(base, cents, "embedding")))
        t("semdedup end-to-end", lambda: noop(semdedup(e, k=8, iters=3)))
        t("kmeans end-to-end", lambda: noop(kmeans_embeddings(e, k=8, iters=3)))

    if "curate" in phases:
        from nlnieuwscrawler_spark.queries import QUERIES

        t("q_curate_pipeline", lambda: QUERIES["curate_pipeline"](spark, SF).count(), reps=3)

    if "queries" in phases:
        from nlnieuwscrawler_spark.queries import QUERIES

        for name in [
            "dedup_components", "dedup_retention", "dedup_retention_best",
            "ngram_novelty", "semdedup", "kmeans_embeddings", "ann_ivf",
            "ann_lsh", "ann_bruteforce", "cosine_neardup", "containment_pairs",
            "ngram_jaccard_pairs", "minhash_lsh_pairs", "perplexity_buckets",
            "lm_bigram_score", "shard_pack", "plan_crawl", "stateful_budget",
            "crawl_epoch", "python_datasource", "stream_stream_join",
            "range_join", "trustrank", "host_pagerank", "ntile_buckets",
            "simhash_pairs", "bm25_search",
        ]:
            t(name, lambda n=name: QUERIES[n](spark, SF).count(), reps=3)


if __name__ == "__main__":
    main()
