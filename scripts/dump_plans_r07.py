#!/usr/bin/env python3
"""Dump .explain("formatted") for the r7-touched registry queries.

Usage: python scripts/dump_plans_r07.py <outdir> <suffix>
e.g.   python scripts/dump_plans_r07.py plans/r07 after

Run from the tree whose plans you want (round-start worktree for
"before", HEAD for "after"). Queries that materialize eagerly during
construction (iterative/composite ops) execute their internal jobs; the
captured plan is the RETURNED frame's plan, and the file notes that the
interesting shape for those ops lives in the internal stages (the
OPTIMIZATION_r07.md entries quote the relevant operator code instead).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_TO_DUMP = [
    "semdedup",
    "kmeans_embeddings",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "ngram_novelty",
    "lm_bigram_score",
    "perplexity_buckets",
    "host_pagerank",
    "trustrank",
    "crawl_depth",
    "plan_crawl",
]


def _explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def dump_curate_chains(spark, sf_dir, outdir, suffix):
    """Two targeted captures for the curate composite, where the
    registry query's returned frame is an opaque checkpoint scan:

    - curate_ingest_chain: the cleaned-corpus chain BEFORE its lineage
      cut (url gate -> incremental dedup -> line rules -> line dedup ->
      boilerplate -> pii). The r7 claim this file verifies: no
      id-keyed corpus join anywhere; the only Exchanges under it belong
      to the incremental anti-join (hash-keyed; broadcastable history)
      and the boilerplate survivor-set aggregation feeding a
      BroadcastExchange.
    - curate_audit: the stage-count union BEFORE materialization — the
      docs/url_gate/incremental legs must be scan+project aggregates,
      not replays of join pipelines.
    """
    from pyspark.sql import functions as F

    from nlnieuwscrawler_spark.operators.curate import curate
    from nlnieuwscrawler_spark.queries import _curate_frontier, load

    lined = _curate_frontier(spark, sf_dir)
    did = F.col("doc_id")
    corpus = lined.filter(did % 31 != 0)
    hist = (
        lined.filter(did % 13 == 2)
        .select(F.md5(F.col("text")).alias("content_hash"))
        .distinct()
    )
    ev = load(spark, sf_dir, "documents").filter(did % 9 == 1).select(
        F.col("doc_id").alias("eval_id"), "text"
    )

    if suffix == "before":
        # reconstruct the r6-form chain (stage frames joined back on id)
        # from the public per-stage functions, which exist in both trees
        from nlnieuwscrawler_spark.functions.text import (
            boilerplate_scrub,
            c4_line_rules,
            dedup_lines,
            pii_scrub,
        )
        from nlnieuwscrawler_spark.functions.urls import url_quality_filter
        from nlnieuwscrawler_spark.operators.dedup import dedup_incremental

        url_ids = (
            url_quality_filter(corpus, url_col="url")
            .filter(F.col("keep"))
            .select("doc_id")
        )
        urld = corpus.join(url_ids, "doc_id")
        incd = dedup_incremental(urld, hist).drop("content_hash")
        lr = (
            c4_line_rules(incd)
            .filter(~F.col("drop_page") & (F.col("n_kept") > 0))
            .select("doc_id", F.col("text_clean").alias("text"))
        )
        cleaned = incd.drop("text").join(lr, "doc_id")
        dl = dedup_lines(cleaned).select(
            "doc_id", F.col("text_dedup").alias("text")
        )
        cleaned = cleaned.drop("text").join(dl, "doc_id")
        bs = boilerplate_scrub(cleaned, min_docs=3).select(
            "doc_id", F.col("text_clean").alias("text")
        )
        cleaned = cleaned.drop("text").join(bs, "doc_id")
        cleaned = cleaned.withColumn(
            "text", pii_scrub(F.col("text"))["text_clean"]
        )
    else:
        # r7 form: zero-shuffle expression chain
        from nlnieuwscrawler_spark.functions.text import (
            boilerplate_scrub_struct,
            boilerplate_sets,
            c4_line_struct,
            line_dedup_struct,
            pii_scrub,
        )
        from nlnieuwscrawler_spark.functions.urls import url_quality_struct
        from nlnieuwscrawler_spark.operators.dedup import dedup_incremental

        urld = corpus.filter(url_quality_struct(F.col("url"))["keep"])
        incd = dedup_incremental(urld, hist).drop("content_hash")
        c4 = c4_line_struct(F.col("text"))
        cleaned = (
            incd.withColumn("__c4", c4)
            .filter(~F.col("__c4.drop_page") & (F.col("__c4.n_kept") > 0))
            .withColumn("text", F.col("__c4.text_clean"))
            .drop("__c4")
            .withColumn(
                "text", line_dedup_struct(F.col("text"))["text_dedup"]
            )
        )
        ba = boilerplate_sets(cleaned, min_docs=3)
        bl = F.coalesce(F.col("__bl"), F.array().cast("array<string>"))
        cleaned = (
            cleaned.join(F.broadcast(ba), on="source", how="left")
            .withColumn(
                "text",
                boilerplate_scrub_struct(F.col("text"), bl)["text_clean"],
            )
            .drop("__bl")
            .withColumn("text", pii_scrub(F.col("text"))["text_clean"])
        )
    with open(
        os.path.join(outdir, f"curate_ingest_chain_{suffix}.txt"), "w"
    ) as f:
        f.write(
            "# curate() cleaned-corpus chain BEFORE the lineage cut —\n"
            "# url gate + incremental dedup + line rules + line dedup +\n"
            "# boilerplate + pii as composed in operators/curate.py.\n\n"
        )
        f.write(_explain_str(cleaned))

    res = curate(
        corpus, eval_docs=ev, seen_hashes=hist, url_col="url",
        line_rules=True, line_dedup=True, boilerplate_min_docs=3, pii=True,
        near_dup="jaccard", near_dup_threshold=0.7,
        retention_quality_col="n_chars", span_dedup=16, decon_min_overlap=8,
        quota=7, salt=4, capacity=256, pack_buckets=8,
    )
    with open(os.path.join(outdir, f"curate_audit_{suffix}.txt"), "w") as f:
        f.write(
            "# curate() stage-count union (the audit) before\n"
            "# materialization.\n\n"
        )
        f.write(_explain_str(res.stage_counts))
    res.unpersist()
    print("wrote curate_ingest_chain / curate_audit")


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r07"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from nlnieuwscrawler_spark.session import get_spark
    from nlnieuwscrawler_spark.queries import QUERIES

    spark = get_spark("plan-dump", master="local[32]", shuffle_partitions=32)
    try:
        dump_curate_chains(spark, sf_dir, outdir, suffix)
    except Exception as e:  # round-start tree lacks the r7 helpers
        print("curate chain dump skipped:", repr(e)[:200])
    for name in QUERIES_TO_DUMP:
        if name not in QUERIES:
            print(f"skip {name} (not in registry)")
            continue
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — returned-frame physical plan "
                f"(explain formatted), sf_dir={sf_dir}\n"
                "# NOTE: eagerly-materializing operators (iterative loops,\n"
                "# localCheckpoint-returning ops) show a scan of the\n"
                "# checkpointed result here; their internal stage shapes\n"
                "# are documented per-operator in OPTIMIZATION_r07.md.\n\n"
            )
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
