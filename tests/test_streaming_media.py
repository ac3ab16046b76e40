"""Streaming/batch parity for the epoch plan + multimodal plumbing."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nlnieuwscrawler_spark.multimodal import media as mm
from nlnieuwscrawler_spark.operators import asof
from nlnieuwscrawler_spark.plans import epoch as epoch_plan
from nlnieuwscrawler_spark.sources import fixtures
from nlnieuwscrawler_spark.streaming.stream import run_epoch_stream

SF = "/root/testdata/sf0.001"


def test_foreachbatch_epoch_matches_batch(spark, tiny_pages_df, tmp_path):
    """The SAME epoch plan driven by foreachBatch over a frontier stream
    must produce the batch result for a single micro-batch."""
    seeds = fixtures.seeds_df(spark)
    frontier = epoch_plan.seeds_frontier(seeds)
    robots = fixtures.robots_df(spark)
    pages_latest = asof.latest_snapshot(tiny_pages_df, "url", "warc_ts")

    batch_res = epoch_plan.run_epoch(
        frontier, pages_latest, robots,
        spark.createDataFrame([], "url_fp long"), epoch=0,
    )
    want = batch_res.crawl_log.select("seq", "url", "status").toPandas()

    fdir = str(tmp_path / "frontier_stream")
    frontier.coalesce(1).write.parquet(fdir)
    fstream = spark.readStream.schema(frontier.schema).parquet(fdir)
    got_df = run_epoch_stream(spark, fstream, pages_latest, robots)
    got = got_df.select("seq", "url", "status").toPandas()

    pd.testing.assert_frame_equal(
        got.sort_values("seq").reset_index(drop=True),
        want.sort_values("seq").reset_index(drop=True),
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_media_decode_deterministic(spark, docs):
    m = mm.synth_media_from_documents(docs)
    f1 = mm.decode_features(m.repartition(1)).select("media_id", "feature").toPandas()
    f2 = mm.decode_features(m.repartition(6)).select("media_id", "feature").toPandas()
    f1 = f1.sort_values("media_id").reset_index(drop=True)
    f2 = f2.sort_values("media_id").reset_index(drop=True)
    assert all(list(a) == list(b) for a, b in zip(f1["feature"], f2["feature"]))
    assert all(len(v) == mm.FEATURE_DIM for v in f1["feature"])


def test_media_unimplemented_backends_raise(spark, docs):
    m = mm.synth_media_from_documents(docs)
    with pytest.raises(NotImplementedError):
        mm.decode_features(m, backend="pillow")
    with pytest.raises(ValueError):
        mm.decode_features(m, backend="nope")


def test_frame_sample_plan(spark, docs):
    m = mm.synth_media_from_documents(docs)
    frames = mm.frame_sample_plan(m, every_n=10)
    rows = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert rows, "video items must yield frame rows"
    meta = {r["media_id"]: r["n"] for r in rows}
    vids = {r["media_id"]: int(r["meta"]["n_frames"]) for r in m.filter(
        F.col("kind") == "video").select("media_id", "meta").collect()}
    for mid, n in meta.items():
        expect = max(1, (vids[mid] - 1) // 10 + 1)
        assert n == expect, (mid, n, expect)


def test_media_features_feed_similarity(spark, docs):
    """Decoded features are valid input for the ANN operator (plumbing)."""
    from nlnieuwscrawler_spark.operators.similarity import ann_bruteforce_topk

    feats = mm.decode_features(mm.synth_media_from_documents(docs.limit(50)))
    vecs = feats.select(F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding"))
    q = vecs.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_bruteforce_topk(vecs, q, k=3)
    assert out.count() == 6
