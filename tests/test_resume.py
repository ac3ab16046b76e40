"""Checkpoint/resume: kill after epoch k, resume → identical crawl_log
(north_rule "resumes exactly mid-frontier"), and snapshot atomicity."""

from __future__ import annotations

import pandas as pd
import pytest

from nlnieuwscrawler_spark.plans.crawler import Crawler, CrawlConfig
from nlnieuwscrawler_spark.sources import fixtures
from nlnieuwscrawler_spark.sources.tableio import SnapshotStore

N_EPOCHS = 4
KILL_AFTER = 2


def _cfg():
    return CrawlConfig(
        max_epochs=N_EPOCHS,
        use_bloom=True,
        bloom_partitions=8,
        bloom_expected_keys=1 << 14,
        checkpoint=True,
    )


def _log(c: Crawler) -> pd.DataFrame:
    return (
        c.crawl_log()
        .select("epoch", "seq", "url", "url_fp", "host", "depth", "fetch_ts", "status")
        .toPandas()
        .sort_values("seq")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def uninterrupted(spark, tiny_pages_df, tmp_path_factory):
    store = SnapshotStore(str(tmp_path_factory.mktemp("snap_full")))
    c = Crawler(spark, tiny_pages_df, fixtures.robots_df(spark), store, _cfg())
    c.run(seeds=fixtures.seeds_df(spark))
    return c


def test_kill_and_resume_identical(spark, tiny_pages_df, tmp_path_factory, uninterrupted):
    store = SnapshotStore(str(tmp_path_factory.mktemp("snap_kill")))
    c1 = Crawler(spark, tiny_pages_df, fixtures.robots_df(spark), store, _cfg())
    c1.start(fixtures.seeds_df(spark))
    for _ in range(KILL_AFTER):
        c1.step()
    # "crash": abandon c1 entirely; a NEW crawler resumes from the store
    c2 = Crawler(spark, tiny_pages_df, fixtures.robots_df(spark), store, _cfg())
    c2.resume()
    assert c2.epoch == KILL_AFTER
    for _ in range(N_EPOCHS - KILL_AFTER):
        if not c2.frontier.take(1):
            break
        c2.step()
    pd.testing.assert_frame_equal(_log(c2), _log(uninterrupted))
    got_seen = {r["url_fp"] for r in c2.seen().collect()}
    want_seen = {r["url_fp"] for r in uninterrupted.seen().collect()}
    assert got_seen == want_seen


def test_manifest_lineage_recorded(uninterrupted):
    m = uninterrupted.store.read_manifest()
    assert m["epoch"] == N_EPOCHS - 1
    fr = m["tables"]["frontier"]
    assert fr["lineage"] is not None and sum(b["rows"] for b in fr["lineage"]) == fr["rows"]
    assert "seen_keys" in m["tables"] and "bloom" in m["tables"]


def test_expire_snapshots_keeps_current_readable(spark, uninterrupted):
    store = uninterrupted.store
    store.expire_snapshots(keep_last=1)
    cur = store.current_version()
    assert store.read_table(spark, "frontier", cur).count() >= 0
    assert store.read_table(spark, "seen_keys", cur).count() > 0
