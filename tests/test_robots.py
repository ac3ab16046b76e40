"""Robots semantics: engine rule eval ≡ stdlib urllib.robotparser (the
reference's robots implementation), first-match-in-file-order, allow default.
"""

from __future__ import annotations

import urllib.robotparser

import pandas as pd
from pyspark.sql import functions as F

from nlnieuwscrawler_spark.operators.robots import robots_allowed, robots_filter
from nlnieuwscrawler_spark.sources import fixtures

PATHS = [
    "/",
    "/sport/live-verslag.html",
    "/sport/uitslagen.html",
    "/sport",
    "/tag/voetbal.html",
    "/zoeken?q=x",
    "/zoeken/resultaat.html",
    "/premium/artikel.html",
    "/video/item.html",
    "/binnenland/2024/item.html",
]


def _stdlib_decisions() -> list[tuple[str, str, bool]]:
    out = []
    for host in fixtures.ROBOTS_FIXTURE:
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(fixtures.robots_txt(host).splitlines())
        for p in PATHS:
            out.append((host, p, rp.can_fetch("nlnieuwscrawler", f"https://{host}{p}")))
    return out


def test_engine_matches_stdlib_robotparser(spark):
    want = _stdlib_decisions()
    cand = spark.createDataFrame(
        pd.DataFrame([{"host": h, "path": p} for h, p, _ in want])
    )
    joined = cand.join(
        fixtures.robots_df(spark).select("host", "rules"), "host", "left"
    ).withColumn("allowed", robots_allowed(F.col("path"), F.col("rules")))
    got = {
        (r["host"], r["path"]): r["allowed"]
        for r in joined.select("host", "path", "allowed").collect()
    }
    for host, p, allowed in want:
        assert got[(host, p)] == allowed, (host, p)


def test_unknown_host_allowed(spark):
    cand = spark.createDataFrame(
        pd.DataFrame([{"host": "volkskrant.nl", "path": "/x.html", "url_fp": 1}])
    )
    out = robots_filter(cand, fixtures.robots_df(spark))
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["crawl_delay"] is None


def test_disallow_all_host_filtered(spark):
    cand = spark.createDataFrame(
        pd.DataFrame([{"host": "nrc.nl", "path": "/x.html", "url_fp": 1}])
    )
    assert robots_filter(cand, fixtures.robots_df(spark)).count() == 0
