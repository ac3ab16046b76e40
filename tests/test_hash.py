"""pyhash parity: the pure-Python Murmur3/fingerprint must equal Spark's."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from nlnieuwscrawler_spark.functions.urls import url_fingerprint
from nlnieuwscrawler_spark.pyhash import spark_murmur3_32, url_fingerprint_py

SAMPLES = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "https://nu.nl/",
    "https://nos.nl/sport/2024/wedstrijd-1234.html?x=1",
    "café-überraschung-€",
    "\x00\x01\x02",
    "x" * 1000,
]


def test_murmur3_matches_spark_hash(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": SAMPLES}))
    got = {r["s"]: r["h"] for r in df.select("s", F.hash("s").alias("h")).collect()}
    for s in SAMPLES:
        assert spark_murmur3_32(s) == got[s], f"murmur mismatch for {s!r}"


def test_fingerprint_matches_spark(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": SAMPLES}))
    got = {
        r["s"]: r["fp"]
        for r in df.select("s", url_fingerprint(F.col("s")).alias("fp")).collect()
    }
    for s in SAMPLES:
        assert url_fingerprint_py(s) == got[s], f"fp mismatch for {s!r}"
