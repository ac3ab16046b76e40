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


def test_fingerprint_halves_independent(spark):
    """Regression: the fp's two murmur32 halves must be INDEPENDENT.

    Murmur3's finalizer is a bijection of (state ^ len), so for two
    same-length strings an h1 collision implies identical pre-final state
    — and a common SUFFIX salt then collides h2 with probability 1,
    collapsing the '64-bit' fp to 32 bits for same-length URLs (~29
    expected full collisions in the 500k same-length keys below; measured
    9 real ones in the 10^6-URL bench corpus). The prefix-salted form is
    a true 64-bit fp: expected collisions here ~7e-9.
    """
    df = spark.range(500_000).select(
        F.concat(
            F.lit("https://x.nl/"),
            F.lpad(F.col("id").cast("string"), 12, "0"),
        ).alias("u")
    )
    n = df.select(url_fingerprint(F.col("u")).alias("fp")).distinct().count()
    assert n == 500_000


def test_minhash_signatures_seeded_deterministic_and_independent(spark):
    """Regression for the seeded-hash-in-lambda evaluation bugs (see
    minhash_signatures' docstring): ``xxhash64(lambdavar, lit(h))``
    ignores the seed literal, and even the concat-the-seed lambda form
    returns DIFFERENT values for the same input across invocations.
    The signature stage is therefore explode+agg; pin (a) entries VARY
    across seeds, (b) each entry equals a directly-computed per-string
    reference, (c) two invocations in one session agree."""
    from pyspark.sql import functions as F

    from nlnieuwscrawler_spark.operators.dedup import minhash_signatures

    rows = [
        (1, ["alpha beta gamma", "beta gamma delta", "gamma delta eps"]),
        (2, ["one two three", "two three four"]),
        (3, ["mail <EMAIL> nu", "<EMAIL> nu einde?", "a b c"]),
    ]
    df = spark.createDataFrame(rows, ["id", "grams"])
    k = 8

    def sig_map():
        return {
            r["id"]: [r[f"__h{h}"] for h in range(k)]
            for r in minhash_signatures(df, k).collect()
        }

    sigs = sig_map()
    # (a) a 3-gram doc with 8 seeds must not produce one constant value
    for i, sig in sigs.items():
        assert len(set(sig)) > 1, f"doc {i}: signature degenerate: {sig}"
    # (b) reference: hash each seeded string as a LITERAL (no lambdas,
    # no lambda-adjacent context), take mins in python
    for doc_id, grams in rows:
        for h in range(k):
            vals = [
                spark.range(1)
                .select(F.xxhash64(F.lit(s + "\x00" + str(h))))
                .collect()[0][0]
                for s in grams
            ]
            assert sigs[doc_id][h] == min(vals), (doc_id, h)
    # (c) cross-invocation determinism (the lambda form failed THIS)
    assert sig_map() == sigs
