"""Extraction: pinned parser goldens + the byte-identical UDF invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from nlnieuwscrawler_spark.functions.extract import extract_udf
from nlnieuwscrawler_spark.functions.htmlparse import extract_html

GOLDENS = [
    (
        b"<html lang='nl'><head><title>  Kop \n van de  dag </title></head>"
        b"<body><p>Eerste <b>alinea</b>.</p><p></p><p>Tweede.</p>"
        b"<a href='/x.html'>x</a><a href='https://nos.nl/y'>y</a></body></html>",
        ("Kop van de dag", "Eerste alinea.\n\nTweede.", ["/x.html", "https://nos.nl/y"], "nl"),
    ),
    (
        b"<p>Caf&eacute; &amp; zo</p>",
        ("", "Caf\xe9 & zo", [], None),
    ),
    (  # unclosed <p>, implicit close by next <p>; anchor text inside p
        b"<title>t</title><p>een <a href='a.html'>link</a><p>twee</p>",
        ("t", "een link\n\ntwee", ["a.html"], None),
    ),
    (  # iso-8859-1 meta charset
        '<meta charset="iso-8859-1"><title>Caf\xe9</title><p>\xe9\xe9n</p>'.encode("iso-8859-1"),
        ("Café", "één", [], None),
    ),
    (  # second <title> ignored; html lang uppercase normalized, truncation
        b"<html LANG='NL-nl'><title>a</title><title>b</title><p>x</p></html>",
        ("a", "x", [], "nl"),
    ),
    (b"", ("", "", [], None)),
    (b"<<<>not html&#", ("", "", [], None)),
]


def test_parser_goldens():
    for html, want in GOLDENS:
        assert extract_html(html) == want, html[:60]


def test_udf_matches_pure_function(spark, tiny_pages_df):
    """The Arrow UDF must reproduce the generator's golden text column
    byte-identically for every url (BASELINE.json per-row invariant)."""
    out = tiny_pages_df.withColumn("e", extract_udf(F.col("html")))
    bad = out.filter(F.col("e.text") != F.col("text")).count()
    assert bad == 0
    # spot-check links/title are populated
    row = out.filter(F.length("e.title") > 0).select("e").first()
    assert row is not None


def test_determinism_across_parallelism(spark, tiny_pages_df):
    one = (
        tiny_pages_df.repartition(1)
        .withColumn("e", extract_udf(F.col("html")))
        .select("url", "warc_ts", F.col("e.text").alias("t"))
    )
    many = (
        tiny_pages_df.repartition(8)
        .withColumn("e", extract_udf(F.col("html")))
        .select("url", "warc_ts", F.col("e.text").alias("t"))
    )
    assert one.exceptAll(many).count() == 0 and many.exceptAll(one).count() == 0
