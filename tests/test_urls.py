"""Canonicalization: Spark native exprs ≡ pure-Python twin, + pinned cases."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nlnieuwscrawler_spark.functions import urls as U
from nlnieuwscrawler_spark.oracle import pyurls
from nlnieuwscrawler_spark.sources import fixtures

BASE = "https://nu.nl/sport/2024/wedstrijd-voetbal-123.html?ref=home"

CASES = [
    # (href, expected canonical)
    ("https://nos.nl/artikel/x.html", "https://nos.nl/artikel/x.html"),
    ("HTTPS://NOS.nl/Artikel/X.html", "https://nos.nl/Artikel/X.html"),
    ("//nos.nl/a.html", "https://nos.nl/a.html"),
    ("/binnenland/item.html", "https://nu.nl/binnenland/item.html"),
    ("item2.html", "https://nu.nl/sport/2024/item2.html"),
    ("../tech/item3.html", "https://nu.nl/sport/tech/item3.html"),
    ("../../x.html", "https://nu.nl/x.html"),
    ("../../../x.html", "https://nu.nl/x.html"),  # over-popping clamps at root
    ("./same.html", "https://nu.nl/sport/2024/same.html"),
    ("?page=2", "https://nu.nl/sport/2024/wedstrijd-voetbal-123.html?page=2"),
    ("item.html#frag", "https://nu.nl/sport/2024/item.html"),
    ("#top", None),
    ("", None),
    ("mailto:x@y.nl", None),
    ("MAILTO:x@y.nl", None),
    ("javascript:void(0)", None),
    ("tel:+31201234567", None),
    ("ftp://ftp.x.nl/f", None),
    ("/logo.png", None),
    ("/app.JS", None),
    ("/feed.rss", None),
    ("https://nu.nl:443/a.html", "https://nu.nl/a.html"),
    ("http://nu.nl:80/a.html", "http://nu.nl/a.html"),
    ("https://nu.nl:8080/a.html", "https://nu.nl:8080/a.html"),
    ("https://NU.NL./a.html", "https://nu.nl/a.html"),
    ("https://nu.nl../a.html", "https://nu.nl/a.html"),  # all trailing dots
    ("http://..", None),   # dot-only authority (idempotency regression)
    ("http://.", None),
    ("https://nu.nl", "https://nu.nl/"),
    ("https://nu.nl//a//b.html", "https://nu.nl/a/b.html"),
    ("https://nu.nl/a/b/", "https://nu.nl/a/b/"),
    ("https://nu.nl/a/b/.", "https://nu.nl/a/b/"),
    ("https://nu.nl/a/?q=1#f", "https://nu.nl/a/?q=1"),
    ("https://nu.nl/a.html?", "https://nu.nl/a.html"),
]


@pytest.fixture(scope="module")
def spark_results(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"base": [BASE] * len(CASES), "href": [c[0] for c in CASES]})
    )
    rows = df.select(
        "href", U.canonicalize(F.col("base"), F.col("href")).alias("canon")
    ).collect()
    return {r["href"]: r["canon"] for r in rows}


def test_pinned_cases_spark(spark_results):
    for href, want in CASES:
        assert spark_results[href] == want, f"spark canon({href!r})"


def test_pinned_cases_python():
    for href, want in CASES:
        assert pyurls.canonicalize(BASE, href) == want, f"py canon({href!r})"


def test_parity_on_fixture_corpus(spark):
    """Every href the fixture generator emits canonicalizes identically."""
    n = 300
    pairs = []
    for i in range(n):
        base = fixtures.page_url(i)
        for href in fixtures.page_links(i, n):
            pairs.append((base, href))
    pdf = pd.DataFrame(pairs, columns=["base", "href"])
    df = spark.createDataFrame(pdf)
    got = [
        r["canon"]
        for r in df.select(
            U.canonicalize(F.col("base"), F.col("href")).alias("canon")
        ).collect()
    ]
    # collect preserves input order for a no-shuffle plan over one batch;
    # zip against the python twin
    want = [pyurls.canonicalize(b, h) for b, h in pairs]
    assert got == want


def test_host_and_path(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"u": ["https://nu.nl:8080/a/b.html?q=1#f", "https://nos.nl/"]})
    )
    rows = df.select(
        U.url_host(F.col("u")).alias("h"), U.url_path(F.col("u")).alias("p")
    ).collect()
    assert (rows[0]["h"], rows[0]["p"]) == ("nu.nl", "/a/b.html")
    assert (rows[1]["h"], rows[1]["p"]) == ("nos.nl", "/")
    assert pyurls.url_host("https://nu.nl:8080/a/b.html?q=1#f") == "nu.nl"
    assert pyurls.url_path("https://nu.nl:8080/a/b.html?q=1#f") == "/a/b.html"


def test_parity_on_adversarial_random_urls(spark):
    """Seeded random fuzz over structured-adversarial URLs (mixed case,
    default/odd ports, dot segments, fragments, tracking params, unicode,
    junk schemes): Spark canonicalization must equal the Python twin on
    every one. Catches divergence the 31 pinned cases don't cover."""
    import random

    rng = random.Random(1234)
    schemes = ["http", "https", "HTTP", "ftp", "", "javascript"]
    hosts = ["nu.nl", "WWW.Nu.NL", "ad.nl:443", "tweakers.net:8080",
             "例え.jp", "a.b.example", "localhost"]
    paths = ["", "/", "/a/b/../c", "/./x/./y/", "/a//b", "/nieuws/artikel",
             "/A%2Fb", "/img/pic.JPG", "/x?b=2&a=1", "/p?utm_source=x&id=3",
             "/frag#sec", "/sp ace", "/uniëke"]
    cases = []
    for _ in range(500):
        u = (f"{rng.choice(schemes)}://{rng.choice(hosts)}"
             f"{rng.choice(paths)}")
        if rng.random() < 0.2:
            u = u.replace("://", ":/", 1)  # malformed
        if rng.random() < 0.2:
            u = " " + u + " "
        cases.append(u)
        cases.append(rng.choice(paths))  # relative forms
    pdf = pd.DataFrame({"u": cases})
    got = [
        r["c"]
        for r in spark.createDataFrame(pdf)
        .select(U.normalize_url(F.col("u")).alias("c"))
        .collect()
    ]
    want = [pyurls.normalize_url(u) for u in cases]
    mismatches = [
        (u, g, w) for u, g, w in zip(cases, got, want) if g != w
    ]
    assert not mismatches, mismatches[:5]


# --------------------------------------------------------------------------
# property-based (hypothesis) — on the pure-Python twin, which tests/test_urls
# proves Spark-identical on pinned + fuzzed corpora above
# --------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_urlish = st.one_of(
    st.text(max_size=80),
    st.builds(
        lambda scheme, host, path, q, frag: f"{scheme}://{host}{path}{q}{frag}",
        st.sampled_from(["http", "https", "HTTP", "ftp", "mailto"]),
        st.from_regex(r"[A-Za-z0-9.\-]{1,20}(:[0-9]{1,5})?", fullmatch=True),
        st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,10}){0,4}/?", fullmatch=True),
        st.sampled_from(["", "?a=1", "?a=1&b=2", "?"]),
        st.sampled_from(["", "#frag", "#", "#a/b?c"]),
    ),
)


@settings(max_examples=300, deadline=None)
@given(u=_urlish)
def test_normalize_idempotent_property(u):
    """normalize ∘ normalize ≡ normalize: a canonical URL re-entering the
    frontier (every discovered link does) must not drift — otherwise
    fingerprints change between epochs and the seen-set breaks."""
    from nlnieuwscrawler_spark.oracle import pyurls

    once = pyurls.normalize_url(u)
    if once is not None:
        assert pyurls.normalize_url(once) == once


@settings(max_examples=300, deadline=None)
@given(base=_urlish, href=st.one_of(_urlish, st.sampled_from(
    ["../a", "./b", "//cdn.x.nl/i.js", "?q=1", "#f", "a/b/../c", ""])))
def test_canonicalize_absolute_or_rejected_property(base, href):
    """canonicalize either rejects (None) or yields an absolute http(s) URL
    that is itself a fixpoint of normalize — the frontier invariant."""
    from nlnieuwscrawler_spark.oracle import pyurls

    nb = pyurls.normalize_url(base)
    if nb is None:
        return
    out = pyurls.canonicalize(nb, href)
    if out is not None:
        assert out.startswith(("http://", "https://"))
        assert "#" not in out
        assert pyurls.normalize_url(out) == out


def test_url_host_twins_agree_on_trailing_dots(spark):
    """Engine url_host and the pure-Python twin must agree on multi-
    trailing-dot authorities (review regression: only normalize_url had
    been updated to strip ALL trailing dots)."""
    import pandas as pd

    from nlnieuwscrawler_spark.functions import urls as U
    from nlnieuwscrawler_spark.oracle import pyurls

    cases = ["https://NU.NL./a", "https://nu.nl../a", "http://x.y.nl/a",
             "https://a.b:8080/c", "http://.."]
    df = spark.createDataFrame(pd.DataFrame({"u": cases}))
    eng = {r["u"]: r["h"] for r in
           df.select("u", U.url_host(F.col("u")).alias("h")).collect()}
    for u in cases:
        assert eng[u] == pyurls.url_host(u), u


def test_url_quality_filter_gates(spark):
    """Each gate trips independently; empty path and case-folded
    blocklist segments behave; normal news URLs pass."""
    from nlnieuwscrawler_spark.functions.urls import url_quality_filter

    rows = [
        (1, "https://a.nl/news/2026/article-title"),   # keep
        (2, "https://a.nl/" + "/".join(["p"] * 10)),   # depth 10 > 8
        (3, "https://a.nl/x?a=1&b=2&c=3&d=4&e=5"),     # 5 params > 4
        (4, "https://a.nl/1234567890"),                # digit ratio > 0.5
        (5, "https://a.nl/stuff/XXX/more"),            # blocked, case-folded
        (6, "https://a.nl"),                           # empty path: ratio 0
        (7, "https://a.nl/ok?x=1"),                    # keep
        (8, "https://a.nl/" + "z" * 600),              # too long
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_quality_filter(df).collect()}
    assert out[1]["keep"] and out[6]["keep"] and out[7]["keep"]
    assert not out[2]["keep"] and out[2]["depth"] == 10
    assert not out[3]["keep"] and out[3]["n_params"] == 5
    assert not out[4]["keep"] and out[4]["digit_ratio"] == 0.909091
    assert out[5]["blocked"] and not out[5]["keep"]
    assert out[6]["digit_ratio"] == 0.0 and out[6]["depth"] == 0
    assert not out[8]["keep"] and out[8]["n_chars"] == 613
    # blocklist is exact-segment, not substring: 'xxxl' must pass
    df2 = spark.createDataFrame(
        [(9, "https://a.nl/xxxl/shop")], "doc_id long, url string"
    )
    assert url_quality_filter(df2).collect()[0]["keep"]


def test_url_quality_filter_zero_shuffle_plan(spark):
    """The 100 TB claim: a pure projection — no Exchange at all."""
    from nlnieuwscrawler_spark.functions.urls import url_quality_filter

    df = spark.createDataFrame(
        [(i, f"https://h{i}.nl/a/b?x={i}") for i in range(10)],
        "doc_id long, url string",
    )
    plan = url_quality_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bitext_candidates_pairing_rules(spark):
    """Same host + same normalized path + different lang segment pairs;
    different host/page or no lang segment never pairs; bare language
    segments ('/nl') pair; lang_a < lang_b canonical ordering."""
    from nlnieuwscrawler_spark.functions.urls import bitext_candidates

    rows = [
        (1, "https://a.nl/nl/artikel-5"),
        (2, "https://a.nl/en/artikel-5"),
        (3, "https://a.nl/de/artikel-5"),
        (4, "https://b.nl/en/artikel-5"),       # other host
        (5, "https://a.nl/nl/other"),           # other page
        (6, "https://a.nl/nonlang/artikel-5"),  # no lang segment
        (7, "https://a.nl/nl"),
        (8, "https://a.nl/en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {(r["doc_a"], r["doc_b"]) for r in bitext_candidates(df).collect()}
    assert got == {(2, 1), (3, 1), (3, 2), (8, 7)}
    rows2 = [r for r in bitext_candidates(df).collect()]
    assert all(r["lang_a"] < r["lang_b"] for r in rows2)
    # 'nonlang' is not a prefix-match trap: '/nl...' inside it must not fire
    assert not any(6 in (a, b) for a, b in got)
