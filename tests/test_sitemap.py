from __future__ import annotations

import pandas as pd

from nlnieuwscrawler_spark.operators.sitemap import parse_sitemap, sitemap_candidates

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://nos.nl/artikel/a-1.html</loc><lastmod>2026-01-01</lastmod></url>
  <url><loc> https://nos.nl/artikel/a-2.html </loc></url>
  <url><loc>/relatief/pad.html</loc></url>
  <url><loc>https://nos.nl/video/clip.mp4</loc></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://nos.nl/sitemap-1.xml</loc></sitemap>
  <sitemap><loc>https://nos.nl/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""

MALFORMED = "<urlset><url><loc>https://nu.nl/x.html</loc></url><url>"


def test_parse_urlset():
    locs, is_index = parse_sitemap(URLSET)
    assert len(locs) == 4 and not is_index
    assert locs[1] == "https://nos.nl/artikel/a-2.html"  # whitespace stripped


def test_parse_index():
    locs, is_index = parse_sitemap(INDEX)
    assert is_index and locs == [
        "https://nos.nl/sitemap-1.xml",
        "https://nos.nl/sitemap-2.xml",
    ]


def test_parse_malformed_falls_back():
    locs, is_index = parse_sitemap(MALFORMED)
    assert locs == ["https://nu.nl/x.html"] and not is_index


def test_candidates_pipeline(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"sitemap_url": ["https://nos.nl/sitemap.xml"] * 2, "xml": [URLSET, INDEX]}
        )
    )
    out = sitemap_candidates(docs).toPandas()
    urls = set(out["url"])
    # relative loc resolved against the sitemap url; media extension rejected
    assert "https://nos.nl/relatief/pad.html" in urls
    assert not any(u.endswith(".mp4") for u in urls)
    assert (out[out["url"].str.contains("sitemap-")]["is_index"]).all()
    assert out["url_fp"].is_unique
