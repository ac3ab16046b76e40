"""O20: XML sitemap expansion into frontier candidates.

Robots rulesets advertise sitemap URLs (fixture: nos.nl). The reference
shape (SURVEY §2 O20, confidence R-low) parses ``<urlset><url><loc>`` and
``<sitemapindex><sitemap><loc>`` documents into crawlable URLs.

Spark form: sitemap XML payloads are just another binary/string column —
parse per Arrow batch with the stdlib XML parser (pandas UDF), ``explode``
the resulting url arrays, and feed the standard canonicalize → fingerprint
→ seen-filter path. Index documents yield their child sitemap urls with
``is_index=true`` so the caller can fetch-and-recurse a bounded number of
levels (sitemap trees are shallow; 2 levels covers the spec).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nlnieuwscrawler_spark.functions import urls as U

_LOC_RE = re.compile(r"<loc>\s*([^<]+?)\s*</loc>")

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("locs", T.ArrayType(T.StringType())),
        T.StructField("is_index", T.BooleanType()),
    ]
)


def parse_sitemap(xml_text: str) -> tuple[list[str], bool]:
    """(loc urls, is_index). Strict XML first; regex fallback for the
    malformed-but-common case. Deterministic, document order."""
    if not xml_text:
        return [], False
    try:
        root = ET.fromstring(xml_text)
        tag = root.tag.rsplit("}", 1)[-1].lower()
        is_index = tag == "sitemapindex"
        locs = [
            el.text.strip()
            for el in root.iter()
            if el.tag.rsplit("}", 1)[-1].lower() == "loc" and el.text
        ]
        return locs, is_index
    except ET.ParseError:
        return _LOC_RE.findall(xml_text), "<sitemapindex" in xml_text


@F.pandas_udf(PARSED_SCHEMA)
def parse_sitemap_udf(xml: pd.Series) -> pd.DataFrame:
    rows = [parse_sitemap(x) for x in xml]
    return pd.DataFrame(
        {"locs": [r[0] for r in rows], "is_index": [r[1] for r in rows]}
    )


def sitemap_candidates(sitemap_docs: DataFrame, xml_col: str = "xml") -> DataFrame:
    """sitemap_docs(sitemap_url, xml) → canonical candidate URLs.

    Output: url, url_fp, host, is_index — ready for frontier merge (depth/
    priority assignment is the caller's policy).
    """
    parsed = sitemap_docs.withColumn("__p", parse_sitemap_udf(F.col(xml_col)))
    exploded = parsed.select(
        F.col("sitemap_url"),
        F.col("__p.is_index").alias("is_index"),
        F.explode("__p.locs").alias("loc"),
    )
    canon = exploded.withColumn(
        "url", U.canonicalize(F.col("sitemap_url"), F.col("loc"))
    ).filter(F.col("url").isNotNull())
    return canon.select(
        "url",
        U.url_fingerprint(F.col("url")).alias("url_fp"),
        U.url_host(F.col("url")).alias("host"),
        "is_index",
    ).dropDuplicates(["url_fp"])
