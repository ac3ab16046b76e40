"""O7: robots.txt allow/deny with urllib.robotparser semantics, UDF-free.

Reference behavior (north_star "enforcing nlnieuwscrawler's robots.txt
rules"): one ruleset per host; rule lines are checked IN FILE ORDER and the
first rule whose path is a prefix of the URL path decides (Python stdlib
``urllib.robotparser`` first-match semantics); hosts without a ruleset and
rule-less rulesets allow everything.

Spark-first realization: the per-host rulesets are a small dimension —
**broadcast** equi-join on ``host``, then evaluate the ordered
``rules ARRAY<STRUCT<allow,path,order>>`` with higher-order array
expressions (``array_sort`` + ``filter`` + first element). Zero Python
boundary, so the filter stays inside WholeStageCodegen and scales with the
candidate set, not the rule count. Parity with the stdlib parser is pinned
by tests/test_robots.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def robots_allowed(path: Column, rules: Column) -> Column:
    """First-match evaluation of an ordered rules array against a URL path.

    NULL rules (unknown host) or no matching rule → allowed (TRUE), matching
    stdlib robotparser's allow-by-default.
    """
    ordered = F.array_sort(
        F.transform(
            rules,
            lambda r: F.struct(
                r["order"].alias("order"),
                r["allow"].alias("allow"),
                r["path"].alias("path"),
            ),
        )
    )
    matches = F.filter(ordered, lambda r: path.startswith(r["path"]))
    return F.coalesce(F.get(matches, 0)["allow"], F.lit(True))


def robots_filter(
    candidates: DataFrame,
    robots: DataFrame,
    path_col: str = "path",
    host_col: str = "host",
) -> DataFrame:
    """LEFT broadcast-join candidates to per-host rules; keep allowed rows.

    Adds ``crawl_delay`` (NULL → caller applies the default) and drops the
    rules payload. Left join (not inner) keeps unknown hosts — allowed by
    default, exactly like a crawler that finds no robots.txt.
    """
    r = robots.select(
        F.col("host").alias("__r_host"), "rules", "crawl_delay"
    )
    joined = candidates.join(
        F.broadcast(r), candidates[host_col] == r["__r_host"], "left"
    )
    return (
        joined.withColumn(
            "__allowed", robots_allowed(F.col(path_col), F.col("rules"))
        )
        .filter(F.col("__allowed"))
        .drop("__r_host", "rules", "__allowed")
    )
