"""Every registry query vs its DuckDB oracle (the driver's t2 check, local).

Mirrors the driver's comparison: row count, column names, and order-
insensitive values (columns sorted by name, rows sorted by all columns).
Floats must match EXACTLY — the registry engineers order-independent float
aggregation (decimal sums) precisely so this is achievable.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from nlnieuwscrawler_spark.queries import NO_ORACLE, ORACLE, QUERIES, TABLES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1)
    if len(out):
        out = out.sort_values(by=list(out.columns), na_position="first")
    return out.reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_duckdb(spark, sf_dir, duck, name):
    if name in NO_ORACLE:
        assert name not in ORACLE
        n = QUERIES[name](spark, sf_dir).count()
        assert n >= 0  # rows-only (cross-validated in dedicated tests)
        return
    assert name in ORACLE, f"{name} lacks oracle SQL (move to NO_ORACLE if intended)"
    got = _normalize(QUERIES[name](spark, sf_dir).toPandas())
    want = _normalize(duck.sql(ORACLE[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"rows: spark={len(got)} duckdb={len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
