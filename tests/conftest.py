from __future__ import annotations

import os

import pytest

from nlnieuwscrawler_spark.session import get_spark
from nlnieuwscrawler_spark.sources import fixtures

TINY_N = 400  # pages in the unit-test corpus


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nlnc-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_pages_pd():
    return fixtures.gen_pages_pandas(TINY_N)


@pytest.fixture(scope="session")
def tiny_pages_path(tiny_pages_pd, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pandas(tiny_pages_pd, preserve_index=False)
    pq.write_table(tbl, path, coerce_timestamps="us", allow_truncated_timestamps=True)
    return path


@pytest.fixture(scope="session")
def tiny_pages_df(spark, tiny_pages_path):
    return spark.read.parquet(tiny_pages_path)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
