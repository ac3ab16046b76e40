"""Snapshot TableIO: Iceberg-style atomic table snapshots over parquet.

The north_rule requires "every epoch checkpoints frontier + Bloom state ...
with per-partition lineage and fetch/dedup metrics so the crawl resumes
exactly mid-frontier" over Iceberg tables. The sandbox has no Iceberg
runtime jars (SURVEY §7.0), so this module provides the same SEMANTICS —
atomic snapshot commit, time-travelable versions, manifest-tracked data
files — behind a thin interface:

- data files: ``<root>/data/<table>-v<version>/part-*.parquet`` (immutable)
- manifest:   ``<root>/_manifests/manifest-<version>.json`` listing every
  table's data path, row count, per-bucket lineage, and the epoch counter
- commit:     write manifest, then ``os.replace`` a pointer file
  ``<root>/_CURRENT`` — the rename is the atomic commit, exactly the
  Iceberg/HadoopCatalog version-hint protocol

Swap-in for real Iceberg: replace ``write_table``/``read_table`` with
``df.writeTo(tbl).overwritePartitions()`` / ``spark.read.format("iceberg")``
— the engine only touches this interface.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- pointer ---------------------------------------------------------
    def current_version(self) -> int | None:
        ptr = os.path.join(self.root, "_CURRENT")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return int(f.read().strip())

    def read_manifest(self, version: int | None = None) -> dict[str, Any] | None:
        v = self.current_version() if version is None else version
        if v is None:
            return None
        path = os.path.join(self.root, "_manifests", f"manifest-{v}.json")
        with open(path) as f:
            return json.load(f)

    # -- snapshot commit ---------------------------------------------------
    def commit(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame],
        epoch: int,
        extra: dict[str, Any] | None = None,
        lineage_bucket_col: str | None = "url_fp",
        n_lineage_buckets: int = 16,
    ) -> int:
        """Write all tables + manifest, then atomically flip _CURRENT.

        A crash anywhere before the final ``os.replace`` leaves the previous
        snapshot fully intact (data dirs are versioned, never overwritten) —
        that is what makes mid-frontier resume exact.
        """
        prev = self.current_version()
        version = (prev or 0) + 1
        entry: dict[str, Any] = {
            "version": version,
            "epoch": epoch,
            "committed_at": time.time(),
            "tables": {},
            "extra": extra or {},
        }
        for name, df in tables.items():
            rel = f"data/{name}-v{version}"
            path = os.path.join(self.root, rel)
            df.write.mode("overwrite").parquet(path)
            written = spark.read.parquet(path)
            lineage = None
            if lineage_bucket_col and lineage_bucket_col in written.columns:
                lineage = [
                    {"bucket": r["bucket"], "rows": r["rows"]}
                    for r in written.groupBy(
                        F.pmod(F.col(lineage_bucket_col), F.lit(n_lineage_buckets)).alias("bucket")
                    )
                    .agg(F.count("*").alias("rows"))
                    .collect()
                ]
            entry["tables"][name] = {
                "path": rel,
                "rows": written.count(),
                "lineage": lineage,
            }
        mpath = os.path.join(self.root, "_manifests", f"manifest-{version}.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(entry, f, indent=1, default=str)
        os.replace(mpath + ".tmp", mpath)
        ptr = os.path.join(self.root, "_CURRENT")
        with open(ptr + ".tmp", "w") as f:
            f.write(str(version))
        os.replace(ptr + ".tmp", ptr)  # ← the atomic commit point
        return version

    def read_table(self, spark: SparkSession, name: str, version: int | None = None) -> DataFrame:
        m = self.read_manifest(version)
        if m is None or name not in m["tables"]:
            raise KeyError(f"no snapshot for table {name!r}")
        return spark.read.parquet(os.path.join(self.root, m["tables"][name]["path"]))

    def expire_snapshots(self, keep_last: int = 2) -> None:
        """GC old versioned data dirs (Iceberg expire_snapshots equivalent)."""
        cur = self.current_version()
        if cur is None:
            return
        keep = {cur - i for i in range(keep_last)}
        data = os.path.join(self.root, "data")
        for d in os.listdir(data):
            if "-v" in d:
                v = int(d.rsplit("-v", 1)[1])
                if v not in keep:
                    shutil.rmtree(os.path.join(data, d), ignore_errors=True)
