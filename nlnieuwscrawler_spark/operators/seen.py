"""O5/O6: the URL-seen set — partitioned Bloom filter + exact confirm.

Reference behavior: an in-memory Python ``set`` consulted before enqueue
(``if url in visited``) — exact, zero false anything. north_star scales
that to 10^10 URLs as "a partitioned Bloom/cuckoo URL-seen set
broadcast-merged per epoch".

Design (SURVEY §7.3.1 — the correctness-critical part): a Bloom filter has
false POSITIVES, and a false positive here would silently DROP a URL the
reference crawls, breaking the exact URL-seen-set equivalence gate. So the
filter is strictly a pre-filter:

1. probe the broadcast Bloom (vectorized numpy inside a pandas UDF):
   ``maybe_seen = bloom[positions(fp)] all set``;
2. rows with ``maybe_seen = false`` are DEFINITELY new (Blooms have no
   false negatives) — they skip the expensive path entirely;
3. rows with ``maybe_seen = true`` (tiny fraction: real dups + ~fpp) get an
   exact LEFT ANTI join against the persisted ``url_seen`` keys.

Net effect at scale: the anti-join's left side shrinks from |candidates| to
|dups| + fpp·|candidates|, so the shuffle is tiny; correctness never
depends on the filter. The filter is partitioned by ``pmod(url_fp, P)`` so
build/merge parallelizes (applyInPandas per partition) and each epoch's
merge is a cheap bitwise OR per partition.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nlnieuwscrawler_spark.pyhash import bloom_positions

DEFAULT_BITS_PER_KEY = 12          # fpp ≈ 0.3% at k=8
DEFAULT_N_HASHES = 8
MIN_PARTITION_BITS = 1 << 13       # 1 KiB floor per partition


def bloom_params(expected_keys: int, n_partitions: int) -> tuple[int, int]:
    per_part = max(1, math.ceil(expected_keys / n_partitions))
    n_bits = max(MIN_PARTITION_BITS, 1 << math.ceil(
        math.log2(per_part * DEFAULT_BITS_PER_KEY + 1)
    ))
    return n_bits, DEFAULT_N_HASHES


def build_bloom_partitions(
    keys: DataFrame, fp_col: str, n_partitions: int, expected_keys: int
) -> list[dict]:
    """Build per-partition Bloom bitmaps distributed, collect the (small) bitmaps.

    ``applyInPandas`` per ``pmod(fp, P)`` partition: each task ORs its
    fingerprints into a numpy bitarray; only P small binary blobs come back
    to the driver (P × n_bits/8 bytes — e.g. 128 MiB total for 10^10 keys at
    12 bits/key, spread over P collectible rows).
    """
    n_bits, n_hashes = bloom_params(expected_keys, n_partitions)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        arr = np.zeros(n_bits // 8, dtype=np.uint8)
        fps = pdf[fp_col].to_numpy(dtype=np.int64)
        pos = bloom_positions(fps, n_bits, n_hashes).ravel()
        np.bitwise_or.at(arr, (pos >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return pd.DataFrame(
            {
                "partition_id": [int(pdf["__pid"].iloc[0])],
                "bloom": [arr.tobytes()],
                "n_items": [len(fps)],
                "n_bits": [n_bits],
                "n_hashes": [n_hashes],
            }
        )

    out_schema = (
        "partition_id int, bloom binary, n_items long, n_bits long, n_hashes int"
    )
    parts = (
        keys.select(F.col(fp_col), F.pmod(F.col(fp_col), F.lit(n_partitions)).alias("__pid"))
        .groupBy("__pid")
        .applyInPandas(build, out_schema)
        .collect()
    )
    return [r.asDict() for r in parts]


class BloomState:
    """Driver-side merged bloom: P partitions as one 2-D numpy bitmap."""

    def __init__(self, n_partitions: int, n_bits: int, n_hashes: int):
        self.n_partitions = n_partitions
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bitmap = np.zeros((n_partitions, n_bits // 8), dtype=np.uint8)
        self.n_items = 0

    @classmethod
    def from_partitions(cls, rows: list[dict], n_partitions: int) -> "BloomState":
        if not rows:
            return cls(n_partitions, MIN_PARTITION_BITS, DEFAULT_N_HASHES)
        n_bits = int(rows[0]["n_bits"])
        st = cls(n_partitions, n_bits, int(rows[0]["n_hashes"]))
        for r in rows:
            st.bitmap[int(r["partition_id"])] |= np.frombuffer(
                bytes(r["bloom"]), dtype=np.uint8
            )
            st.n_items += int(r["n_items"])
        return st

    def merge(self, other: "BloomState") -> "BloomState":
        """Bitwise-OR merge (the per-epoch broadcast-merge)."""
        if other.n_bits != self.n_bits or other.n_partitions != self.n_partitions:
            raise ValueError("bloom geometry mismatch")
        self.bitmap |= other.bitmap
        self.n_items += other.n_items
        return self

    def to_rows(self) -> list[dict]:
        return [
            {
                "partition_id": p,
                "bloom": self.bitmap[p].tobytes(),
                "n_items": self.n_items,
                "n_bits": self.n_bits,
                "n_hashes": self.n_hashes,
            }
            for p in range(self.n_partitions)
        ]


def probe_maybe_seen(df: DataFrame, fp_col: str, bloom: BloomState | None) -> DataFrame:
    """Add ``maybe_seen`` via a broadcast Bloom probe (numpy, Arrow batches)."""
    if bloom is None or bloom.n_items == 0:
        return df.withColumn("maybe_seen", F.lit(False))
    sc = df.sparkSession.sparkContext
    b = sc.broadcast((bloom.bitmap, bloom.n_partitions, bloom.n_bits, bloom.n_hashes))

    @F.pandas_udf(T.BooleanType())
    def probe(fps: pd.Series) -> pd.Series:
        bitmap, n_parts, n_bits, n_hashes = b.value
        a = fps.to_numpy(dtype=np.int64)
        pid = (a % n_parts + n_parts) % n_parts  # pmod
        pos = bloom_positions(a, n_bits, n_hashes)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        hit = (bitmap[pid[:, None], byte_idx] & bit) != 0
        return pd.Series(hit.all(axis=1))

    return df.withColumn("maybe_seen", probe(F.col(fp_col)))


def filter_unseen(
    candidates: DataFrame,
    seen_keys: DataFrame,
    fp_col: str = "url_fp",
    bloom: BloomState | None = None,
) -> DataFrame:
    """Exact not-seen filter, Bloom-accelerated when a filter is supplied.

    Without a Bloom this degrades to a plain left-anti join (still exact,
    just a bigger shuffle) — the filter is an optimization, never semantics.
    """
    if bloom is None:
        return candidates.join(
            seen_keys.select(F.col(fp_col)), on=fp_col, how="left_anti"
        )
    probed = probe_maybe_seen(candidates, fp_col, bloom)
    definite_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    rescued = suspects.join(
        seen_keys.select(F.col(fp_col)), on=fp_col, how="left_anti"
    )
    return definite_new.unionByName(rescued)
