"""Lineage cutting for iterative operators — local vs RELIABLE.

Iterative plans (label propagation, global sequence numbering) must cut
lineage every round or the recursive plan tree blows up. Two modes:

- ``reliable=False`` (default): ``localCheckpoint`` — blocks live in
  executor block managers. Fast (no FS round-trip) but EXECUTOR-LOSS
  FRAGILE: on a real cluster, losing one executor mid-run kills the job
  because the truncated lineage cannot recompute the lost blocks.
- ``reliable=True``: ``df.checkpoint()`` to the SparkContext checkpoint
  dir — survives executor loss, the right mode for long-running 100 TB
  jobs. If no checkpoint dir is set, a session-scoped local default is
  chosen (fine on local[*]; on a real cluster set a durable shared path —
  HDFS/S3 — via ``spark.sparkContext.setCheckpointDir`` first).

The crawl loop itself never needs this: its SnapshotStore commits are the
durable path (plans/crawler.py).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame


def cut_lineage(
    df: DataFrame,
    reliable: bool = False,
    eager: bool = True,
    storage_level=None,
) -> DataFrame:
    """Materialize ``df`` with truncated lineage (see module docstring).

    ``storage_level`` (local mode only): storage for the checkpoint
    blocks. Lineage-cut blocks are NOT evictable (there is no plan left
    to recompute them from), so a large corpus checkpointed at the
    default MEMORY_AND_DISK pins heap that the unified pool can never
    reclaim for execution — pass ``StorageLevel.DISK_ONLY`` for
    corpus-sized cuts so joins downstream keep their execution memory
    (curate()'s cleaned-corpus cut OOMed the 2M composite before this).
    """
    if not reliable:
        return df.localCheckpoint(eager=eager, storageLevel=storage_level)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(
            os.path.join(
                tempfile.gettempdir(), f"nlnc-checkpoints-{uuid.uuid4().hex[:8]}"
            )
        )
    return df.checkpoint(eager=eager)
