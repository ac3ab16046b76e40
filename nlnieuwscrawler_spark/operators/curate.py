"""End-to-end corpus curation: the composite plan a training-data user runs.

``curate()`` chains the individually-oracled curation operators into ONE
deliverable pipeline over a web-text corpus:

    quality gates (Gopher)            functions/text.py:gopher_quality
    → exact dedup (keep min-id rep)   operators/dedup.py:dedup_exact
    → incremental dedup vs history    operators/dedup.py:dedup_incremental
    → near-dup retention              minhash_lsh_pairs | ngram_jaccard_pairs
                                      → dedup_retention (components, keep-one)
    → C4-style global span dedup      operators/dedup.py:dedup_spans
      (optional; docs rebuilt from first-occurrence spans, empties drop)
    → eval-set decontamination        operators/dedup.py:decontaminate
    → stratified per-source sampling  operators/sampling.py:stratified_sample
    → sequence packing (FFD bins)     operators/sampling.py:pack_sequences

Scale shape: each stage keeps its own audited 100 TB plan (narrow
exchanges, broadcast dims, bucketed candidates — see the per-operator
docstrings); the composite adds NO new shuffle of the fat ``text`` column
beyond what the stages themselves need. The corpus survivors after
incremental dedup are persisted ONCE and feed both the pair generation
and the retention join; the decontaminated set is persisted once and
feeds sampling + the stage-count audit.

Per-stage counts: every curation run must report kept/dropped per stage
(the audit a data team actually reviews before a training run). They are
computed as ONE union-all aggregation job over the persisted stage
outputs — a single extra action for the whole audit, never one count()
per stage. (The Observation API is deliberately NOT used here: the doc
chain references the corpus subtree more than once — each dedup stage
joins the corpus against ids derived from the same corpus — and
CollectMetrics accumulates once per plan instance, double-counting any
observed node that appears in both subtrees. The crawl path, whose
metric nodes are single-reference, does use observe(): plans/crawler.py.)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nlnieuwscrawler_spark.functions.text import gopher_quality, token_count_ws
from nlnieuwscrawler_spark.operators.dedup import (
    decontaminate,
    dedup_exact,
    dedup_incremental,
    dedup_retention,
    dedup_spans,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from nlnieuwscrawler_spark.operators.sampling import (
    pack_sequences,
    stratified_sample,
)

#: pipeline stage names in execution order (stage_idx = position here)
STAGES = [
    "input",
    "quality",
    "exact",
    "incremental",
    "near_dup",
    "span_dedup",
    "decontaminated",
    "sampled",
    "packed",
]


@dataclass
class CurationResult:
    """Outputs of one :func:`curate` run.

    ``curated``: the final sampled docs (full input schema + sample_rank).
    ``packed``: one row per curated doc with (bucket, bin_id, bin_seq).
    ``stage_counts``: (stage_idx, stage, rows_kept) — one row per STAGES
    entry; ``rows_kept`` for "packed" equals "sampled" by construction
    (packing assigns every doc a bin, it never drops — the audit makes
    that invariant visible).
    ``cached``: persisted intermediates; callers unpersist when done.
    """

    curated: DataFrame
    packed: DataFrame
    stage_counts: DataFrame
    cached: list[DataFrame] = field(default_factory=list)

    def unpersist(self) -> None:
        for df in self.cached:
            df.unpersist()


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "source",
    eval_docs: DataFrame | None = None,
    seen_hashes: DataFrame | None = None,
    near_dup: str | None = "minhash",
    near_dup_threshold: float = 0.7,
    near_dup_block: str | None = "lang",
    span_dedup: int | None = None,
    decon_min_overlap: int = 8,
    quota: int = 7,
    salt: int = 8,
    capacity: int = 2048,
    pack_buckets: int = 64,
    reliable: bool = False,
) -> CurationResult:
    """Run the full curation chain; see module docstring for the stages.

    ``near_dup``: "minhash" (the 100 TB default — banded LSH candidates),
    "jaccard" (PPJoin exact pairs — the oracle-checkable mode), or None.
    ``seen_hashes``: (content_hash) table of previously-ingested md5s
    (cross-batch dedup); None skips the stage (count = exact's).
    ``eval_docs``: (eval_id, text) benchmark suite; None skips
    decontamination. ``span_dedup``: span width for C4-style GLOBAL
    (validated before any work so a typo can't leak a persisted corpus)
    span-level dedup of the retained docs (every repeat of any
    ``span_dedup``-token span corpus-wide is removed, docs are rebuilt
    from their surviving spans, docs losing every span drop out); None
    skips the stage (count = near_dup's). ``reliable``: route the
    clustering lineage cuts through the SparkContext checkpoint dir
    (executor-loss-safe).
    """
    if near_dup not in ("minhash", "jaccard", None):
        raise ValueError(f"unknown near_dup {near_dup!r}")
    if span_dedup is not None and span_dedup < 1:
        raise ValueError(
            f"span_dedup must be a positive span width, got {span_dedup!r}"
        )

    # -- 1. quality gates ---------------------------------------------------
    quality_ids = (
        gopher_quality(docs, text_col=text_col, id_col=id_col)
        .filter(F.col("passes"))
        .select(id_col)
    )
    qd = docs.join(quality_ids, id_col)

    # -- 2. exact dedup (keep the min-id representative) --------------------
    reps = dedup_exact(qd, text_col=text_col, id_col=id_col).select(
        F.col("keep_id").alias(id_col)
    )
    exd = qd.join(reps, id_col)

    # -- 3. incremental dedup vs persisted history --------------------------
    if seen_hashes is not None:
        incd = dedup_incremental(
            exd, seen_hashes, text_col=text_col, id_col=id_col
        ).drop("content_hash")
    else:
        incd = exd
    # one persisted corpus pass: feeds pair generation AND the retention
    # join AND the downstream stages — without it the whole
    # quality→exact→incremental chain re-executes per consumer
    incd = incd.persist()
    cached = [incd]

    # -- 4. near-dup clustering + keep-one-per-cluster retention ------------
    if near_dup == "minhash":
        pairs = minhash_lsh_pairs(
            incd,
            text_col=text_col,
            id_col=id_col,
            threshold=near_dup_threshold,
            block_col=near_dup_block,
        )
    elif near_dup == "jaccard":
        pairs = ngram_jaccard_pairs(
            incd,
            text_col=text_col,
            id_col=id_col,
            block_col=near_dup_block,
            threshold=near_dup_threshold,
        )
    else:
        pairs = None
    if pairs is None:
        keepd = incd
    else:
        # no persist needed: BOTH pair generators return eagerly
        # localCheckpoint-materialized frames, so dedup_retention's two
        # references (the edge-flip union) read RDD blocks, not the plan
        keep_ids = (
            dedup_retention(incd, pairs, id_col=id_col, reliable=reliable)
            .filter(F.col("keep"))
            .select(id_col)
        )
        keepd = incd.join(keep_ids, id_col)

    # -- 5. C4-style global span dedup (optional) ---------------------------
    if span_dedup is not None:
        rebuilt = (
            dedup_spans(keepd, span=span_dedup, text_col=text_col, id_col=id_col)
            .filter(F.col("n_spans_kept") > 0)
            .select(id_col, F.col("text_dedup").alias(text_col))
        )
        # text is REPLACED by the rebuild (lowered tokens, single-space
        # joined — the tokenizer's canonical form, so downstream gram /
        # token stages see identical tokens); all other columns ride along.
        # Persisted: the span hash-agg chain is referenced by
        # decontamination, the downstream join AND the audit count —
        # uncached it re-evaluates per consumer (measured: +10 s on the
        # sf0.1 composite)
        spand = keepd.drop(text_col).join(rebuilt, id_col).persist()
        cached.append(spand)
    else:
        spand = keepd

    # -- 6. eval-set decontamination ----------------------------------------
    if eval_docs is not None:
        flagged = (
            decontaminate(
                spand,
                eval_docs,
                text_col=text_col,
                id_col=id_col,
                eval_text_col=text_col,
                min_overlap=decon_min_overlap,
            )
            .select(id_col)
            .distinct()
        )
        decd = spand.join(flagged, id_col, "left_anti")
    else:
        decd = spand
    decd = decd.persist()
    cached.append(decd)

    # -- 7. stratified per-source sampling ----------------------------------
    sampled = stratified_sample(
        decd, strata_col, quota=quota, id_col=id_col, salt=salt
    ).persist()
    cached.append(sampled)

    # -- 8. sequence packing -------------------------------------------------
    packed = pack_sequences(
        sampled.withColumn("__nt", token_count_ws(F.col(text_col))),
        tokens_col="__nt",
        id_col=id_col,
        capacity=capacity,
        n_buckets=pack_buckets,
    )

    # -- stage audit: ONE union-all aggregation job --------------------------
    # the quality/exact legs count the NARROW id frames (identical row
    # counts to qd/exd by construction — the joins are 1:1 on id) so the
    # audit doesn't re-run the corpus joins for two numbers
    stage_dfs = [docs, quality_ids, reps, incd, keepd, spand, decd, sampled,
                 packed]
    counts = reduce(
        DataFrame.unionByName,
        [
            df.agg(F.count(F.lit(1)).alias("rows_kept")).select(
                F.lit(i).alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.col("rows_kept"),
            )
            for i, (name, df) in enumerate(zip(STAGES, stage_dfs))
        ],
    )
    return CurationResult(
        curated=sampled, packed=packed, stage_counts=counts, cached=cached
    )
