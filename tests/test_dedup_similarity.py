"""Cross-validation for the sketch-based ops that have no SQL oracle:
MinHash-LSH recall vs exact Jaccard, SimHash determinism + planted dups,
LSH-ANN recall vs brute force, winnowing guarantees.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nlnieuwscrawler_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_minhash_lsh_recall_vs_exact(spark, docs):
    """LSH candidates must contain every high-Jaccard exact pair (the
    verify step makes precision exact, so the only risk is recall)."""
    # block_col=None: LSH is unblocked, so compare against unblocked exact
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, block_col=None, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert exact, "fixture should contain planted near-duplicates"
    missed = exact - lsh
    assert not missed, f"LSH missed high-similarity pairs: {missed}"
    # precision is exact by construction (verified with true Jaccard)
    assert lsh <= exact


def test_minhash_block_col_matches_blocked_exact(spark, docs):
    """block_col threads the same blocking contract as
    ngram_jaccard_pairs: pairs crossing the block must vanish, pairs
    inside it must keep identical recall (ADVICE r5: both near-dup
    backends must give curate() the same pair universe)."""
    exact_blocked = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(
            docs, block_col="lang", threshold=0.5
        ).collect()
    }
    lsh_blocked = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, threshold=0.5, block_col="lang"
        ).collect()
    }
    assert lsh_blocked <= exact_blocked
    missed = exact_blocked - lsh_blocked
    assert not missed, f"blocked LSH missed pairs: {missed}"
    # and a planted cross-block dup must NOT pair when blocked
    extra = spark.createDataFrame(
        [(900001, "x y z " * 30, "nl", "w"), (900002, "x y z " * 30, "fr", "w")],
        "doc_id long, text string, lang string, source string",
    )
    got = dedup.minhash_lsh_pairs(extra, threshold=0.5, block_col="lang")
    assert got.count() == 0
    unblocked = dedup.minhash_lsh_pairs(extra, threshold=0.5)
    assert unblocked.count() == 1


def test_minhash_max_bucket_guard_prunes_template_farm(spark, docs):
    """A template farm (200 near-identical docs, distinct texts so exact
    dedup can't collapse them) lands its cohort in one bucket per band;
    max_bucket skips those buckets LOUDLY (stats) instead of building
    O(cohort²) candidates, while normal planted near-dups elsewhere are
    untouched."""
    # varying repeat counts: distinct texts (exact dedup can't collapse)
    # but IDENTICAL distinct-gram sets -> identical signatures -> one
    # 200-doc bucket in every band, the canonical template farm
    farm = [(800000 + i, "x y z " * (20 + i), "nl", "w") for i in range(200)]
    pair = [
        (900001, "p q r s t u v w " * 10, "nl", "w"),
        (900002, "p q r s t u v w " * 10 + "extra", "nl", "w"),
    ]
    df = spark.createDataFrame(
        farm + pair, "doc_id long, text string, lang string, source string"
    )
    stats: dict = {}
    got = dedup.minhash_lsh_pairs(
        df, threshold=0.5, max_bucket=50, stats=stats
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in got.collect()}
    assert stats["hot_buckets"] >= 1
    # the healthy near-dup pair survives the guard
    assert (900001, 900002) in pairs
    # farm pairs are pruned (every farm bucket is hot in every band)
    assert not any(a >= 800000 and b < 900000 for a, b in pairs), pairs
    # unguarded: the farm floods the pair set
    all_pairs = dedup.minhash_lsh_pairs(df, threshold=0.5)
    assert all_pairs.count() > len(pairs)


def test_minhash_deterministic_across_partitioning(spark, docs):
    one = dedup.minhash_lsh_pairs(docs.repartition(1), threshold=0.1)
    many = dedup.minhash_lsh_pairs(docs.repartition(7), threshold=0.1)
    assert one.exceptAll(many).count() == 0 and many.exceptAll(one).count() == 0


def test_simhash_planted_duplicate(spark, docs):
    """A doc vs itself with one word changed → tiny hamming distance."""
    base = docs.limit(1).collect()[0]
    toks = base["text"].split()
    mutated = " ".join(toks[:-1] + ["zzz"])
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [base["text"], mutated, "totally different words entirely unrelated content here"]}
    )
    df = spark.createDataFrame(pdf)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_pairs(df, max_hamming=10).collect()
    }
    assert (1, 2) in pairs, "near-identical docs must collide in a band"
    assert pairs[(1, 2)] <= 10
    assert (1, 3) not in pairs or pairs[(1, 3)] > pairs[(1, 2)]


def test_cosine_vec_bit_identical_to_expression_cosine(spark, embeddings):
    """r7: the vectorized numpy cosine used by the ANN scorers must
    reproduce the higher-order-fold expression BIT-FOR-BIT (raw doubles
    compared with ==), including a zero vector and the real float32
    fixture vectors paired against shifted copies of themselves."""
    import numpy as np

    rng = np.random.RandomState(29)
    n, dim = 200, 64
    a = rng.standard_normal((n, dim)).astype(np.float32)
    b = rng.standard_normal((n, dim)).astype(np.float32)
    a[7] = 0.0
    b[11] = 0.0
    a[13] = b[13]  # cos exactly 1-ish path
    rows = [
        (i, [float(x) for x in a[i]], [float(y) for y in b[i]])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["i", "va", "vb"]).select(
        "i",
        F.col("va").cast("array<float>").alias("va"),
        F.col("vb").cast("array<float>").alias("vb"),
    )
    got = (
        df.select(
            "i",
            similarity.cosine(F.col("va"), F.col("vb")).alias("c_expr"),
            similarity.cosine_vec(F.col("va"), F.col("vb")).alias("c_vec"),
        )
        .orderBy("i")
        .collect()
    )
    for r in got:
        assert r["c_expr"] == r["c_vec"], (r["i"], r["c_expr"], r["c_vec"])


def test_ann_lsh_recall_vs_bruteforce(spark, embeddings):
    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = similarity.ann_bruteforce_topk(embeddings, q, k=5)
    # random 64-d vectors are near-orthogonal (top-neighbor cos ≈ 0.45 →
    # per-plane agreement only ≈ 0.65), so recall needs wide multi-probe;
    # real embedding clusters sit much closer and need fewer probes.
    lsh = similarity.ann_lsh_topk(embeddings, q, k=5, n_planes=4, probe_hamming=2)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    l = {(r["query_id"], r["neighbor_id"]) for r in lsh.collect()}
    recall = len(b & l) / len(b)
    assert recall >= 0.6, f"LSH-ANN recall too low: {recall}"


def test_ann_ivf_recall_vs_bruteforce(spark, embeddings):
    """IVF (KMeans coarse quantizer) with nprobe=8/16 lists must recover
    most exact top-5 neighbors. Random near-orthogonal vectors are the
    hard case (clustered real embeddings need fewer probes)."""
    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = similarity.ann_bruteforce_topk(embeddings, q, k=5)
    ivf = similarity.ann_ivf_topk(embeddings, q, k=5, n_lists=16, nprobe=8)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    i = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(b & i) / len(b)
    assert recall >= 0.5, f"IVF-ANN recall too low: {recall}"
    # every IVF result must be a real vector id with a valid rank
    assert ivf.filter(F.col("rank") > 5).count() == 0


def test_winnowing_shared_substring(spark):
    """Winnowing guarantee: docs sharing a ≥ W+K-1 char run share a print."""
    from nlnieuwscrawler_spark.functions.text import winnow_fingerprints_udf

    shared = "identieke gedeelde zin die lang genoeg is"
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "aaa " + shared + " unieke staart een",
                "bbb andere aanhef maar " + shared + " toch",
                "volstrekt ongerelateerde inhoud zonder overlap q9z8",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    rows = df.select(
        "doc_id", winnow_fingerprints_udf(F.col("text")).alias("fps")
    ).collect()
    fps = {r["doc_id"]: set(r["fps"]) for r in rows}
    assert fps[1] & fps[2], "shared substring must yield a shared fingerprint"
    assert not (fps[1] & fps[3] & fps[2]) or len(fps[1] & fps[3]) < len(fps[1] & fps[2])


def test_ann_lsh_plan_has_no_bnlj(spark, embeddings):
    """Probe expansion must keep the candidate join an EQUI-join: the r2
    bit_count(xor)<=r theta form planned a BroadcastNestedLoopJoin, which
    scans |vectors|x|queries| once the query side outgrows a broadcast."""
    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    lsh = similarity.ann_lsh_topk(embeddings, q, k=5, n_planes=4, probe_hamming=2)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_cosine_neardup_tiling_identical(spark, embeddings):
    """Gram-matrix tiling is a pure memory optimization: a tile smaller
    than the block must yield the exact same pair set (strip-boundary
    pairs are the regression this pins)."""
    whole = similarity.cosine_neardup_pairs(
        embeddings, threshold=0.2, block_col=None, tile_rows=1 << 20
    )
    tiled = similarity.cosine_neardup_pairs(
        embeddings, threshold=0.2, block_col=None, tile_rows=7
    )
    w = {(r["id_a"], r["id_b"], r["cos"]) for r in whole.collect()}
    t = {(r["id_a"], r["id_b"], r["cos"]) for r in tiled.collect()}
    assert w, "threshold should plant some pairs at sf0.001"
    assert w == t


def test_cosine_neardup_hot_block_completes(spark):
    """A 50k-row single-label block: the untiled gram matrix would be
    50k^2 x 8 B = 20 GB in ONE task (the r2 OOM cliff); the tiled form
    holds only a tile_rows x 50k strip. Planted duplicate pair must
    surface; runtime bounded by BLAS flops, not memory."""
    import numpy as np

    rng = np.random.RandomState(7)
    n, d = 50_000, 8
    m = rng.standard_normal((n, d)).astype(np.float32)
    m[1] = m[0]  # planted exact duplicate → cos == 1.0
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": list(m)})
    df = spark.createDataFrame(pdf)
    out = similarity.cosine_neardup_pairs(
        df, threshold=0.9999, block_col=None, tile_rows=4096
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (0, 1) in pairs


def test_spread_never_shrinks(spark, docs):
    """_spread widens a single-split scan but must pass an already-wide
    input through untouched (no Exchange shrinking a 100 TB table to the
    core count)."""
    wide_n = spark.sparkContext.defaultParallelism + 8
    wide = docs.repartition(wide_n)
    assert dedup._spread(wide) is wide
    narrow = docs.coalesce(1)
    assert (
        dedup._spread(narrow).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_exact_dedup_representative(spark):
    pdf = pd.DataFrame(
        {"doc_id": [10, 7, 3, 9], "text": ["x y z", "x y z", "a b", "x y z"]}
    )
    out = dedup.dedup_exact(spark.createDataFrame(pdf)).collect()
    m = {r["keep_id"]: r["n_copies"] for r in out}
    assert m == {7: 3, 3: 1}


def test_dedup_components_chain(spark):
    """Transitive chains collapse to one component; disjoint pairs stay
    separate; labels are the component-min doc_id."""
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [1, 2, 3, 4, 10], "doc_b": [2, 3, 4, 5, 11]})
    )
    out = {r["doc_id"]: r["component"]
           for r in dedup.dedup_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_dedup_components_long_chain_pointer_doubling(spark):
    """A 64-node path converges within max_iter=10: pointer doubling gives
    O(log diameter) rounds — plain neighbor-min propagation would need 63
    and fail this budget."""
    import numpy as np

    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": np.arange(63), "doc_b": np.arange(1, 64)})
    )
    out = dedup.dedup_components(pairs, max_iter=10)
    comps = {r["component"] for r in out.collect()}
    assert comps == {0}
    assert out.count() == 64


def test_bm25_ranks_term_frequency(spark):
    """More query-term occurrences (at comparable doclen) → higher score."""
    from nlnieuwscrawler_spark.functions.text import bm25_topk

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["vector vector vector pad pad", "vector pad pad pad pad",
                 "pad pad pad pad pad"],
    })
    out = bm25_topk(spark.createDataFrame(pdf), terms=["vector"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert ids == [1, 2]  # doc 3 has no query term → absent


def test_split_bucket_partition_invariant(spark, docs):
    """The md5 split is a pure function of the id: membership identical
    under any repartitioning."""
    from nlnieuwscrawler_spark.functions.text import split_bucket

    a = docs.repartition(1).select("doc_id", split_bucket(F.col("doc_id")).alias("s"))
    b = docs.repartition(13).select("doc_id", split_bucket(F.col("doc_id")).alias("s"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_dedup_components_reliable_checkpoint_identical(spark):
    """reliable=True routes every lineage cut through the SparkContext
    checkpoint dir (executor-loss-safe mode for real clusters) and must
    produce exactly the same components as the localCheckpoint default."""
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [1, 2, 3, 4, 10, 20], "doc_b": [2, 3, 4, 5, 11, 21]})
    )
    local = {(r["doc_id"], r["component"])
             for r in dedup.dedup_components(pairs).collect()}
    rel = {(r["doc_id"], r["component"])
           for r in dedup.dedup_components(pairs, reliable=True).collect()}
    assert rel == local
    assert spark.sparkContext.getCheckpointDir() is not None


def test_ann_ivf_nprobe_sweep_recall(spark, embeddings):
    """VERDICT r4 #7: the IVF recall knob must actually work — recall is
    non-decreasing in nprobe, clears 0.8 well before exhaustive probing,
    and probing ALL lists reproduces brute force exactly (recall 1.0).
    Random near-orthogonal vectors are the worst case for a coarse
    quantizer; clustered real embeddings reach 0.8 at lower nprobe."""
    q = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_bruteforce_topk(embeddings, q, k=5).collect()
    }
    recalls = {}
    for nprobe in (4, 8, 12, 16):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ann_ivf_topk(
                embeddings, q, k=5, n_lists=16, nprobe=nprobe
            ).collect()
        }
        recalls[nprobe] = len(brute & got) / len(brute)
    vals = [recalls[n] for n in (4, 8, 12, 16)]
    assert vals == sorted(vals), f"recall not monotone in nprobe: {recalls}"
    assert recalls[12] >= 0.8, f"nprobe=12 recall below 0.8: {recalls}"
    assert recalls[16] == 1.0, f"exhaustive probing must be exact: {recalls}"


def test_containment_pairs_excerpt_and_asymmetry(spark):
    """A short excerpt is contained in its source (containment 1.0) but
    NOT vice versa; unrelated docs never pair; near-identical docs pair
    in BOTH directions."""
    long = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    df = spark.createDataFrame(
        [
            (1, long, "nl"),
            (2, "w1 w2 w3 w4 w5 w6", "nl"),        # prefix excerpt of 1
            (3, "x1 x2 x3 x4 x5 x6 x7 x8", "nl"),  # unrelated
            (4, long + " w13", "nl"),               # near-identical to 1
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        (r["container"], r["contained"]): r["containment"]
        for r in dedup.containment_pairs(df, threshold=0.8).collect()
    }
    assert got[(1, 2)] == 1.0
    assert (2, 1) not in got           # 1 is NOT contained in 2
    assert got[(4, 1)] == 1.0          # all of 1's grams are in 4
    assert (1, 4) in got               # 10/11 = 0.909091 >= 0.8
    assert got[(1, 4)] == round(10 / 11, 6)
    assert not any(3 in p for p in got)


def test_containment_pairs_blocking_and_threshold(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h", "nl"),
            (2, "a b c d e f", "en"),   # contained but different block
            (3, "a b c d e f", "nl"),   # contained, same block
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        (r["container"], r["contained"])
        for r in dedup.containment_pairs(df, threshold=0.8).collect()
    }
    assert (1, 3) in got and (1, 2) not in got
    with pytest.raises(ValueError):
        dedup.containment_pairs(df, threshold=0.0)


def test_containment_pairs_matches_naive_allpairs(spark):
    """Prefix-filtered candidates + verify ≡ the naive all-pairs form on
    a corpus with planted excerpts, partial overlaps, and short docs."""
    rows = []
    base = [f"t{i}" for i in range(30)]
    for d in range(8):
        toks = [f"{w}d{d % 4}" if i % 3 == 0 else w
                for i, w in enumerate(base)]
        rows.append((d, " ".join(toks), "nl"))
        rows.append((100 + d, " ".join(toks[: 10 + d]), "nl"))  # excerpts
    rows.append((200, "a b", "nl"))  # sub-n-token: no grams at all
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    fast = {
        (r["container"], r["contained"]): r["containment"]
        for r in dedup.containment_pairs(df, threshold=0.6).collect()
    }
    g = df.select(
        "doc_id", "lang",
        dedup.word_ngrams(F.col("text"), 3).alias("gs"),
    ).filter(F.size("gs") > 0)
    a = g.select(F.col("doc_id").alias("ca"), F.col("lang").alias("l"),
                 F.col("gs").alias("ga"))
    b = g.select(F.col("doc_id").alias("cb"), F.col("lang").alias("l"),
                 F.col("gs").alias("gb"))
    naive = (
        a.join(b, "l")
        .filter(F.col("ca") != F.col("cb"))
        .select(
            "ca", "cb",
            F.round(
                F.size(F.array_intersect("ga", "gb")).cast("double")
                / F.size("gb"), 6,
            ).alias("c"),
        )
        .filter(F.col("c") >= 0.6)
    )
    slow = {(r["ca"], r["cb"]): r["c"] for r in naive.collect()}
    assert fast == slow


def test_containment_pairs_no_bnlj_plan(spark):
    """Inspect the LAZY form (eager=True returns a checkpoint scan whose
    plan is vacuously clean): candidates must come from equi-joins only."""
    df = spark.createDataFrame(
        [(i, f"w{i} a b c d e f g h", "nl") for i in range(12)],
        "doc_id long, text string, lang string",
    )
    out = dedup.containment_pairs(df, threshold=0.8, eager=False)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    spark.catalog.clearCache()  # lazy form leaves the internal caches live
