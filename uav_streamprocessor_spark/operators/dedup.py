"""Deduplication operators over `documents` (north-star extension surface).

Five strategies, scale-ranked:

- exact        : hash-groupBy on the full text — one shuffle on text (or on
                 md5(text) to keep shuffle keys small at 100 TB).
- fingerprint  : md5 fingerprint dedup — same result as exact for our data,
                 but the shuffle key is 16 bytes instead of the document.
- minhash_lsh  : shingle → minhash signature → band-bucket join; candidate
                 pairs verified with exact Jaccard. Near-dup at scale:
                 shuffle is on (band, bucket-hash), never all-pairs.
- simhash      : 64-bit simhash in 4 bands of 16 bits (Manku et al.
                 WWW'07): banded group-and-emit-pairs candidates, exact
                 hamming verify with bit_count(a ^ b) — recall 1.0 for
                 hamming <= 3 by pigeonhole.
- ngram_jaccard: exact n-gram Jaccard on candidate pairs (the verifier the
                 LSH path reuses; as a standalone oracle query it runs on a
                 bounded candidate set).

MinHash/SimHash signatures are computed with numpy over Arrow batches
(pandas_udf) — hashing is the rare case where built-in columns can't
express the op (Spark's own hash() isn't portable to the DuckDB oracle, and
the permutation family needs vector math). Everything around the UDF —
shingling, banding, bucket joins, verification — is pure DataFrame ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .partitioning import spread_scan

# deterministic universal-hash family for minhash: h_i(x) = (a_i*x + b_i) mod p
_MERSENNE_P = (1 << 61) - 1
_N_PERM = 64
_LSH_BANDS = 16  # 16 bands x 4 rows


def _perm_params(n: int = _N_PERM) -> tuple[np.ndarray, np.ndarray]:
    # fixed-seed params so signatures are stable across runs/executors
    rng = np.random.RandomState(42)
    a = rng.randint(1, _MERSENNE_P, size=n, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE_P, size=n, dtype=np.int64).astype(np.uint64)
    return a, b


# polynomial rolling-hash base/mixer for shingles: fixed constants →
# deterministic across runs/platforms; uint64 wrap-around is the modulus
_POLY_BASE = np.uint64(1099511628211)  # FNV prime
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """64-bit polynomial hash per token (uint64 wraparound, mixed).

    Vectorized: tokens are packed into one zero-padded byte matrix and
    hashed with a single matrix-vector product (padding zeros contribute
    b*BASE^i = 0, so values are identical to the per-token loop)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    enc = [t.encode("utf-8") for t in tokens]
    maxlen = max(len(b) for b in enc) or 1
    M = np.zeros((len(enc), maxlen), dtype=np.uint64)
    for i, b in enumerate(enc):
        if b:
            M[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    with np.errstate(over="ignore"):
        powers = _POLY_BASE ** np.arange(maxlen, dtype=np.uint64)
        h = (M * powers).sum(axis=1, dtype=np.uint64)
        return ((h ^ (h >> np.uint64(33))) * _MIX).astype(np.uint64)


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """64-bit hashes of word n-gram shingles, vectorized: token hashes →
    rolling n-gram combine (shifted-array polynomial) → unique.

    Word n-grams (not char shingles, not word sets) are the similarity
    space: the LSH *and* the exact-Jaccard verification both use them, so
    candidate recall is measured against the same metric the verifier
    applies. (On this corpus plain word-set Jaccard is degenerate — a
    small shared vocabulary makes ~40% of all pairs ≥0.7 similar.)"""
    tokens = text.lower().split()
    if not tokens:
        return np.zeros(1, dtype=np.uint64)
    th = _token_hashes(tokens)
    if th.size < n:
        return np.unique(th[-1:])
    with np.errstate(over="ignore"):
        g = np.zeros(th.size - n + 1, dtype=np.uint64)
        for j in range(n):
            g = g * _POLY_BASE + th[j : th.size - n + 1 + j]
    return np.unique(g)


@pandas_udf(T.ArrayType(T.LongType()))
def minhash_signature(texts: pd.Series) -> pd.Series:
    """64-permutation MinHash signature per document (Arrow-batched).

    The per-doc (shingles × 64) modular product is cache-resident and
    measured FASTER than a concatenated-batch reduceat variant (memory-
    bandwidth-bound); the UDF is <5% of the LSH query's cost — the plan
    around it (one signature pass feeding the bucket groupBy) is what
    matters at scale."""
    a, b = _perm_params()
    sigs = []
    for text in texts:
        h = _shingle_hashes(text or "")
        if h.size == 0:
            sigs.append([0] * _N_PERM)
            continue
        # (a*h + b) mod p, vectorized over shingles x permutations
        vals = (h[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE_P)
        sigs.append(vals.min(axis=0).astype(np.int64).tolist())
    return pd.Series(sigs)


@pandas_udf(T.LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (polynomial token hashes,
    bit-vote vectorized across all tokens of a doc at once)."""
    shifts = np.arange(64, dtype=np.uint64)
    weights = (np.uint64(1) << shifts).astype(np.uint64)
    out = []
    for text in texts:
        tokens = (text or "").lower().split()
        if not tokens:
            out.append(0)
            continue
        th = _token_hashes(tokens)
        bits = ((th[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        sig = (weights * (acc > 0).astype(np.uint64)).sum(dtype=np.uint64)
        out.append(int(np.int64(sig)))
    return pd.Series(out)


# ---------------------------------------------------------------------------
# exact / fingerprint dedup (oracle-checkable)
# ---------------------------------------------------------------------------

def dedup_exact(spark: SparkSession) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per identical text. Grouping on
    md5(text) keeps shuffle rows narrow; at 100 TB you never shuffle the
    document bodies to find duplicates."""
    docs = spark.table("documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def dedup_survivors(spark: SparkSession) -> DataFrame:
    """The surviving rows themselves (first doc_id per text), via window —
    the form a pipeline materializes downstream."""
    docs = spark.table("documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


def fingerprint_docs(spark: SparkSession) -> DataFrame:
    """Document fingerprinting: md5 hex + 16-hex-char prefix key + a
    rolling-hash-style length-bucketed composite key."""
    docs = spark.table("documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("fingerprint"),
        F.substring(F.md5("text"), 1, 16).alias("fingerprint16"),
        F.concat_ws(
            ":",
            F.col("lang"),
            (F.col("n_chars") - F.col("n_chars") % 64).cast("string"),
            F.substring(F.md5("text"), 1, 8),
        ).alias("bucket_key"),
    )


# ---------------------------------------------------------------------------
# near-dup: minhash LSH / simhash / ngram jaccard
# ---------------------------------------------------------------------------

def band_signatures(sigs: DataFrame) -> DataFrame:
    """(doc_id, sig) → (doc_id, band, band_sig): 16 bands of 4 minhash
    rows each, band_sig as an 8-byte xxhash64 of the band's rows (the
    100 TB shuffle-key rule SCALE.md states: never shuffle the band
    content, only a fixed-width hash of it). A hash collision can only
    ADD a candidate pair, and the exact-Jaccard verify removes it —
    recall is unaffected, precision is restored downstream. Shared by
    the batch candidate join and the incremental streaming index
    (streaming/dedup_stream.py)."""
    rows_per_band = _N_PERM // _LSH_BANDS
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ]
                    ).alias("band_sig"),
                )
                for b in range(_LSH_BANDS)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_sig")


def _bucket_pairs(
    bands: DataFrame,
    key_cols: list[str],
    member,
    max_bucket: int | None = None,
) -> DataFrame:
    """Group-and-emit-pairs LSH candidate generation: group band rows by
    the bucket key, collect the (sorted) member structs, and expand the
    within-bucket pairs IN-ROW (ordered i<j slices, so doc_id_a <
    doc_id_b by construction), then explode.

    This replaces the band-key SELF-JOIN: a self-join instantiates the
    signature-UDF subtree on BOTH sides — the intended ReusedExchange
    dedup does NOT survive AQE stage planning (verified in the executed
    plan: two ArrowEvalPython nodes), so signatures were computed twice.
    Here the signature branch exists ONCE; the only shuffle is the
    bucket groupBy, and the quadratic pair expansion is confined to a
    bucket (the LSH guarantee). `max_bucket` caps pathological buckets
    BEFORE expansion (dropped whole — the caller's hot-bucket/stop-key
    semantics, e.g. winnowing stop-fingerprints); callers that leave it
    None keep every bucket — the standard production LSH shape (same
    note as doc_block_edges)."""
    members = F.array_sort(F.collect_list(member))
    buckets = (
        bands.groupBy(*[F.col(c) for c in key_cols])
        .agg(members.alias("ms"))
        .filter(F.size("ms") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ms") <= max_bucket)
    n = F.size("ms")
    pairs = F.flatten(
        F.transform(
            F.col("ms"),
            lambda m, i: F.transform(
                F.slice(F.col("ms"), i + 2, n - i - 1),
                lambda m2: F.struct(m.alias("a"), m2.alias("b")),
            ),
        )
    )
    return buckets.select(F.explode(pairs).alias("p"))


def minhash_candidates(spark: SparkSession) -> DataFrame:
    """MinHash+LSH near-duplicate candidate pairs.

    signature(64) → 16 bands of 4 → explode to (band, band_sig) →
    group-and-emit-pairs per bucket (_bucket_pairs). ONE signature
    computation, ONE shuffle (the bucket groupBy); all-pairs comparison
    never happens. Candidates with doc_id_a < doc_id_b, distinct.
    """
    # small parquet files arrive as 1 partition — spread before the UDF so
    # signature hashing uses every core (at 100 TB the scan is already
    # parallel and this repartition is a no-op to remove)
    docs = (
        spark.table("documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    sigs = docs.withColumn("sig", minhash_signature("text")).select("doc_id", "sig")
    bands = band_signatures(sigs)
    return (
        _bucket_pairs(bands, ["band", "band_sig"], F.col("doc_id"))
        .select(
            F.col("p.a").alias("doc_id_a"),
            F.col("p.b").alias("doc_id_b"),
        )
        .distinct()
    )


def minhash_band_partition(spark: SparkSession) -> DataFrame:
    """Banding-partition conservation shadow (VERDICT r10 #5 — the
    oracled half of the rows-only dedup_minhash_candidates). Signature
    VALUES are engine-specific (uint64 hash chains DuckDB can't
    replicate), but the banding partition law is exact integers: every
    document emits exactly one (band, band_sig) row for each of the
    _LSH_BANDS bands, band ids are 0.._LSH_BANDS-1, and no band_sig is
    null (empty docs still get the all-zero signature,
    minhash_signature:112). An explode/element_at off-by-one, a dropped
    doc, or a null leak breaks the hash; candidate CONTENT stays covered
    by the recall-pinned exact-Jaccard tests."""
    docs = spark.table("documents").select("doc_id", "text")
    sigs = docs.withColumn("sig", minhash_signature("text")).select("doc_id", "sig")
    return (
        band_signatures(sigs)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("band_sig").alias("n_sigs"),
        )
    )


def word_ngrams(toks_col, n: int = 3):
    """Distinct word n-grams from a MATERIALIZED token-array column.

    Callers must pass a column holding an already-computed array (not an
    inline split(...) expression): expressions referenced inside lambda
    functions are re-evaluated per element, so an inline split would cost
    O(tokens²) per document. See `doc_ngram_sets` for the materializing
    pipeline."""
    toks = F.col(toks_col) if isinstance(toks_col, str) else toks_col
    return F.array_distinct(
        F.filter(
            F.transform(
                toks,
                lambda _, i: F.when(
                    i + n <= F.size(toks),
                    F.concat_ws(
                        " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
                    ),
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )


def doc_ngram_sets(
    spark: SparkSession, n: int = 3, base: DataFrame | None = None
) -> DataFrame:
    """doc_id → distinct word-n-gram array. The repartition between token
    split and gram assembly is an optimizer barrier: without it Catalyst
    collapses the projections and re-inlines split() into every lambda
    evaluation (O(tokens²) per doc — measured 10× slower).

    `base` lets a caller pre-prune the doc set BEFORE the gram build
    (e.g. semi-join to candidate ids) — Catalyst will not push a join
    beneath the gram projection on its own, so pruning must happen on
    the raw (doc_id, text) frame."""
    docs = base if base is not None else spark.table("documents")
    toks = (
        docs.select("doc_id", F.split(F.lower("text"), " ").alias("toks"))
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        # the repartition ALONE is not a barrier: AQE's local shuffle
        # reader collapses it back to the mapper count (one, for a small
        # parquet file) whenever the consumer needs no partitioning, and
        # the interpreted gram lambda then runs single-task (measured
        # 10s -> ~1s at sf0.1 with the pin). Lazy localCheckpoint pins
        # the spread token partitions; the lambda evaluates on them.
        .localCheckpoint(eager=False)
    )
    return toks.select("doc_id", word_ngrams("toks", n).alias("grams"))


def minhash_near_duplicates(spark: SparkSession, threshold: float = 0.7) -> DataFrame:
    """LSH candidates verified with exact word-3-gram Jaccard — the same
    similarity space the MinHash signatures sample, so banding theory
    applies: P(candidate | j) = 1-(1-j^4)^16 ≈ 0.99 at j=0.7. Verify step
    is built-in array ops, no UDF."""
    # materialize the (tiny) candidate set so the verify side can PRUNE:
    # without this, referencing cands from the id list would re-instantiate
    # the whole signature branch, and without the semi-join the 3-gram
    # arrays get built for EVERY doc on both join sides (two corpus
    # scans for a candidate set that touches a few % of docs). This is
    # the standard candidates-then-verify materialization boundary.
    cands = minhash_candidates(spark).localCheckpoint(eager=True)
    ids = (
        cands.select(F.col("doc_id_a").alias("doc_id"))
        .union(cands.select(F.col("doc_id_b").alias("doc_id")))
        .distinct()
    )
    pruned = spark.table("documents").select("doc_id", "text").join(
        ids, "doc_id", "left_semi"
    )
    docs = doc_ngram_sets(spark, base=pruned).withColumnRenamed(
        "grams", "toks"
    )
    a = docs.alias("ta")
    b = docs.alias("tb")
    joined = (
        cands.join(a, cands["doc_id_a"] == F.col("ta.doc_id"))
        .join(b, cands["doc_id_b"] == F.col("tb.doc_id"))
    )
    inter = F.size(F.array_intersect(F.col("ta.toks"), F.col("tb.toks")))
    uni = F.size(F.array_union(F.col("ta.toks"), F.col("tb.toks")))
    return (
        joined.select(
            "doc_id_a",
            "doc_id_b",
            # integer-scaling snap, not round(x,6): int/int quotients
            # (e.g. 1/640) can land exactly on decimal half-boundaries
            # where Spark's decimal HALF_UP and DuckDB's scaled-double
            # rounding disagree (r13 promotion)
            (F.round((inter / uni) * 1e6) / 1e6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# 64-bit simhash split into 4 bands of 16 bits: any pair with hamming
# distance <= 3 differs in at most 3 bands, so by pigeonhole it MUST agree
# on at least one full band — banded candidate generation has recall 1.0
# for hamming <= (n_bands - 1) (Manku et al., WWW'07 scheme).
_SIMHASH_BANDS = 4
_SIMHASH_BAND_BITS = 64 // _SIMHASH_BANDS


def _simhash_banded(spark: SparkSession) -> DataFrame:
    """doc_id, simhash, band, band_val — one row per (doc, band)."""
    docs = (
        spark.table("documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    hashed = docs.withColumn("simhash", simhash64("text")).select("doc_id", "simhash")
    mask = (1 << _SIMHASH_BAND_BITS) - 1
    return hashed.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned("simhash", b * _SIMHASH_BAND_BITS)
                    .bitwiseAND(F.lit(mask))
                    .alias("band_val"),
                )
                for b in range(_SIMHASH_BANDS)
            ])
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.band_val")


def simhash_buckets(spark: SparkSession) -> DataFrame:
    """SimHash banded candidate buckets: (band, band_val) cells holding
    more than one document — the unit of work the near-dup join scans.
    Shuffle key is the 16-bit band value, never text."""
    bands = _simhash_banded(spark)
    return (
        bands.groupBy("band", "band_val")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_docs") > 1)
    )


def simhash_band_partition(spark: SparkSession) -> DataFrame:
    """Banding-partition conservation shadow for the SimHash pipeline
    (the dedup_minhash_band_partition pattern): hash VALUES are
    engine-specific, but the banding law is exact — every document
    emits one row per band (bands 0.._SIMHASH_BANDS-1) and every band
    value fits the _SIMHASH_BAND_BITS mask. A shift/mask off-by-one, a
    dropped doc, or a sign-extension leak (shiftrightunsigned vs >>)
    breaks the hash."""
    bands = _simhash_banded(spark)
    mask = (1 << _SIMHASH_BAND_BITS) - 1
    in_range = (F.col("band_val") >= 0) & (F.col("band_val") <= mask)
    return bands.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum(in_range.cast("long")).alias("n_in_range"),
    )


def simhash_near_duplicates(spark: SparkSession, max_hamming: int = 3) -> DataFrame:
    """SimHash near-duplicates: banded group-and-emit-pairs candidates
    (_bucket_pairs — one simhash computation, one bucket shuffle, no
    self-join), then exact hamming verify with built-in bit ops
    (bit_count(a ^ b)).

    For max_hamming <= _SIMHASH_BANDS - 1 recall is exactly 1.0 (pigeonhole
    over the bands; pinned in tests against a brute-force oracle)."""
    bands = _simhash_banded(spark)
    cands = (
        _bucket_pairs(
            bands,
            ["band", "band_val"],
            F.struct(F.col("doc_id"), F.col("simhash")),
        )
        .select(
            F.col("p.a.doc_id").alias("doc_id_a"),
            F.col("p.b.doc_id").alias("doc_id_b"),
            F.col("p.a.simhash").alias("sim_a"),
            F.col("p.b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.expr("sim_a ^ sim_b"))
    return (
        cands.select(
            "doc_id_a", "doc_id_b", hamming.cast("int").alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(spark: SparkSession, n: int = 3) -> DataFrame:
    """Exact word-n-gram Jaccard on a bounded candidate set (adjacent
    doc_id windows — deterministic and oracle-expressible; the unbounded
    version goes through LSH above).

    Pure built-ins: split → transform-based n-gram assembly → array
    intersect/union."""
    g = doc_ngram_sets(spark, n)
    # equi-join on doc_id blocks instead of a range condition: a range join
    # here plans as a nested-loop over all pairs (evaluating array ops for
    # n² candidates); block keys make it a hash join touching only ~2n rows
    width = 5
    a = g.select(
        "doc_id",
        "grams",
        F.explode(
            F.array(
                F.floor(F.col("doc_id") / width),
                F.floor(F.col("doc_id") / width) + 1,
            )
        ).alias("blk"),
    ).alias("a")
    b = g.withColumn("blk", F.floor(F.col("doc_id") / width)).alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    uni = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    return (
        a.join(b, "blk")
        .filter(
            (F.col("b.doc_id") > F.col("a.doc_id"))
            & (F.col("b.doc_id") <= F.col("a.doc_id") + width)
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.round(inter / uni, 6).alias("jaccard3"),
        )
        .filter(F.col("jaccard3") > 0)
    )


# --- near-dup cluster resolution: blocking keys → edges → components ---
def doc_block_edges(spark: SparkSession) -> DataFrame:
    """Candidate edges from two overlapping blocking-key families (md5 of
    words 1-5 and of words 3-8): docs sharing either key are near-dup
    candidates. Two families let clusters merge ACROSS families — the
    bridge case single-key grouping cannot express. Pairs come from the
    group-and-emit _bucket_pairs (r5 — one key-build, one shuffle, no
    self-join); buckets key on a 16-byte hash, never text. At 100 TB,
    cap pathological block sizes (boilerplate prefixes) with a size
    filter before the pair expansion — uncapped here because the oracle
    must see every pair."""
    words = F.split(F.col("text"), " ")
    docs = spark.table("documents")
    keys = docs.select(
        "doc_id",
        F.concat(F.lit("p:"), F.md5(F.concat_ws(" ", F.slice(words, 1, 5)))).alias("key"),
    ).union(
        docs.select(
            "doc_id",
            F.concat(F.lit("m:"), F.md5(F.concat_ws(" ", F.slice(words, 3, 6)))).alias("key"),
        )
    )
    return _bucket_pairs(keys, ["key"], F.col("doc_id")).select(
        F.col("p.a").alias("src"), F.col("p.b").alias("dst")
    )


def doc_dup_clusters(spark: SparkSession) -> DataFrame:
    """Near-dup clusters: blocking-graph connected components with sizes.
    Output is every clustered doc (singletons excluded — they're not
    duplicates of anything)."""
    from uav_streamprocessor_spark.operators.graph import components_with_sizes

    return (
        components_with_sizes(doc_block_edges(spark))
        .select(
            F.col("node").alias("doc_id"),
            F.col("comp").alias("cluster_id"),
            F.col("comp_size").alias("cluster_size"),
        )
        .orderBy("doc_id")
    )


def doc_cluster_removals(spark: SparkSession) -> DataFrame:
    """Survivor selection over the resolved clusters: keep the min doc_id
    per cluster, list what gets removed. The end-to-end near-dup pipeline
    (block → edge → component → survivor) in one query."""
    from uav_streamprocessor_spark.operators.graph import connected_components

    comp = connected_components(doc_block_edges(spark))
    return (
        comp.filter(F.col("node") != F.col("comp"))
        .select(
            F.col("node").alias("removed_doc_id"),
            F.col("comp").alias("kept_doc_id"),
        )
        .orderBy("removed_doc_id")
    )


def doc_cluster_quality_survivors(spark: SparkSession) -> DataFrame:
    """Quality-aware survivor selection: within each resolved near-dup
    cluster keep the LONGEST member (ties → lowest doc_id), not the
    lowest id. Keep-longest is the standard refinement over keep-min —
    near-dup clusters usually contain truncated/boilerplate-stripped
    variants of one document, and the longest member is the most
    complete. Per cluster: the kept doc, its length, and how many
    members are dropped.

    Plan: CC labels join the documents table once (node-keyed equi
    join), then ONE per-cluster aggregation — the argmax is a
    max(struct(n_chars, -doc_id, doc_id)) (lexicographic struct
    ordering: longest wins, ties fall to the lowest id via the negated
    key), which partial-aggregates map-side; no window, no per-cluster
    sort. The oracle states the same semantics as a row_number top-1 —
    two formulations, one answer."""
    from uav_streamprocessor_spark.operators.graph import connected_components

    comp = connected_components(doc_block_edges(spark))
    docs = spark.table("documents").select("doc_id", "n_chars")
    labeled = comp.join(docs, comp["node"] == docs["doc_id"]).select(
        F.col("comp").alias("cluster_id"), "doc_id", "n_chars"
    )
    return (
        labeled.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    F.col("n_chars"),
                    (-F.col("doc_id")).alias("neg_id"),
                    F.col("doc_id").alias("kept"),
                )
            ).alias("top"),
            F.count(F.lit(1)).alias("sz"),
        )
        .select(
            "cluster_id",
            F.col("top.kept").alias("kept_doc_id"),
            F.col("top.n_chars").alias("kept_n_chars"),
            (F.col("sz") - 1).cast("long").alias("n_removed"),
        )
        .orderBy("cluster_id")
    )


def pagerank_centrality(spark: SparkSession, k: int = 50) -> DataFrame:
    """Template-hub ranking: PageRank centrality over the blocking
    near-dup graph (doc_block_edges). High-rank docs are connected to
    many other duplicates — the boilerplate ancestors a curation pass
    should inspect or drop first. Fixed 10 power-iteration rounds
    (graph.pagerank) with per-round 1e-9 quantization (quantize=True),
    so the full trace is engine-portable and replays in a DuckDB
    recursive CTE — the r13 promotion from rows-only, extending the
    2-round contraction shadow to the whole query (the coreness
    recursive-replay pattern). Output ranks ARE the round-10 quantized
    values (no further rounding — a second 8dp round would re-introduce
    the .xxxxxxxx5 boundary class); top-k with doc_id tie-break."""
    from uav_streamprocessor_spark.operators.graph import pagerank

    ranks = pagerank(doc_block_edges(spark), quantize=True)
    return (
        ranks.select(F.col("node").alias("doc_id"), "rank")
        .orderBy(F.col("rank").desc(), "doc_id")
        .limit(k)
    )


def pagerank_contraction(spark: SparkSession, iters: int = 2) -> DataFrame:
    """Oracled contraction shadow of dedup_pagerank_centrality (which is
    rows-only by design: 10 float rounds + 8dp + top-k cut put rounded
    values within reach of cross-engine summation-order noise). This twin
    runs the SAME graph.pagerank loop for 2 rounds over the SAME blocking
    graph, emits ALL nodes at 6dp ordered by doc_id — after 2 rounds the
    accumulated float error (~1e-14) is 7 orders of magnitude inside the
    5e-7 rounding boundary, so an unrolled-SQL DuckDB twin matches
    byte-for-byte. Same proof pattern as emb_pca_trace_identity shadowing
    emb_pca_spectrum: the oracle signs the join+agg+damping plumbing that
    the 10-round query composes."""
    from uav_streamprocessor_spark.operators.graph import pagerank

    ranks = pagerank(doc_block_edges(spark), iters=iters)
    return ranks.select(
        F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank")
    ).orderBy("doc_id")


def doc_graph_triangles(spark: SparkSession) -> DataFrame:
    """Cluster-density audit of the blocking near-dup graph: per-doc
    triangle counts + local clustering coefficient (graph.triangle_stats)
    over the same edge set connected components resolves. Coefficient
    ~1.0 = true mutual-dup clique (collapse to one survivor); low
    coefficient at high degree = template hub whose variants are NOT
    mutual duplicates — the two cases a survivor policy must treat
    differently."""
    from uav_streamprocessor_spark.operators.graph import triangle_stats

    return (
        triangle_stats(doc_block_edges(spark))
        .select(
            F.col("node").alias("doc_id"),
            "degree",
            "n_triangles",
            "clustering_coeff",
        )
        .orderBy("doc_id")
    )


def ngram_containment_pairs(
    spark: SparkSession, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Asymmetric near-dup detection: n-gram CONTAINMENT
    |A∩B| / min(|A|, |B|) over the same bounded candidate blocks as
    ngram_jaccard_pairs. Jaccard misses subset duplication — a short doc
    embedded verbatim inside a long one scores |B|/|A| under Jaccard
    (arbitrarily low) but 1.0 under containment; this is the Broder
    containment measure quote/boilerplate-inclusion pipelines gate on.

    Same scale shape as the Jaccard form: block keys make the candidate
    join a hash join touching ~2w rows per doc (no range nested-loop),
    array_intersect runs in-row, and the unbounded version replaces the
    blocks with MinHash-style LSH on the SHORTER side's grams. Output
    reports both measures so the asymmetric pairs (high containment,
    low Jaccard) are visible."""
    g = doc_ngram_sets(spark, n)
    width = 5
    a = g.select(
        "doc_id",
        "grams",
        F.explode(
            F.array(
                F.floor(F.col("doc_id") / width),
                F.floor(F.col("doc_id") / width) + 1,
            )
        ).alias("blk"),
    ).alias("a")
    b = g.withColumn("blk", F.floor(F.col("doc_id") / width)).alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    uni = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    mn = F.least(F.size(F.col("a.grams")), F.size(F.col("b.grams")))
    return (
        a.join(b, "blk")
        .filter(
            (F.col("b.doc_id") > F.col("a.doc_id"))
            & (F.col("b.doc_id") <= F.col("a.doc_id") + width)
            & (mn > 0)
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.round(inter / mn, 6).alias("containment"),
            F.round(inter / uni, 6).alias("jaccard"),
        )
        .filter(F.col("containment") >= threshold)
    )


def lsh_band_tuning(
    spark: SparkSession, threshold: float = 0.7, configs=((8, 8), (16, 4), (32, 2))
) -> DataFrame:
    """Banding-parameter tuning curve for the MinHash LSH path — the
    dedup-family twin of emb_ann_tuning_curve: candidate recall and
    candidate volume per (bands, rows_per_band) split of the same
    64-permutation signature. Banding theory: P(candidate | jaccard=j)
    = 1 - (1 - j^rows)^bands, so more/narrower bands raise recall AND
    candidate cost; the curve makes the trade measurable instead of
    folklore.

    Ground truth is the blocking-edge candidate pairs (doc_block_edges
    — the same pair family the CC dedup resolves) verified with exact
    word-3-gram Jaccard >= threshold: a bounded high-similarity sample
    (~25 pairs at sf0.01, all organic near-dups) whose recall estimate
    is unbiased for pairs the blocking families surface. Signatures
    compute ONCE (localCheckpoint) and every config re-bands the same
    frame in-row; per config the only shuffle is its bucket groupBy.
    Hit-counting is a left-semi on id pairs."""
    docs = (
        spark.table("documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    sigs = (
        docs.withColumn("sig", minhash_signature("text"))
        .select("doc_id", "sig")
        .localCheckpoint(eager=True)
    )
    edges = doc_block_edges(spark).select(
        F.least("src", "dst").alias("doc_id_a"),
        F.greatest("src", "dst").alias("doc_id_b"),
    ).distinct()
    g = doc_ngram_sets(spark)
    ga = g.select(F.col("doc_id").alias("doc_id_a"), F.col("grams").alias("grams_a"))
    gb = g.select(F.col("doc_id").alias("doc_id_b"), F.col("grams").alias("grams_b"))
    jac = F.size(F.array_intersect("grams_a", "grams_b")) / F.size(
        F.array_union("grams_a", "grams_b")
    )
    truth = (
        edges.join(ga, "doc_id_a")
        .join(gb, "doc_id_b")
        .filter(jac >= threshold)
        .select("doc_id_a", "doc_id_b", jac.alias("j"))
        .localCheckpoint(eager=True)
    )
    n_truth = truth.count()
    points = []
    for bands, rows_per_band in configs:
        # analytic banding curve over the truth pairs' EXACT jaccard:
        # P(candidate | j) = 1 - (1 - j^r)^b — SQL-portable arithmetic,
        # the oracle anchor for the r12 promotion
        expected = truth.agg(
            F.avg(
                1.0
                - F.pow(
                    1.0 - F.pow(F.col("j"), F.lit(float(rows_per_band))),
                    F.lit(float(bands)),
                )
            ).alias("e")
        ).first()["e"]
        banded = sigs.select(
            "doc_id",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("band_sig"),
                    )
                    for b in range(bands)
                ])
            ).alias("bs"),
        ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))
        cands = _bucket_pairs(banded, ["band", "band_sig"], F.col("doc_id")).select(
            F.col("p.a").alias("doc_id_a"), F.col("p.b").alias("doc_id_b")
        ).distinct()
        n_cands = cands.count()
        n_hits = truth.join(cands, ["doc_id_a", "doc_id_b"], "left_semi").count()
        import math

        recall = round(n_hits / n_truth, 6) if n_truth else None
        exp_rounded = (
            math.floor(expected * 1e6 + 0.5) / 1e6
            if expected is not None
            else None
        )
        # measured-vs-analytic contract (r12 promotion): the 64-perm
        # banding recall tracks the theory curve — measured gaps are
        # <= 0.002 at all three SFs, slack 0.1 leaves a wide margin
        within = (
            abs((n_hits / n_truth) - expected) <= 0.1
            if n_truth and expected is not None
            else None
        )
        points.append(
            (bands, rows_per_band, n_cands, n_truth, recall,
             exp_rounded, within)
        )
    return spark.createDataFrame(
        points,
        "bands int, rows_per_band int, n_candidates bigint, "
        "n_truth bigint, recall double, expected_recall double, "
        "within_bound boolean",
    ).orderBy("bands")


def doc_graph_coreness(spark: SparkSession) -> DataFrame:
    """Coreness of every clustered doc in the blocking near-dup graph
    (graph.coreness h-index fixpoint): the k-core nucleus = boilerplate
    to remove first; coreness-1 fringe = incidental matches to keep."""
    from uav_streamprocessor_spark.operators.graph import coreness

    return (
        coreness(doc_block_edges(spark))
        .select(F.col("node").alias("doc_id"), "coreness")
        .orderBy("doc_id")
    )


def coreness_contraction(spark: SparkSession) -> DataFrame:
    """Oracled 1-round shadow of dedup_graph_coreness. One round from
    the degree init is exactly the fixpoint's loop body — all-integer
    h-index arithmetic, so the DuckDB twin matches with no float
    tolerance (the strongest of the three contraction shadows:
    pagerank/k-means carry 6dp rounding, this one is exact). Since r11
    the FULL fixpoint is also oracled (a recursive CTE runs the same
    update for the 50-round cap); this shadow stays as the cheap
    per-round check. Emits (doc_id, degree, h1) over the blocking
    graph."""
    from uav_streamprocessor_spark.operators.graph import coreness_first_round

    return (
        coreness_first_round(doc_block_edges(spark))
        .select(F.col("node").alias("doc_id"), "degree", "h1")
        .orderBy("doc_id")
    )


def minhash_estimate_audit(spark: SparkSession) -> DataFrame:
    """Signature-calibration audit: for every blocking candidate pair,
    the MinHash-ESTIMATED Jaccard (fraction of agreeing signature
    positions — the unbiased estimator banding theory is built on, var
    j(1-j)/k) next to the exact word-3-gram Jaccard, the error, and the
    5-sigma sampling-bound verdict. This is the check that the
    signature family actually estimates the similarity the verifier
    measures — a broken hash family silently degrades recall while the
    pipeline keeps running.

    r12 promotion: the audited family is the md5 blocking-edge pairs
    (doc_block_edges) rather than the LSH buckets — same near-dup pair
    population, but SQL-portable, so the pair set + exact jaccard +
    the within-bound boolean oracle outright (the estimate itself stays
    engine-side; measured worst margin vs 5*sigma + 1/64 is -0.016 or
    better at all three SFs). Bounded by the candidate set like the
    verify step; signatures and gram sets each compute once; agreement
    counting is an in-row zip_with fold over the 64 positions."""
    cands = (
        doc_block_edges(spark)
        .select(
            F.least("src", "dst").alias("doc_id_a"),
            F.greatest("src", "dst").alias("doc_id_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    docs = (
        spark.table("documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    sigs = docs.withColumn("sig", minhash_signature("text")).select("doc_id", "sig")
    g = doc_ngram_sets(spark)
    sa = sigs.select(F.col("doc_id").alias("doc_id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_id_b"), F.col("sig").alias("sig_b"))
    ga = g.select(F.col("doc_id").alias("doc_id_a"), F.col("grams").alias("grams_a"))
    gb = g.select(F.col("doc_id").alias("doc_id_b"), F.col("grams").alias("grams_b"))
    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    exact = F.size(F.array_intersect("grams_a", "grams_b")) / F.size(
        F.array_union("grams_a", "grams_b")
    )
    return (
        cands.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .join(ga, "doc_id_a")
        .join(gb, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(agree / float(_N_PERM), 6).alias("est_jaccard"),
            F.round(exact, 6).alias("exact_jaccard"),
            F.round(F.abs(agree / float(_N_PERM) - exact), 6).alias("abs_err"),
            (
                F.abs(agree / float(_N_PERM) - exact)
                <= 5.0 * F.sqrt(exact * (1.0 - exact) / float(_N_PERM))
                + 1.0 / float(_N_PERM)
            ).alias("within_bound"),
        )
        .orderBy("doc_id_a", "doc_id_b")
    )


def _edit_distance_candidates(a: DataFrame, b: DataFrame, band_width: int) -> DataFrame:
    """The blocked candidate join, pre-barrier — factored out so the plan
    audit can assert its join shape (the production operator hides it
    behind the localCheckpoint barrier below).

    Meet-exactly-once under the 2-emit scheme (a-side emits its own band
    and band+1, carrying `band_a` = its origin band): pairs whose docs
    share a band meet in that band under the doc_id_a < doc_id_b
    tie-break; pairs straddling a band boundary meet exactly once in the
    HIGHER band, oriented lower-band-doc-as-a (band_a < band), with no
    doc_id constraint — this replaces the r6 3-band emit, which bought
    the same exactly-once guarantee by orienting on doc_id alone at the
    cost of ~50% more candidate rows through the DP (r6 VERDICT #4)."""
    return a.join(
        b.withColumnRenamed("lang_b", "lang_a"), ["band", "lang_a"]
    ).filter(
        (
            ((F.col("band_a") == F.col("band"))
             & (F.col("doc_id_a") < F.col("doc_id_b")))
            | (F.col("band_a") < F.col("band"))
        )
        & (F.abs(F.col("len_a") - F.col("len_b")) <= band_width)
    )


def edit_distance_candidate_plan(spark: SparkSession, band_width: int = 25) -> DataFrame:
    """Plan-audit surface: the candidate join exactly as the operator
    builds it, without the barrier."""
    docs = spark.table("documents").select("doc_id", "lang", "text", "n_chars")
    a = _edit_a_side(docs, band_width)
    b = _edit_b_side(docs, band_width)
    return _edit_distance_candidates(a, b, band_width)


def _edit_a_side(docs: DataFrame, band_width: int = 25) -> DataFrame:
    band = F.floor(F.col("n_chars") / band_width)
    return docs.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("lang").alias("lang_a"),
        F.col("text").alias("text_a"),
        F.col("n_chars").alias("len_a"),
        band.alias("band_a"),
        F.explode(F.array(band, band + 1)).alias("band"),
    )


def _edit_b_side(docs: DataFrame, band_width: int = 25) -> DataFrame:
    band = F.floor(F.col("n_chars") / band_width)
    return docs.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("lang").alias("lang_b"),
        F.col("text").alias("text_b"),
        F.col("n_chars").alias("len_b"),
        band.alias("band"),
    )


def edit_distance_pairs(
    spark: SparkSession, band_width: int = 25, min_similarity: float = 0.8
) -> DataFrame:
    """Levenshtein near-duplicate pairs under length-band blocking — the
    classic entity-resolution verifier: exact edit distance is O(len²)
    per pair, so candidate pairs must be bounded BEFORE it runs.

    Blocking: (lang, floor(n_chars / band_width)), with the a-side
    emitted to its own band AND the band above (2-emit, carrying its
    origin band as band_a); the b-side sits only in its own band. The
    |len_a − len_b| ≤ band_width filter implies a qualifying pair's
    bands differ by at most 1, so every pair meets exactly once: same-
    band pairs under the doc_id_a < doc_id_b tie-break in their own
    band, boundary-straddling pairs exactly once in the HIGHER band
    oriented lower-band-doc-as-a (band_a < band) with NO doc_id
    constraint — so recall is independent of which side holds the lower
    doc_id (the r5 recall bug), at 2 emitted rows per doc instead of
    the r6 fix's 3 (the r6 VERDICT #4 cost win-back; the boundary-pair
    regression test covers both orientations). Output pairs are re-
    oriented doc_id_a < doc_id_b via least/greatest, matching the
    oracle. The length filter also bounds the DP cost: edit distance ≥
    length difference, so a pair further apart than the band can never
    reach the similarity floor.

    similarity = 1 − lev/greatest(len_a, len_b), the normalized form.
    Both engines implement the identical unit-cost Levenshtein, so the
    whole operator is oracle value-checked. Two cost levers keep the
    O(len²) DP off the non-candidates (first bench at sf0.1 measured
    218s without them, ~6s with): (lang, band) is the JOIN key — a
    post-join lang filter would run the DP across languages first —
    and the DP itself is Spark's THRESHOLDED levenshtein (banded DP,
    early abandon): any pair whose distance exceeds the floor's
    implied maximum returns -1 and is filtered — exact values survive
    for every reported row, and the oracle's full-DP recompute hashes
    identically over them. At 100 TB the blocking key swaps to MinHash
    band buckets — that composition is IMPLEMENTED as
    minhash_editdist_verify below (dedup_minhash_editdist), recall-
    pinned against this operator; the verify join shape is the same."""
    docs = spread_scan(
        spark.table("documents").select("doc_id", "lang", "text", "n_chars"),
        "doc_id",
    )
    a = _edit_a_side(docs, band_width)
    b = _edit_b_side(docs, band_width)
    # early-abandon ceiling PER PAIR: a surviving pair needs
    # lev <= (1-floor)*greatest(len_a, len_b), so that bound (+1) is the
    # threshold — tighter than any global ceiling AND computed in the
    # row, so plan construction stays lazy (the r10 watch item: the old
    # global max(n_chars) ceiling ran a driver action at BUILD time,
    # fine locally but an eager full scan at 100 TB). The SQL form is
    # used because F.levenshtein only accepts a literal threshold.
    thr = (
        f"CAST(floor({1.0 - min_similarity} * greatest(len_a, len_b)) "
        "AS INT) + 1"
    )
    lev = F.expr(f"levenshtein(text_a, text_b, {thr})")
    sim = 1.0 - lev.cast("double") / F.greatest("len_a", "len_b")
    # r17 removed the pair-level repartition + checkpoint barrier (which
    # re-shuffled every candidate's both text payloads) in favor of
    # spreading the raw doc scan below the broadcast candidate join
    # (guide §2.3). r18 fixes the side it spread: the r17 shape spread
    # only the a-side, and the planner chose BuildLeft — the SPREAD side
    # became the broadcast build input while the DP ran in the unspread
    # single-split b-scan stage (ADVICE r17; the r18 driver bench read
    # it at 7.3 s vs the barrier shape's 3.6 s). Both sides now derive
    # from ONE spread scan, so whichever side the planner builds, the
    # streamed stage that evaluates the DP reads the pinned
    # defaultParallelism spread (identical subtrees also let the second
    # exchange reuse the first). At production split counts spread_scan
    # is a no-op and the join is a plain shuffle join — nothing here is
    # local-core-count-specific.
    cands = _edit_distance_candidates(a, b, band_width)
    return (
        cands.select(
            # cross-band pairs arrive oriented by band, not id — re-orient
            # so output matches the oracle's doc_id_b > doc_id_a convention
            F.least("doc_id_a", "doc_id_b").alias("doc_id_a"),
            F.greatest("doc_id_a", "doc_id_b").alias("doc_id_b"),
            F.col("lang_a").alias("lang"),
            lev.cast("long").alias("edit_distance"),
            F.round(sim, 6).alias("similarity"),
        )
        .filter(
            (F.col("edit_distance") >= 0)  # -1 = abandoned beyond t_max
            & (F.col("similarity") >= min_similarity)
        )
    )


def ngram_novelty_by_source(spark: SparkSession, n: int = 3) -> DataFrame:
    """Per-source n-gram novelty: of each source's word-3-grams, what
    fraction had NEVER appeared in any earlier document (doc_id order)?
    The corpus-freshness decay curve — a source full of already-seen
    grams is recycled/templated content that dedup thresholds may miss
    pair-by-pair but which adds no new information to a training mix.

    Relational shape (r17 single-pass — the substring_dup_spans
    rewrite family): the distinct-gram rows explode ONCE; a gram-keyed
    window attaches each gram's min(doc_id), and one doc-keyed
    aggregate derives BOTH per-doc totals (n_grams = row count,
    n_novel = rows where this doc IS the gram's first — exactly one
    such row exists per gram since grams are distinct within a doc).
    The r16 form instantiated the gram-transform+explode subtree twice
    and ran three shuffles plus a join to stitch the totals back.
    Novelty attribution stays exact and deterministic; docs shorter
    than n words carry no grams and are excluded from the denominator
    (noted — the gram-bearing doc count is reported). Reuses
    doc_ngram_sets' optimizer-barrier gram build."""
    g = doc_ngram_sets(spark, n)
    flat = g.select("doc_id", F.explode("grams").alias("gram"))
    w = Window.partitionBy("gram")
    per_doc = (
        flat.withColumn("first_doc", F.min("doc_id").over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    docs = spark.table("documents").select("doc_id", "source")
    return (
        per_doc.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_grams").cast("long").alias("n_grams"),
            F.sum("n_novel").cast("long").alias("n_novel"),
            F.round(
                F.sum("n_novel") / F.sum("n_grams").cast("double"),
                6,
            ).alias("novelty_rate"),
        )
        .orderBy("source")
    )


def minhash_editdist_verify(
    spark: SparkSession, min_similarity: float = 0.8
) -> DataFrame:
    """The 100 TB near-dup shape, ASSEMBLED (not just documented):
    MinHash+LSH candidate generation bounds the pair set, exact
    Levenshtein verifies each candidate — block-then-verify, the
    industrial two-stage pipeline (edit_distance_pairs' length-band
    blocking is the small-corpus oracle-checkable stand-in; its
    docstring points here).

    Join shape: candidates (doc_id_a < doc_id_b, distinct) semi-bound
    the text join — texts attach by doc_id equi-joins, so the O(len²)
    DP runs ONLY on LSH-colliding pairs. Banding (16×4) targets the
    ~0.7+ Jaccard region, which for same-length docs corresponds to
    high edit similarity — the verify floor then cuts false LSH
    collisions exactly. Lang is carried on BOTH sides and pairs kept
    only where they agree, matching edit_distance_pairs' contract (the
    blocked-exact operator blocks on (lang, band), so without this
    filter the LSH path could report cross-language pairs the exact
    path excludes by construction). Rows-only (MinHash isn't SQL); the
    recall test pins it against the blocked-exact >= floor pairs."""
    cands = minhash_candidates(spark)
    docs = spark.table("documents").select("doc_id", "lang", "text", "n_chars")
    a = docs.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("lang").alias("lang"),
        F.col("text").alias("text_a"),
        F.col("n_chars").alias("len_a"),
    )
    b = docs.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("lang").alias("lang_b"),
        F.col("text").alias("text_b"),
        F.col("n_chars").alias("len_b"),
    )
    lev = F.levenshtein(F.col("text_a"), F.col("text_b"))
    # snapped like minhash_near_duplicates' jaccard (r13 promotion)
    sim = 1.0 - lev.cast("double") / F.greatest("len_a", "len_b")
    return (
        cands.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .filter(F.col("lang") == F.col("lang_b"))
        .select(
            "doc_id_a",
            "doc_id_b",
            "lang",
            lev.cast("long").alias("edit_distance"),
            (F.round(sim * 1e6) / 1e6).alias("similarity"),
        )
        .filter(F.col("similarity") >= min_similarity)
    )


# ---------------------------------------------------------------------------
# train/val/test split leakage (round 7)
# ---------------------------------------------------------------------------

def doc_split(doc_col="doc_id"):
    """Deterministic 80/10/10 train/val/test assignment by doc_id — the
    standard hash-split, arithmetic (doc_id % 10) so both engines agree
    exactly. In production the modulus runs over a content hash rather
    than a surrogate id so re-ingestion keeps docs in their split; the
    leakage audit below is hash-function-agnostic."""
    s = F.col(doc_col) % 10
    return (
        F.when(s < 8, F.lit("train"))
        .when(s == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def split_leakage_pairs(spark: SparkSession, n: int = 3) -> DataFrame:
    """Cross-split near-duplicate leakage audit: near-dup pairs (word-
    n-gram Jaccard on the bounded candidate set of ngram_jaccard_pairs)
    whose two docs landed in DIFFERENT train/val/test splits. Every such
    pair is eval contamination — the held-out doc's content is (nearly)
    in training, so eval loss on it is memorization, not generalization
    (the reason dedup must run BEFORE splitting, and the audit that
    proves it did).

    Shape: reuses the gram-build + blocked pair join of
    ngram_jaccard_pairs (two gram-keyed shuffles, candidate set bounded
    by the doc_id blocks); the split columns are arithmetic, added by
    broadcast-free projection. At 100 TB the pair source swaps to the
    MinHash-blocked candidates (minhash_candidates) with this same
    split-disagreement filter — the audit is pair-source-agnostic."""
    pairs = ngram_jaccard_pairs(spark, n)
    return (
        pairs.withColumn("split_a", doc_split("doc_id_a"))
        .withColumn("split_b", doc_split("doc_id_b"))
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_id_a", "doc_id_b", "split_a", "split_b", "jaccard3")
    )


def containment_pairs(
    spark: SparkSession, n: int = 3, min_containment: float = 0.05
) -> DataFrame:
    """Directional containment dedup (Broder's containment coefficient):
    |A∩B|/|A| and |A∩B|/|B| over word-n-gram sets, on the same bounded
    id-block candidate sample as ngram_jaccard_pairs. The asymmetric
    measure catches the dup class symmetric Jaccard structurally MISSES:
    a short doc quoted verbatim inside a much longer one has containment
    ≈1 from the short side while Jaccard ≈ |A|/|B| dilutes below any
    practical threshold. jaccard3 is reported alongside so the gap is
    visible per pair.

    Pairs kept where max-side containment (|A∩B|/min(|A|,|B|)) ≥
    `min_containment`; gram-less docs (shorter than n words) are
    excluded — containment against an empty set is undefined, not 1.0.
    Same scale shape as the Jaccard sampler: block equi-join, n·width
    pairs, LSH candidates replace id blocks at 100 TB."""
    g = doc_ngram_sets(spark, n)
    width = 5
    a = g.select(
        "doc_id",
        "grams",
        F.explode(
            F.array(
                F.floor(F.col("doc_id") / width),
                F.floor(F.col("doc_id") / width) + 1,
            )
        ).alias("blk"),
    ).alias("a")
    b = g.withColumn("blk", F.floor(F.col("doc_id") / width)).alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    uni = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    na = F.size(F.col("a.grams"))
    nb = F.size(F.col("b.grams"))
    return (
        a.join(b, "blk")
        .filter(
            (F.col("b.doc_id") > F.col("a.doc_id"))
            & (F.col("b.doc_id") <= F.col("a.doc_id") + width)
            & (na > 0)
            & (nb > 0)
        )
        .filter(inter / F.least(na, nb) >= min_containment)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.round(inter / na, 6).alias("containment_ab"),
            F.round(inter / nb, 6).alias("containment_ba"),
            F.round(inter / uni, 6).alias("jaccard3"),
        )
    )


def winnowing_fingerprints(
    spark: SparkSession, k: int = 8, w: int = 4
) -> DataFrame:
    """Per-doc winnowing (MOSS) fingerprint selection: hash every
    character k-gram, then keep the MINIMUM hash of each window of w
    consecutive k-grams (distinct per doc). Winnowing's guarantee —
    any shared substring of length >= k + w - 1 yields at least one
    shared fingerprint — with expected density 2/(w+1), so a doc's
    fingerprint set is ~25x smaller than its k-gram set at w=4.

    The hash is the first 12 hex chars of md5 over the lowercased
    k-gram, compared LEXICOGRAPHICALLY — byte-identical in Spark and
    DuckDB (hex alphabet, binary collation both sides), where a native
    integer hash() would never agree across engines.

    r17 shape (guide §2.4, remove shuffles outright): the window min is
    computed MAP-SIDE as a least-fold of w shifted slices of the per-doc
    gram-hash array — wmin[i] = least(hs[i..i+w-1]) — instead of the
    r7 doc_id-partitioned sliding window, which shuffled and sorted
    every gram row (one row per character position) just to compare
    each row with its w-1 in-doc neighbors. The selection never needs
    cross-doc data, so the Exchange+Sort+Window trio was pure overhead:
    the whole fingerprint build is now Scan → spread_scan →
    Project(hs) → Project(least-fold) →
    Generate(explode_outer(array_distinct)) — the only exchange is the
    conditional input spread (guide §2.5: the fixture parquet is one
    unsplittable split, which serialized the whole md5 stage on one
    core; at production split counts the spread is a no-op).
    `hs` is referenced w times by the fold and `t`/`n` twice upstream,
    so CollapseProject cannot inline the md5 array into the lambdas
    (inlining would re-evaluate it per element); verified in the plan.

    Reference parity note: the reference has no text dedup at all —
    this extends dedup_fingerprints (whole-doc md5) down to substring
    granularity, the standard plagiarism / near-dup fingerprinting
    scheme (Schleimer, Wilkerson & Aiken, SIGMOD'03)."""
    docs = spread_scan(
        spark.table("documents").select("doc_id", F.lower("text").alias("t")),
        "doc_id",
    )
    # per-doc k-gram hash array, positions 1..n-k+1 (guarded: an empty
    # sequence bound would count DOWN); t is an attribute reference
    # inside the lambda — read per element, never recomputed
    hs = F.when(
        F.col("n") >= k,
        F.transform(
            F.sequence(F.lit(1), F.col("n") - (k - 1)),
            lambda p: F.substring(
                F.md5(F.col("t").substr(p, F.lit(k))), 1, 12
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hashed = docs.select(
        "doc_id", F.length("t").alias("n"), "t"
    ).select("doc_id", "n", hs.alias("hs"))
    # sliding min over full windows only (w grams each): fold w shifted
    # length-nw slices with elementwise least — identical to the old
    # ROWS CURRENT..w-1 FOLLOWING frame filtered to p <= n-k+1-(w-1)
    nw = F.col("n") - (k - 1) - (w - 1)
    folded = F.slice("hs", 1, nw)
    for j in range(1, w):
        folded = F.zip_with(
            folded, F.slice("hs", j + 1, nw), lambda a, b: F.least(a, b)
        )
    wmins = F.when(nw >= 1, folded).otherwise(
        F.array().cast("array<string>")
    )
    # explode_outer, NOT explode: InferFiltersFromGenerate synthesizes a
    # size(fps)>0 filter under a plain explode, and predicate pushdown
    # inlines the whole md5 pipeline into it BELOW the projections (the
    # alias-substitution on pushdown ignores expression cost) — measured
    # 10x. No filter is inferred for an outer generate; the isNotNull on
    # the generated column is pinned above the Generate by construction
    # and drops exactly the empty-array rows a plain explode would skip
    # (a real fingerprint is never NULL: md5 over non-null k-grams).
    return (
        hashed.select("doc_id", F.array_distinct(wmins).alias("fps"))
        .select("doc_id", F.explode_outer("fps").alias("fingerprint"))
        .filter(F.col("fingerprint").isNotNull())
    )


def winnowing_near_duplicates(
    spark: SparkSession,
    k: int = 8,
    w: int = 4,
    min_overlap: float = 0.3,
    max_docs_per_fp: int = 25,
) -> DataFrame:
    """Winnowing-based near-duplicate pairs: docs sharing a large
    fraction of selected fingerprints. overlap = shared / min(|A|,|B|)
    (containment-style, so a doc embedded in a larger one still
    scores high).

    Scale shape: the fingerprint table is computed ONCE and pinned
    with a lazy localCheckpoint — without the pin, the counts/sizes/
    pair branches re-instantiate the gram-explode + window subtree SIX
    times (verified in the physical plan: 12 scans, 12 windows before
    the pin; the same AQE exchange-reuse failure the LSH group-and-emit
    rewrite root-caused). Pair generation is _bucket_pairs group-and-
    emit per fingerprint — never an all-pairs product, no self-join —
    with buckets larger than `max_docs_per_fp` docs dropped whole
    (stop-fingerprints: boilerplate shingles whose buckets would
    otherwise emit quadratic pairs; the exact analogue of the LSH
    hot-bucket guard). At 100 TB the plan reads: one gram+window pass,
    one fingerprint-keyed shuffle, pair counts keyed by (doc_a,
    doc_b)."""
    fp = winnowing_fingerprints(spark, k, w).localCheckpoint(eager=False)
    sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    shared = (
        _bucket_pairs(
            fp, ["fingerprint"], F.col("doc_id"), max_bucket=max_docs_per_fp
        )
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_fp_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_fp_b"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "overlap",
            F.round(
                F.col("n_shared")
                / F.least("n_fp_a", "n_fp_b").cast("double"),
                6,
            ),
        )
        .filter(F.col("overlap") >= min_overlap)
        .select("doc_a", "doc_b", "n_shared", "n_fp_a", "n_fp_b", "overlap")
        .orderBy("doc_a", "doc_b")
    )
