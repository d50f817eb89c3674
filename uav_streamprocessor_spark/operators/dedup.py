"""Deduplication operators over `documents` (north-star extension surface).

Five strategies, scale-ranked:

- exact        : hash-groupBy on the full text — one shuffle on text (or on
                 md5(text) to keep shuffle keys small at 100 TB).
- fingerprint  : md5 fingerprint dedup — same result as exact for our data,
                 but the shuffle key is 16 bytes instead of the document.
- minhash_lsh  : shingle → minhash signature → band-bucket join; candidate
                 pairs verified with exact Jaccard. Near-dup at scale:
                 shuffle is on (band, bucket-hash), never all-pairs.
- simhash      : 64-bit simhash; near-dups = equal fingerprints on any
                 rotated band table (here: hamming check among bucket mates).
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

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

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


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """64-bit hashes of character k-shingles (md5-based: stable across
    platforms and Python hash seeds)."""
    s = text.lower()
    if len(s) < k:
        shingles = {s}
    else:
        shingles = {s[i : i + k] for i in range(len(s) - k + 1)}
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, sh in enumerate(shingles):
        out[i] = struct.unpack("<Q", hashlib.md5(sh.encode()).digest()[:8])[0]
    return out


@pandas_udf(T.ArrayType(T.LongType()))
def minhash_signature(texts: pd.Series) -> pd.Series:
    """64-permutation MinHash signature per document (Arrow-batched)."""
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
    """64-bit SimHash over whitespace tokens (md5 token hashes)."""
    out = []
    for text in texts:
        tokens = (text or "").lower().split()
        if not tokens:
            out.append(0)
            continue
        acc = np.zeros(64, dtype=np.int64)
        for tok in tokens:
            h = struct.unpack("<Q", hashlib.md5(tok.encode()).digest()[:8])[0]
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        sig = np.uint64(0)
        for i in range(64):
            if acc[i] > 0:
                sig |= np.uint64(1) << np.uint64(i)
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

def minhash_candidates(spark: SparkSession) -> DataFrame:
    """MinHash+LSH near-duplicate candidate pairs.

    signature(64) → 16 bands of 4 → explode to (band, band_sig) → self-join
    on the band bucket. The only shuffle is on the band bucket key; all-pairs
    comparison never happens. Candidates with doc_id_a < doc_id_b, distinct.
    """
    docs = spark.table("documents").select("doc_id", "text")
    sigs = docs.withColumn("sig", minhash_signature("text")).select("doc_id", "sig")
    rows_per_band = _N_PERM // _LSH_BANDS
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        "_",
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                            for r in range(rows_per_band)
                        ],
                    ).alias("band_sig"),
                )
                for b in range(_LSH_BANDS)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_sig")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )


def minhash_near_duplicates(spark: SparkSession, threshold: float = 0.7) -> DataFrame:
    """LSH candidates verified with exact token-set Jaccard (computed with
    built-in array functions — no UDF in the verify step)."""
    cands = minhash_candidates(spark)
    docs = spark.table("documents").select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("toks")
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
            F.round(inter / uni, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_buckets(spark: SparkSession) -> DataFrame:
    """SimHash near-dup buckets: documents sharing a 64-bit simhash (exact
    collision = near-identical token multisets)."""
    docs = spark.table("documents").select("doc_id", "text")
    hashed = docs.withColumn("simhash", simhash64("text"))
    return (
        hashed.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(spark: SparkSession, n: int = 3) -> DataFrame:
    """Exact word-n-gram Jaccard on a bounded candidate set (adjacent
    doc_id windows — deterministic and oracle-expressible; the unbounded
    version goes through LSH above).

    Pure built-ins: split → transform-based n-gram assembly → array
    intersect/union."""
    docs = spark.table("documents").select("doc_id", F.lower("text").alias("t"))
    toks = F.split(F.col("t"), " ")
    ngrams = F.array_distinct(
        F.filter(
            F.transform(
                toks,
                lambda _, i: F.when(
                    i + n <= F.size(toks),
                    F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )
    g = docs.select("doc_id", ngrams.alias("grams"))
    a = g.alias("a")
    b = g.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    uni = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    return (
        a.join(
            b,
            (F.col("b.doc_id") > F.col("a.doc_id"))
            & (F.col("b.doc_id") <= F.col("a.doc_id") + 5),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.round(inter / uni, 6).alias("jaccard3"),
        )
        .filter(F.col("jaccard3") > 0)
    )
