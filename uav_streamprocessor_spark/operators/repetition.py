"""Repetition / boilerplate / contamination analysis over `documents`
(north-star extension: the filters a pretraining corpus pass runs after
exact+near dedup).

Four operators, all pure built-ins (split/transform/explode/agg — no
Python in any hot path), modeled on the published pipeline heuristics:

- per-doc duplicate n-gram fraction (Gopher repetition rule family /
  Rae et al. 2021 §A1.1; CCNet's paragraph-dup analogue — the corpus has
  no newlines, so fixed-width word windows stand in for lines);
- cross-document repeated n-grams (boilerplate detection);
- composite quality gate (Gopher-style pass/fail rules);
- train→test contamination report (shared n-grams across the
  content-hash split — the eval-decontamination join every training
  pipeline needs).

Scale notes: the only shuffles key on gram strings here (oracle
comparability); a 100 TB run keys on xxhash64(gram) instead — 8-byte
shuffle keys, gram text carried only where reported. Per-doc stats never
shuffle at all (arrays stay inside the row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uav_streamprocessor_spark.operators.sampling import _TRAIN_MAX_NIBBLE


def _word_ngrams(n: int):
    """array<string> of space-joined word n-grams of lower(text).
    1-based element_at matches the oracle's 1-based DuckDB list indexing;
    docs shorter than n words are filtered out by the caller (Spark's
    sequence(1, k) with k < 1 counts DOWN — never build it unguarded)."""
    words = F.split(F.lower("text"), " ")
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    return words, F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + int(k)) for k in range(n)]
        ),
    )


def ngram_repetition_stats(spark: SparkSession, n: int = 3) -> DataFrame:
    """Per-doc duplicate n-gram fraction: 1 - distinct/total over word
    trigrams. The whole computation stays inside the row (no explode, no
    shuffle) — at 100 TB this is a map-only pass."""
    docs = spark.table("documents")
    words, grams = _word_ngrams(n)
    return (
        docs.filter(F.size(F.split(F.lower("text"), " ")) >= n)
        .select(
            "doc_id",
            "lang",
            F.size(grams).alias("n_grams"),
            F.size(F.array_distinct(grams)).alias("n_distinct_grams"),
            F.round(
                1.0 - F.size(F.array_distinct(grams)) / F.size(grams).cast("double"),
                6,
            ).alias("dup_gram_fraction"),
        )
    )


def boilerplate_ngrams(
    spark: SparkSession, n: int = 3, min_docs: int = 5
) -> DataFrame:
    """Cross-document repeated n-grams (boilerplate/template detection):
    grams appearing in >= min_docs distinct documents, with doc and
    occurrence counts. distinct-per-doc BEFORE the global agg keeps the
    exploded row count bounded by distinct grams per doc."""
    docs = spark.table("documents")
    _, grams = _word_ngrams(n)
    per_doc = (
        docs.filter(F.size(F.split(F.lower("text"), " ")) >= n)
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("gram"))
    )
    return (
        per_doc.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def gopher_quality_flags(spark: SparkSession) -> DataFrame:
    """Composite Gopher-style quality gate, summarized per (lang, passes):
    word count >= 30, mean word length <= 5.5, stopword ('the') ratio
    >= 0.02, zero duplicate trigrams. Thresholds are corpus-calibrated so
    every rule splits the data (a gate that always passes proves
    nothing)."""
    docs = spark.table("documents")
    words, grams = _word_ngrams(3)
    n_words = F.size(words)
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    the_hits = (F.length(padded) - F.length(F.replace(padded, F.lit(" the ")))) / 5
    flags = docs.filter(n_words >= 3).select(
        "lang",
        (n_words >= 30).alias("f_len"),
        (F.length("text") / n_words <= 5.5).alias("f_word_len"),
        (the_hits / n_words >= 0.02).alias("f_stopword"),
        (F.size(F.array_distinct(grams)) == F.size(grams)).alias("f_no_rep"),
    )
    return (
        flags.withColumn(
            "passes",
            (
                F.col("f_len")
                & F.col("f_word_len")
                & F.col("f_stopword")
                & F.col("f_no_rep")
            ).cast("int"),  # INT not BOOLEAN: the driver value-hash is typed
        )
        .groupBy("lang", "passes")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("f_len").cast("long")).alias("n_len_ok"),
            F.sum(F.col("f_word_len").cast("long")).alias("n_word_len_ok"),
            F.sum(F.col("f_stopword").cast("long")).alias("n_stopword_ok"),
            F.sum(F.col("f_no_rep").cast("long")).alias("n_no_rep_ok"),
        )
    )


def decontamination_report(spark: SparkSession, n: int = 4) -> DataFrame:
    """Eval-set contamination: for each TEST-split doc, how many of its
    distinct word n-grams also appear in ANY TRAIN-split doc, and how
    many train docs share at least one gram. Split rule = the engine's
    content-hash split (sampling.py) so dedup/split/decontamination all
    key on the same family.

    Plan shape: both sides explode to distinct (doc, gram), the join
    keys on gram only — a standard shuffle-hash/broadcast equi-join. The
    train side pre-aggregates to distinct grams (+ doc count) BEFORE the
    join, so join fan-out is bounded by test grams, not |test|x|train|."""
    docs = spark.table("documents")
    is_train = F.substring(F.md5("text"), 1, 1) <= _TRAIN_MAX_NIBBLE
    _, grams = _word_ngrams(n)
    base = docs.filter(F.size(F.split(F.lower("text"), " ")) >= n).select(
        "doc_id", is_train.alias("is_train"), F.explode(F.array_distinct(grams)).alias("gram")
    )
    train_grams = (
        base.filter("is_train")
        .groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("n_train_docs"))
    )
    test = base.filter(~F.col("is_train"))
    return (
        test.join(train_grams, "gram")  # inner: only contaminated grams survive
        .groupBy(test["doc_id"].alias("test_doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_shared_grams"),
            F.sum("n_train_docs").alias("total_train_doc_hits"),
        )
    )


def decontamination_prefiltered(spark: SparkSession, n: int = 4) -> DataFrame:
    """Scale path for `decontamination_report`: before the corpus-wide
    gram aggregation, semi-join the (huge) train side against a BROADCAST
    compact filter of eval-gram hashes — xxhash64(gram), 8 bytes each.
    This is the shape of every production decontamination pass: the eval
    set is a bounded benchmark corpus (MBs), so its distinct-gram hash
    set broadcasts like a fixed dim (nation/region class), and 99%+ of
    corpus grams are dropped MAP-SIDE before any shuffle. The hash set is
    a k=1 Bloom filter with a 64-bit domain; Spark's runtime bloom-join
    injection does the same thing automatically when thresholds allow,
    but here the filter is explicit so the plan is pinned.

    Result is EXACTLY `decontamination_report(n)`'s: the hash prefilter
    has no false negatives, and the exact gram equi-join that follows
    removes any hash collisions — so both share one oracle.
    """
    docs = spark.table("documents")
    is_train = F.substring(F.md5("text"), 1, 1) <= _TRAIN_MAX_NIBBLE
    _, grams = _word_ngrams(n)
    base = docs.filter(F.size(F.split(F.lower("text"), " ")) >= n).select(
        "doc_id",
        is_train.alias("is_train"),
        F.explode(F.array_distinct(grams)).alias("gram"),
    )
    test = base.filter(~F.col("is_train"))
    eval_gram_hashes = test.select(F.xxhash64("gram").alias("gh")).distinct()
    train_grams = (
        base.filter("is_train")
        .join(
            F.broadcast(eval_gram_hashes),
            F.xxhash64("gram") == F.col("gh"),
            "leftsemi",
        )
        .groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("n_train_docs"))
    )
    return (
        test.join(train_grams, "gram")
        .groupBy(test["doc_id"].alias("test_doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_shared_grams"),
            F.sum("n_train_docs").alias("total_train_doc_hits"),
        )
    )


def curation_funnel(spark: SparkSession) -> DataFrame:
    """End-to-end corpus-curation funnel — the pipeline this engine's
    text surface exists for, composed from the SAME rules the standalone
    queries prove individually:

      00_raw                 -> every document
      10_exact_dedup         -> keep lowest doc_id per identical text
                                (dedup.dedup_survivors rule)
      20_quality             -> Gopher-style gate (gopher_quality_flags
                                rules, all four must pass)
      30_train_split         -> content-hash train side (sampling rule)
      40_train_decontaminated-> drop train docs sharing any 4-gram with
                                the held-out eval split
      41_eval_held_out       -> the eval side, kept aside

    Returns (stage, n_docs) — the funnel report a curation run logs.
    Each stage builds on the previous DataFrame lineage; a production run
    materializes per-stage checkpoints instead of recomputing the chain,
    but the logical plan here IS the production plan shape: md5-keyed
    window for dedup, map-only quality filter, gram semi-join for
    decontamination. Counts-only output keeps the oracle compact while
    pinning every stage's cardinality."""
    from pyspark.sql import Window

    docs = spark.table("documents").select("doc_id", "lang", "text")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    ded = docs.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")

    words = F.split(F.lower("text"), " ")
    n_words = F.size(words)
    _, grams3 = _word_ngrams(3)
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    the_hits = (F.length(padded) - F.length(F.replace(padded, F.lit(" the ")))) / 5
    q = ded.filter(n_words >= 30).filter(
        (F.length("text") / n_words.cast("double") <= 5.5)
        & (the_hits / n_words >= 0.02)
        & (F.size(F.array_distinct(grams3)) == F.size(grams3))
    )

    split = q.withColumn(
        "is_train", F.substring(F.md5("text"), 1, 1) <= _TRAIN_MAX_NIBBLE
    )
    _, grams4 = _word_ngrams(4)
    g = split.filter(n_words >= 4).select(
        "doc_id", "is_train", F.explode(F.array_distinct(grams4)).alias("gram")
    )
    eval_grams = g.filter(~F.col("is_train")).select("gram").distinct()
    contaminated = (
        g.filter("is_train")
        .join(eval_grams, "gram", "leftsemi")
        .select("doc_id")
        .distinct()
    )
    train = split.filter("is_train")
    train_clean = train.join(contaminated, "doc_id", "left_anti")

    def cnt(df: DataFrame, stage: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(stage).alias("stage"), "n_docs"
        )

    return (
        cnt(docs, "00_raw")
        .unionAll(cnt(ded, "10_exact_dedup"))
        .unionAll(cnt(q, "20_quality"))
        .unionAll(cnt(train, "30_train_split"))
        .unionAll(cnt(train_clean, "40_train_decontaminated"))
        .unionAll(cnt(split.filter(~F.col("is_train")), "41_eval_held_out"))
    )
