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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from uav_streamprocessor_spark.operators.partitioning import spread_scan
from uav_streamprocessor_spark.operators.sampling import _TRAIN_MAX_NIBBLE


def _with_tokens(df: DataFrame) -> DataFrame:
    """Materialize the lowered token array ONCE as a `ws` column. Gram
    builders must reference this column, never an inline split(...):
    expressions captured inside transform() lambdas are re-evaluated per
    output element, so an inline split costs O(words²) splits per doc —
    measured 7-11s vs ~1.5s for the decontamination join at sf0.1 (same
    pitfall dedup.word_ngrams documents).

    NOTE: CollapseProject can re-inline the split if the gram projection
    sits directly on this one (dedup.doc_ngram_sets uses a repartition
    barrier for that reason). Every caller here has a Filter or Window
    node between _with_tokens and the gram lambdas, which blocks the
    collapse — keep it that way when adding callers."""
    return df.withColumn("ws", F.split(F.lower("text"), " "))


def _grams_col(n: int):
    """array<string> of space-joined word n-grams from the materialized
    `ws` column; [] for docs shorter than n words (guards sequence(),
    which counts DOWN over a negative span). 1-based element_at matches
    DuckDB's 1-based list indexing."""
    ws = F.col("ws")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, i + int(k)) for k in range(n)]
        ),
    )
    return F.when(F.size(ws) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_repetition_stats(spark: SparkSession, n: int = 3) -> DataFrame:
    """Per-doc duplicate n-gram fraction: 1 - distinct/total over word
    trigrams. The whole computation stays inside the row (no explode, no
    shuffle) — at 100 TB this is a map-only pass."""
    docs = spark.table("documents")
    d = (
        _with_tokens(docs)
        .filter(F.size("ws") >= n)
        .withColumn("grams", _grams_col(n))
        .withColumn("n_distinct", F.size(F.array_distinct("grams")))
    )
    return d.select(
        "doc_id",
        "lang",
        F.size("grams").alias("n_grams"),
        F.col("n_distinct").alias("n_distinct_grams"),
        F.round(
            1.0 - F.col("n_distinct") / F.size("grams").cast("double"), 6
        ).alias("dup_gram_fraction"),
    )


def boilerplate_ngrams(
    spark: SparkSession, n: int = 3, min_docs: int = 5
) -> DataFrame:
    """Cross-document repeated n-grams (boilerplate/template detection):
    grams appearing in >= min_docs distinct documents, with doc and
    occurrence counts. distinct-per-doc BEFORE the global agg keeps the
    exploded row count bounded by distinct grams per doc."""
    docs = spark.table("documents")
    per_doc = (
        _with_tokens(docs)
        .filter(F.size("ws") >= n)
        .select("doc_id", F.explode(F.array_distinct(_grams_col(n))).alias("gram"))
    )
    return (
        per_doc.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def gopher_doc_flags(spark: SparkSession) -> DataFrame:
    """Per-document Gopher gate verdict: (doc_id, passes INT) with the
    SAME four rules and thresholds as gopher_quality_flags (which is
    this frame aggregated). Docs under 3 words carry no row — callers
    left-join and treat absence as fail, exactly like the aggregate
    form's filter. Exposed so downstream audits (classifier
    calibration) can join the verdict without re-deriving the rules."""
    docs = spark.table("documents")
    n_words = F.size("ws")
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    the_hits = (F.length(padded) - F.length(F.replace(padded, F.lit(" the ")))) / 5
    grams = F.col("grams")
    return (
        _with_tokens(docs)
        .filter(n_words >= 3)
        .withColumn("grams", _grams_col(3))
        .select(
            "doc_id",
            (
                (n_words >= 30)
                & (F.length("text") / n_words <= 5.5)
                & (the_hits / n_words >= 0.02)
                & (F.size(F.array_distinct(grams)) == F.size(grams))
            ).cast("int").alias("passes"),
        )
    )


def gopher_quality_flags(spark: SparkSession) -> DataFrame:
    """Composite Gopher-style quality gate, summarized per (lang, passes):
    word count >= 30, mean word length <= 5.5, stopword ('the') ratio
    >= 0.02, zero duplicate trigrams. Thresholds are corpus-calibrated so
    every rule splits the data (a gate that always passes proves
    nothing)."""
    docs = spark.table("documents")
    n_words = F.size("ws")
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    the_hits = (F.length(padded) - F.length(F.replace(padded, F.lit(" the ")))) / 5
    grams = F.col("grams")
    flags = (
        _with_tokens(docs)
        .filter(n_words >= 3)
        .withColumn("grams", _grams_col(3))
        .select(
            "lang",
            (n_words >= 30).alias("f_len"),
            (F.length("text") / n_words <= 5.5).alias("f_word_len"),
            (the_hits / n_words >= 0.02).alias("f_stopword"),
            (F.size(F.array_distinct(grams)) == F.size(grams)).alias("f_no_rep"),
        )
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
    base = (
        _with_tokens(docs)
        .filter(F.size("ws") >= n)
        .select(
            "doc_id",
            is_train.alias("is_train"),
            F.explode(F.array_distinct(_grams_col(n))).alias("gram"),
        )
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
    base = (
        _with_tokens(docs)
        .filter(F.size("ws") >= n)
        .select(
            "doc_id",
            is_train.alias("is_train"),
            F.explode(F.array_distinct(_grams_col(n))).alias("gram"),
        )
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

    Plan shape: every per-doc stage is a FLAG COLUMN on one labeled
    pass (dedup window + quality rules + split nibble), so all six
    counts come from a single aggregation + stack — NOT a six-branch
    union that recomputes the lineage per stage (the first cut did
    that; 17s vs ~4s at sf0.1). The only second subtree is the
    decontamination gram self-join, which joins back per doc_id. A
    production run materializes per-stage checkpoints; this is the
    single-pass audit over the same rules."""
    from pyspark.sql import Window

    docs = spark.table("documents").select("doc_id", "text")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")

    n_words = F.size("ws")
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    the_hits = (F.length(padded) - F.length(F.replace(padded, F.lit(" the ")))) / 5
    grams3 = _grams_col(3)  # [] below 3 words; n_words >= 30 gates anyway
    q_rules = (
        (n_words >= 30)
        & (F.length("text") / n_words.cast("double") <= 5.5)
        & (the_hits / n_words >= 0.02)
        & (F.size(F.array_distinct(grams3)) == F.size(grams3))
    )

    flagged = (
        _with_tokens(docs)
        .withColumn("kept", F.row_number().over(w) == 1)
        .select(
            "doc_id",
            "ws",
            "kept",
            (F.col("kept") & q_rules).alias("q"),
            (F.substring(F.md5("text"), 1, 1) <= _TRAIN_MAX_NIBBLE).alias(
                "is_train"
            ),
        )
    )

    g = flagged.filter("q").select(
        "doc_id", "is_train", F.explode(F.array_distinct(_grams_col(4))).alias("gram")
    )
    eval_grams = g.filter(~F.col("is_train")).select("gram").distinct()
    contaminated = (
        g.filter("is_train")
        .join(eval_grams, "gram", "leftsemi")
        .select("doc_id")
        .distinct()
        .withColumn("contam", F.lit(True))
    )

    final = flagged.drop("ws").join(contaminated, "doc_id", "left")
    counts = final.agg(
        F.count(F.lit(1)).alias("c00"),
        F.sum(F.col("kept").cast("long")).alias("c10"),
        F.sum(F.col("q").cast("long")).alias("c20"),
        F.sum((F.col("q") & F.col("is_train")).cast("long")).alias("c30"),
        F.sum(
            (F.col("q") & F.col("is_train") & F.col("contam").isNull()).cast("long")
        ).alias("c40"),
        F.sum((F.col("q") & ~F.col("is_train")).cast("long")).alias("c41"),
    )
    return counts.select(
        F.expr(
            "stack(6, '00_raw', c00, '10_exact_dedup', c10, "
            "'20_quality', c20, '30_train_split', c30, "
            "'40_train_decontaminated', c40, '41_eval_held_out', c41) "
            "AS (stage, n_docs)"
        )
    )


def paragraph_block_dedup(spark: SparkSession, block_words: int = 20) -> DataFrame:
    """Paragraph-level keep-first dedup, CCNet-style (Wenzek et al.,
    arXiv:1911.00359 dedups Common Crawl per PARAGRAPH hash before any
    doc-level pass; the corpus has no newlines, so non-overlapping
    `block_words`-word blocks stand in for paragraphs — same convention
    as the repetition rules above). Every block is hashed; across the
    corpus the FIRST occurrence (min (doc_id, block_idx)) is the keeper
    and later occurrences are removals. Output: per affected doc, how
    many of its blocks a paragraph-dedup pass would cut.

    Plan shape: blocks are built in-row (sequence+transform over the
    materialized token array — one narrow projection, no per-word
    explode; a doc explodes into ceil(words/20) block rows, 20x fewer
    than word rows). The only shuffle keys on the 128-bit block hash;
    keep-first is one row_number window per hash — state O(occurrences
    of that hash), never corpus-wide. At 100 TB the md5 key would drop
    to xxhash64 like substring_dup_spans (md5 kept here so the DuckDB
    oracle compares identical strings)."""
    docs = spark.table("documents")
    ws = F.col("ws")
    n_blocks = F.ceil(F.size(ws) / F.lit(float(block_words))).cast("int")
    block_hashes = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(ws, i * block_words + 1, block_words))
        ),
    )
    blocks = (
        _with_tokens(docs.select("doc_id", "text"))
        .filter(F.size("ws") > 0)
        .select("doc_id", F.posexplode(block_hashes).alias("block_idx", "h"))
    )
    w = Window.partitionBy("h").orderBy("doc_id", "block_idx")
    marked = blocks.withColumn(
        "removed", (F.row_number().over(w) > 1).cast("int")
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_blocks"),
            F.sum("removed").cast("int").alias("n_dup_blocks"),
        )
        .filter(F.col("n_dup_blocks") > 0)
        .withColumn(
            "dup_ratio",
            F.round(F.col("n_dup_blocks") / F.col("n_blocks").cast("double"), 6),
        )
    )


def substring_dup_spans(spark: SparkSession, n: int = 8) -> DataFrame:
    """Duplicated-span coverage — the relational approximation of exact
    substring dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499, which uses a corpus
    suffix array): per document, the fraction of word 8-gram POSITIONS
    whose gram also occurs in some OTHER document. High coverage means
    most of the doc is textual material shared verbatim elsewhere —
    the docs substring-dedup would cut spans from.

    Plan: grams never materialize as strings ANYWHERE — this op doesn't
    report gram text, so each position hashes its n words directly with
    the multi-argument xxhash64 (field-wise, so ("ab","c") ≠ ("a","bc")
    — strictly better than hashing a joined string) and every shuffle
    keys on 8-byte longs (unlike boilerplate_ngrams, whose output IS
    the gram): positions explode once, a (doc, hash) distinct +
    count>=2 marks cross-doc grams, and a left-semi join re-weights
    every position. A 64-bit collision would fuse two distinct grams
    (probability ~n²/2^65 — negligible, and it would surface as an
    oracle mismatch since the DuckDB side compares exact strings).
    Per-doc position totals are pure arithmetic (n_words - n + 1), no
    second gram pass. Suffix arrays find character-level spans; word
    8-grams are the standard join-friendly surrogate (a shared
    >=8-word span implies a shared 8-gram).

    r17 single-pass shape (guide §2.3/§2.4 — the r16 form tokenized and
    exploded the corpus TWICE and shuffled every position row through a
    distinct + a gram-keyed semi-join): positions explode ONCE into a
    (doc_id, g) partial count `pc` — the spread_scan partitioning by
    doc_id already satisfies the groupBy(doc_id, g) distribution, so no
    extra exchange — then one window over g counts the distinct docs
    per gram on the pc rows (distinct-gram-sized, not position-sized),
    and one doc-keyed aggregate derives BOTH totals: n_positions =
    Σc (every position emits exactly one gram) and n_dup_positions =
    Σc over grams seen in ≥2 docs. 2 explodes + 5 exchanges + 2 joins
    → 1 explode + 3 exchanges + 0 joins, results identical."""
    docs = spread_scan(
        spark.table("documents").select("doc_id", "text"), "doc_id"
    )
    ws = F.col("ws")
    gram_hashes = F.transform(
        F.sequence(F.lit(1), F.size(ws) - (n - 1)),
        lambda i: F.xxhash64(
            *[F.element_at(ws, i + int(k)) for k in range(n)]
        ),
    )
    positions = (
        _with_tokens(docs)
        .filter(F.size("ws") >= n)
        .select("doc_id", F.explode(gram_hashes).alias("g"))
    )
    pc = positions.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("g"))
    per_doc = (
        pc.withColumn("n_docs", n_docs)
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_positions"),
            F.sum(
                F.when(F.col("n_docs") >= 2, F.col("c")).otherwise(F.lit(0))
            ).alias("n_dup_positions"),
        )
    )
    return (
        per_doc.select(
            "doc_id",
            "n_positions",
            "n_dup_positions",
            F.round(
                F.col("n_dup_positions")
                / F.col("n_positions").cast("double"),
                6,
            ).alias("dup_span_coverage"),
        )
        .orderBy("doc_id")
    )
