"""Text-analysis operators over `documents` (north-star extension).

Token counting, quality scoring, language-ID heuristic, word counts,
TF-IDF — all with built-in string/array functions (JVM-side); no Python
in any hot path (sole exception: char_entropy_gate's Arrow-batched
numpy UDF, measured 25× faster than the interpreted-HOF built-in form —
rationale in its docstring). Counting idioms use length-difference arithmetic
(length(x) - length(replace(x, t, ''))) which is exact, codegen'd, and
portable to the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from uav_streamprocessor_spark.operators.partitioning import spread_scan


def _occurrences(col, token: str):
    """# of occurrences of `token` via length arithmetic (no regex —
    deterministic and cross-engine)."""
    tl = len(token)
    return (F.length(col) - F.length(F.replace(col, F.lit(token)))) / tl


def token_stats(spark: SparkSession) -> DataFrame:
    """Whitespace token counts + char stats per doc."""
    docs = spark.table("documents")
    n_tokens = (_occurrences(F.col("text"), " ") + 1).cast("long")
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        F.round(F.length("text") / n_tokens, 6).alias("avg_token_len"),
    )


def quality_scores(spark: SparkSession) -> DataFrame:
    """Quality scoring: stopword ratio, mean word length, length score —
    the heuristics a pretraining pipeline gates on."""
    docs = spark.table("documents")
    text = F.col("text")
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    n_tokens = (_occurrences(text, " ") + 1).cast("double")
    stop_hits = (
        _occurrences(padded, " the ")
        + _occurrences(padded, " a ")
        + _occurrences(padded, " of ")
        + _occurrences(padded, " and ")
    )
    return docs.select(
        "doc_id",
        "lang",
        F.round(stop_hits / n_tokens, 6).alias("stopword_ratio"),
        F.round(F.length(text) / n_tokens, 6).alias("mean_word_len"),
        F.when(F.length(text) >= 200, 1.0)
        .when(F.length(text) >= 50, 0.5)
        .otherwise(0.0)
        .alias("length_score"),
    )


def language_id_heuristic(spark: SparkSession) -> DataFrame:
    """Character-frequency language-ID heuristic and its confusion counts
    against the labeled lang column. (The corpus is synthetic English-ish
    text for all langs, so accuracy is meaningless — the point is the
    operator shape: per-doc feature extraction → argmax over scores →
    confusion matrix, all relational.)"""
    docs = spark.table("documents")
    t = F.lower(F.col("text"))
    n = F.length(t).cast("double")
    e_ratio = _occurrences(t, "e") / n
    z_ratio = _occurrences(t, "z") / n
    q_ratio = _occurrences(t, "q") / n
    pred = (
        F.when(z_ratio > 0.01, F.lit("zh"))
        .when(q_ratio > 0.01, F.lit("fr"))
        .when(e_ratio > 0.09, F.lit("en"))
        .otherwise(F.lit("other"))
    )
    return (
        docs.select(F.col("lang").alias("actual_lang"), pred.alias("predicted_lang"))
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def word_counts(spark: SparkSession, k: int = 20) -> DataFrame:
    """Classic distributed word count, top-k by frequency: split → explode
    → groupBy (map-side combine) → TakeOrderedAndProject."""
    docs = spark.table("documents")
    words = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(k)
    )


def tf_idf_top_terms(spark: SparkSession, k: int = 30) -> DataFrame:
    """TF-IDF with exact DF counts: tf = in-doc count, idf =
    ln((N+1)/(df+1)). Two shuffles (doc-term, term); idf side is tiny →
    broadcast back. Top-k terms by best tf-idf.

    r17 note: a single-pass rewrite (df as a word-partitioned window
    over the (doc, word) counts, the substring_dup_spans family) was
    measured and REVERTED — the window's vocab×docs sort costs more
    than the second explode + hash countDistinct both at fixture scale
    (A/B medians 0.72 vs 0.64) and plausibly at 100 TB (sort vs hash);
    documented in OPTIMIZATION_r17.md."""
    docs = spark.table("documents")
    # N as a broadcast scalar aggregate — no driver-side action at
    # plan-build time (the previous docs.count() ran a job per build)
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    terms = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    tf = terms.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_ = terms.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    idf = df_.crossJoin(F.broadcast(n_docs)).select(
        "word", F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)).alias("idf")
    )
    scored = tf.join(F.broadcast(idf), "word").select(
        "word", "doc_id", F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf")
    )
    return (
        scored.groupBy("word")
        .agg(F.round(F.max("tfidf"), 6).alias("best_tfidf"))
        .orderBy(F.col("best_tfidf").desc(), F.col("word"))
        .limit(k)
    )


def zipf_slope(spark: SparkSession) -> DataFrame:
    """Zipf's-law fit per language — the corpus-health screen that
    catches template/synthetic text (natural language fits ln(freq) ≈
    a + s·ln(rank) with s ≈ -1; machine-generated or boilerplate-heavy
    corpora flatten or steepen the tail): per lang, rank words by
    frequency and fit the log-log slope with the built-in least-squares
    aggregates (regr_slope/regr_r2 — identical closed form in DuckDB).

    One word-count shuffle (map-side combined) + one per-lang rank
    window over the VOCABULARY (types, not tokens — the window input is
    |vocab| rows, tiny at any corpus scale) + one scalar agg per lang.
    Ranks use (freq desc, word) so ties are deterministic cross-engine."""
    docs = spark.table("documents")
    words = docs.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    freq = words.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("word"))
    ranked = freq.withColumn("rnk", F.row_number().over(w))
    lx = F.log(F.col("rnk").cast("double"))
    ly = F.log(F.col("n").cast("double"))
    return (
        ranked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("n").alias("n_tokens"),
            F.round(F.regr_slope(ly, lx), 6).alias("zipf_slope"),
            F.round(F.regr_r2(ly, lx), 6).alias("zipf_r2"),
        )
        .orderBy("lang")
    )


# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space
# symbol — the GPT-2-style split that word-level BPE vocabularies train
# over. Portable between Java regex (Spark) and RE2 (DuckDB).
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regex_token_stats(spark: SparkSession) -> DataFrame:
    """Regex (BPE-ish) token counting per doc: total tokens, distinct
    tokens, word/number/symbol breakdown — all with regexp_extract_all +
    array built-ins (JVM-side), no UDF."""
    docs = spark.table("documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)
    words = F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$"))
    numbers = F.filter(toks, lambda t: t.rlike("^[0-9]+$"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(words).alias("n_word_tokens"),
        F.size(numbers).alias("n_number_tokens"),
        (F.size(toks) - F.size(words) - F.size(numbers)).alias("n_symbol_tokens"),
    )


def doc_stats_by_lang_source(spark: SparkSession) -> DataFrame:
    """Grouped doc-quality dashboard: per (lang, source) char totals and
    extremes."""
    docs = spark.table("documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


def unigram_cross_entropy(spark: SparkSession) -> DataFrame:
    """Per-document cross-entropy against the corpus's own unigram LM —
    the perplexity-filter staple of pretraining pipelines (docs whose
    token distribution diverges from the corpus score high and get
    culled). Two passes, both JVM-side: token counts (explode + groupBy,
    map-side combinable), then a token-level join back. The LM table is
    vocabulary-sized (≪ corpus at any scale — Heaps' law) but still
    grows with data, so it carries NO broadcast hint; AQE broadcasts it
    while it fits. avg(ln p) is rounded to 6dp — summation-order ULP
    noise sits ~1e-13 below that boundary."""
    toks = (
        spark.table("documents")
        .select("doc_id", "lang", F.explode(F.split("text", " ")).alias("word"))
    )
    counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("corpus_tokens"))
    lm = counts.crossJoin(F.broadcast(total)).select(
        "word", (F.col("n") / F.col("corpus_tokens")).alias("p")
    )
    return (
        toks.join(lm, "word")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(-F.avg(F.log("p")), 6).alias("cross_entropy"),
        )
        .orderBy("doc_id")
    )


def source_vocabulary_overlap(spark: SparkSession) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the contamination /
    provenance-overlap matrix. Distinct (source, word) incidence, counted
    once per source and once per co-occurring pair: one shuffle on word
    for the pair expansion, one tiny agg on (src_a, src_b). The pair
    space is sources², independent of corpus size; the word-level join
    is the only data-sized stage and its key is the token."""
    sv = (
        spark.table("documents")
        .select("source", F.explode(F.split("text", " ")).alias("word"))
        .distinct()
    )
    sizes = sv.groupBy("source").agg(F.count(F.lit(1)).alias("vocab"))
    a, b = sv.alias("a"), sv.alias("b")
    inter = (
        a.join(b, "word")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("vocab").alias("vocab_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("vocab").alias("vocab_b"))
    return (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")),
                6,
            ).alias("vocab_jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# PII redaction + URL/domain analytics (training-data compliance surface).
#
# The synthetic `documents` corpus is word-soup with no real PII/URLs, so
# both operators first derive a deterministic augmented view — PII/URL
# strings injected by doc_id arithmetic, identically re-derivable in the
# DuckDB oracle — then run the real scrubbing pipeline over it. The
# injection is a test fixture; the redaction path is the product.
# ---------------------------------------------------------------------------

# Patterns restricted to the Java-regex ∩ RE2 common subset (no lookaround,
# no backrefs) so Spark and the DuckDB oracle agree byte-for-byte.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"
IP_RE = r"\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
URL_RE = r"https?://([A-Za-z0-9.-]+)"


def _with_injected_pii(docs: DataFrame) -> DataFrame:
    """Deterministic PII injection: every 7th doc an email, every 11th a
    phone, every 13th an IP — mirrored exactly by the oracle CTE."""
    d = F.col("doc_id")
    return docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                d % 7 == 0,
                F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                d % 11 == 0,
                F.concat(F.lit(" call 555-"), F.lpad((d % 10000).cast("string"), 4, "0")),
            ).otherwise(F.lit("")),
            F.when(
                d % 13 == 0,
                F.concat(F.lit(" host 10."), (d % 256).cast("string"), F.lit(".0.1")),
            ).otherwise(F.lit("")),
        ),
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The reusable scrubber: chained JVM-side regexp_replace (no Python
    in the row path; codegen keeps the three passes in one stage)."""
    c = F.col(text_col)
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PHONE_RE, "<PHONE>")
    c = F.regexp_replace(c, IP_RE, "<IP>")
    return docs.withColumn("redacted", c)


def pii_redaction_stats(spark: SparkSession) -> DataFrame:
    """Per-source PII audit: docs containing each PII class, characters
    removed by redaction, and a residual count that must come out 0 —
    the scrub-completeness check a compliance pipeline gates on.

    Scale: map-only until a |sources|-row aggregate; regexes run in the
    scan stage, nothing wide shuffles."""
    injected = _with_injected_pii(spark.table("documents"))
    scrubbed = redact_pii(injected)
    any_pii = f"({EMAIL_RE})|({PHONE_RE})|({IP_RE})"
    return (
        scrubbed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("text").rlike(EMAIL_RE).cast("int")).alias("docs_with_email"),
            F.sum(F.col("text").rlike(PHONE_RE).cast("int")).alias("docs_with_phone"),
            F.sum(F.col("text").rlike(IP_RE).cast("int")).alias("docs_with_ip"),
            F.sum(F.length("text") - F.length("redacted")).alias("chars_redacted"),
            F.sum(F.col("redacted").rlike(any_pii).cast("int")).alias("residual_pii"),
        )
        .orderBy("source")
    )


def url_domain_stats(spark: SparkSession, top_k: int = 20) -> DataFrame:
    """Domain-level URL analytics with a blocklist filter: extract the
    host from each injected URL, drop blocklisted domains via a broadcast
    anti-join, return the top-k domains by document count.

    Scale: the blocklist is a fixed tiny dim (broadcast anti-join — never
    a shuffle); domain extraction is a scan-stage regexp; the only
    shuffle is the |domains|-key aggregate."""
    d = F.col("doc_id")
    docs = spark.table("documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                d % 3 == 0,
                F.concat(
                    F.lit(" see http://site"),
                    (d % 40).cast("string"),
                    F.lit(".example.com/p"),
                    d.cast("string"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    blocklist = spark.range(4).select(
        F.concat(F.lit("site"), (F.col("id") * 10).cast("string"), F.lit(".example.com"))
        .alias("domain")
    )
    domains = (
        docs.select(F.regexp_extract("text", URL_RE, 1).alias("domain"))
        .filter(F.col("domain") != "")
        .join(F.broadcast(blocklist), "domain", "left_anti")
    )
    return (
        domains.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), "domain")
        .limit(top_k)
    )


def array_hof_profile(spark: SparkSession) -> DataFrame:
    """Higher-order-function surface in one pass over the token array:
    filter (long words), exists (stopword hit), forall (all-alpha),
    aggregate (char fold) — each per doc, summarized per lang. All
    JVM-side lambdas inside one codegen stage; the token array never
    explodes."""
    docs = spark.table("documents")
    words = F.split(F.lower("text"), " ")
    n_long = F.size(F.filter(words, lambda w: F.length(w) > 6))
    has_the = F.exists(words, lambda w: w == "the").cast("int")
    all_alpha = F.forall(words, lambda w: w.rlike("^[a-z]+$")).cast("int")
    total_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    per_doc = docs.select(
        "lang",
        n_long.alias("n_long"),
        has_the.alias("has_the"),
        all_alpha.alias("all_alpha"),
        total_chars.alias("total_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_long").cast("long").alias("total_long_words"),
        F.sum("has_the").cast("long").alias("docs_with_the"),
        F.sum("all_alpha").cast("long").alias("docs_all_alpha"),
        F.round(F.avg("total_chars"), 6).alias("avg_word_chars"),
    )


def perplexity_buckets(spark: SparkSession) -> DataFrame:
    """CCNet-style head/middle/tail bucketing: per language, docs are
    ranked by unigram cross-entropy (ascending — most-fluent first) and
    cut into terciles with ntile(3). Pretraining pipelines keep `head`,
    sample `middle`, and drop `tail` (Wenzek et al., CCNet,
    arXiv:1911.00359). The window partitions by lang, so each language
    buckets independently — parallel across the partition key, with the
    usual dominant-language skew caveat (at extreme skew, replace ntile
    with approx-percentile cutpoints computed per lang, which drops the
    per-lang global sort for two scans). Ordering ties break on doc_id;
    cross_entropy is pre-rounded to 6dp so the tercile boundaries are
    engine-portable."""
    ce = unigram_cross_entropy(spark)
    w = Window.partitionBy("lang").orderBy("cross_entropy", "doc_id")
    bucketed = ce.withColumn("tercile", F.ntile(3).over(w)).withColumn(
        "bucket",
        F.when(F.col("tercile") == 1, "head")
        .when(F.col("tercile") == 2, "middle")
        .otherwise("tail"),
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("cross_entropy"), 6).alias("avg_ce"),
            F.round(F.min("cross_entropy"), 6).alias("min_ce"),
            F.round(F.max("cross_entropy"), 6).alias("max_ce"),
        )
        .orderBy("lang", "bucket")
    )


def quality_classifier(spark: SparkSession) -> DataFrame:
    """Linear quality classifier (fasttext-style scorer reduced to its
    relational core): a fixed weight vector over cheap text features —
    stopword ratio, mean word length, log length — through a sigmoid.
    The model is a handful of literals (broadcast by construction, the
    same shape as serving any small linear/logistic scorer in-plan);
    features reuse the exact length-arithmetic idioms of quality_scores,
    so the whole scorer is one codegen'd projection, no Python, no
    shuffle. `pred_keep` is derived from the 6dp-ROUNDED score so the
    decision boundary is engine-portable."""
    docs = spark.table("documents")
    text = F.col("text")
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    n_tokens = (_occurrences(text, " ") + 1).cast("double")
    stop_ratio = (
        _occurrences(padded, " the ")
        + _occurrences(padded, " a ")
        + _occurrences(padded, " of ")
        + _occurrences(padded, " and ")
    ) / n_tokens
    mean_word_len = F.length(text) / n_tokens
    log_len = F.log(F.length(text).cast("double") + 1.0)
    z = (
        F.lit(-6.0)
        + stop_ratio * 12.0
        + mean_word_len * 0.55
        + log_len * 0.35
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return docs.select(
        "doc_id",
        "lang",
        score.alias("quality_score"),
        (score >= 0.5).cast("int").alias("pred_keep"),
    )


def bm25_topk(
    spark: SparkSession,
    n_query_terms: int = 5,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 retrieval (Robertson/Sparck-Jones): for each query term,
    the top-k documents by the Okapi BM25 score

        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

    with idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1). Query terms are
    corpus-derived deterministically — the n most document-frequent
    terms of length >= 5 (ties on the term string) — so the query set
    needs no external input and is identical in the oracle.

    Plan shape: the tokenize/explode + partial-agg EXCHANGE is planned
    once and every consumer reuses its shuffle files (ReusedExchange):
    tf is the final agg over it; df re-aggregates the same exchange by
    term; doc length attaches to tf as a sum window collapsed to
    doc_id. The naive four-branch formulation (separate dl/df/corpus
    aggs each re-deriving tf) re-ran the explode 4x — 22s → ~1s at
    sf0.1. Corpus scalars (N, avgdl) come from a map-only in-row token
    count over the documents scan — one narrow 1-row broadcast. The
    query-term side is n rows, broadcast; the final per-term top-k
    window sees only docs MATCHING a query term (inner join prunes
    first). At 100 TB, tf/df are the classic inverted-index build —
    linear, combinable, no skew beyond natural term skew (and the
    top-k window partitions by query term, bounded by n)."""
    docs = spark.table("documents")
    terms = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # doc length as a window over tf — same subtree, exchange reused
    tf_dl = tf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus stats from an in-row token count: map-only, no explode
    n_tokens = F.size(
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    )
    corpus = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(n_tokens.cast("double")).alias("avgdl"),
    )
    qterms = (
        df_.filter(F.length("term") >= 5)
        .orderBy(F.col("df").desc(), "term")
        .limit(n_query_terms)
        .select("term", "df")
    )
    # NO broadcast hint on qterms: a BroadcastExchange subquery is its
    # own AQE boundary and re-instantiates the explode subtree; as a
    # plain join both branches share the (doc_id, term) shuffle STAGE
    # (AQE stage reuse), the explode runs once, and AQE still promotes
    # the 5-row side to broadcast after the fact.
    scored = tf_dl.join(qterms, "term").crossJoin(F.broadcast(corpus))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.col("avgdl")
    )
    score = F.round(idf * F.col("tf") * (k1 + 1.0) / norm, 6)
    w = Window.partitionBy("term").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    return (
        scored.select("term", "doc_id", "tf", "dl", score.alias("bm25"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("term", "rnk")
    )


def char_entropy_gate(spark: SparkSession, min_bits: float = 3.8) -> DataFrame:
    """Character-level Shannon entropy per document, with a low-entropy
    gate — the cheap screen that catches degenerate text (single-char
    floods, template spam, base64-ish blobs sit HIGH, natural prose in
    this corpus ~4 bits/char).

    Shape: map-only, ZERO shuffle — a per-doc scalar must not move the
    corpus (the naive explode-chars plan shuffles one row per CHARACTER
    — at 100 TB, the whole corpus through the wire). The per-row count
    is an Arrow-batched pandas UDF: ASCII docs take the numpy fast path
    (frombuffer → bincount — C speed, no Python per char); non-ASCII
    falls back to a codepoint Counter per row. A pure higher-order-
    function formulation was measured first and REJECTED: Spark
    evaluates HOF lambdas interpreted (no codegen), and the O(alphabet
    × len) filter-count ran 13s at sf0.1 vs ~0.5s for this UDF — the
    documented "built-ins beat UDFs" default inverts when the built-in
    path is interpreted per element."""

    @pandas_udf(T.DoubleType())
    def entropy_bits(texts: pd.Series) -> pd.Series:
        import collections

        out = np.empty(len(texts), dtype=np.float64)
        for i, s in enumerate(texts):
            if not s:
                out[i] = 0.0
                continue
            if s.isascii():
                counts = np.bincount(
                    np.frombuffer(s.encode("ascii"), dtype=np.uint8)
                )
                counts = counts[counts > 0].astype(np.float64)
            else:
                counts = np.array(
                    list(collections.Counter(s).values()), dtype=np.float64
                )
            p = counts / counts.sum()
            out[i] = float(-(p * np.log2(p)).sum())
        return pd.Series(out)

    docs = spark.table("documents")
    ent = F.round(entropy_bits(F.col("text")), 6)
    return docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").alias("n_chars"),
        ent.alias("char_entropy"),
        (ent < min_bits).cast("int").alias("low_entropy"),
    )


def bpe_pair_counts(spark: SparkSession, k: int = 20) -> DataFrame:
    """The counting core of one BPE merge step (Sennrich et al.,
    arXiv:1508.07909): frequency of every ADJACENT symbol pair inside
    words across the corpus; the argmax pair is the next merge. Symbols
    here are characters (step 0 of training); the plan is identical for
    later steps with multi-char symbols.

    Pairs are built IN-ROW: tokenize to words, chars per word, then
    zip_with over the two offset slices — no per-character explode.
    The only shuffle is the final pair count (map-side combined,
    alphabet^2-bounded key space, so the reduce side is tiny no matter
    the corpus size). Top-k by (count desc, pair) for determinism."""
    docs = spark.table("documents")
    words = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.length("word") >= 2)
    chars = F.filter(F.split(F.col("word"), ""), lambda x: x != "")
    left = F.slice(chars, 1, F.size(chars) - 1)
    right = F.slice(chars, 2, F.size(chars) - 1)
    pairs = F.zip_with(left, right, lambda a, b_: F.concat(a, b_))
    return (
        words.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(k)
    )


def hybrid_retrieval(
    spark: SparkSession,
    n_candidates: int = 20,
    k: int = 10,
    alpha: float = 0.5,
) -> DataFrame:
    """Hybrid lexical+vector retrieval — the modern RAG retrieval stack
    in one plan: BM25 produces per-term candidates, the term's rank-1
    document supplies the query VECTOR (pseudo-relevance feedback — the
    deterministic stand-in for an external query embedding), and
    candidates re-rank by

        hybrid = alpha * bm25 / max_bm25(term)  +  (1-alpha) * cosine

    (min-max-free normalization: BM25 scaled by the term's top score,
    cosine already in [-1, 1]).

    Plan: the candidate set is MATERIALIZED once (localCheckpoint —
    same candidates-then-rerank boundary as minhash verify; the BM25
    plan would otherwise re-instantiate per reference: once for the
    per-term max, once for the query-vector pick, once as the rerank
    input). Vectors join candidate rows by id — the embeddings scan is
    pruned to ~n_candidates x terms rows by the join; the query-vector
    side is ≤ n_terms rows, broadcast. At 100 TB this is exactly a
    production two-stage retriever: cheap lexical stage bounds the
    expensive vector stage."""
    from uav_streamprocessor_spark.operators.similarity import _cosine

    cands = bm25_topk(spark, k=n_candidates).localCheckpoint(eager=True)
    max_bm25 = cands.groupBy("term").agg(F.max("bm25").alias("max_bm25"))
    qvec = (
        cands.filter(F.col("rnk") == 1)
        .select(F.col("term"), F.col("doc_id").alias("q_doc_id"))
    )
    emb = spark.table("embeddings").select(
        F.col("vec_id"), F.col("embedding")
    )
    qvec_e = qvec.join(
        emb, qvec["q_doc_id"] == emb["vec_id"]
    ).select("term", F.col("embedding").alias("qv"))
    scored = (
        cands.join(emb, cands["doc_id"] == emb["vec_id"])
        .join(F.broadcast(qvec_e), "term")
        .join(F.broadcast(max_bm25), "term")
    )
    cos = F.round(_cosine(F.col("qv"), F.col("embedding")), 6)
    hybrid = F.round(
        alpha * F.col("bm25") / F.col("max_bm25")
        + (1.0 - alpha) * F.col("cosine"),
        6,
    )
    w = Window.partitionBy("term").orderBy(
        F.col("hybrid").desc(), F.col("doc_id")
    )
    return (
        scored.select(
            "term", "doc_id", "bm25", "max_bm25", cos.alias("cosine")
        )
        .withColumn("hybrid", hybrid)
        .drop("max_bm25")
        .withColumn("new_rnk", F.row_number().over(w))
        .filter(F.col("new_rnk") <= k)
        .select(
            "term",
            F.col("new_rnk").alias("rnk"),
            "doc_id",
            "bm25",
            "cosine",
            "hybrid",
        )
        .orderBy("term", "rnk")
    )


def bigram_cross_entropy(spark: SparkSession) -> DataFrame:
    """Bigram-LM fluency scoring — the sequence-aware upgrade of
    unigram_cross_entropy: per doc, average -log2 P(w2 | w1) under an
    add-one-smoothed corpus bigram model,

        P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V).

    Plan: doc bigrams are built IN-ROW (zip_with over offset slices of
    the token array — the word-level twin of bpe_pair_counts), so the
    only data-scale shuffles are the bigram/unigram count aggs and the
    per-(doc, bigram) probability join, all keyed by compact gram
    strings; V is a 1-row broadcast. The model tables are vocabulary-
    (not corpus-) sized — at 100 TB they're the small side and the join
    broadcasts or bucket-joins on gram."""
    docs = spark.table("documents")
    toks = docs.select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("ws")
    )
    bi = F.zip_with(
        F.slice(F.col("ws"), 1, F.size("ws") - 1),
        F.slice(F.col("ws"), 2, F.size("ws") - 1),
        lambda a, b_: F.concat_ws(" ", a, b_),
    )
    doc_bi = toks.select(
        "doc_id", "lang", F.explode(bi).alias("bigram")
    )
    bi_counts = doc_bi.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("c_bi")
    )
    uni = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    uni_counts = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c_uni"))
    vocab = uni_counts.agg(
        F.count(F.lit(1)).cast("double").alias("v_size")
    )
    model = (
        bi_counts.withColumn(
            "w1", F.substring_index("bigram", " ", 1)
        )
        .join(uni_counts, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            (
                -F.log(
                    (F.col("c_bi") + 1.0)
                    / (F.col("c_uni") + F.col("v_size"))
                )
                / F.log(F.lit(2.0))
            ).alias("nll_bits"),
        )
    )
    return (
        doc_bi.join(model, "bigram")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nll_bits"), 6).alias("bigram_ce"),
        )
    )


def classifier_calibration(spark: SparkSession) -> DataFrame:
    """Classifier calibration audit — does the linear quality scorer's
    score MEAN anything? Per absolute score decile (floor(score*10),
    top bucket closed), the fraction of docs that pass the independent
    Gopher rule gate. A well-calibrated scorer shows gate_rate rising
    with the bucket; a flat curve means the scorer is noise. The same
    eval-as-a-query pattern as emb_ann_tuning_curve, fully
    SQL-expressible this time.

    Plan: two map-only per-doc projections (scorer, gate) joined on
    doc_id, one 10-key aggregation — the join is the only shuffle, and
    absolute-bin bucketing avoids the global ntile sort on purpose."""
    from uav_streamprocessor_spark.operators.repetition import gopher_doc_flags

    scores = quality_classifier(spark)
    gate = gopher_doc_flags(spark)
    joined = scores.join(gate, "doc_id", "left").select(
        "doc_id",
        "quality_score",
        F.coalesce(F.col("passes"), F.lit(0)).alias("gate"),
    )
    bucket = F.least(
        F.floor(F.col("quality_score") * 10).cast("int"), F.lit(9)
    )
    return (
        joined.groupBy(bucket.alias("score_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("gate").cast("long").alias("n_gate_pass"),
            F.round(F.avg("gate"), 6).alias("gate_rate"),
            F.round(F.avg("quality_score"), 6).alias("avg_score"),
        )
        .orderBy("score_bucket")
    )


def bpe_train_merges(
    spark: SparkSession, rounds: int = 6, passes: int = 3
) -> DataFrame:
    """Iterative BPE training (Sennrich et al., arXiv:1508.07909): run
    `rounds` merge steps, each selecting the most frequent adjacent
    symbol pair and fusing it corpus-wide; returns the merge table
    (round, pair, new_symbol, weighted count at selection) — the actual
    artifact a tokenizer trainer produces, of which bpe_pair_counts is
    the single-step counting core.

    Scale design (the industrial BPE shape, cf. HF tokenizers): ONE
    corpus-sized aggregation up front (word -> frequency), then every
    round runs over the DISTINCT-WORD table — vocab-sized, not
    corpus-sized — with occurrences weighted by word freq. Words are
    space-delimited symbol strings (' h e l l o '); pair counting is
    in-row zip_with over offset slices + one map-side-combined groupBy
    (key space bounded by the live symbol-pair vocabulary); the argmax
    is ONE collected row per round (same O(1)-rows driver state as the
    k-means centroid step); the merge itself is a JVM replace() chain,
    map-only. localCheckpoint after each merge keeps the plan flat
    across rounds.

    Merge semantics: ' a b ' -> ' ab ' applied `passes` times — one
    replace() pass resolves alternating occurrences only (consecutive
    matches share the delimiter space), and each extra pass doubles the
    resolved run length, so passes=3 is exact for same-pair runs up to
    length 7 (beyond any real word). Both engines run the identical
    chain, so Spark and the oracle agree bit-for-bit regardless."""
    words, merges = _bpe_train(spark, rounds, passes)
    return spark.createDataFrame(
        merges, "round int, pair string, new_symbol string, total bigint"
    ).orderBy("round")


def _bpe_train(spark: SparkSession, rounds: int, passes: int):
    """Shared trainer core: returns (final vocab DataFrame with columns
    (word, seq, freq), merge list). The `word` column rides along so
    downstream evals (bpe_fertility) can join vocab state back to
    per-language frequencies."""
    docs = spark.table("documents")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "word",
            F.concat(
                F.lit(" "), F.regexp_replace(F.col("word"), "(.)", "$1 ")
            ).alias("seq"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )
    merges = []
    for rnd in range(1, rounds + 1):
        toks = F.split(F.trim(F.col("seq")), " ")
        pairs = F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b_: F.concat(a, F.lit(" "), b_),
        )
        best = (
            words.select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("total"))
            .orderBy(F.col("total").desc(), "pair")
            .limit(1)
            .collect()[0]
        )
        pat = " " + best["pair"] + " "
        rep = " " + best["pair"].replace(" ", "") + " "
        merges.append((rnd, best["pair"], best["pair"].replace(" ", ""), best["total"]))
        # build the replace chain with column expressions (no SQL-string
        # interpolation of corpus-derived text)
        merged = F.col("seq")
        for _ in range(passes):
            merged = F.replace(merged, F.lit(pat), F.lit(rep))
        # lazy checkpoint (r17): the barrier still truncates lineage,
        # but materialization folds into the next round's argmax collect
        # (or the consumer's first action) instead of paying a dedicated
        # job per merge round — halves the round-trip count of the loop
        words = words.select(
            "word", merged.alias("seq"), "freq"
        ).localCheckpoint(eager=False)
    return words, merges


def bpe_fertility(
    spark: SparkSession, rounds: int = 6, passes: int = 3
) -> DataFrame:
    """Tokenizer-quality eval over the trained merges: per-language
    fertility (tokens per word) and compression (chars per token) after
    `rounds` BPE merges — the standard multilingual-tokenizer fairness
    audit (a vocabulary trained on a corpus mix tokenizes some languages
    into more pieces; fertility gaps quantify it).

    The vocab state from _bpe_train joins back to per-(lang, word)
    frequencies by word — the join is vocab-sized on both sides; the
    corpus-sized work is the same two word-count shuffles the trainer
    already does. Token counts per word fall out of the seq string
    relationally (space arithmetic), so the eval adds zero Python."""
    words, _ = _bpe_train(spark, rounds, passes)
    docs = spark.table("documents")
    per_lang = (
        docs.select(
            "lang", F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .filter(F.length("word") >= 2)
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("freq_l"))
    )
    n_tokens = F.size(F.split(F.trim(F.col("seq")), " "))
    vocab = words.select("word", n_tokens.alias("n_tokens"))
    joined = per_lang.join(vocab, "word")
    return (
        joined.groupBy("lang")
        .agg(
            F.sum("freq_l").alias("n_words"),
            F.sum(F.col("freq_l") * F.col("n_tokens")).alias("total_tokens"),
            F.sum(F.col("freq_l") * F.length("word")).alias("total_chars"),
        )
        .select(
            "lang",
            "n_words",
            "total_tokens",
            F.round(F.col("total_tokens") / F.col("n_words"), 6).alias(
                "fertility"
            ),
            F.round(F.col("total_chars") / F.col("total_tokens"), 6).alias(
                "chars_per_token"
            ),
        )
        .orderBy("lang")
    )


def typo_variant_pairs(
    spark: SparkSession, min_ratio: int = 5, min_canon: int = 5
) -> DataFrame:
    """OCR/typo noise screen over the corpus vocabulary: rare words at
    edit distance 1 from a much more frequent word are likely damaged
    variants of it (the spell-noise signal quality pipelines use to
    flag scanned/OCR'd sources). Emits (canonical, variant) pairs where
    freq(canonical) >= min_ratio * freq(variant).

    Candidate generation is SymSpell deletion-neighborhood blocking
    (Garbe): every word keys on itself plus its single-char deletions;
    any two words within edit distance 1 provably share a key (the
    shorter word IS a deletion of the longer, or both share the
    deletion at the edit position for substitutions), so recall is 1.0
    WITHOUT an all-pairs scan — candidate work is O(word_len) keys per
    vocab type, and the verify (levenshtein == 1) runs only inside
    key buckets. The whole pipeline is vocab-sized after one corpus
    word-count shuffle: the same sublinear-working-set shape as the
    BPE trainer. Bucket keys are strings; at 100 TB hash them to
    16-byte keys exactly like the blocking-edge families."""
    docs = spark.table("documents")
    vocab = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.length("word") >= 3)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    dels = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.concat(
            F.col("word").substr(F.lit(1), i - 1),
            F.col("word").substr(i + 1, F.length("word")),
        ),
    )
    keys = vocab.select(
        "word",
        "n",
        F.explode(
            F.array_distinct(F.concat(F.array(F.col("word")), dels))
        ).alias("key"),
    )
    a = keys.select(
        F.col("word").alias("canonical"), F.col("n").alias("n_canonical"), "key"
    )
    b = keys.select(
        F.col("word").alias("variant"), F.col("n").alias("n_variant"), "key"
    )
    return (
        a.join(b, "key")
        .filter(
            (F.col("canonical") != F.col("variant"))
            & (F.levenshtein("canonical", "variant") == 1)
            & (F.col("n_canonical") >= min_ratio * F.col("n_variant"))
            & (F.col("n_canonical") >= min_canon)
        )
        .select("canonical", "variant", "n_canonical", "n_variant")
        .distinct()
        .orderBy("canonical", "variant")
    )


def score_quantile_normalization(spark: SparkSession) -> DataFrame:
    """Cross-source score calibration: the same classifier score means
    different things on different sources (a 0.6 on a clean source can
    be worse than a 0.4 on a noisy one), so source-fair selection ranks
    WITHIN source and compares ranks, not raw scores. Per (source,
    within-source quintile): doc count, mean raw score, and the mean
    GLOBAL quintile those docs land in — a well-calibrated source shows
    global ~= local on every row; divergence tells quota selection to
    use the within-source rank.

    Reuses the quality_classifier scorer (one codegen'd projection).
    No global window anywhere (the plan-audit ban): global quintile
    boundaries come from ONE exact-percentile scalar aggregate
    broadcast back as four literals (the rel_price_statistics
    pattern), and the within-source quintile is an ntile(5) window
    partitioned by source with (score, doc_id) tie-breaks —
    deterministic and identical in DuckDB."""
    docs = spark.table("documents").select("doc_id", "source")
    scored = (
        quality_classifier(spark)
        .select("doc_id", "quality_score")
        .join(docs, "doc_id")
    )
    brk = scored.agg(
        F.percentile("quality_score", F.lit(0.2)).alias("p20"),
        F.percentile("quality_score", F.lit(0.4)).alias("p40"),
        F.percentile("quality_score", F.lit(0.6)).alias("p60"),
        F.percentile("quality_score", F.lit(0.8)).alias("p80"),
    )
    w = Window.partitionBy("source").orderBy("quality_score", "doc_id")
    global_q = (
        F.when(F.col("quality_score") <= F.col("p20"), 1)
        .when(F.col("quality_score") <= F.col("p40"), 2)
        .when(F.col("quality_score") <= F.col("p60"), 3)
        .when(F.col("quality_score") <= F.col("p80"), 4)
        .otherwise(5)
    )
    return (
        scored.crossJoin(F.broadcast(brk))
        .withColumn("local_q", F.ntile(5).over(w))
        .withColumn("global_q", global_q)
        .groupBy("source", "local_q")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality_score"), 6).alias("mean_score"),
            F.round(F.avg("global_q"), 6).alias("mean_global_q"),
        )
        .orderBy("source", "local_q")
    )


def score_psi_by_source(spark: SparkSession) -> DataFrame:
    """Population stability index per source — THE industry drift
    metric (credit-scoring heritage, now standard ML monitoring):
    PSI(source) = sum_i (p_i - q_i) * ln(p_i / q_i) over score deciles,
    where q is the reference distribution. The reference here is the
    POOLED corpus cut at its own global deciles, which makes q uniform
    (0.1 per bucket) by construction — so each source's PSI measures
    exactly how far its score distribution sits from the corpus-wide
    one. PSI < 0.1 = stable, 0.1-0.2 = moderate, > 0.2 = drifted are
    the conventional thresholds — but they assume large samples: under
    the null PSI is ~chi-square with E[PSI] ~ (buckets-1)/n, which at
    25 docs/source is 0.36 on its own. The flag therefore uses
    max(0.2, 3*(buckets-1)/n_docs): the conventional cut once n is
    large, a 3x-null-mean cut before that, so small sources aren't
    spuriously flagged by sampling noise.

    Shares the quality_classifier scorer and the exact-percentile
    breakpoint pattern of score_normalization (scalar agg broadcast as
    9 literals, no global window); counts are Laplace-smoothed
    (+0.5/bucket) so empty buckets don't blow up the log. Readout is
    an O(sources) aggregate."""
    docs = spark.table("documents").select("doc_id", "source")
    scored = (
        quality_classifier(spark)
        .select("doc_id", "quality_score")
        .join(docs, "doc_id")
    )
    qs = [i / 10.0 for i in range(1, 10)]
    brk = scored.agg(
        *[
            F.percentile("quality_score", F.lit(q)).alias(f"p{int(q * 100)}")
            for q in qs
        ]
    )
    decile = F.lit(10)
    for q in reversed(qs):
        decile = F.when(
            F.col("quality_score") <= F.col(f"p{int(q * 100)}"),
            F.lit(int(q * 10)),
        ).otherwise(decile)
    counts = (
        scored.crossJoin(F.broadcast(brk))
        .select("source", decile.alias("decile"))
        .groupBy("source", "decile")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.groupBy("source").agg(F.sum("n").alias("n_docs"))
    # smoothed share per (source, decile); missing buckets contribute via
    # the 10-bucket smoothing denominator and the q=0.1 reference term
    # handled below by unioning the zero rows in relationally
    full = (
        totals.crossJoin(
            spark.range(1, 11).select(F.col("id").cast("int").alias("decile"))
        )
        .join(counts, ["source", "decile"], "left")
        .select(
            "source",
            "n_docs",
            "decile",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )
    p = (F.col("n") + 0.5) / (F.col("n_docs") + 5.0)
    term = (p - 0.1) * F.log(p / 0.1)
    return (
        full.select("source", "n_docs", term.alias("term"))
        .groupBy("source", "n_docs")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
        .select(
            "source",
            "n_docs",
            "psi",
            (
                F.col("psi") > F.greatest(F.lit(0.2), 27.0 / F.col("n_docs"))
            ).alias("drifted"),
        )
        .orderBy("source")
    )


def dsir_importance_weights(
    spark: SparkSession, min_count: int = 5
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): score every raw document by the log-likelihood
    ratio of its unigrams under a *target* LM vs the *raw-corpus* LM,
    then select the docs whose per-token average ratio is positive
    (they look more like the target than like the average of the pool).

    Target definition is deterministic and in-corpus: English docs of
    >= 200 chars (the Gopher-ish "clean prose" proxy this corpus
    affords). Both LMs are Laplace-smoothed over the SAME shared
    vocabulary (add-0.5 / +0.5*V), so a vocab token unseen in the
    target still gets a finite (negative) log ratio instead of -inf.

    The vocabulary keeps only words with raw count >= `min_count`
    (tokenizer-LM min-frequency cutoff). Without it, a token unseen in
    BOTH corpora scores ln((0.5/(T_t+0.5V)) / (1.5/(T_r+0.5V))) > 0
    whenever the target corpus is much smaller than the raw pool — a
    smoothing artifact that would rank pure OOV junk ABOVE genuine
    target-like text (caught by the planted-junk control in
    tests/test_round5c_ops.py). The paper avoids this by hashing into
    a dense feature space where every bucket is observed; word-level
    min-count is the exact-vocabulary equivalent. Consequence: n_tokens
    counts scored (in-vocab) tokens, and a doc with ZERO in-vocab
    tokens is excluded from the output rather than given an artifact
    score. At 100 TB swap the `word` key for `xxhash64(word) % 2^20`
    and the plan is unchanged — the LM stays feature-space-sized.

    Shape at scale: one explode + one word-keyed count per LM (shared
    scan, conditional aggregation — a single shuffle), a vocab-sized
    ratio table joined back to the token stream (AQE broadcasts while
    it fits, exactly like unigram_cross_entropy), then a per-doc avg.
    No Python anywhere."""
    docs = spark.table("documents")
    is_target = (F.col("lang") == "en") & (F.col("n_chars") >= 200)
    toks = docs.select(
        "doc_id",
        "lang",
        is_target.alias("is_target"),
        F.explode(F.split("text", " ")).alias("word"),
    )
    counts = toks.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("n_tgt"),
    ).filter(F.col("n_raw") >= min_count)
    totals = counts.agg(
        F.sum("n_raw").alias("tot_raw"),
        F.sum("n_tgt").alias("tot_tgt"),
        F.count(F.lit(1)).alias("vocab"),
    )
    lm = counts.crossJoin(F.broadcast(totals)).select(
        "word",
        (
            F.log(
                (F.col("n_tgt") + 0.5)
                / (F.col("tot_tgt") + 0.5 * F.col("vocab"))
            )
            - F.log(
                (F.col("n_raw") + 0.5)
                / (F.col("tot_raw") + 0.5 * F.col("vocab"))
            )
        ).alias("log_ratio"),
    )
    return (
        toks.join(lm, "word")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("log_ratio"), 6).alias("avg_log_ratio"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "avg_log_ratio",
            (F.col("avg_log_ratio") > 0).alias("selected"),
        )
        .orderBy("doc_id")
    )


def heaps_law_curve(spark: SparkSession) -> DataFrame:
    """Heaps'-law vocabulary growth: cumulative distinct words V(n) vs
    cumulative tokens n in doc_id order, plus the fitted log-log
    exponent beta (V ≈ K·n^beta; natural corpora sit near beta ≈
    0.4-0.6 — a curve that flattens early means the corpus is
    recycling a closed vocabulary, i.e. template/synthetic text; one
    that stays near 1 is ID-like noise). The companion screen to
    zipf_slope: Zipf reads the frequency RANKS, Heaps reads vocabulary
    GROWTH — template corpora can pass one and fail the other.

    Relational decomposition: a word's first occurrence is min(doc_id)
    over its postings (one word-keyed shuffle, map-side combinable);
    new-words-per-doc is a count over those firsts; both cumulative
    sums run over the O(docs) per-doc aggregate, never over tokens.
    The doc-order cumsum is TWO-PHASE (the fixture's kf_offset trick):
    a window partitioned by doc_id bucket plus a bucket-level carry-in
    from a triangular join over the O(buckets) bucket aggregate — no
    single-partition window anywhere (the global-window form would
    serialize the per-doc table through one task at corpus scale; the
    plan audit bans it). beta fits with the built-in least-squares
    aggregate (regr_slope of ln V on ln n — same closed form in
    DuckDB) and rides every row via a 1-row broadcast crossJoin. At
    100 TB the curve rows would be sampled checkpoints (every 2^j
    tokens); the shuffles stay word-, doc- and bucket-keyed either
    way."""
    docs = spark.table("documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    firsts = toks.groupBy("word").agg(F.min("doc_id").alias("first_doc"))
    new_per_doc = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("new_words")
    )
    base = (
        per_doc.join(new_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_toks",
            F.coalesce("new_words", F.lit(0)).alias("new_words"),
        )
        .withColumn("bucket", (F.col("doc_id") / 64).cast("long"))
    )
    in_bucket = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bucket_totals = base.groupBy("bucket").agg(
        F.sum("n_toks").alias("b_toks"), F.sum("new_words").alias("b_words")
    )
    carry = (
        bucket_totals.alias("c")
        .join(
            bucket_totals.alias("p"),
            F.col("p.bucket") < F.col("c.bucket"),
            "left",
        )
        .groupBy(F.col("c.bucket").alias("bucket"))
        .agg(
            F.coalesce(F.sum("p.b_toks"), F.lit(0)).alias("tok_carry"),
            F.coalesce(F.sum("p.b_words"), F.lit(0)).alias("word_carry"),
        )
    )
    curve = (
        base.join(F.broadcast(carry), "bucket")
        .withColumn("cum_tokens", F.col("tok_carry") + F.sum("n_toks").over(in_bucket))
        .withColumn(
            "cum_vocab", F.col("word_carry") + F.sum("new_words").over(in_bucket)
        )
        .select("doc_id", "cum_tokens", "cum_vocab")
    )
    fit = curve.agg(
        F.round(
            F.regr_slope(F.log("cum_vocab"), F.log("cum_tokens")), 6
        ).alias("heaps_beta")
    )
    return curve.crossJoin(F.broadcast(fit)).orderBy("doc_id")


def pmi_collocations(
    spark: SparkSession, min_pair_count: int = 25, k: int = 50
) -> DataFrame:
    """PMI collocation extraction (Church & Hanks 1990 — the standard
    multi-word-expression miner): score every adjacent word bigram by
    pointwise mutual information ln(p(ab) / (p(a)·p(b))). High-PMI
    pairs co-occur far above chance — named entities, fixed phrases,
    template fragments; a tokenizer/vocab pipeline promotes them to
    single units, and a contamination screen reads them as signatures.
    PMI is the probabilistic upgrade of raw bigram counts
    (text_top_bigrams_udtf): frequency finds "of the", PMI finds pairs
    that are RARE apart. The min_pair_count floor is the standard
    guard against PMI's low-count bias (a pair seen twice, each word
    seen twice, maxes PMI on noise).

    Bigrams build IN-ROW (zip_with over offset slices of the token
    array, the bpe_pair_counts idiom — no per-token explode for the
    pair stage); unigram and bigram counts are two map-side-combinable
    shuffles; the unigram table joins back twice on the (vocab-sized)
    word keys. Top-k by (pmi desc, pair) for determinism."""
    docs = spark.table("documents")
    toks = F.filter(
        F.split(F.lower("text"), " "), lambda x: x != F.lit("")
    )
    left = F.slice(toks, 1, F.size(toks) - 1)
    right = F.slice(toks, 2, F.size(toks) - 1)
    pair_rows = docs.select(
        F.explode(
            F.zip_with(left, right, lambda a, b_: F.struct(a.alias("w1"), b_.alias("w2")))
        ).alias("p")
    ).select("p.w1", "p.w2")
    n_pairs_total = pair_rows.agg(
        F.count(F.lit(1)).cast("double").alias("total_pairs")
    )
    uni = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_uni_total = uni.agg(F.sum("n").cast("double").alias("total_words"))
    pairs = (
        pair_rows.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_count)
    )
    u1 = uni.select(F.col("word").alias("w1"), F.col("n").alias("n_w1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("n").alias("n_w2"))
    scored = (
        pairs.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_pairs_total))
        .crossJoin(F.broadcast(n_uni_total))
        .select(
            "w1",
            "w2",
            "n_pair",
            "n_w1",
            "n_w2",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("total_pairs"))
                    / (
                        (F.col("n_w1") / F.col("total_words"))
                        * (F.col("n_w2") / F.col("total_words"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(k)


def readability_scores(spark: SparkSession) -> DataFrame:
    """Flesch reading-ease per document with the standard vowel-group
    syllable approximation (syllables ≈ maximal [aeiouy]+ runs — the
    heuristic every pure-SQL readability implementation uses; exact
    syllabification needs a dictionary).

    flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).
    Sentences = runs of [.!?], floored at 1 so fragment-only docs score
    instead of dividing by zero. Everything is regexp_extract_all +
    size — JVM codegen, map-only, zero shuffle; the identical regexes
    run in the DuckDB oracle, so the whole score is value-checked.
    Grade buckets follow the conventional Flesch bands."""
    docs = spark.table("documents")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    sentences = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1),
    )
    syllables = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), F.lit(0))
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences)
        - F.lit(84.6) * (syllables.cast("double") / words)
    )
    band = (
        F.when(flesch >= 90, "very_easy")
        .when(flesch >= 70, "easy")
        .when(flesch >= 50, "medium")
        .when(flesch >= 30, "difficult")
        .otherwise("very_difficult")
    )
    return docs.select(
        "doc_id",
        "lang",
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        F.round(flesch, 6).alias("flesch"),
        band.alias("band"),
    )


def lang_source_chi2(spark: SparkSession) -> DataFrame:
    """Chi-square independence test of the lang × source contingency
    table — "does source composition differ by language?", the
    first-order corpus-mix audit before training-mix decisions.

    Per-cell rows carry observed, expected = row·col/N, and the cell's
    χ² contribution; the table-level statistic, degrees of freedom and
    Cramér's V ride along as columns via a 1-row broadcast crossJoin of
    the cell-level aggregate (no unpartitioned window, no second corpus
    pass). Cells, margins and the total are three partial-agg passes
    over the cell aggregate, not the corpus."""
    docs = spark.table("documents")
    observed = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("obs")
    )
    lang_tot = observed.groupBy("lang").agg(F.sum("obs").alias("lang_n"))
    src_tot = observed.groupBy("source").agg(F.sum("obs").alias("src_n"))
    total = observed.agg(
        F.sum("obs").alias("n"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )
    # the FULL grid, structural zeros included: a (lang, source) cell the
    # corpus never produced still has expected > 0 and contributes — the
    # observed-only form silently understates dependence (a perfectly
    # diagonal table would score half its true χ²)
    cells = (
        lang_tot.crossJoin(F.broadcast(src_tot))
        .join(observed, ["lang", "source"], "left")
        .withColumn("obs", F.coalesce("obs", F.lit(0.0)))
    )
    joined = (
        cells.crossJoin(F.broadcast(total))
        .withColumn("expected", F.col("lang_n") * F.col("src_n") / F.col("n"))
        .withColumn(
            "contribution",
            F.pow(F.col("obs") - F.col("expected"), 2) / F.col("expected"),
        )
    )
    total_chi2 = joined.agg(F.sum("contribution").alias("chi2"))
    chi2 = F.col("chi2")
    dof = (F.col("n_langs") - 1) * (F.col("n_sources") - 1)
    cramers_v = F.sqrt(
        chi2 / (F.col("n") * F.least(F.col("n_langs"), F.col("n_sources")) - F.col("n"))
    )
    return joined.crossJoin(F.broadcast(total_chi2)).select(
        "lang",
        "source",
        F.col("obs").cast("long").alias("observed"),
        F.round("expected", 6).alias("expected"),
        F.round("contribution", 6).alias("contribution"),
        F.round(chi2, 6).alias("chi2_total"),
        dof.cast("long").alias("dof"),
        F.round(cramers_v, 6).alias("cramers_v"),
    ).orderBy("lang", "source")


# gate thresholds shared with compression_contract's band recompute
# (ADVICE r15: one source of truth, not re-hardcoded constants)
COMPRESSION_MAX_RATIO = 0.8
COMPRESSION_MIN_RATIO = 0.35


def compression_ratio_gate(
    spark: SparkSession,
    max_ratio: float = COMPRESSION_MAX_RATIO,
    min_ratio: float = COMPRESSION_MIN_RATIO,
) -> DataFrame:
    """zlib compression-ratio quality gate — the cheap entropy proxy
    production curation stacks run beside Gopher rules (CCNet uses LM
    perplexity; compression is its model-free cousin): highly
    compressible text is repetitive/templated (low information per
    byte), incompressible "text" is usually binary junk or encrypted
    noise. Both tails get flagged; the healthy band rides between.
    The 0.8 ceiling is calibrated for TEXT: random printable ASCII
    (~6.55 bits/char) lands ~0.83, real prose ~0.3-0.5.

    Arrow-batched pandas UDF (zlib level 6 over UTF-8 bytes) — the only
    Python in the plan, map-only, no shuffle; the per-doc ratio is a
    pure function of the text so the output is deterministic. Rows-only
    (no zlib in SQL); the repetition correlation and both planted tails
    are pinned in tests."""
    import zlib

    @pandas_udf(T.DoubleType())
    def ratio(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            raw = (t or "").encode("utf-8")
            if not raw:
                out.append(None)
                continue
            out.append(len(zlib.compress(raw, 6)) / len(raw))
        return pd.Series(out, dtype="float64")

    docs = spark.table("documents")
    # flag from the SAME 6dp-rounded ratio the gate publishes (ADVICE
    # r15): a raw ratio within ~5e-7 of a threshold must not publish a
    # flag inconsistent with its own published ratio
    r6 = F.round(ratio(F.col("text")), 6)
    return docs.select(
        "doc_id",
        "source",
        F.length("text").alias("n_chars"),
        r6.alias("compression_ratio"),
        (
            (r6 > max_ratio) | (r6 < min_ratio)
        ).alias("entropy_flag"),
    )


def compression_contract(spark: SparkSession) -> DataFrame:
    """Oracled accuracy-contract twin for text_compression_ratio (r15;
    the sketch *_bound pattern — the one rows-only query that had no
    oracled shadow). Runs the REAL compression_ratio_gate lineage (zlib
    level 6 in an Arrow-batched pandas UDF) and counts, per source, the
    documents satisfying three PROVABLE contracts the oracle recomputes
    without zlib:

    - n_within_bound: compressed size ≤ zlib's documented compress2
      worst case n + n/4096 + n/16384 + n/2^25 + 13 (compressBound) —
      a format guarantee, so the count must equal n_nonempty;
    - n_positive: ratio > 0 (DEFLATE output is never empty);
    - n_flag_consistent: the published entropy_flag equals the
      (ratio > 0.8 OR ratio < 0.35) band recomputed from the published
      6dp ratio — signs the flag logic against refactors.

    The DuckDB oracle emits the same counts from count(*) arithmetic
    alone (contracts hold by proof); any zlib-lane breakage — encoding
    error, column mix-up, truncation — shows up as a count mismatch.
    Lengths are UTF-8 BYTES on both sides (octet_length / strlen):
    zlib compresses bytes and compressBound is a byte guarantee."""
    gate = compression_ratio_gate(spark)

    @pandas_udf(T.LongType())
    def comp_len(texts: pd.Series) -> pd.Series:
        import zlib

        out = []
        for t in texts:
            raw = (t or "").encode("utf-8")
            out.append(len(zlib.compress(raw, 6)) if raw else None)
        return pd.Series(out, dtype="Int64")

    docs = spark.table("documents").select("doc_id", "text")
    joined = gate.join(docs, "doc_id").withColumn(
        "comp_len", comp_len(F.col("text"))
    )
    # byte length, not characters: zlib compresses UTF-8 BYTES, and the
    # compressBound guarantee is in bytes (oracle mirrors with strlen)
    n = F.octet_length("text").cast("long")
    bound = (
        n
        + F.floor(n / F.lit(4096))
        + F.floor(n / F.lit(16384))
        + F.floor(n / F.lit(33554432))
        + F.lit(13)
    )
    nonempty = n > 0
    band = (F.col("compression_ratio") > COMPRESSION_MAX_RATIO) | (
        F.col("compression_ratio") < COMPRESSION_MIN_RATIO
    )

    def _c(pred):  # NULL-safe contract count (NULL text rows count 0)
        return F.sum(F.coalesce(pred.cast("long"), F.lit(0))).cast("long")

    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            _c(nonempty).alias("n_nonempty"),
            _c(nonempty & (F.col("comp_len") <= bound)).alias(
                "n_within_bound"
            ),
            _c(nonempty & (F.col("compression_ratio") > 0.0)).alias(
                "n_positive"
            ),
            _c(nonempty & (F.col("entropy_flag") == band)).alias(
                "n_flag_consistent"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# per-source quota, length bucketing, exact source-overlap matrix (round 7)
# ---------------------------------------------------------------------------


def source_quota(spark: SparkSession, cap: int = 10) -> DataFrame:
    """Per-source document quota — the crawl-politeness / anti-dominance
    curation step: within each source, rank docs by quality (longest
    first; doc_id breaks ties deterministically) and keep the top `cap`.
    Uncapped, a handful of giant hosts dominate a web-scale mix; every
    production corpus recipe carries a per-domain cap.

    Doc-level output (kept flag rather than a filtered set) so the audit
    trail shows WHAT was dropped and at which rank — the no-silent-caps
    convention. One source-partitioned window (row_number), no global
    sort; at 100 TB source is the natural partition key and skewed
    mega-sources are exactly the rows this op exists to cut."""
    docs = spark.table("documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("int").alias("quota_rank"),
    ).withColumn("kept", (F.col("quota_rank") <= cap).cast("int"))


def length_buckets(spark: SparkSession, n_buckets: int = 8) -> DataFrame:
    """Length-bucketed batch scheduling stats: ntile buckets over doc
    length WITHIN each language, and the padding waste a batcher would
    pay if it padded every doc in a bucket to the bucket max — the
    quantity length-bucketing exists to minimize (uniform batching pads
    everything to the corpus max; bucketing cuts the waste to the
    within-bucket spread).

    Windows are lang-partitioned (ntile + the order it rides on) — no
    global sort; per-bucket rollup is a partial agg. Ties broken by
    doc_id so both engines produce identical bucket assignments."""
    docs = spark.table("documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    b = docs.select(
        "lang", "n_chars", F.ntile(n_buckets).over(w).cast("int").alias("bucket")
    )
    return (
        b.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            (F.max("n_chars") * F.count(F.lit(1)) - F.sum("n_chars"))
            .cast("long")
            .alias("padding_waste"),
        )
        .orderBy("lang", "bucket")
    )


def source_overlap_exact(spark: SparkSession, n: int = 3) -> DataFrame:
    """Exact pairwise source-overlap matrix: for every source pair, how
    many distinct word-n-grams they share, with containment ratios both
    ways — the inter-source duplication audit that tells a mix designer
    which "independent" corpora are actually the same crawl twice. The
    EXACT twin of the HLL/top-k sketch-overlap ops: at calibration scale
    this oracle-checkable matrix validates the sketches; at 100 TB only
    the sketch path runs (gram vocab × sources would still be fine, but
    the sketch is one pass and mergeable).

    Shape: distinct (source, gram) via the pinned gram builder (one
    gram-keyed shuffle), then a gram-keyed equi-self-join bounded by
    gram frequency across sources (a gram appearing in k sources emits
    k(k-1)/2 pairs — bounded by #sources², never by corpus size), then
    a source-pair rollup."""
    from uav_streamprocessor_spark.operators.dedup import doc_ngram_sets

    docs = spark.table("documents").select("doc_id", "source")
    grams = (
        doc_ngram_sets(spark, n)
        .join(docs, "doc_id")
        .select("source", F.explode("grams").alias("gram"))
        .distinct()
        # three consumers below (both self-join sides + the per-source
        # denominators); without a barrier each one re-evaluates the gram
        # build and the distinct shuffle — the same multi-consumer hazard
        # the LSH group-and-emit rewrite removed. Lazy localCheckpoint
        # materializes the (source, gram) set exactly once.
        .localCheckpoint(eager=False)
    )
    per_source = grams.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    a = grams.alias("a")
    b = grams.alias("b")
    shared = (
        a.join(b, "gram")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )
    pa = per_source.select(
        F.col("source").alias("source_a"), F.col("n_grams").alias("grams_a")
    )
    pb = per_source.select(
        F.col("source").alias("source_b"), F.col("n_grams").alias("grams_b")
    )
    return (
        shared.join(F.broadcast(pa), "source_a")
        .join(F.broadcast(pb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared_grams",
            F.round(F.col("n_shared_grams") / F.col("grams_a"), 6).alias(
                "containment_a"
            ),
            F.round(F.col("n_shared_grams") / F.col("grams_b"), 6).alias(
                "containment_b"
            ),
        )
        .orderBy("source_a", "source_b")
    )


def chunk_manifest(
    spark: SparkSession, chunk_tokens: int = 64, overlap: int = 8
) -> DataFrame:
    """Context-window chunking manifest: split each doc into fixed-size
    token windows with overlap — the preprocessing step that turns a
    variable-length corpus into training-context-sized pieces (overlap
    preserves cross-boundary n-grams so no phrase is unlearnable). The
    MANIFEST (doc, chunk, token range) is computed relationally from
    token counts alone; the text slices materialize later in the
    tokenizer pass, so the planning stage never shuffles document
    bodies.

    Pure per-row arithmetic + one bounded sequence explode (≤
    ceil(n_tokens/stride) rows per doc) — map-only, no shuffle at all;
    the final chunk is short rather than padded (end = min(start+size,
    n_tokens)), and its true length is reported."""
    stride = chunk_tokens - overlap
    docs = spark.table("documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.col("n_tokens") - F.lit(overlap)) / F.lit(stride)).cast("int"),
    )
    chunks = docs.select(
        "doc_id",
        "n_tokens",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    end = F.least(start + chunk_tokens, F.col("n_tokens"))
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        start.cast("long").alias("start_token"),
        end.cast("long").alias("end_token"),
        (end - start).cast("long").alias("n_chunk_tokens"),
    )


def _ngram_rows(docs: DataFrame, n: int) -> DataFrame:
    """Per-doc word n-grams (space-joined), built array-side: tokens =
    non-empty lowercase whitespace split; gram i = slice(toks, i, n)
    for i in 1..len-n+1. The sequence is guarded for short docs —
    Spark's sequence(1, 0) would count DOWN, not return empty."""
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id", "source", F.lit(n).alias("n"), F.explode(grams).alias("gram")
    )


def distinct_ngram_diversity(spark: SparkSession, max_n: int = 3) -> DataFrame:
    """Distinct-n diversity per source: distinct n-grams / total
    n-grams for n = 1..max_n — the standard corpus-diversity metric for
    training data (a low distinct-2 means the source repeats itself;
    generation-quality papers report exactly this ratio). Complements
    text_ngram_repetition (within-doc) by measuring ACROSS the source.

    Map-only gram emission (one pass per n over the token arrays, doc
    boundaries respected — grams never cross documents), then one
    (source, n)-keyed aggregate; count(DISTINCT) shuffles gram-keyed,
    which is the unavoidable cost of an exact type count. At 100 TB,
    swap the exact distinct for approx_count_distinct — the ratio is a
    curation signal, not an accounting number; the exact form here is
    the oracle-checkable reference semantics."""
    docs = spark.table("documents")
    grams = _ngram_rows(docs, 1)
    for n in range(2, max_n + 1):
        grams = grams.unionByName(_ngram_rows(docs, n))
    return (
        grams.groupBy("source", "n")
        .agg(
            F.countDistinct("gram").cast("long").alias("n_distinct"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
        )
        .withColumn(
            "distinct_ratio",
            F.round(F.col("n_distinct") / F.col("n_total").cast("double"), 6),
        )
        .orderBy("source", "n")
    )


def kneser_ney_bigrams(
    spark: SparkSession, discount: float = 0.75, top_k: int = 50
) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities for the corpus's
    top bigrams — the smoothing every n-gram LM baseline (KenLM et al.)
    ships with, next to the raw MLE the existing cross-entropy ops use.
    The KN insight: back off to how many CONTEXTS a word continues
    ("continuation probability"), not its raw frequency, so "Francisco"
    (frequent but only ever after "San") stops stealing mass.

      P_kn(w2|w1) = max(c12 − d, 0)/c1 + (d·N1+(w1·)/c1) · N1+(·w2)/B

    with c1 = Σ_w2 c12, N1+(w1·)/N1+(·w2) the distinct right/left
    neighbor counts, B the total bigram-type count, d = `discount`.

    Everything derives from ONE bigram-count table (doc-boundary-safe
    grams): two keyed re-aggregations (by w1, by w2) joined back on
    their own keys — vocab-sized sides, so they shuffle-join (AQE may
    still broadcast at small SF) rather than being force-broadcast;
    only the type total is a broadcast scalar. Top-k is TakeOrdered —
    no windows anywhere."""
    docs = spark.table("documents")
    c12 = (
        _ngram_rows(docs, 2)
        .select(F.split("gram", " ").alias("ws"))
        .select(
            F.element_at("ws", 1).alias("w1"), F.element_at("ws", 2).alias("w2")
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        # pinned: four consumers (the base join, both re-aggregations and
        # the type total) would otherwise each re-run the gram explode
        .localCheckpoint(eager=False)
    )
    left = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count(F.lit(1)).alias("n1p_fwd"),
    )
    right = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bwd"))
    types = c12.agg(F.count(F.lit(1)).cast("double").alias("n_types"))
    d = F.lit(float(discount))
    p_cont = F.col("n1p_bwd") / F.col("n_types")
    p_kn = (
        F.greatest(F.col("c12") - d, F.lit(0.0)) / F.col("c1")
        + d * F.col("n1p_fwd") / F.col("c1") * p_cont
    )
    return (
        c12.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.round(F.col("c12") / F.col("c1").cast("double"), 6).alias("p_mle"),
            F.round(p_kn, 6).alias("p_kn"),
            F.round(p_cont, 6).alias("p_cont"),
        )
        .orderBy(F.col("c12").desc(), "w1", "w2")
        .limit(top_k)
    )


def word_burstiness(spark: SparkSession, top_k: int = 50) -> DataFrame:
    """Church–Gale word burstiness: compare each word's OBSERVED
    document frequency with the Poisson expectation from its corpus
    rate. Content words are bursty — once a doc mentions "kernel" it
    mentions it again, so they appear in FAR fewer docs than a Poisson
    spread of the same token mass would (ratio << 1); function words
    sit near 1. The curation signal: a "common" word with low
    burstiness ratio is topical, not boilerplate, and deserves to
    survive stopword-style pruning.

      expected_df = D · (1 − exp(−cf/D)),  burstiness = df/expected_df

    One token pass producing (word, cf, df) via a single groupBy
    (distinct doc counting rides count(DISTINCT doc_id) on the same
    shuffle), the doc total a broadcast scalar, top-k by collection
    frequency via TakeOrdered — no windows."""
    docs = spark.table("documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    stats = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("cf"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    totals = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    expected = F.col("n_docs") * (
        1.0 - F.exp(-F.col("cf") / F.col("n_docs"))
    )
    return (
        stats.crossJoin(F.broadcast(totals))
        .select(
            "word",
            "cf",
            "df",
            F.round(expected, 6).alias("expected_df"),
            F.round(F.col("df") / expected, 6).alias("burstiness"),
        )
        .orderBy(F.col("cf").desc(), "word")
        .limit(top_k)
    )


def source_keyness(spark: SparkSession, top_k: int = 10) -> DataFrame:
    """Dunning log-likelihood keyness (G²) per source: which words are
    statistically over-represented in a source versus the rest of the
    corpus — the corpus-linguistics answer to "what is this source
    actually about", and the principled version of the raw-TF-IDF
    top-terms list (G² is robust at low counts where TF-IDF inflates).

      G² = 2·(a·ln(a/E1) + b·ln(b/E2)),
      E1 = c·(a+b)/(c+d), E2 = d·(a+b)/(c+d)

    with a,b = word counts in source/rest and c,d = source/rest
    totals; zero cells contribute 0 (the x·ln x → 0 limit, same
    convention both engines via the explicit CASE). Only enriched
    terms (a/c > (a+b)/(c+d)) are ranked — depletion is the other
    source's enrichment.

    Shape: one (source, word) count, one word rollup joined back on
    its own key, source totals broadcast; ranking is a
    source-partitioned row_number — no global windows."""
    docs = spark.table("documents")
    words = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    sw = words.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("double").alias("a")
    )
    word_tot = sw.groupBy("word").agg(F.sum("a").alias("ab"))
    src_tot = sw.groupBy("source").agg(F.sum("a").alias("c"))
    grand = src_tot.agg(F.sum("c").alias("cd"))
    j = (
        sw.join(word_tot, "word")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(grand))
        .withColumn("b", F.col("ab") - F.col("a"))
        .withColumn("d", F.col("cd") - F.col("c"))
    )
    e1 = F.col("c") * F.col("ab") / F.col("cd")
    e2 = F.col("d") * F.col("ab") / F.col("cd")
    term_a = F.when(F.col("a") > 0, F.col("a") * F.log(F.col("a") / e1)).otherwise(0.0)
    term_b = F.when(F.col("b") > 0, F.col("b") * F.log(F.col("b") / e2)).otherwise(0.0)
    g2 = 2.0 * (term_a + term_b)
    enriched = j.filter(
        F.col("a") / F.col("c") > F.col("ab") / F.col("cd")
    ).select(
        "source",
        "word",
        F.col("a").cast("long").alias("count_in_source"),
        F.col("b").cast("long").alias("count_in_rest"),
        F.round(g2, 6).alias("g2"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("g2").desc(), "word"
    )
    return (
        enriched.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("source", "rank", "word", "count_in_source", "count_in_rest", "g2")
        .orderBy("source", "rank")
    )


def distinct_ngram_diversity_approx(
    spark: SparkSession, max_n: int = 3, rsd: float = 0.02,
    audit: bool = False,
) -> DataFrame:
    """The 100 TB form of text_distinct_ngrams: HLL++ approximate
    distinct types (approx_count_distinct at 2% target rsd) instead of
    the exact gram-keyed count(DISTINCT). The exact twin IS the oracle
    for this one — the pytest gate pins the relative error inside 3×
    the configured rsd per (source, n) — so the swap's cost is
    measured, not asserted. The shuffle carries HLL registers per
    (source, n) group instead of every distinct gram: map-side
    combinable, group-count-bounded state, no gram-keyed exchange at
    all — the difference between a curation dashboard refresh and a
    full-corpus shuffle at scale.

    `audit=True` (r12 promotion) additionally computes the EXACT
    distinct per group in the same pass and signs the sketch in with
    within_bound = relative error <= 3*rsd — the sketch-contract
    pattern; the exact anchors + boolean are SQL-portable, so the
    registered projection oracles outright while the approx-only form
    stays the production 100 TB shape."""
    docs = spark.table("documents")
    grams = _ngram_rows(docs, 1)
    for n in range(2, max_n + 1):
        grams = grams.unionByName(_ngram_rows(docs, n))
    aggs = [
        F.approx_count_distinct("gram", rsd).cast("long").alias(
            "n_distinct_approx"
        ),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    ]
    if audit:
        aggs.append(
            F.countDistinct("gram").cast("long").alias("n_distinct_exact")
        )
    out = (
        grams.groupBy("source", "n")
        .agg(*aggs)
        .withColumn(
            "distinct_ratio_approx",
            F.round(
                F.col("n_distinct_approx") / F.col("n_total").cast("double"), 6
            ),
        )
    )
    if audit:
        out = out.withColumn(
            "within_bound",
            F.abs(F.col("n_distinct_approx") - F.col("n_distinct_exact"))
            <= 3.0 * rsd * F.col("n_distinct_exact"),
        )
    return out.orderBy("source", "n")


def source_js_divergence(spark: SparkSession) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between source unigram
    distributions (nats) — the symmetric, always-finite distributional
    distance completing the source-similarity kit: chi2
    (text_lang_source_chi2) tests IF sources differ, vocab overlap
    counts SHARED types, JSD measures HOW FAR the distributions sit —
    the quantity mixture-weight tuning (DoReMi-style) actually wants.

    Zero-probability words contribute 0 to their own side's KL term
    (the x·ln x → 0 limit, explicit CASE both engines) and JSD stays
    ≤ ln 2 by construction. Shape: one (source, word) count, per-source
    totals broadcast back, the tiny source-pair frame joined twice on
    word (the union materializes via the full-outer merge), one
    (pair)-keyed sum. Word rows scale with vocab × pairs — pairs are
    sources², a handful.

    The (source, word) count table is PINNED (lazy localCheckpoint):
    it has five consumers (totals, both pair-sides' prob frames, and
    the sources list via totals), and without the pin each one
    re-instantiates the corpus scan + explode — 8 parquet scans in the
    physical plan, the same AQE exchange-reuse failure winnowing hit
    (SCALE.md r7 session-2). Pinned, the corpus is read ONCE and every
    consumer reads the vocab×sources-bounded table — the shape that
    survives 100 TB. Gated in tests/test_plan_audit.py."""
    docs = spark.table("documents")
    counts = (
        docs.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    totals = counts.groupBy("source").agg(F.sum("c").alias("tot"))
    probs = counts.join(F.broadcast(totals), "source").select(
        "source", "word", (F.col("c") / F.col("tot")).alias("p")
    )
    sources = totals.select("source")
    pairs = (
        sources.select(F.col("source").alias("source_a"))
        .crossJoin(sources.select(F.col("source").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    wa = probs.join(
        F.broadcast(pairs), F.col("source") == F.col("source_a")
    ).select("source_a", "source_b", "word", F.col("p").alias("pa"))
    wb = probs.join(
        F.broadcast(pairs), F.col("source") == F.col("source_b")
    ).select("source_a", "source_b", "word", F.col("p").alias("pb"))
    merged = (
        wa.join(wb, ["source_a", "source_b", "word"], "full_outer")
        .select(
            "source_a",
            "source_b",
            "word",
            F.coalesce("pa", F.lit(0.0)).alias("p"),
            F.coalesce("pb", F.lit(0.0)).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2.0
    contrib = 0.5 * F.when(
        F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)
    ).otherwise(0.0) + 0.5 * F.when(
        F.col("q") > 0, F.col("q") * F.log(F.col("q") / m)
    ).otherwise(0.0)
    return (
        merged.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words_union"),
            F.round(F.sum(contrib), 6).alias("jsd_nats"),
            F.round(F.sqrt(F.sum(contrib)), 6).alias("jsd_distance"),
        )
        .orderBy("source_a", "source_b")
    )
