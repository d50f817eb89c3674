"""Dataset splitting / sampling / sharding for training pipelines.

The patterns a pretraining data pipeline needs at 100 TB:

- train/test split must be DETERMINISTIC and content-keyed (hash of the
  document, not random()): stable under re-ingest, replay, and engine
  change, and a near-duplicate of a train doc can be excluded from test
  by splitting on the same key family the dedup pass uses.
- stratified sampling keeps per-stratum proportions (sampleBy — seeded
  Bernoulli per stratum; engine-specific RNG → rows-only check with a
  tolerance test).
- shard assignment for shuffled training output: hash-bucket then local
  sort, never a global ORDER BY rand() (a single-partition sort at
  scale). Shards are md5-prefix buckets — deterministic, uniform, and
  exactly reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# hex chars sort '0'..'9' < 'a'..'f' in both engines (ASCII); first nibble
# <= 'c' keeps 13/16 = 81.25% of documents in train
_TRAIN_MAX_NIBBLE = "c"


def train_test_split_summary(spark: SparkSession) -> DataFrame:
    """Deterministic content-hash split: first hex nibble of md5(text)
    BETWEEN '0' AND 'c' → train (13/16 = 81.25%), else test. Summarized
    per (lang, split) so the full assignment is value-checked compactly."""
    docs = spark.table("documents")
    split = F.when(
        F.substring(F.md5("text"), 1, 1) <= _TRAIN_MAX_NIBBLE, "train"
    ).otherwise("test")
    return (
        docs.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


def shard_assignment(spark: SparkSession, n_shards: int = 64) -> DataFrame:
    """Deterministic shard assignment for shuffled training output:
    shard = first-2-hex-bytes of md5(text) mod n_shards. Writing
    partitionBy(shard) + sortWithinPartitions gives globally-shuffled,
    locally-sorted output with NO global sort. Per-shard stats verify
    the assignment end-to-end."""
    docs = spark.table("documents")
    # conv() is Spark-only; stay portable by mapping two hex chars through
    # a CASE-free arithmetic: position of each char in the hex alphabet
    hex1 = F.substring(F.md5("text"), 1, 1)
    hex2 = F.substring(F.md5("text"), 2, 1)

    def nibble(c):
        # '0'..'9' → 0..9, 'a'..'f' → 10..15 via ascii arithmetic
        return F.when(c <= "9", F.ascii(c) - 48).otherwise(F.ascii(c) - 87)

    shard = (nibble(hex1) * 16 + nibble(hex2)) % n_shards
    return (
        docs.withColumn("shard", shard.cast("int"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def stratified_downsample(
    spark: SparkSession,
    fractions: dict[str, float] | None = None,
    default_fraction: float = 0.9,
) -> DataFrame:
    """Per-stratum deterministic downsampling — the rebalancing move a
    pretraining mix needs (e.g. halve the dominant language). Keep
    probability comes from a CONTENT HASH, not an RNG: u = md5 hex chars
    3-4 as a uniform in [0,256) (chars 1-2 are reserved for split/shard
    so the draws are independent); keep iff u < fraction(lang) * 256.

    Fully deterministic and engine-portable — unlike df.sampleBy, whose
    seeded RNG is engine-specific and whose fractions dict forces a
    driver-side distinct() collect at plan-build time."""
    fractions = {"en": 0.5} if fractions is None else fractions
    docs = spark.table("documents")
    hex3 = F.substring(F.md5("text"), 3, 1)
    hex4 = F.substring(F.md5("text"), 4, 1)

    def nibble(c):
        return F.when(c <= "9", F.ascii(c) - 48).otherwise(F.ascii(c) - 87)

    u = nibble(hex3) * 16 + nibble(hex4)
    frac = F.lit(default_fraction)
    for lang, f in fractions.items():
        frac = F.when(F.col("lang") == lang, F.lit(f)).otherwise(frac)
    kept = docs.filter(u < frac * 256)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("doc_id").alias("min_doc_id"),
        F.sum("n_chars").alias("total_chars"),
    )


def stratified_topk_sample(spark: SparkSession, k: int = 20) -> DataFrame:
    """EXACT per-stratum quota sampling: keep precisely k docs per lang,
    chosen as the k smallest md5(text) values (ties impossible — md5 is
    effectively injective on distinct texts; identical texts tie-break
    on doc_id). The hash IS the uniform random draw, so this is
    deterministic sampling-without-replacement with an exact quota —
    the eval-set builder's contract (`stratified_downsample` keeps a
    hash FRACTION, so its per-stratum counts float; this pins them).

    Scale: one shuffle on lang for the per-stratum top-k window; rank
    state per partition is O(k). At extreme per-lang skew, pre-reduce
    with a per-partition local top-k (groupBy mapPartitions pattern) —
    Spark's TakeOrderedAndProject does this automatically for GLOBAL
    top-k; per-group, the window form is standard."""
    docs = spark.table("documents")
    w = Window.partitionBy("lang").orderBy(F.md5("text"), "doc_id")
    return (
        docs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "lang",
            F.col("rnk").cast("int").alias("rnk"),
            "doc_id",
            F.md5("text").alias("draw"),
        )
        .orderBy("lang", "rnk")
    )


def weighted_sample_topk(spark: SparkSession, k: int = 10) -> DataFrame:
    """Efraimidis-Spirakis A-ES weighted sampling WITHOUT replacement:
    per language, k docs drawn with inclusion probability proportional
    to n_chars (importance-weighted corpus sampling — longer docs carry
    more training signal, so mixture builders upsample them).

    A-ES: each item draws uniform u, gets key u^(1/w); the k largest
    keys are a without-replacement weighted sample (Efraimidis &
    Spirakis, IPL 97(5), 2006). As everywhere in sampling.py, u is a
    CONTENT HASH, not an RNG — first 8 md5 hex chars scaled to (0,1) —
    so the sample is deterministic, reproducible across engines, and
    shardable. We rank by the monotone-equivalent ln(u)/w (better float
    spread than u^(1/w), which crushes toward 1 for large w), rounded
    6dp pre-rank so the oracle ranks identically.

    Scale: one lang-keyed shuffle for the per-stratum top-k window,
    O(k) rank state per partition; the key is a codegen'd projection.
    Same skew caveat as stratified_topk_sample."""
    docs = spark.table("documents")
    u = (
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("double")
        + 1.0
    ) / (2.0**32 + 2.0)
    es_key = F.round(F.log(u) / F.col("n_chars"), 6)
    w = Window.partitionBy("lang").orderBy(F.col("es_key").desc(), "doc_id")
    return (
        docs.select("lang", "doc_id", "n_chars", es_key.alias("es_key"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("lang", "rnk")
    )


def group_holdout_split(spark: SparkSession) -> DataFrame:
    """Leakage-safe train/test split: split at the NEAR-DUP-CLUSTER
    level, not the document level. A doc-hash split puts near-duplicate
    pairs on opposite sides of the train/test boundary — the classic
    eval-contamination bug (the test half 'leaks' via its train-side
    twins). Here every doc inherits its blocking-cluster's split
    (group_key = connected component id, singletons key on themselves),
    so a cluster can never straddle.

    Output compares both policies on the same corpus at (mode, split)
    grain: docs/chars/groups touched per split, plus the count of LEAKY
    groups (members in both splits) — structurally 0 for grouped mode,
    organically >0 for the naive doc-hash mode. The audit is computed,
    not asserted, so the oracle value-checks the leakage claim itself.

    Scale shape: the CC labeling (one O(diameter) fixpoint, shared with
    the dedup pipeline — in production the SAME label table feeds both
    survivor selection and splitting) + one left join on doc_id + two
    map-only split assignments + grouped aggs keyed on (mode, split).
    The md5 split keys are content-derived, so re-ingest, replay, or
    engine change cannot reshuffle the assignment."""
    from uav_streamprocessor_spark.operators import dedup

    docs = spark.table("documents")
    clusters = dedup.doc_dup_clusters(spark).select(
        F.col("doc_id").alias("c_doc_id"), "cluster_id"
    )
    base = docs.join(
        clusters, docs["doc_id"] == clusters["c_doc_id"], "left"
    ).select(
        "doc_id",
        "n_chars",
        "text",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("group_key"),
    )

    def nibble_split(col):
        return F.when(
            F.substring(F.md5(col), 1, 1) <= _TRAIN_MAX_NIBBLE, "train"
        ).otherwise("test")

    assigned = base.select(
        F.lit("naive_doc_hash").alias("mode"),
        "doc_id",
        "n_chars",
        "group_key",
        nibble_split(F.col("text")).alias("split"),
    ).unionByName(
        base.select(
            F.lit("grouped").alias("mode"),
            "doc_id",
            "n_chars",
            "group_key",
            nibble_split(F.col("group_key").cast("string")).alias("split"),
        )
    )
    leaky = assigned.groupBy("mode", "group_key").agg(
        (F.countDistinct("split") > 1).alias("is_leaky")
    )
    return (
        assigned.join(leaky, ["mode", "group_key"])
        .groupBy("mode", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("group_key").alias("n_groups"),
            F.countDistinct(
                F.when(F.col("is_leaky"), F.col("group_key"))
            ).alias("n_leaky_groups"),
        )
        .orderBy("mode", "split")
    )
