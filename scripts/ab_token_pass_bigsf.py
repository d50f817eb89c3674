"""Bigger-SF A/B for the shared-token-pass question (VERDICT r17 #4/#7).

unigram_cross_entropy / dsir_importance_weights instantiate their
tokenize+explode subtree twice (LM build + join-back); curation_funnel
instantiates its flagged pass twice (gram explode + final counts). At
sf0.1 a localCheckpoint of the shared intermediate measured SLOWER than
recomputing (r17 negative result); this script re-asks at N x sf0.1 —
the corpus is replicated with shifted doc_ids into an 8-file parquet in
/tmp (a measurement artifact only; nothing in the repo reads it) and
each operator runs paired A/B (as-committed vs checkpointed) with noop
sinks, reporting medians and the ratio.

    python scripts/ab_token_pass_bigsf.py [mult] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from uav_streamprocessor_spark.session import get_spark


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name=f"ab_token_pass_x{mult}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = f"/tmp/r18_ab_docs_x{mult}.parquet"
    if not os.path.exists(big):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        mx = d.agg(F.max("doc_id")).first()[0] + 1
        u = d
        for i in range(1, mult):
            u = u.union(d.withColumn("doc_id", F.col("doc_id") + F.lit(i * mx)))
        u.repartition(8).write.parquet(big)
    spark.read.parquet(big).createOrReplaceTempView("documents")
    n = spark.table("documents").count()
    print(f"# corpus: {n} docs x{mult}, 8 files", file=sys.stderr)

    from uav_streamprocessor_spark.operators import repetition, text

    def unigram_ckpt(spark):
        toks = (
            spark.table("documents")
            .select(
                "doc_id", "lang",
                F.explode(F.split("text", " ")).alias("word"),
            )
            .localCheckpoint(eager=True)
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

    def dsir_ckpt(spark, min_count: int = 5):
        docs = spark.table("documents")
        is_target = (F.col("lang") == "en") & (F.col("n_chars") >= 200)
        toks = docs.select(
            "doc_id", "lang", is_target.alias("is_target"),
            F.explode(F.split("text", " ")).alias("word"),
        ).localCheckpoint(eager=True)
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
                F.log((F.col("n_tgt") + 0.5)
                      / (F.col("tot_tgt") + 0.5 * F.col("vocab")))
                - F.log((F.col("n_raw") + 0.5)
                        / (F.col("tot_raw") + 0.5 * F.col("vocab")))
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
                "doc_id", "lang", "n_tokens", "avg_log_ratio",
                (F.col("avg_log_ratio") > 0).alias("selected"),
            )
            .orderBy("doc_id")
        )

    def funnel_ckpt(spark):
        # curation_funnel with the flagged pass checkpointed once
        docs = spark.table("documents").select("doc_id", "text")
        w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
        n_words = F.size("ws")
        padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
        the_hits = (
            F.length(padded) - F.length(F.replace(padded, F.lit(" the ")))
        ) / 5
        grams3 = repetition._grams_col(3)
        q_rules = (
            (n_words >= 30)
            & (F.length("text") / n_words.cast("double") <= 5.5)
            & (the_hits / n_words >= 0.02)
            & (F.size(F.array_distinct(grams3)) == F.size(grams3))
        )
        flagged = (
            repetition._with_tokens(docs)
            .withColumn("kept", F.row_number().over(w) == 1)
            .select(
                "doc_id", "ws", "kept",
                (F.col("kept") & q_rules).alias("q"),
                (F.substring(F.md5("text"), 1, 1)
                 <= repetition._TRAIN_MAX_NIBBLE).alias("is_train"),
            )
            .localCheckpoint(eager=True)
        )
        g = flagged.filter("q").select(
            "doc_id", "is_train",
            F.explode(F.array_distinct(repetition._grams_col(4))).alias("gram"),
        )
        eval_grams = g.filter(~F.col("is_train")).select("gram").distinct()
        contaminated = (
            g.filter("is_train")
            .join(eval_grams, "gram", "leftsemi")
            .select("doc_id").distinct()
            .withColumn("contam", F.lit(True))
        )
        final = flagged.drop("ws").join(contaminated, "doc_id", "left")
        counts = final.agg(
            F.count(F.lit(1)).alias("c00"),
            F.sum(F.col("kept").cast("long")).alias("c10"),
            F.sum(F.col("q").cast("long")).alias("c20"),
            F.sum((F.col("q") & F.col("is_train")).cast("long")).alias("c30"),
            F.sum((F.col("q") & F.col("is_train")
                   & F.col("contam").isNull()).cast("long")).alias("c40"),
            F.sum((F.col("q") & ~F.col("is_train")).cast("long")).alias("c41"),
        )
        stages = F.array(*[
            F.struct(F.lit(s).alias("stage"), F.col(c).alias("n_docs"))
            for s, c in [
                ("00_raw", "c00"), ("10_exact_dedup", "c10"),
                ("20_quality", "c20"), ("30_train_split", "c30"),
                ("40_train_decontaminated", "c40"), ("41_eval_held_out", "c41"),
            ]
        ])
        return (
            counts.select(F.explode(stages).alias("s"))
            .select("s.stage", "s.n_docs").orderBy("stage")
        )

    pairs = [
        ("unigram_cross_entropy",
         lambda: text.unigram_cross_entropy(spark),
         lambda: unigram_ckpt(spark)),
        ("dsir_importance_weights",
         lambda: text.dsir_importance_weights(spark),
         lambda: dsir_ckpt(spark)),
        ("curation_funnel",
         lambda: repetition.curation_funnel(spark),
         lambda: funnel_ckpt(spark)),
    ]
    for name, fa, fb in pairs:
        # equivalence first: checkpointed variant must return identical rows
        ra = [tuple(r) for r in fa().collect()]
        rb = [tuple(r) for r in fb().collect()]
        assert ra == rb, f"{name}: checkpointed variant diverges"
        a_times, b_times = [], []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{name} A (as committed)")
            t0 = time.perf_counter(); noop(fa()); a_times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(f"{name} B (checkpointed)")
            t0 = time.perf_counter(); noop(fb()); b_times.append(time.perf_counter() - t0)
        ma, mb = statistics.median(a_times), statistics.median(b_times)
        print(f"{name} x{mult}: as-committed {ma:.3f}s  checkpointed {mb:.3f}s  "
              f"B/A {mb/ma:.3f}  runsA {[round(t,2) for t in a_times]} "
              f"runsB {[round(t,2) for t in b_times]}")


if __name__ == "__main__":
    main()
