"""Behavioral invariants for the round-4 operators (oracle parity covers
value-level correctness in test_oracle_parity.py; these pin the
properties the oracle can't express — conservation, ordering relations,
non-vacuity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uav_streamprocessor_spark.fixtures import register_uav_views
from uav_streamprocessor_spark.operators import packing, repetition, text
from uav_streamprocessor_spark.operators.dedup import (
    doc_cluster_quality_survivors,
    doc_dup_clusters,
)
from uav_streamprocessor_spark.operators.similarity import (
    hard_negatives,
    knn_bruteforce,
)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _views(spark):
    register_uav_views(spark, SF_SMALL)


def test_sequence_packing_conserves_docs_and_tokens(spark):
    docs = spark.table("documents")
    n_docs = docs.count()
    corpus_tokens = docs.select(
        F.sum(
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" ")))
            + 1
        ).alias("t")
    ).first()["t"]
    packed = packing.sequence_packing(spark).collect()
    assert sum(r["n_docs"] for r in packed) == n_docs
    assert sum(r["started_tokens"] for r in packed) == corpus_tokens
    assert sum(r["n_split_docs"] for r in packed) > 0  # boundary docs exist
    # within a shard, sequences are contiguous from 0
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r["seq_id"])
    for shard, seqs in by_shard.items():
        assert sorted(seqs) == list(range(len(seqs))), shard


def test_mix_weights_normalize_and_compress(spark):
    rows = packing.mix_weights(spark).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["expected_tokens"] for r in rows) - 1_000_000) < len(rows)
    # temperature alpha<1 up-samples small sources, down-samples large
    smallest = min(rows, key=lambda r: r["total_tokens"])
    largest = max(rows, key=lambda r: r["total_tokens"])
    assert smallest["oversample"] > 1.0 > largest["oversample"]


def test_perplexity_buckets_cover_each_lang(spark):
    rows = text.perplexity_buckets(spark).collect()
    langs = {r["lang"] for r in rows}
    for lang in langs:
        per = {r["bucket"]: r for r in rows if r["lang"] == lang}
        assert set(per) == {"head", "middle", "tail"}
        # terciles are ordered: head CE <= middle CE <= tail CE
        assert per["head"]["max_ce"] <= per["middle"]["min_ce"] + 1e-9
        assert per["middle"]["max_ce"] <= per["tail"]["min_ce"] + 1e-9
        sizes = [per[b]["n_docs"] for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1  # ntile balance


def test_quality_classifier_splits_corpus(spark):
    rows = text.quality_classifier(spark).collect()
    kept = [r for r in rows if r["pred_keep"] == 1]
    assert 0 < len(kept) < len(rows)
    for r in rows:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert r["pred_keep"] == int(r["quality_score"] >= 0.5)


def test_hard_negatives_exclude_query_label_and_rank_below_knn(spark):
    hn = hard_negatives(spark).collect()
    assert all(r["label"] != r["query_label"] for r in hn)
    # the best hard negative can never beat the UNRESTRICTED best
    # neighbor (knn's candidate set is a superset)
    knn_best = {
        r["query_id"]: r["cosine"]
        for r in knn_bruteforce(spark).collect()
        if r["rnk"] == 1
    }
    for qid in {r["query_id"] for r in hn}:
        best_hn = max(r["cosine"] for r in hn if r["query_id"] == qid)
        assert best_hn <= knn_best[qid] + 1e-9


def test_quality_survivor_is_longest_cluster_member(spark):
    clusters = doc_dup_clusters(spark).collect()
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in spark.table("documents").select("doc_id", "n_chars").collect()
    }
    members = {}
    for r in clusters:
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    kept = doc_cluster_quality_survivors(spark).collect()
    assert {r["cluster_id"] for r in kept} == set(members)
    non_min = 0
    for r in kept:
        group = members[r["cluster_id"]]
        assert r["n_removed"] == len(group) - 1
        assert r["kept_doc_id"] in group
        best = max(group, key=lambda d: (docs[d], -d))
        assert r["kept_doc_id"] == best
        assert r["kept_n_chars"] == docs[best]
        if best != min(group):
            non_min += 1
    assert non_min > 0  # differs from keep-min-id somewhere: non-vacuous


def test_substring_dup_spans_bounded_and_nonvacuous(spark):
    rows = repetition.substring_dup_spans(spark).collect()
    assert all(0.0 <= r["dup_span_coverage"] <= 1.0 for r in rows)
    assert any(r["dup_span_coverage"] > 0 for r in rows)


def test_substring_dup_spans_exact_on_planted_corpus(spark):
    """Hand-computed coverages on a planted corpus: exact twins get 1.0,
    a partial 8-word overlap covers exactly its shared positions, and a
    unique doc gets 0.0."""
    rows = [
        (0, "a b c d e f g h i j"),  # 3 positions, twin of d1 -> 1.0
        (1, "a b c d e f g h i j"),  # 1.0
        (2, "x b c d e f g h i y"),  # shares only "b..i" with d0/d1 -> 1/3
        (3, "p q r s t u v w"),      # 1 position, unique -> 0.0
        (4, "too short to gram"),    # < 8 words: excluded entirely
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("documents")
    try:
        got = {
            r["doc_id"]: (
                r["n_positions"],
                r["n_dup_positions"],
                r["dup_span_coverage"],
            )
            for r in repetition.substring_dup_spans(spark).collect()
        }
        assert got == {
            0: (3, 3, 1.0),
            1: (3, 3, 1.0),
            2: (3, 1, round(1 / 3, 6)),
            3: (1, 0, 0.0),
        }
    finally:
        spark.read.parquet(f"{SF_SMALL}/documents.parquet").createOrReplaceTempView(
            "documents"
        )


def test_stratified_topk_sample_exact_quota_and_deterministic(spark):
    from uav_streamprocessor_spark.operators.sampling import (
        stratified_topk_sample,
    )

    rows = stratified_topk_sample(spark, k=20).collect()
    per_lang_corpus = {
        r["lang"]: r["n"]
        for r in spark.table("documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r)
    assert set(per_lang) == set(per_lang_corpus)
    corpus_ids = {
        r["doc_id"] for r in spark.table("documents").select("doc_id").collect()
    }
    for lang, sample in per_lang.items():
        # exact quota (capped by stratum size), contiguous ranks, sorted draws
        assert len(sample) == min(20, per_lang_corpus[lang])
        assert sorted(r["rnk"] for r in sample) == list(range(1, len(sample) + 1))
        draws = [r["draw"] for r in sorted(sample, key=lambda r: r["rnk"])]
        assert draws == sorted(draws)
        assert all(r["doc_id"] in corpus_ids for r in sample)
    # deterministic: a second evaluation is identical
    again = stratified_topk_sample(spark, k=20).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_topk_users_rollup_merge_equals_whole_and_counts_exact(spark):
    """Frequent-items rollup invariants: (1) with maxItemsTracked >= the
    distinct-user count the sketch counts are EXACT — every reported
    (user, count) matches the groupBy truth; (2) merge-of-daily-parts
    equals a single whole-feed accumulate (associativity, the mergeable-
    summaries contract); (3) the reported top-1 count is the true max."""
    from uav_streamprocessor_spark.operators.sketches import topk_users_rollup

    ev = spark.table("events")
    exact = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rolled = topk_users_rollup(spark, k=10).collect()
    assert rolled
    for r in rolled:
        assert exact[(r["event_type"], r["user_id"])] == r["est_count"]
    # boundary-tie membership (ADVICE r4): the k+slack over-fetch +
    # relational (count desc, user_id) cut must reproduce the EXACT
    # top-10 membership per type, including ties across the cutoff
    expected = {}
    for (et, uid), n in exact.items():
        expected.setdefault(et, []).append((-n, uid))
    for et in expected:
        expected[et] = [uid for _, uid in sorted(expected[et])[:10]]
    got = {}
    for r in sorted(rolled, key=lambda r: (r["event_type"], r["rnk"])):
        got.setdefault(r["event_type"], []).append(r["user_id"])
    assert got == expected
    # top-1 per type is the true max count
    true_max = {}
    for (et, _), n in exact.items():
        true_max[et] = max(true_max.get(et, 0), n)
    for r in rolled:
        if r["rnk"] == 1:
            assert r["est_count"] == true_max[r["event_type"]]

    # merge-of-parts == whole: single global accumulate, same estimate
    whole = (
        ev.groupBy("event_type")
        .agg(F.expr("approx_top_k_accumulate(user_id, 4096)").alias("state"))
        .select("event_type", F.expr("approx_top_k_estimate(state, 10)").alias("top"))
        .select("event_type", F.explode("top").alias("e"))
        .select(
            "event_type",
            F.col("e.item").cast("long").alias("user_id"),
            F.col("e.count").cast("long").alias("est_count"),
        )
        .collect()
    )
    def count_multiset(rows):
        out = {}
        for r in rows:
            out.setdefault(r["event_type"], []).append(r["est_count"])
        return {k: sorted(v) for k, v in out.items()}

    assert count_multiset(rolled) == count_multiset(whole)


def test_r4_perturbation_controls(spark):
    """Positive controls (the r2 pattern): each r4 knob must CHANGE the
    output when turned — a gate/packing/sampler that ignores its
    parameters proves nothing."""
    from uav_streamprocessor_spark.operators.sampling import (
        stratified_topk_sample,
    )

    # tighter budget -> strictly more sequences
    seqs_512 = len(packing.sequence_packing(spark, budget=512).collect())
    seqs_128 = len(packing.sequence_packing(spark, budget=128).collect())
    assert seqs_128 > seqs_512

    # alpha=1 is natural sampling: every oversample factor becomes 1.0
    natural = packing.mix_weights(spark, alpha=1.0).collect()
    assert all(abs(r["oversample"] - 1.0) < 1e-4 for r in natural)
    tempered = packing.mix_weights(spark, alpha=0.7).collect()
    assert any(abs(r["oversample"] - 1.0) > 1e-4 for r in tempered)

    # smaller chunk stride -> more chunks for every multi-chunk doc
    c48 = {r["doc_id"]: r["n_chunks"] for r in packing.chunk_windows(spark).collect()}
    c16 = {
        r["doc_id"]: r["n_chunks"]
        for r in packing.chunk_windows(spark, stride=16).collect()
    }
    assert all(c16[d] >= c48[d] for d in c48)
    assert any(c16[d] > c48[d] for d in c48)

    # k drives the quota exactly: expected = sum over strata of
    # min(k, stratum_size), computed from the corpus rather than
    # hardcoding its current shape (ADVICE r4)
    strata = {
        r["lang"]: r["n"]
        for r in spark.table("documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for k in (1, 5, 20):
        got = stratified_topk_sample(spark, k=k).collect()
        assert len(got) == sum(min(k, n) for n in strata.values())
        per_lang = {}
        for r in got:
            per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
        assert per_lang == {
            lang: min(k, n) for lang, n in strata.items() if min(k, n) > 0
        }
