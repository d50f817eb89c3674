"""Behavioral invariants + perturbation controls for the round-5
operators (VERDICT r4 #8: every new op ships with a perturbed-input
positive control proving its gate/threshold bites; oracle parity covers
value-level correctness in test_oracle_parity.py / PARITY artifacts)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from uav_streamprocessor_spark.fixtures import register_uav_views
from uav_streamprocessor_spark.operators import (
    events_ops,
    multimodal,
    repetition,
    similarity,
    text,
)
from uav_streamprocessor_spark.operators.pixel import encode_image

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _views(spark):
    register_uav_views(spark, SF_SMALL)


# ---------------------------------------------------------------------------
# ev_rate_limit_windows
# ---------------------------------------------------------------------------

def test_rate_limit_conserves_and_knob_is_monotone(spark):
    r1 = {r["event_type"]: r for r in events_ops.rate_limit_windows(spark).collect()}
    total_events = spark.table("events").count()
    assert sum(r["n_events"] for r in r1.values()) == total_events
    for r in r1.values():
        assert r["n_allowed"] + r["n_throttled"] == r["n_events"]
    # the default knob must actually bite on this corpus (6 at sf0.001)
    assert sum(r["n_throttled"] for r in r1.values()) > 0
    # raising the limit strictly shrinks throttling, to zero at limit=inf
    r2 = {r["event_type"]: r for r in
          events_ops.rate_limit_windows(spark, limit=2).collect()}
    for et in r1:
        assert r2[et]["n_throttled"] <= r1[et]["n_throttled"]
    r_inf = events_ops.rate_limit_windows(spark, limit=10**6).collect()
    assert sum(r["n_throttled"] for r in r_inf) == 0


def test_rate_limit_throttles_planted_burst(spark):
    """Perturbation: plant 10 same-hour events for one user/type — the
    limiter must throttle exactly 9 of the extra volume."""
    ev = spark.table("events")
    base = events_ops.rate_limit_windows(spark).collect()
    base_throttled = sum(r["n_throttled"] for r in base)
    burst = spark.range(10).select(
        (F.lit(10**9) + F.col("id")).alias("event_id"),
        F.expr("timestamp '2099-01-01 12:00:00' + make_interval(0,0,0,0,0,0,id)").alias("ts"),
        F.lit(424242).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    try:
        ev.unionByName(burst.select(ev.columns)).createOrReplaceTempView("events")
        perturbed = events_ops.rate_limit_windows(spark).collect()
        assert sum(r["n_throttled"] for r in perturbed) == base_throttled + 9
    finally:
        ev.createOrReplaceTempView("events")


# ---------------------------------------------------------------------------
# ev_user_anomaly_zscore
# ---------------------------------------------------------------------------

def test_anomaly_zscore_threshold_monotone_and_consistent(spark):
    strict = events_ops.user_anomaly_zscore(spark, z_threshold=3.0).collect()
    loose = events_ops.user_anomaly_zscore(spark, z_threshold=2.0).collect()
    assert 0 < len(strict) <= len(loose)
    strict_keys = {(r["user_id"], r["day"]) for r in strict}
    loose_keys = {(r["user_id"], r["day"]) for r in loose}
    assert strict_keys <= loose_keys
    for r in strict:
        assert r["robust_z"] > 3.0
        assert r["mad_events"] > 0
        # z recomputes from the reported median/MAD (6dp rounding slack)
        z = abs(r["n_events"] - r["median_events"]) / (1.4826 * r["mad_events"])
        assert abs(z - r["robust_z"]) < 1e-3


def test_anomaly_zscore_flags_planted_spike(spark):
    """Perturbation: give one quiet user a single 500-event day — that
    (user, day) must appear in the anomaly report."""
    ev = spark.table("events")
    victim = ev.groupBy("user_id").count().orderBy("count", "user_id").first()
    spike = spark.range(500).select(
        (F.lit(2 * 10**9) + F.col("id")).alias("event_id"),
        F.expr("timestamp '2099-06-01 00:00:00' + make_interval(0,0,0,0,0,0,id)").alias("ts"),
        F.lit(victim["user_id"]).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    try:
        ev.unionByName(spike.select(ev.columns)).createOrReplaceTempView("events")
        flagged = events_ops.user_anomaly_zscore(spark).collect()
        hits = [r for r in flagged
                if r["user_id"] == victim["user_id"] and r["n_events"] == 500]
        assert len(hits) == 1
    finally:
        ev.createOrReplaceTempView("events")


# ---------------------------------------------------------------------------
# text_paragraph_dedup
# ---------------------------------------------------------------------------

def test_paragraph_dedup_conservation(spark):
    """Total removals == total block occurrences - distinct block hashes
    (keep-first keeps exactly one occurrence per hash), recomputed
    independently from the raw corpus."""
    res = repetition.paragraph_block_dedup(spark).collect()
    docs = spark.table("documents")
    ws = F.split(F.lower("text"), " ")
    nb = F.ceil(F.size("ws") / F.lit(20.0)).cast("int")
    blocks = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") > 0)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), nb - 1),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("ws", i * 20 + 1, 20))),
                )
            ).alias("h")
        )
    )
    occurrences = blocks.count()
    distinct = blocks.distinct().count()
    assert sum(r["n_dup_blocks"] for r in res) == occurrences - distinct
    assert all(0 < r["n_dup_blocks"] <= r["n_blocks"] for r in res)
    assert len(res) > 0  # the corpus really has cross-doc dup blocks


def test_paragraph_dedup_detects_planted_copy(spark):
    """Perturbation: append a verbatim copy of an existing doc — every
    one of the copy's blocks must be counted as removed."""
    docs = spark.table("documents")
    src = docs.orderBy("doc_id").first()
    n_blocks_src = -(-len(src["text"].split(" ")) // 20)  # ceil
    copy = docs.limit(0).unionByName(
        spark.createDataFrame(
            [(10**9, src["text"], src["lang"], src["source"], src["n_chars"])],
            docs.schema,
        )
    )
    try:
        docs.unionByName(copy).createOrReplaceTempView("documents")
        res = {r["doc_id"]: r for r in
               repetition.paragraph_block_dedup(spark).collect()}
        assert 10**9 in res
        assert res[10**9]["n_dup_blocks"] == n_blocks_src
        assert res[10**9]["dup_ratio"] == 1.0
    finally:
        docs.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# text_zipf_slope
# ---------------------------------------------------------------------------

def test_zipf_slope_negative_on_corpus_flat_on_uniform(spark):
    rows = text.zipf_slope(spark).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["zipf_slope"] < 0  # frequency falls with rank
        assert 0.0 <= r["zipf_r2"] <= 1.0
        assert r["n_tokens"] >= r["n_types"]
    # control: a perfectly uniform corpus has slope exactly 0
    docs = spark.table("documents")
    uniform = spark.createDataFrame(
        [(i, "alpha beta gamma delta", "xx", "ctl", 22) for i in range(50)],
        docs.schema,
    )
    try:
        uniform.createOrReplaceTempView("documents")
        flat = text.zipf_slope(spark).collect()
        assert len(flat) == 1
        assert abs(flat[0]["zipf_slope"]) < 1e-9
    finally:
        docs.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# media_phash_neardups
# ---------------------------------------------------------------------------

def _media_df(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_phash_brightness_invariant_scramble_sensitive(spark):
    """pHash is a PERCEPTUAL hash: +10 global brightness changes only
    the DC coefficient (still the max -> no bit flips, hamming 0);
    scrambling the pixels flips ~half the bits."""
    rng = np.random.RandomState(7)
    base = rng.randint(0, 200, size=(32, 32, 3), dtype=np.uint8)
    bright = np.clip(base.astype(np.int16) + 10, 0, 255).astype(np.uint8)
    scrambled = base.reshape(-1, 3)[rng.permutation(32 * 32)].reshape(32, 32, 3)
    media = _media_df(
        spark,
        [(0, bytearray(encode_image(base))),
         (1, bytearray(encode_image(bright))),
         (2, bytearray(encode_image(scrambled)))],
    )
    h = {r["media_id"]: r["phash"] for r in multimodal.image_phash(media).collect()}
    assert h[0] == h[1], "brightness shift must not change the pHash"
    ham = bin((h[0] ^ h[2]) & (2**64 - 1)).count("1")
    assert ham > 10, f"scramble only flipped {ham} bits"


def test_phash_neardups_find_planted_groups_knob_monotone(spark):
    pairs3 = multimodal.image_phash_neardups(spark, max_hamming=3).collect()
    pairs0 = multimodal.image_phash_neardups(spark, max_hamming=0).collect()
    assert 0 < len(pairs0) <= len(pairs3)
    # every reported pair comes from the same planted dup group
    # (documents_as_media: group = media_id // 8)
    for r in pairs3:
        assert r["media_id_a"] // 8 == r["media_id_b"] // 8
        assert r["hamming"] <= 3


# ---------------------------------------------------------------------------
# emb_pq_quantization
# ---------------------------------------------------------------------------

def test_pq_audit_deterministic_and_codebook_knob_monotone(spark):
    a = similarity.pq_quantization_audit(spark).collect()
    b = similarity.pq_quantization_audit(spark).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert all(r["avg_mse_pq"] > 0 for r in a)
    assert all(r["compression_pq"] == 64.0 for r in a)
    # richer codebooks reconstruct strictly better (corpus-level mean)
    small = similarity.pq_quantization_audit(spark, ksub=4).collect()
    big = similarity.pq_quantization_audit(spark, ksub=64).collect()

    def mean_mse(rows):
        n = sum(r["n_vectors"] for r in rows)
        return sum(r["avg_mse_pq"] * r["n_vectors"] for r in rows) / n

    assert mean_mse(big) < mean_mse(small)


# ---------------------------------------------------------------------------
# semdedup scale guard (VERDICT r4 #3)
# ---------------------------------------------------------------------------

def test_semdedup_k_derives_from_corpus_size(spark):
    """Default k = ceil(N / target_cluster_size): reproduces the former
    k=10 at this corpus size, and doubles when the corpus doubles — the
    quadratic per-cluster bound tracks N instead of silently growing."""
    emb = spark.table("embeddings")
    n = emb.count()
    prof = similarity.semdedup_profile(spark, iters=2).collect()
    expected_k = -(-n // 50)
    assert len(prof) == expected_k  # every cluster profiled
    assert sum(r["n_docs"] for r in prof) == n

    doubled = emb.unionByName(
        emb.select(
            (F.col("vec_id") + 10**6).alias("vec_id"), "embedding", "label"
        )
    )
    try:
        doubled.createOrReplaceTempView("embeddings")
        prof2 = similarity.semdedup_profile(spark, iters=2).collect()
        assert len(prof2) == -(-2 * n // 50)
        assert sum(r["n_docs"] for r in prof2) == 2 * n
    finally:
        emb.createOrReplaceTempView("embeddings")


# ---------------------------------------------------------------------------
# text_bm25_topk / text_char_entropy / text_bpe_pairs (round-5 session 2)
# ---------------------------------------------------------------------------

def _docs_view(spark, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.createOrReplaceTempView("documents")


def test_bm25_length_normalization_bites(spark):
    """Perturbation: same tf, different doc length -> shorter doc wins;
    with b=0 the length penalty is off and the scores tie."""
    docs = spark.table("documents")
    try:
        _docs_view(spark, [
            "query query pad",
            "query query " + " ".join(["pad"] * 28),
            # extra docs so df/avgdl aren't degenerate
            "other words here entirely",
            "more filler content rows",
        ])
        res = {r["doc_id"]: r["bm25"] for r in
               text.bm25_topk(spark).collect() if r["term"] == "query"}
        assert res[0] > res[1], "shorter doc must outscore at same tf"
        flat = {r["doc_id"]: r["bm25"] for r in
                text.bm25_topk(spark, b=0.0).collect() if r["term"] == "query"}
        assert flat[0] == flat[1], "b=0 removes the length penalty"
    finally:
        docs.createOrReplaceTempView("documents")


def test_bm25_tf_saturates(spark):
    """tf grows the score sub-linearly and saturates near idf*(k1+1):
    doubling tf must gain less than the first occurrence did."""
    docs = spark.table("documents")
    try:
        _docs_view(spark, [
            "query alpha alpha alpha",
            "query query alpha alpha",
            "query query query query",
            "unrelated filler words here",
        ])
        res = {r["doc_id"]: r["bm25"] for r in text.bm25_topk(spark).collect()
               if r["term"] == "query"}
        gain1 = res[1] - res[0]
        gain2 = res[2] - res[1]
        assert 0 < gain2 < gain1
    finally:
        docs.createOrReplaceTempView("documents")


def test_char_entropy_flags_planted_flood(spark):
    docs = spark.table("documents")
    base_low = sum(
        r["low_entropy"] for r in text.char_entropy_gate(spark).collect()
    )
    flood = spark.createDataFrame(
        [(10**9, "a" * 200, "en", "src0", 200)], docs.schema
    )
    try:
        docs.unionByName(flood).createOrReplaceTempView("documents")
        res = {r["doc_id"]: r for r in text.char_entropy_gate(spark).collect()}
        assert res[10**9]["char_entropy"] == 0.0
        assert res[10**9]["low_entropy"] == 1
        # the flood adds exactly one flagged doc on top of the corpus's
        # natural short-doc tail
        n_low = sum(r["low_entropy"] for r in res.values())
        assert n_low == base_low + 1
        # knob: an impossible threshold flags nothing
        none = text.char_entropy_gate(spark, min_bits=-1.0).collect()
        assert sum(r["low_entropy"] for r in none) == 0
    finally:
        docs.createOrReplaceTempView("documents")


def test_char_entropy_exact_on_known_string(spark):
    """'aabb' -> two symbols at p=.5 each -> exactly 1 bit."""
    docs = spark.table("documents")
    try:
        _docs_view(spark, ["aabb", "abcd"])
        res = {r["doc_id"]: r["char_entropy"]
               for r in text.char_entropy_gate(spark).collect()}
        assert res[0] == 1.0
        assert res[1] == 2.0
    finally:
        docs.createOrReplaceTempView("documents")


def test_bpe_pairs_word_internal_only(spark):
    """Pairs never cross word boundaries, and the dominant planted pair
    wins the count."""
    docs = spark.table("documents")
    try:
        _docs_view(spark, ["ab cd " * 5, "zz zz zz zz zz zz zz"])
        rows = text.bpe_pair_counts(spark).collect()
        counts = {r["pair"]: r["n"] for r in rows}
        assert counts["zz"] == 7
        assert counts["ab"] == 5 and counts["cd"] == 5
        assert "bc" not in counts and "dz" not in counts
        assert rows[0]["pair"] == "zz"
    finally:
        docs.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# rel_scd2_snapshot / text_weighted_sample / dedup_pagerank_centrality
# ---------------------------------------------------------------------------

def test_scd2_snapshot_point_in_time_unique_and_consistent(spark):
    from uav_streamprocessor_spark.operators import relational

    snap = relational.scd2_snapshot(spark, as_of="1997-06-01").collect()
    custs = [r["o_custkey"] for r in snap]
    assert len(custs) == len(set(custs)), "one version per customer"
    for r in snap:
        assert r["effective_from"].strftime("%Y-%m-%d") <= "1997-06-01"
        if r["effective_to"] is not None:
            assert r["effective_to"].strftime("%Y-%m-%d") > "1997-06-01"
    # snapshot before any order: empty reconstruction
    assert relational.scd2_snapshot(spark, as_of="1960-01-01").count() == 0
    # coverage grows monotonically with the snapshot date
    later = relational.scd2_snapshot(spark, as_of="2099-01-01").collect()
    assert set(custs) <= {r["o_custkey"] for r in later}
    # the far-future snapshot is exactly the is_current slice of history
    current = relational.scd2_order_priority_history(spark).filter(
        "is_current = 1"
    )
    cur = {(r["o_custkey"], r["priority"]) for r in current.collect()}
    assert {(r["o_custkey"], r["priority"]) for r in later} == cur


def test_weighted_sample_quota_and_weight_bites(spark):
    from uav_streamprocessor_spark.operators import sampling

    docs = spark.table("documents")
    per_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    res = sampling.weighted_sample_topk(spark, k=10).collect()
    got = {}
    for r in res:
        got.setdefault(r["lang"], []).append(r)
    for lang, n in per_lang.items():
        assert len(got[lang]) == min(10, n), lang
    # deterministic: a second build returns the identical sample
    res2 = sampling.weighted_sample_topk(spark, k=10).collect()
    assert {tuple(r) for r in res2} == {tuple(r) for r in res}
    # weight dominance: a planted doc with overwhelming weight is always
    # drawn (its key ln(u)/w -> 0-, above any natural key)
    whale = spark.createDataFrame(
        [(10**9, "whale doc unique text", "en", "src0", 10**9)], docs.schema
    )
    try:
        docs.unionByName(whale).createOrReplaceTempView("documents")
        sampled = sampling.weighted_sample_topk(spark, k=10).collect()
        en = [r for r in sampled if r["lang"] == "en"]
        assert any(r["doc_id"] == 10**9 for r in en)
        assert en[0]["doc_id"] == 10**9, "whale takes rank 1"
    finally:
        docs.createOrReplaceTempView("documents")


def test_pagerank_centrality_query_shape(spark):
    from uav_streamprocessor_spark.operators import dedup

    rows = dedup.pagerank_centrality(spark, k=50).collect()
    assert 0 < len(rows) <= 50
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r["rank"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# ev_attribution_credit / ev_markov_transitions
# ---------------------------------------------------------------------------

def test_attribution_planted_purchase_credits_exactly(spark):
    """Perturbation: one new user with 2 views + 1 click then a purchase
    -> linear credit +2/3 view +1/3 click, first touch = view, last =
    click; a touch just OUTSIDE the lookback earns nothing."""
    ev = spark.table("events")
    base = {r["touch_type"]: r for r in
            events_ops.attribution_credit(spark).collect()}
    uid = 31337
    rows = [
        # outside the 7-day lookback: never credited
        (3 * 10**9 + 0, "2099-05-20 00:00:00", "view"),
        (3 * 10**9 + 1, "2099-06-01 10:00:00", "view"),
        (3 * 10**9 + 2, "2099-06-01 11:00:00", "view"),
        (3 * 10**9 + 3, "2099-06-01 12:00:00", "click"),
        (3 * 10**9 + 4, "2099-06-01 13:00:00", "purchase"),
    ]
    planted = spark.createDataFrame(
        [(i, t, uid, et, 1.0, "{}") for i, t, et in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    try:
        ev.unionByName(planted.select(ev.columns)).createOrReplaceTempView("events")
        got = {r["touch_type"]: r for r in
               events_ops.attribution_credit(spark).collect()}
        assert got["view"]["n_touches"] == base["view"]["n_touches"] + 2
        assert got["click"]["n_touches"] == base["click"]["n_touches"] + 1
        assert abs(got["view"]["linear_credit"]
                   - base["view"]["linear_credit"] - 2 / 3) < 1e-5
        assert abs(got["click"]["linear_credit"]
                   - base["click"]["linear_credit"] - 1 / 3) < 1e-5
        assert got["view"]["n_first_touch"] == base["view"]["n_first_touch"] + 1
        assert got["click"]["n_last_touch"] == base["click"]["n_last_touch"] + 1
    finally:
        ev.createOrReplaceTempView("events")


def test_attribution_linear_credit_conserves_purchases(spark):
    """Sum of linear credit over touch types == number of purchases that
    had at least one in-window touch (each splits exactly 1.0)."""
    res = events_ops.attribution_credit(spark).collect()
    total_linear = sum(r["linear_credit"] for r in res)
    assert abs(total_linear - round(total_linear)) < 1e-3
    n_first = sum(r["n_first_touch"] for r in res)
    n_last = sum(r["n_last_touch"] for r in res)
    assert n_first == n_last == round(total_linear)


def test_markov_row_stochastic_and_planted_chain(spark):
    ev = spark.table("events")
    res = events_ops.markov_transitions(spark).collect()
    by_prev = {}
    for r in res:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rows in by_prev.items():
        assert abs(sum(r["p"] for r in rows) - 1.0) < 1e-4, prev
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in res) == n_events - n_users
    # planted deterministic loop user: signup->error->error->error
    uid = 71717
    planted = spark.createDataFrame(
        [(4 * 10**9 + i, f"2099-07-01 00:0{i}:00", uid, et, 1.0, "{}")
         for i, et in enumerate(["signup", "error", "error", "error"])],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    base = {(r["prev_type"], r["next_type"]): r["n"] for r in res}
    try:
        ev.unionByName(planted.select(ev.columns)).createOrReplaceTempView("events")
        got = {(r["prev_type"], r["next_type"]): r["n"]
               for r in events_ops.markov_transitions(spark).collect()}
        assert got[("signup", "error")] == base.get(("signup", "error"), 0) + 1
        assert got[("error", "error")] == base.get(("error", "error"), 0) + 2
    finally:
        ev.createOrReplaceTempView("events")


# ---------------------------------------------------------------------------
# text_hybrid_retrieval / text_bigram_ce
# ---------------------------------------------------------------------------

def test_hybrid_alpha_endpoints_recover_pure_rankers(spark):
    """alpha=1 must reproduce BM25's own top-10 ordering; alpha=0 must
    order by cosine alone — the mixing knob provably bites."""
    pure_bm = {(r["term"], r["rnk"]): r["doc_id"]
               for r in text.bm25_topk(spark, k=10).collect()}
    a1 = text.hybrid_retrieval(spark, alpha=1.0).collect()
    for r in a1:
        assert pure_bm[(r["term"], r["rnk"])] == r["doc_id"]
    a0 = text.hybrid_retrieval(spark, alpha=0.0).collect()
    by_term = {}
    for r in a0:
        by_term.setdefault(r["term"], []).append(r)
    for term, rows in by_term.items():
        cosines = [r["cosine"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert cosines == sorted(cosines, reverse=True), term
        # the query doc itself (cosine 1.0 with its own vector) ranks 1
        assert rows[0]["cosine"] == 1.0


def test_hybrid_scores_bounded_and_deterministic(spark):
    res = text.hybrid_retrieval(spark).collect()
    assert len(res) > 0
    for r in res:
        assert -1.0 <= r["cosine"] <= 1.0
        assert r["hybrid"] <= 0.5 + 0.5 + 1e-9
    res2 = text.hybrid_retrieval(spark).collect()
    assert {tuple(r) for r in res} == {tuple(r) for r in res2}


def test_bigram_ce_planted_repetition_scores_fluent(spark):
    """Perturbation: a doc that is one high-frequency bigram repeated
    must score far LOWER cross-entropy than the corpus median — the LM
    rewards predictable sequences."""
    docs = spark.table("documents")
    base = text.bigram_cross_entropy(spark).collect()
    med = sorted(r["bigram_ce"] for r in base)[len(base) // 2]
    planted = spark.createDataFrame(
        [(10**9, "the " * 200 + "the", "en", "src0", 803)], docs.schema
    )
    try:
        docs.unionByName(planted).createOrReplaceTempView("documents")
        res = {r["doc_id"]: r for r in text.bigram_cross_entropy(spark).collect()}
        assert res[10**9]["n_bigrams"] == 200
        assert res[10**9]["bigram_ce"] < med / 2
    finally:
        docs.createOrReplaceTempView("documents")


def test_bigram_ce_counts_match_token_arithmetic(spark):
    """n_bigrams per doc == token-array length - 1 (all bigrams join the
    model because the corpus contains the doc)."""
    res = {r["doc_id"]: r["n_bigrams"]
           for r in text.bigram_cross_entropy(spark).collect()}
    toks = {
        r["doc_id"]: r["n"]
        for r in spark.table("documents")
        .select("doc_id", F.size(F.split(F.lower("text"), " ")).alias("n"))
        .collect()
    }
    for doc_id, nb in res.items():
        assert nb == toks[doc_id] - 1, doc_id


# ---------------------------------------------------------------------------
# ev_top_session_paths
# ---------------------------------------------------------------------------

def test_session_paths_conserve_sessions_and_split_on_gap(spark):
    """Path counts (unlimited k) must sum to the session count from the
    gaps-and-islands sessionizer; a planted sequence appears as one path
    with a tight gap and shatters into singletons past the gap knob."""
    n_sessions = events_ops.sessionize_gap_method(spark).count()
    all_paths = events_ops.top_session_paths(spark, k=None).collect()
    assert sum(r["n_sessions"] for r in all_paths) == n_sessions

    ev = spark.table("events")
    seq = ["view", "click", "purchase"]
    planted = spark.createDataFrame(
        [(5 * 10**9 + i, f"2099-08-01 00:{i:02d}:00", 90909, et, 1.0, "{}")
         for i, et in enumerate(seq)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    try:
        ev.unionByName(planted.select(ev.columns)).createOrReplaceTempView("events")
        tight = {r["path"]: r["n_sessions"]
                 for r in events_ops.top_session_paths(spark, k=None).collect()}
        base = {r["path"]: r["n_sessions"] for r in all_paths}
        assert tight.get("view>click>purchase", 0) == base.get("view>click>purchase", 0) + 1
        # gap knob: 30s sessions shatter the 1-minute-spaced plant
        shattered = {r["path"]: r["n_sessions"] for r in
                     events_ops.top_session_paths(spark, gap_minutes=0.5, k=None).collect()}
        total = sum(shattered.values())
        assert total > sum(base.values()) + 1  # more, smaller sessions
    finally:
        ev.createOrReplaceTempView("events")


# ---------------------------------------------------------------------------
# emb_ann_tuning_curve
# ---------------------------------------------------------------------------

def test_ann_tuning_curve_monotone_and_consistent(spark):
    """Recall must be monotone in the probe knob for each method, and the
    LSH point at the default radius must equal the recall the dedicated
    equality test computes from ann_lsh_topk directly."""
    rows = {(r["method"], r["knob"]): r["recall"]
            for r in similarity.ann_tuning_curve(spark).collect()}
    assert rows[("lsh", 0)] <= rows[("lsh", 1)] <= rows[("lsh", 2)]
    assert rows[("ivf", 1)] <= rows[("ivf", 2)] <= rows[("ivf", 4)]
    assert 0.0 <= min(rows.values()) and max(rows.values()) <= 1.0
    # independent recomputation of the lsh/h=2 point
    truth = {(r["query_id"], r["vec_id"])
             for r in similarity.knn_bruteforce(spark).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in similarity.ann_lsh_topk(spark).collect()}
    assert rows[("lsh", 2)] == round(len(truth & approx) / len(truth), 6)


# ---------------------------------------------------------------------------
# text_classifier_calibration
# ---------------------------------------------------------------------------

def test_classifier_calibration_conserves_and_gate_consistent(spark):
    """Bucket counts sum to the corpus; gate passes sum to the aggregate
    Gopher report's pass count; gate_rate recomputes from the counts."""
    from uav_streamprocessor_spark.operators import repetition

    rows = text.classifier_calibration(spark).collect()
    n_docs = spark.table("documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    gopher = repetition.gopher_quality_flags(spark).collect()
    n_pass = sum(r["n_docs"] for r in gopher if r["passes"] == 1)
    assert sum(r["n_gate_pass"] for r in rows) == n_pass
    for r in rows:
        assert abs(r["gate_rate"] - r["n_gate_pass"] / r["n_docs"]) < 1e-5
        assert 0 <= r["score_bucket"] <= 9


def test_classifier_calibration_flood_lands_in_fail_bucket(spark):
    """Perturbation: a stopword-free single-char flood must land with
    gate=0 and not perturb other buckets' gate passes."""
    docs = spark.table("documents")
    base = {r["score_bucket"]: r for r in text.classifier_calibration(spark).collect()}
    flood = spark.createDataFrame(
        [(10**9, ("zq " * 40).strip(), "en", "src0", 119)], docs.schema
    )
    try:
        docs.unionByName(flood).createOrReplaceTempView("documents")
        got = {r["score_bucket"]: r for r in text.classifier_calibration(spark).collect()}
        assert sum(r["n_docs"] for r in got.values()) == sum(
            r["n_docs"] for r in base.values()
        ) + 1
        assert sum(r["n_gate_pass"] for r in got.values()) == sum(
            r["n_gate_pass"] for r in base.values()
        ), "the flood fails the stopword rule, so gate passes are unchanged"
    finally:
        docs.createOrReplaceTempView("documents")
