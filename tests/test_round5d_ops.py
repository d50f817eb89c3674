"""Behavioral invariants + perturbation controls for the round-5 third
batch (VERDICT r4 #8 pattern: every new op ships with a perturbed-input
positive control proving its gate/threshold/knob bites; value-level
correctness is the DuckDB oracle's job in test_oracle_parity.py /
PARITY artifacts)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from uav_streamprocessor_spark.fixtures import register_uav_views
from uav_streamprocessor_spark.operators import (
    dedup,
    events_ops,
    relational,
    similarity,
    text,
    uav_extra,
)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _views(spark):
    register_uav_views(spark, SF_SMALL)


# ---------------------------------------------------------------------------
# ev_concurrent_sessions
# ---------------------------------------------------------------------------

def test_concurrent_sessions_conserves_session_count_and_peak_bounds(spark):
    days = events_ops.concurrent_sessions(spark).collect()
    assert len(days) > 0
    n_sessions = events_ops.sessionize_gap_method(spark).count()
    assert sum(r["n_sessions_started"] for r in days) == n_sessions
    # a started session implies at least one concurrent session that day
    for r in days:
        assert r["peak_concurrency"] >= 1 or r["n_sessions_started"] == 0
        # peak can never exceed sessions alive that day (started today or
        # carried in — bounded loosely by total sessions)
        assert r["peak_concurrency"] <= n_sessions


def test_concurrent_sessions_planted_burst_raises_peak(spark):
    """Perturbation: 7 fresh users all online in the same minute on a
    quiet future day — that day's peak must be >= 7."""
    ev = spark.table("events")
    burst = spark.range(14).select(
        (F.lit(2 * 10**9) + F.col("id")).alias("event_id"),
        F.expr(
            "timestamp '2099-06-01 12:00:00' + make_interval(0,0,0,0,0,0,id % 2)"
        ).alias("ts"),
        (F.lit(700_000) + F.col("id") % 7).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    try:
        ev.unionByName(burst.select(ev.columns)).createOrReplaceTempView("events")
        days = {
            str(r["day"]): r for r in events_ops.concurrent_sessions(spark).collect()
        }
        planted = days["2099-06-01"]
        assert planted["peak_concurrency"] >= 7
        assert planted["n_sessions_started"] == 7
    finally:
        ev.createOrReplaceTempView("events")


def test_concurrent_sessions_gap_knob_merges_sessions(spark):
    small = events_ops.concurrent_sessions(spark, gap_minutes=5).collect()
    big = events_ops.concurrent_sessions(spark, gap_minutes=24 * 60).collect()
    assert sum(r["n_sessions_started"] for r in big) < sum(
        r["n_sessions_started"] for r in small
    )


# ---------------------------------------------------------------------------
# rel_revenue_gini / rel_abc_pareto
# ---------------------------------------------------------------------------

def _plant_segment_orders(spark, revenues: list[float]):
    """Replace orders/customer views with a single synthetic segment whose
    per-customer revenues are exactly `revenues`."""
    orders = spark.createDataFrame(
        [(i, i, rev) for i, rev in enumerate(revenues)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(i, "PLANTED") for i in range(len(revenues))],
        "c_custkey long, c_mktsegment string",
    )
    return orders, customer


def test_gini_zero_on_uniform_and_rises_with_planted_whale(spark):
    orders0 = spark.table("orders")
    customer0 = spark.table("customer")
    try:
        o, c = _plant_segment_orders(spark, [100.0] * 20)
        o.createOrReplaceTempView("orders")
        c.createOrReplaceTempView("customer")
        uniform = relational.revenue_gini(spark).collect()
        assert len(uniform) == 1 and abs(uniform[0]["gini"]) < 1e-9

        o, c = _plant_segment_orders(spark, [100.0] * 19 + [100_000.0])
        o.createOrReplaceTempView("orders")
        c.createOrReplaceTempView("customer")
        whale = relational.revenue_gini(spark).collect()
        assert whale[0]["gini"] > 0.8
    finally:
        orders0.createOrReplaceTempView("orders")
        customer0.createOrReplaceTempView("customer")


def test_gini_bounds_on_corpus(spark):
    rows = relational.revenue_gini(spark).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0


def test_abc_conserves_and_c_class_always_present(spark):
    rows = relational.abc_classification(spark).collect()
    segs = {}
    for r in rows:
        segs.setdefault(r["c_mktsegment"], []).append(r)
    n_with_orders = (
        spark.table("orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_with_orders
    for seg, rs in segs.items():
        # shares sum to 1 and the tail class always exists (the last
        # customer's cumulative share is exactly 1 > 0.95)
        assert abs(sum(r["revenue_share"] for r in rs) - 1.0) < 1e-5
        assert any(r["abc_class"] == "C" for r in rs)


def test_abc_planted_whale_classed_by_threshold(spark):
    """One customer at 90% of segment revenue: cum_share 0.9 > 0.8 puts
    the whale in B (not A — the 80% threshold bites), and the next five
    1%-customers ride along in B until the 95% cut; the rest are C."""
    orders0 = spark.table("orders")
    customer0 = spark.table("customer")
    try:
        o, c = _plant_segment_orders(spark, [1.0] * 10 + [90.0])
        o.createOrReplaceTempView("orders")
        c.createOrReplaceTempView("customer")
        rows = {r["abc_class"]: r for r in relational.abc_classification(spark).collect()}
        assert set(rows) == {"B", "C"}
        assert rows["B"]["n_customers"] == 6  # whale + 5 until cum 0.95
        assert abs(rows["B"]["class_revenue"] - 95.0) < 1e-9
        assert rows["C"]["n_customers"] == 5
    finally:
        orders0.createOrReplaceTempView("orders")
        customer0.createOrReplaceTempView("customer")


# ---------------------------------------------------------------------------
# text_readability_scores
# ---------------------------------------------------------------------------

def _plant_docs(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_readability_closed_form_and_sentence_split_bites(spark):
    docs0 = spark.table("documents")
    try:
        _plant_docs(
            spark, ["The cat sat. The dog ran.", "The cat sat The dog ran."]
        ).createOrReplaceTempView("documents")
        rows = {r["doc_id"]: r for r in text.readability_scores(spark).collect()}
        r2 = rows[0]  # two sentences
        assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (6, 2, 6)
        expected = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
        assert abs(r2["flesch"] - round(expected, 6)) < 1e-9
        assert r2["band"] == "very_easy"
        r1 = rows[1]  # periods removed -> one long sentence -> harder
        assert r1["n_sentences"] == 1
        assert r1["flesch"] < r2["flesch"]
    finally:
        docs0.createOrReplaceTempView("documents")


def test_readability_corpus_sane(spark):
    rows = text.readability_scores(spark).collect()
    assert len(rows) == spark.table("documents").count()
    for r in rows:
        assert r["n_words"] >= 1 and r["n_sentences"] >= 1
        assert r["band"] in {
            "very_easy",
            "easy",
            "medium",
            "difficult",
            "very_difficult",
        }


# ---------------------------------------------------------------------------
# text_lang_source_chi2
# ---------------------------------------------------------------------------

def test_chi2_zero_on_independent_and_positive_on_planted_dependence(spark):
    docs0 = spark.table("documents")
    try:
        # perfectly balanced 2x2 -> expected == observed -> chi2 == 0
        balanced = spark.createDataFrame(
            [
                (i, "t", lang, src, 1)
                for i, (lang, src) in enumerate(
                    [(l, s) for l in ("en", "de") for s in ("a", "b")] * 5
                )
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        balanced.createOrReplaceTempView("documents")
        rows = text.lang_source_chi2(spark).collect()
        assert all(abs(r["chi2_total"]) < 1e-9 for r in rows)
        assert all(abs(r["contribution"]) < 1e-9 for r in rows)

        # diagonal dependence: en only in a, de only in b -> chi2 == N, V == 1
        diagonal = spark.createDataFrame(
            [
                (i, "t", ("en" if i % 2 == 0 else "de"), ("a" if i % 2 == 0 else "b"), 1)
                for i in range(20)
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        diagonal.createOrReplaceTempView("documents")
        rows = text.lang_source_chi2(spark).collect()
        assert all(abs(r["chi2_total"] - 20.0) < 1e-6 for r in rows)
        assert all(abs(r["cramers_v"] - 1.0) < 1e-6 for r in rows)
    finally:
        docs0.createOrReplaceTempView("documents")


def test_chi2_contributions_sum_to_total_on_corpus(spark):
    rows = text.lang_source_chi2(spark).collect()
    assert len(rows) > 0
    total = rows[0]["chi2_total"]
    assert all(r["chi2_total"] == total for r in rows)
    assert abs(sum(r["contribution"] for r in rows) - total) < 1e-3
    assert sum(r["observed"] for r in rows) == spark.table("documents").count()
    assert 0.0 <= rows[0]["cramers_v"] <= 1.0


# ---------------------------------------------------------------------------
# dedup_edit_distance
# ---------------------------------------------------------------------------

def test_edit_distance_finds_planted_near_copy_not_scramble(spark):
    docs0 = spark.table("documents")
    base = "the quick brown fox jumps over the lazy dog again and again"
    try:
        _plant_docs(
            spark,
            [
                base,
                base.replace("quick", "quack"),  # 1 substitution
                base[::-1],  # same length, same lang, scrambled
            ],
        ).createOrReplaceTempView("documents")
        pairs = {
            (r["doc_id_a"], r["doc_id_b"]): r
            for r in dedup.edit_distance_pairs(spark).collect()
        }
        assert (0, 1) in pairs
        assert pairs[(0, 1)]["edit_distance"] == 1
        assert pairs[(0, 1)]["similarity"] > 0.95
        # the reversal shares the block (same length) but fails the floor
        assert (0, 2) not in pairs and (1, 2) not in pairs
    finally:
        docs0.createOrReplaceTempView("documents")


def test_edit_distance_boundary_pair_lower_id_in_higher_band(spark):
    """r5 ADVICE regression: with band_width 25, a 100-char doc sits in
    band 4 and a 99-char doc in band 3. When the LOWER doc_id holds the
    HIGHER band, the old one-sided (band, band+1) a-side emit never met
    the pair (orientation is doc_id_b > doc_id_a, so doc 0's upward walk
    missed doc 1 sitting one band BELOW); the symmetric 3-band emit
    finds it — and still exactly once."""
    docs0 = spark.table("documents")
    t100 = ("x" * 9 + " ") * 10  # 100 chars -> band 4
    t99 = t100[:-1]  # 99 chars -> band 3, edit distance 1
    assert (len(t100), len(t99)) == (100, 99)
    try:
        _plant_docs(spark, [t100, t99]).createOrReplaceTempView("documents")
        rows = dedup.edit_distance_pairs(spark).collect()
        assert len(rows) == 1  # found, and not double-counted
        r = rows[0]
        assert (r["doc_id_a"], r["doc_id_b"]) == (0, 1)
        assert r["edit_distance"] == 1
        assert abs(r["similarity"] - 0.99) < 1e-9
        # mirrored orientation (lower id in the LOWER band) still meets once
        _plant_docs(spark, [t99, t100]).createOrReplaceTempView("documents")
        rows = dedup.edit_distance_pairs(spark).collect()
        assert len(rows) == 1
        assert (rows[0]["doc_id_a"], rows[0]["doc_id_b"]) == (0, 1)
    finally:
        docs0.createOrReplaceTempView("documents")


def test_edit_distance_threshold_monotone_on_corpus(spark):
    loose = dedup.edit_distance_pairs(spark, min_similarity=0.5).collect()
    tight = dedup.edit_distance_pairs(spark, min_similarity=0.9).collect()
    assert len(loose) > 0  # the corpus near-dups surface here too
    keys = lambda rows: {(r["doc_id_a"], r["doc_id_b"]) for r in rows}
    assert keys(tight) <= keys(loose)
    for r in loose:
        # edit distance lower-bounds on length difference held by blocking
        assert r["similarity"] >= 0.5
        assert r["doc_id_a"] < r["doc_id_b"]
    # no pair reported twice
    assert len(keys(loose)) == len(loose)


# ---------------------------------------------------------------------------
# emb_dimension_variance
# ---------------------------------------------------------------------------

def test_dimension_variance_planted_dominant_dim_wins(spark):
    emb0 = spark.table("embeddings")
    try:
        boosted = emb0.select(
            "vec_id",
            F.expr(
                "transform(embedding, (x, i) -> CASE WHEN i = 7 THEN x * 10 "
                "ELSE x END)"
            ).alias("embedding"),
            "label",
        )
        boosted.createOrReplaceTempView("embeddings")
        top = similarity.dimension_variance_profile(spark, top_k=3).collect()
        assert top[0]["dim"] == 7
    finally:
        emb0.createOrReplaceTempView("embeddings")


def test_dimension_variance_full_profile_consistent(spark):
    rows = similarity.dimension_variance_profile(spark, top_k=10_000).collect()
    dim = len(spark.table("embeddings").first()["embedding"])
    assert len(rows) == dim
    for r in rows:
        assert r["variance"] >= 0.0
        assert r["min_x"] <= r["mean"] <= r["max_x"]
    # ordered by variance desc
    vs = [r["variance"] for r in rows]
    assert vs == sorted(vs, reverse=True)


# ---------------------------------------------------------------------------
# uav_motion_vectors
# ---------------------------------------------------------------------------

def test_motion_vectors_exact_on_planted_track_and_zero_when_static(spark):
    planted = spark.createDataFrame(
        # moving car: center steps 30px right every 30 frames -> speed 1.0
        [(1, "camX", 0, 0, 0, 20, 20, 0.9, 2, "car"),
         (2, "camX", 30, 30, 0, 50, 20, 0.9, 2, "car"),
         (3, "camX", 60, 60, 0, 80, 20, 0.9, 2, "car"),
         # static person: same box every keyframe -> speed 0
         (4, "camX", 0, 100, 100, 120, 120, 0.8, 0, "person"),
         (5, "camX", 30, 100, 100, 120, 120, 0.8, 0, "person"),
         # low-confidence decoy must be ignored by the whitelist filter
         (6, "camX", 30, 500, 500, 600, 600, 0.1, 2, "car")],
        "det_id long, camera_id string, frame_number long, x_min int, "
        "y_min int, x_max int, y_max int, confidence double, class_id int, "
        "class_name string",
    )
    rows = {
        (r["camera_id"], r["class_name"]): r
        for r in uav_extra.motion_vectors(planted).collect()
    }
    car = rows[("camX", "car")]
    assert car["n_moves"] == 2
    assert abs(car["avg_speed"] - 1.0) < 1e-9
    assert abs(car["max_speed"] - 1.0) < 1e-9
    person = rows[("camX", "person")]
    assert person["n_moves"] == 1
    assert person["avg_speed"] == 0.0


def test_motion_vectors_corpus_nonempty_and_positive(spark):
    rows = uav_extra.motion_vectors(spark.table("detections")).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["class_name"] in ("car", "person")
        assert r["n_moves"] >= 1
        assert 0.0 <= r["avg_speed"] <= r["max_speed"]
        assert math.isfinite(r["max_speed"])


# ---------------------------------------------------------------------------
# text_ngram_novelty
# ---------------------------------------------------------------------------

def test_ngram_novelty_conserves_and_planted_copy_adds_nothing(spark):
    rows = dedup.ngram_novelty_by_source(spark).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_grams"]
        assert 0.0 <= r["novelty_rate"] <= 1.0
    # every distinct gram is novel exactly once -> totals conserve
    from uav_streamprocessor_spark.operators.dedup import doc_ngram_sets

    total_distinct = (
        doc_ngram_sets(spark)
        .select(F.explode("grams").alias("g"))
        .distinct()
        .count()
    )
    assert sum(r["n_novel"] for r in rows) == total_distinct

    docs0 = spark.table("documents")
    base = {r["source"]: r for r in rows}
    src0_doc = docs0.filter(F.col("source") == "src0").orderBy("doc_id").first()
    copy = spark.createDataFrame(
        [(10**9, src0_doc["text"], src0_doc["lang"], "src0",
          len(src0_doc["text"]))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    try:
        docs0.unionByName(copy).createOrReplaceTempView("documents")
        pert = {
            r["source"]: r
            for r in dedup.ngram_novelty_by_source(spark).collect()
        }
        # the verbatim copy adds grams to src0 but zero novel ones
        assert pert["src0"]["n_novel"] == base["src0"]["n_novel"]
        assert pert["src0"]["n_grams"] > base["src0"]["n_grams"]
        assert pert["src0"]["novelty_rate"] < base["src0"]["novelty_rate"]
    finally:
        docs0.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# ev_dau_mau_stickiness
# ---------------------------------------------------------------------------

def test_dau_mau_bounds_and_window_knob(spark):
    rows = events_ops.dau_mau_stickiness(spark).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r["dau"] <= r["mau"]
        assert 0.0 < r["stickiness"] <= 1.0
    # first day's trailing window holds only itself
    first = min(rows, key=lambda r: r["day"])
    assert first["dau"] == first["mau"]
    # a 1-day window collapses MAU to DAU everywhere
    for r in events_ops.dau_mau_stickiness(spark, window_days=1).collect():
        assert r["dau"] == r["mau"] and r["stickiness"] == 1.0


# ---------------------------------------------------------------------------
# emb_mmr_rerank
# ---------------------------------------------------------------------------

def test_mmr_lam1_equals_pure_relevance_order(spark):
    mmr = {
        (r["query_id"], r["rank"]): r
        for r in similarity.mmr_rerank(spark, k=5, lam=1.0).collect()
    }
    knn = {
        (r["query_id"], r["rnk"]): r
        for r in similarity.knn_bruteforce(spark, k=5).collect()
    }
    assert set(mmr) == set(knn)
    for key, m in mmr.items():
        assert m["vec_id"] == knn[key]["vec_id"]


def test_mmr_scores_match_numpy_reference(spark):
    import numpy as np

    out = similarity.mmr_rerank(spark, n_queries=2, k=6, lam=0.6).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.table("embeddings").collect()
    }

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        picked = []
        for r in rs:
            if picked:
                max_sim = max(cos(emb[r["vec_id"]], emb[p]) for p in picked)
            else:
                max_sim = 0.0
            expected = 0.6 * r["relevance"] - 0.4 * max_sim
            assert abs(r["mmr_score"] - round(expected, 6)) < 1e-5
            picked.append(r["vec_id"])


def test_mmr_demotes_planted_duplicate(spark):
    """Plant an exact copy of each query's top hit: pure relevance ranks
    the copy adjacent to the original; MMR's diversity term must push it
    out of rank 2."""
    emb0 = spark.table("embeddings")
    top1 = {
        r["query_id"]: r["vec_id"]
        for r in similarity.knn_bruteforce(spark, k=1).collect()
    }
    q0_top = top1[0]
    dup = emb0.filter(F.col("vec_id") == q0_top).select(
        F.lit(999_999).cast("long").alias("vec_id"), "embedding", "label"
    )
    try:
        emb0.unionByName(dup).createOrReplaceTempView("embeddings")
        pure = [
            r
            for r in similarity.mmr_rerank(spark, k=4, lam=1.0).collect()
            if r["query_id"] == 0
        ]
        diverse = [
            r
            for r in similarity.mmr_rerank(spark, k=4, lam=0.5).collect()
            if r["query_id"] == 0
        ]
        pure.sort(key=lambda r: r["rank"])
        diverse.sort(key=lambda r: r["rank"])
        pure_ids = [r["vec_id"] for r in pure]
        # relevance-only: original and its planted copy sit at ranks 1-2
        assert set(pure_ids[:2]) == {q0_top, 999_999}
        div_ids = [r["vec_id"] for r in diverse]
        assert div_ids[0] in (q0_top, 999_999)
        assert div_ids[1] not in (q0_top, 999_999)
    finally:
        emb0.createOrReplaceTempView("embeddings")


# ---------------------------------------------------------------------------
# ev_funnel_step_timing
# ---------------------------------------------------------------------------

def test_funnel_timing_reconciles_with_conversion_counts(spark):
    timing = {r["step"]: r for r in events_ops.funnel_step_timing(spark).collect()}
    conv = events_ops.funnel_view_click_purchase(spark).collect()[0]
    assert timing["view_to_click"]["n_users"] == conv["n_clicked"]
    assert timing["click_to_purchase"]["n_users"] == conv["n_purchased"]
    for r in timing.values():
        assert r["min_gap_s"] <= r["median_gap_s"] <= r["max_gap_s"]
        assert r["min_gap_s"] >= 0  # steps are time-ordered by construction


def test_funnel_timing_exact_median_on_planted_gaps(spark):
    """5 users with view->click gaps 10/20/30/40/1000s: median 30 (robust
    to the outlier), mean 220. One user converts to purchase 60s later."""
    ev0 = spark.table("events")
    rows = []
    eid = 0
    for u, gap in enumerate([10, 20, 30, 40, 1000]):
        rows.append((eid, "2099-01-01 00:00:00", 900_000 + u, "view", 1.0, "{}")); eid += 1
        rows.append((eid, f"2099-01-01 00:{gap // 60:02d}:{gap % 60:02d}",
                     900_000 + u, "click", 1.0, "{}")); eid += 1
    rows.append((eid, "2099-01-01 00:01:10", 900_000, "purchase", 1.0, "{}"))
    planted = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, "
              "value double, props string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value", "props")
    try:
        planted.createOrReplaceTempView("events")
        t = {r["step"]: r for r in events_ops.funnel_step_timing(spark).collect()}
        vc = t["view_to_click"]
        assert vc["n_users"] == 5
        assert vc["median_gap_s"] == 30.0
        assert abs(vc["avg_gap_s"] - 220.0) < 1e-9
        cp = t["click_to_purchase"]
        assert cp["n_users"] == 1 and cp["median_gap_s"] == 60.0
    finally:
        ev0.createOrReplaceTempView("events")


# ---------------------------------------------------------------------------
# ev_forecast_backtest
# ---------------------------------------------------------------------------

def test_forecast_backtest_perfect_on_weekday_periodic_series(spark):
    """Perturbation control inverted: a perfectly weekday-periodic series
    must backtest with MAE == MAPE == 0 — proving the weekday keying and
    the train/test split both work."""
    ev0 = spark.table("events")
    rows = []
    eid = 0
    # 28 days, weekday w gets w+1 events per day
    for d in range(28):
        wd = d % 7
        for i in range(wd + 1):
            rows.append((eid, f"2099-03-{d + 1:02d} 12:00:00", 1, "view", 1.0, "{}"))
            eid += 1
    planted = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, "
              "value double, props string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value", "props")
    try:
        planted.createOrReplaceTempView("events")
        out = events_ops.forecast_backtest(spark).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_test_days"] == 7
        assert r["mae"] == 0.0 and r["mape"] == 0.0
        assert r["actual_mean"] == r["forecast_mean"]
    finally:
        ev0.createOrReplaceTempView("events")


def test_forecast_backtest_corpus_sane(spark):
    rows = events_ops.forecast_backtest(spark).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_test_days"] >= 1
        assert r["mae"] >= 0.0 and r["mape"] >= 0.0
    # a longer horizon tests more days
    longer = events_ops.forecast_backtest(spark, horizon_days=14).collect()
    assert sum(r["n_test_days"] for r in longer) > sum(
        r["n_test_days"] for r in rows
    )


# ---------------------------------------------------------------------------
# rel_cohort_repurchase
# ---------------------------------------------------------------------------

def test_cohort_repurchase_offset_zero_is_full_and_bounded(spark):
    rows = relational.cohort_repurchase_matrix(spark).collect()
    assert len(rows) > 0
    zero = [r for r in rows if r["offset_m"] == 0]
    assert zero and all(r["retention"] == 1.0 for r in zero)
    for r in rows:
        assert 1 <= r["n_active"] <= r["cohort_size"]
        assert 0.0 < r["retention"] <= 1.0
        assert 1 <= r["cohort_month"] <= 12
        assert r["offset_m"] >= 0


def test_cohort_repurchase_planted_december_and_offset(spark):
    """December cohorts stay in their own year (the zero-based month
    index), and a repurchase k months later lands at offset k exactly."""
    orders0 = spark.table("orders")
    planted = spark.createDataFrame(
        [(1, 11, "2098-12-15"), (2, 11, "2099-03-02"),  # dec cohort, +3
         (3, 12, "2099-01-05")],
        "o_orderkey long, o_custkey long, d string",
    ).select("o_orderkey", "o_custkey",
             F.col("d").cast("timestamp").alias("o_orderdate"))
    try:
        planted.createOrReplaceTempView("orders")
        rows = relational.cohort_repurchase_matrix(spark).collect()
        dec = {r["offset_m"]: r for r in rows
               if r["cohort_year"] == 2098 and r["cohort_month"] == 12}
        assert set(dec) == {0, 3}
        assert dec[3]["retention"] == 1.0 and dec[3]["cohort_size"] == 1
        jan = [r for r in rows
               if r["cohort_year"] == 2099 and r["cohort_month"] == 1]
        assert len(jan) == 1 and jan[0]["offset_m"] == 0
    finally:
        orders0.createOrReplaceTempView("orders")


# ---------------------------------------------------------------------------
# dedup_minhash_editdist (block-then-verify composition)
# ---------------------------------------------------------------------------

def test_minhash_editdist_recall_vs_blocked_exact(spark):
    """Every high-similarity pair the length-band exact operator finds
    must also survive the LSH-candidates + verify pipeline (banding at
    16x4 targets the >= 0.7 Jaccard region, and 0.8+ edit similarity on
    this corpus implies it), and the verify floor holds on every
    reported pair."""
    exact = {
        (r["doc_id_a"], r["doc_id_b"]): r["similarity"]
        for r in dedup.edit_distance_pairs(spark, min_similarity=0.8).collect()
    }
    lsh = {
        (r["doc_id_a"], r["doc_id_b"]): r["similarity"]
        for r in dedup.minhash_editdist_verify(spark, min_similarity=0.8).collect()
    }
    assert exact, "the corpus carries 0.8+ near-dups"
    missed = set(exact) - set(lsh)
    assert not missed, f"LSH pipeline missed exact pairs: {missed}"
    for pair, sim in lsh.items():
        assert sim >= 0.8
        assert pair[0] < pair[1]
    # identical values where both report
    for pair in set(exact) & set(lsh):
        assert exact[pair] == lsh[pair]


def test_minhash_editdist_verify_floor_bites(spark):
    """The verify stage must cut below the floor. On this corpus every
    LSH candidate is a genuine near-dup (precision 1.0 at 16x4 banding),
    so the bite is proven two ways: (a) a floor derived from the
    observed similarity distribution (its median) keeps a strict
    non-empty subset, and (b) a planted UPPERCASED copy of an original —
    shingling lowercases, so the MinHash signature is IDENTICAL and LSH
    must collide in every band, while Levenshtein sees every alpha char
    differ — enters the candidate set and is dropped by the verify
    floor."""
    scored = dedup.minhash_editdist_verify(spark, min_similarity=0.0).collect()
    sims = sorted(r["similarity"] for r in scored)
    assert len(sims) >= 2 and sims[0] < sims[-1]
    mid = sims[len(sims) // 2]
    tight = dedup.minhash_editdist_verify(spark, min_similarity=mid).collect()
    assert 0 < len(tight) < len(scored)

    docs0 = spark.table("documents")
    src = docs0.orderBy("doc_id").first()
    shouting = src["text"].upper()
    assert shouting != src["text"]
    plant = spark.createDataFrame(
        [(10**9, shouting, src["lang"], src["source"], len(shouting))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    try:
        docs0.unionByName(plant).createOrReplaceTempView("documents")
        cands = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in dedup.minhash_candidates(spark).collect()
        }
        planted_pairs = {p for p in cands if 10**9 in p}
        assert (src["doc_id"], 10**9) in planted_pairs, (
            "identical shingle set must collide in LSH"
        )
        verified = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in dedup.minhash_editdist_verify(
                spark, min_similarity=0.8
            ).collect()
        }
        assert not (planted_pairs & verified), "case-flip must fail verify"
    finally:
        docs0.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# ev_srm_check
# ---------------------------------------------------------------------------

def test_srm_balanced_corpus_unflagged_planted_imbalance_flags(spark):
    rows = events_ops.srm_check(spark).collect()
    assert len(rows) == 2
    total = sum(r["n_users"] for r in rows)
    for r in rows:
        assert abs(r["expected_users"] - total / 2) < 1e-6
    # user_id % 2 over a contiguous-ish id space is balanced -> no flag
    assert not rows[0]["srm_flag"]

    # plant 300 extra EVEN-id users: the split breaks hard and flags
    ev0 = spark.table("events")
    extra = spark.range(300).select(
        (F.lit(3 * 10**9) + F.col("id")).alias("event_id"),
        F.lit("2099-01-01 00:00:00").cast("timestamp").alias("ts"),
        (F.lit(800_000) + F.col("id") * 2).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    try:
        ev0.unionByName(extra.select(ev0.columns)).createOrReplaceTempView(
            "events"
        )
        pert = events_ops.srm_check(spark).collect()
        assert pert[0]["srm_flag"] and pert[1]["srm_flag"]
        assert pert[0]["chi2"] > 10.83
    finally:
        ev0.createOrReplaceTempView("events")


# ---------------------------------------------------------------------------
# emb_matryoshka_overlap
# ---------------------------------------------------------------------------

def test_matryoshka_full_prefix_is_identity_and_degrades_when_cut(spark):
    # prefix = full dimension -> the two rankings are identical
    dim = len(spark.table("embeddings").first()["embedding"])
    ident = similarity.matryoshka_overlap(spark, prefix_dim=dim).collect()
    assert ident and all(r["overlap_at_k"] == 1.0 for r in ident)
    # a 4-dim prefix of generic embeddings cannot preserve every top-k
    brutal = similarity.matryoshka_overlap(spark, prefix_dim=4).collect()
    assert any(r["overlap_at_k"] < 1.0 for r in brutal)
    for r in brutal:
        assert 0 <= r["n_overlap"] <= r["k"]


# ---------------------------------------------------------------------------
# uav_class_cooccurrence
# ---------------------------------------------------------------------------

def test_class_cooccurrence_exact_lift_on_planted_scene(spark):
    """10 frames: car+person share frames 0-4 (lift 2: together twice as
    often as independence predicts), dog holds frames 5-9 alone (never
    pairs). Lift arithmetic verified exactly."""
    rows = []
    det_id = 0
    for f in range(5):
        for cls_id, cls in [(2, "car"), (0, "person")]:
            rows.append((det_id, "camP", f * 30, 0, 0, 10, 10, 0.9, cls_id, cls))
            det_id += 1
    for f in range(5, 10):
        rows.append((det_id, "camP", f * 30, 0, 0, 10, 10, 0.9, 16, "dog"))
        det_id += 1
    planted = spark.createDataFrame(
        rows,
        "det_id long, camera_id string, frame_number long, x_min int, "
        "y_min int, x_max int, y_max int, confidence double, class_id int, "
        "class_name string",
    )
    out = {(r["class_a"], r["class_b"]): r
           for r in uav_extra.class_cooccurrence(planted).collect()}
    assert set(out) == {("car", "person")}
    r = out[("car", "person")]
    assert r["n_both"] == 5 and r["n_a"] == 5 and r["n_b"] == 5
    assert r["lift"] == 2.0  # 5 shared * 10 frames / (5 * 5)


def test_class_cooccurrence_corpus_bounds(spark):
    rows = uav_extra.class_cooccurrence(spark.table("detections")).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        assert r["lift"] > 0
        assert r["class_a"] < r["class_b"]


# ---------------------------------------------------------------------------
# ev_bot_regularity
# ---------------------------------------------------------------------------

def test_bot_regularity_flags_planted_metronome(spark):
    ev0 = spark.table("events")
    bot = spark.range(25).select(
        (F.lit(4 * 10**9) + F.col("id")).alias("event_id"),
        F.expr(
            "timestamp '2099-01-01 00:00:00' + make_interval(0,0,0,0,0,id,0)"
        ).alias("ts"),
        F.lit(850_000).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    try:
        ev0.unionByName(bot.select(ev0.columns)).createOrReplaceTempView("events")
        rows = {r["user_id"]: r for r in events_ops.bot_regularity_screen(spark).collect()}
        b = rows[850_000]
        assert b["n_events"] == 25
        assert b["mean_gap_s"] == 60.0
        assert b["gap_cv"] == 0.0
        assert b["bot_flag"]
        # organic users are bursty — none should look metronomic
        organic_flags = [r["bot_flag"] for u, r in rows.items() if u != 850_000]
        assert organic_flags and not any(organic_flags)
    finally:
        ev0.createOrReplaceTempView("events")


def test_bot_regularity_threshold_monotone(spark):
    loose = {r["user_id"] for r in
             events_ops.bot_regularity_screen(spark, cv_threshold=5.0).collect()
             if r["bot_flag"]}
    tight = {r["user_id"] for r in
             events_ops.bot_regularity_screen(spark, cv_threshold=0.01).collect()
             if r["bot_flag"]}
    assert tight <= loose
    assert len(loose) > 0  # cv 5 catches essentially everyone reported


# ---------------------------------------------------------------------------
# emb_centroid_separation
# ---------------------------------------------------------------------------

def test_centroid_separation_bounds_and_planted_twin_label(spark):
    rows = similarity.centroid_separation(spark).collect()
    n_labels = spark.table("embeddings").select("label").distinct().count()
    assert len(rows) == n_labels * (n_labels - 1) // 2
    for r in rows:
        assert -1.0 - 1e-9 <= r["centroid_cosine"] <= 1.0 + 1e-9

    emb0 = spark.table("embeddings")
    twin = emb0.filter(F.col("label") == 0).select(
        (F.col("vec_id") + 10**9).alias("vec_id"),
        "embedding",
        F.lit(99).cast("int").alias("label"),
    )
    try:
        emb0.unionByName(twin).createOrReplaceTempView("embeddings")
        pert = {
            (r["label_a"], r["label_b"]): r["centroid_cosine"]
            for r in similarity.centroid_separation(spark).collect()
        }
        assert pert[(0, 99)] == 1.0  # identical centroids
    finally:
        emb0.createOrReplaceTempView("embeddings")


# ---------------------------------------------------------------------------
# rel_incremental_agg
# ---------------------------------------------------------------------------

def test_incremental_agg_merge_equals_recompute_and_covers_all_days(spark):
    """The oracle proves merge == recompute by value hash; here the
    structural half: every order day appears once, counts conserve, and
    the newest day (the delta partition) is present."""
    rows = relational.incremental_daily_revenue(spark).collect()
    o = spark.table("orders")
    n_days = o.select(F.to_date("o_orderdate")).distinct().count()
    assert len(rows) == n_days
    assert sum(r["n_orders"] for r in rows) == o.count()
    max_day = o.agg(F.max(F.to_date("o_orderdate"))).first()[0]
    assert rows[-1]["day"] == max_day  # delta day merged in, ordered last
    for r in rows:
        assert abs(r["avg_order"] - round(r["revenue"] / r["n_orders"], 6)) < 1e-9


# ---------------------------------------------------------------------------
# rel_t_closeness
# ---------------------------------------------------------------------------

def test_t_closeness_bounds_and_planted_skewed_class(spark):
    rows = relational.t_closeness_audit(spark).collect()
    n_classes = spark.table("customer").select("c_nationkey").distinct().count()
    assert len(rows) == n_classes
    for r in rows:
        assert 0.0 <= r["t_emd"] <= 1.0  # EMD over probability vectors

    # plant a nation whose members sit ENTIRELY in the global top tail:
    # its decile distribution concentrates in bucket 9 -> near-max EMD
    cust0 = spark.table("customer")
    top = cust0.agg(F.max("c_acctbal")).first()[0]
    skew = spark.range(30).select(
        (F.lit(10**6) + F.col("id")).alias("c_custkey"),
        F.lit(999).cast("int").alias("c_nationkey"),
        F.lit("SKEWED").alias("c_mktsegment"),
        (F.lit(float(top)) + F.col("id") + 1).alias("c_acctbal"),
    )
    cols = ["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"]
    try:
        cust0.select(cols).unionByName(skew).createOrReplaceTempView("customer")
        pert = {r["c_nationkey"]: r for r in relational.t_closeness_audit(spark).collect()}
        planted = pert[999]
        assert planted["t_flag"]
        # every other class's EMD stays below the planted outlier's
        assert all(
            r["t_emd"] <= planted["t_emd"] for r in pert.values()
        )
    finally:
        cust0.createOrReplaceTempView("customer")


def test_t_closeness_uniform_population_scores_zero(spark):
    """A single-class population IS the population: EMD exactly 0."""
    cust0 = spark.table("customer")
    try:
        cust0.withColumn(
            "c_nationkey", F.lit(1).cast("int")
        ).createOrReplaceTempView("customer")
        rows = relational.t_closeness_audit(spark).collect()
        assert len(rows) == 1 and rows[0]["t_emd"] == 0.0
        assert not rows[0]["t_flag"]
    finally:
        cust0.createOrReplaceTempView("customer")


# ---------------------------------------------------------------------------
# media corpus queries (audio features / scene changes / frame samples)
# ---------------------------------------------------------------------------

def test_corpus_media_deterministic_and_typed(spark):
    from uav_streamprocessor_spark.operators import multimodal

    m = multimodal.corpus_media(spark)
    n_docs = spark.table("documents").count()
    assert m.count() == n_docs
    types = dict(
        (r["media_type"], r["count"])
        for r in m.groupBy("media_type").count().collect()
    )
    assert set(types) == {"image", "video", "audio"}
    # rerun is byte-identical (rows-only driver checks need stability)
    a = {r["media_id"]: bytes(r["payload"]) for r in m.collect()}
    b = {r["media_id"]: bytes(r["payload"]) for r in multimodal.corpus_media(spark).collect()}
    assert a == b


def test_media_audio_features_closed_form_sine(spark):
    from uav_streamprocessor_spark.operators import multimodal

    rows = multimodal.extract_audio_features(
        multimodal.corpus_media(spark)
    ).collect()
    assert rows
    for r in rows:
        # amp-10000 sine: RMS -> 10000/sqrt(2), ZCR -> 2f/rate
        assert abs(r["rms"] - 10000 / math.sqrt(2)) < 60
        assert r["peak"] <= 10000
        assert r["duration_s"] == 0.5
        freq = 200.0 + (r["media_id"] % 200)
        if 16000 % int(2 * freq) != 0:
            assert abs(r["zero_crossing_rate"] - 2 * freq / 16000) < 0.01
        else:
            # crossings land EXACTLY on zero samples (2f divides the
            # rate): the strict sign-change rule sees product == 0, not
            # < 0 — crossings under-count, bounded by the closed form
            assert r["zero_crossing_rate"] <= 2 * freq / 16000


def test_media_scene_changes_respect_planted_static_half(spark):
    from uav_streamprocessor_spark.operators import multimodal

    m = multimodal.corpus_media(spark)
    cuts = multimodal.video_scene_changes(m).collect()
    by_vid = {}
    for r in cuts:
        by_vid.setdefault(r["media_id"], set()).add(r["frame_index"])
    n_videos = m.filter(F.col("media_type") == "video").count()
    assert len(by_vid) == n_videos
    # noise front half cuts at 1..3; the repeated back half is cut-free
    for vid, idx in by_vid.items():
        assert idx == {1, 2, 3}, (vid, idx)


def test_media_frame_samples_counts(spark):
    from uav_streamprocessor_spark.operators import multimodal

    m = multimodal.corpus_media(spark)
    samples = multimodal.frame_sample_video(m, every_n=3).collect()
    n_videos = m.filter(F.col("media_type") == "video").count()
    # 8 frames, every 3rd -> indexes 0,3,6 per video
    assert len(samples) == 3 * n_videos
    per = {}
    for r in samples:
        per.setdefault(r["media_id"], []).append(r["frame_index"])
    assert all(sorted(v) == [0, 3, 6] for v in per.values())


# ---------------------------------------------------------------------------
# text_compression_ratio
# ---------------------------------------------------------------------------

def test_compression_gate_flags_both_planted_tails(spark):
    docs0 = spark.table("documents")
    import random

    rng = random.Random(7)
    noise = "".join(chr(rng.randint(0x21, 0x7E)) for _ in range(400))
    planted = _plant_docs(
        spark,
        ["spam " * 100,            # templated -> tiny ratio
         noise,                    # random printable ASCII -> ~0.83
         "The quick brown fox jumps over the lazy dog and then "
         "wanders through a perfectly ordinary meadow full of "
         "different words that mostly do not repeat themselves."],
    )
    try:
        planted.createOrReplaceTempView("documents")
        rows = {r["doc_id"]: r for r in text.compression_ratio_gate(spark).collect()}
        assert rows[0]["entropy_flag"] and rows[0]["compression_ratio"] < 0.35
        assert rows[1]["entropy_flag"] and rows[1]["compression_ratio"] > 0.8
        assert not rows[2]["entropy_flag"]
        # ordering: noise > prose > template
        assert (rows[1]["compression_ratio"] > rows[2]["compression_ratio"]
                > rows[0]["compression_ratio"])
    finally:
        docs0.createOrReplaceTempView("documents")


def test_compression_contract_counts_and_empty_doc(spark):
    """text_compression_bound (r15 oracled twin): on any corpus the
    three contract counts equal n_nonempty — zlib's compressBound is a
    format guarantee, DEFLATE output is never empty, and the flag is
    the published band. An empty planted doc exercises the nonempty
    carve-out (it has no ratio to contract on)."""
    docs0 = spark.table("documents")
    planted = _plant_docs(spark, ["spam " * 100, "", "plain prose here."])
    try:
        planted.createOrReplaceTempView("documents")
        rows = text.compression_contract(spark).collect()
        assert len(rows) == 1  # one source in the planted frame
        r = rows[0]
        assert r["n_docs"] == 3 and r["n_nonempty"] == 2
        assert (
            r["n_within_bound"] == r["n_positive"]
            == r["n_flag_consistent"] == 2
        )
    finally:
        docs0.createOrReplaceTempView("documents")
    # and on the real fixture corpus, per source
    for r in text.compression_contract(spark).collect():
        assert (
            r["n_within_bound"] == r["n_positive"]
            == r["n_flag_consistent"] == r["n_nonempty"]
        ), r


def test_compression_ratio_doubling_monotone(spark):
    """Deterministic repetition control: doubling any document's text
    strictly lowers its compression ratio (zlib finds the repeat)."""
    docs0 = spark.table("documents")
    texts = [r["text"] for r in docs0.orderBy("doc_id").limit(20).collect()]
    both = _plant_docs(spark, texts + [t + " " + t for t in texts])
    try:
        both.createOrReplaceTempView("documents")
        rows = {r["doc_id"]: r["compression_ratio"]
                for r in text.compression_ratio_gate(spark).collect()}
        for i in range(len(texts)):
            assert rows[i + len(texts)] < rows[i]
    finally:
        docs0.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# emb_procrustes_drift
# ---------------------------------------------------------------------------

def test_procrustes_recovers_planted_rotation_exactly(spark):
    """Rotate every ODD vector by a known orthogonal R: the 'new'
    snapshot differs from 'old' by pure rotation plus the organic pair
    noise. Alignment must collapse the residual to (near) the level a
    perfect-rotation world would show, and must beat no-alignment."""
    import numpy as np

    emb0 = spark.table("embeddings")
    rows = emb0.collect()
    dim = len(rows[0]["embedding"])
    rng = np.random.RandomState(11)
    q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))

    def rot(vec):
        return (np.array(vec, dtype=np.float64) @ q).tolist()

    planted = spark.createDataFrame(
        [
            (
                r["vec_id"],
                [float(x) for x in (
                    rot(r["embedding"]) if r["vec_id"] % 2 == 1 else r["embedding"]
                )],
                r["label"],
            )
            for r in rows
        ],
        "vec_id long, embedding array<float>, label int",
    )
    try:
        planted.createOrReplaceTempView("embeddings")
        out = similarity.procrustes_drift(spark).collect()
        # baseline: the residual structure WITHOUT any rotation planted
        emb0.createOrReplaceTempView("embeddings")
        base = similarity.procrustes_drift(spark).collect()
        planted_aligned = sum(r["mean_residual_aligned"] * r["n_pairs"] for r in out) / sum(
            r["n_pairs"] for r in out
        )
        base_aligned = sum(r["mean_residual_aligned"] * r["n_pairs"] for r in base) / sum(
            r["n_pairs"] for r in base
        )
        # rotating one side is fully repaired: aligned residuals match the
        # unrotated corpus's aligned residuals (float32 storage tolerance)
        assert abs(planted_aligned - base_aligned) < 1e-3
        # and alignment must strictly beat the raw comparison on the
        # rotated corpus (raw sees the rotation, aligned doesn't)
        planted_raw = sum(r["mean_residual_raw"] * r["n_pairs"] for r in out) / sum(
            r["n_pairs"] for r in out
        )
        assert planted_aligned < planted_raw * 0.95
    finally:
        emb0.createOrReplaceTempView("embeddings")


def test_procrustes_aligned_never_worse_on_corpus(spark):
    rows = similarity.procrustes_drift(spark).collect()
    assert rows
    for r in rows:
        assert r["mean_residual_aligned"] <= r["mean_residual_raw"] + 1e-6
        assert r["n_pairs"] >= 1


# ---------------------------------------------------------------------------
# emb_dbscan_lite
# ---------------------------------------------------------------------------

def test_dbscan_planted_blob_clusters_and_noise(spark):
    """Two tight planted blobs + the organic corpus: each blob's members
    are core points of ONE cluster; an isolated far-out vector is
    noise. Blob vectors are near-copies (cosine ~1), organic corpus
    vectors sit near orthogonal (max pairwise ~0.5 at threshold 0.35
    they may form their own structures — only the planted ids are
    asserted)."""
    import numpy as np

    emb0 = spark.table("embeddings")
    dim = len(emb0.first()["embedding"])
    rng = np.random.RandomState(3)
    b1 = rng.standard_normal(dim)
    b2 = rng.standard_normal(dim)
    rows = []
    for i in range(4):
        rows.append((int(2_000_000 + i),
                     [float(x) for x in b1 + 0.01 * rng.standard_normal(dim)], 0))
        rows.append((int(3_000_000 + i),
                     [float(x) for x in b2 + 0.01 * rng.standard_normal(dim)], 1))
    # the isolate: orthogonal-ish one-hot far from everything
    lone = np.zeros(dim); lone[dim - 1] = 100.0
    rows.append((4_000_000, [float(x) for x in lone], 2))
    planted = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    try:
        emb0.unionByName(planted).createOrReplaceTempView("embeddings")
        out = {r["vec_id"]: r for r in similarity.dbscan_lite(spark).collect()}
        blob1 = [out[2_000_000 + i] for i in range(4)]
        blob2 = [out[3_000_000 + i] for i in range(4)]
        assert all(r["role"] == "core" for r in blob1 + blob2)
        assert len({r["cluster_id"] for r in blob1}) == 1
        assert len({r["cluster_id"] for r in blob2}) == 1
        assert blob1[0]["cluster_id"] != blob2[0]["cluster_id"]
        assert out[4_000_000]["role"] == "noise"
        assert out[4_000_000]["cluster_id"] is None
    finally:
        emb0.createOrReplaceTempView("embeddings")


def test_dbscan_partition_invariants(spark):
    rows = similarity.dbscan_lite(spark).collect()
    n = spark.table("embeddings").count()
    assert len(rows) == n  # every vector labeled exactly once
    by_role = {}
    for r in rows:
        by_role.setdefault(r["role"], []).append(r)
        if r["role"] == "noise":
            assert r["cluster_id"] is None
        else:
            assert r["cluster_id"] is not None
    # raising the threshold to impossible makes everything noise
    all_noise = similarity.dbscan_lite(spark, threshold=1.01).collect()
    assert all(r["role"] == "noise" for r in all_noise)


# ---------------------------------------------------------------------------
# ev_experiment_readout / rel_rfm_segmentation
# ---------------------------------------------------------------------------

def test_experiment_readout_conserves_and_planted_lift_significant(spark):
    rows = events_ops.experiment_readout(spark).collect()
    assert len(rows) == 2
    n_users = spark.table("events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert 0.0 <= r["conv_rate"] <= 1.0
    # same z/lift on both rows (broadcast scalars)
    assert rows[0]["z_stat"] == rows[1]["z_stat"]

    # plant 120 treatment-arm users who all convert -> strong real lift
    ev0 = spark.table("events")
    boost = spark.range(120 * 14).select(
        (F.lit(5 * 10**9) + F.col("id")).alias("event_id"),
        F.lit("2099-01-01 00:00:00").cast("timestamp").alias("ts"),
        (F.lit(900_001) + (F.col("id") % 120) * 2).cast("long").alias("user_id"),
        F.lit("purchase").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    try:
        ev0.unionByName(boost.select(ev0.columns)).createOrReplaceTempView("events")
        pert = events_ops.experiment_readout(spark).collect()
        assert pert[0]["significant_95"]
        assert pert[0]["lift_abs"] > 0  # treatment (odd ids) boosted
        assert pert[0]["z_stat"] > 1.96
    finally:
        ev0.createOrReplaceTempView("events")


def test_rfm_scores_bounded_and_conserve_customers(spark):
    rows = relational.rfm_segmentation(spark).collect()
    n_cust = spark.table("orders").select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    names = set()
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        names.add(r["segment"])
    assert "champions" in names  # the top corner is populated


def test_rfm_planted_whale_is_champion(spark):
    """A customer ordering EVERY day of the window with giant totals
    maxes every dimension: cell (5,5,5) -> champions."""
    orders0 = spark.table("orders")
    days = [r[0] for r in orders0.select(
        F.to_date("o_orderdate").alias("d")).distinct().collect()]
    whale_rows = [(9_000_000 + i, 777_777, str(d)) for i, d in enumerate(days)]
    whale = spark.createDataFrame(
        whale_rows, "o_orderkey long, o_custkey long, d string"
    ).select(
        "o_orderkey", "o_custkey",
        F.col("d").cast("timestamp").alias("o_orderdate"),
        F.lit(10**9).cast("double").alias("o_totalprice"),
    )
    keep = ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    try:
        orders0.select(keep).unionByName(whale.select(keep)) \
            .createOrReplaceTempView("orders")
        rows = relational.rfm_segmentation(spark).collect()
        top = [r for r in rows if (r["r_score"], r["f_score"], r["m_score"]) == (5, 5, 5)]
        assert top and top[0]["segment"] == "champions"
        assert top[0]["n_customers"] >= 1
    finally:
        orders0.createOrReplaceTempView("orders")


# ---------------------------------------------------------------------------
# DENSE_GEMM_MAX_ROWS guard (r6 ADVICE: prove the guard bites)
# ---------------------------------------------------------------------------


def test_dense_gemm_guard_bites(spark, monkeypatch):
    """Monkeypatch the model-budget ceiling below the test corpus and
    assert _corpus_unit_matrix refuses with the error that names the
    production twins — the loud-failure contract VERDICT r5 #4 asked
    for, exercised end to end instead of only documented."""
    from uav_streamprocessor_spark.operators import similarity

    n = spark.table("embeddings").count()
    assert n > 1
    monkeypatch.setattr(similarity, "DENSE_GEMM_MAX_ROWS", n - 1)
    with pytest.raises(ValueError) as exc:
        similarity._corpus_unit_matrix(spark)
    msg = str(exc.value)
    # the message must route users to the scale-path twins
    for twin in ("ann_lsh_topk", "ivfpq_topk", "DENSE_GEMM_MAX_ROWS"):
        assert twin in msg
    # and the guard restored, the matrix builds fine
    monkeypatch.setattr(similarity, "DENSE_GEMM_MAX_ROWS", n)
    ids, M, labels = similarity._corpus_unit_matrix(spark)
    assert len(ids) == n


def test_forecast_backtest_actual_mean_covered_days_only(spark):
    """r6 ADVICE regression: when a test day's (type, weekday) never
    appears in training (forecast NULL → n_dropped_days), actual_mean
    must average the COVERED days only, matching forecast_mean/mae/mape's
    denominator — otherwise the bias comparison mixes day sets. Planted:
    weekday-periodic series (weekday w → w+1 events/day) with weekday 3
    absent from the whole training span but present in the test week."""
    ev0 = spark.table("events")
    rows = []
    eid = 0
    for d in range(28):
        wd = d % 7
        if wd == 3 and d < 21:  # no training coverage for weekday 3
            continue
        # the uncovered test day is an outlier (40 events): an all-days
        # actual_mean would shift to (1+2+3+40+5+6+7)/7 ≈ 9.14 and the
        # assertion below would catch the regression
        n_day = 40 if wd == 3 else wd + 1
        for i in range(n_day):
            rows.append((eid, f"2099-03-{d + 1:02d} 12:00:00", 1, "view", 1.0, "{}"))
            eid += 1
    planted = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, "
              "value double, props string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value", "props")
    try:
        planted.createOrReplaceTempView("events")
        out = events_ops.forecast_backtest(spark).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_test_days"] == 7
        assert r["n_dropped_days"] == 1
        # covered weekdays w ∈ {0,1,2,4,5,6} → mean of {1,2,3,5,6,7} = 4.0
        # (the all-days mean with the planted outlier would be ≈9.14)
        assert r["actual_mean"] == pytest.approx(4.0)
        assert r["forecast_mean"] == pytest.approx(4.0)
        assert r["mae"] == 0.0
    finally:
        ev0.createOrReplaceTempView("events")
