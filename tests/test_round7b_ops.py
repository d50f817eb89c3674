"""Round-7b additions: survival analysis (Kaplan–Meier), causal readout
(difference-in-differences), plus the batch that follows them. Each op
gets a planted scenario with a hand-computed expected answer (the
perturbation proves the op bites) and a real-corpus invariant; DuckDB
value parity rides the registry oracles in test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uav_streamprocessor_spark.fixtures import register_uav_views
from uav_streamprocessor_spark.operators import events_ops

SF_SMALL = "/root/testdata/sf0.001"

_EVENTS_SCHEMA = (
    "event_id long, ts_s string, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(autouse=True)
def _views(spark):
    register_uav_views(spark, SF_SMALL)


def _with_events(spark, rows):
    """Swap the events view for planted (eid, 'Y-m-d H:M:S', user, type,
    value, props) rows; returns the original view's DataFrame."""
    orig = spark.table("events")
    planted = spark.createDataFrame(rows, _EVENTS_SCHEMA).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    planted.createOrReplaceTempView("events")
    return orig


# ---------------------------------------------------------------------------
# ev_kaplan_meier
# ---------------------------------------------------------------------------


def _ev(eid, day, user, etype="view", value=1.0):
    return (eid, f"2099-06-{day:02d} 12:00:00", user, etype, value, "{}")


def test_kaplan_meier_hand_computed_curve_with_censoring(spark):
    """Variant 0: 4 users — two churn at t=4, one at t=10, one censored
    at t=28 → S = 1, 0.5 (2/4 gone), 0.25 (1/2 gone), then FLAT at the
    censored step (censoring must not drop the curve). Variant 1 is
    computed independently."""
    rows = [
        # variant 0 (even user ids)
        _ev(0, 1, 2), _ev(1, 5, 2),          # t=4, churn
        _ev(2, 1, 4), _ev(3, 5, 4),          # t=4, churn
        _ev(4, 1, 6), _ev(5, 11, 6),         # t=10, churn
        _ev(6, 1, 8), _ev(7, 29, 8),         # t=28, censored (within 3d of end)
        # variant 1 (odd user ids)
        _ev(8, 1, 1),                        # t=0, churn
        _ev(9, 1, 3), _ev(10, 30, 3),        # t=29, censored; pins obs_end
    ]
    orig = _with_events(spark, rows)
    try:
        out = events_ops.kaplan_meier_survival(spark, censor_days=3).collect()
        got = {(r["variant"], r["t_days"]): r for r in out}
        expect = {
            (0, 4): (4, 2, 0, 0.5),
            (0, 10): (2, 1, 0, 0.25),
            (0, 28): (1, 0, 1, 0.25),
            (1, 0): (2, 1, 0, 0.5),
            (1, 29): (1, 0, 1, 0.5),
        }
        assert set(got) == set(expect)
        for k, (n, d, c, s) in expect.items():
            r = got[k]
            assert (r["n_at_risk"], r["n_churned"], r["n_censored"]) == (n, d, c), k
            assert r["survival"] == pytest.approx(s, abs=1e-6), k
    finally:
        orig.createOrReplaceTempView("events")


def test_kaplan_meier_real_corpus_invariants(spark):
    """On the real corpus: survival is non-increasing within a variant,
    starts at most 1, and the earliest at-risk count equals the
    variant's user count."""
    out = events_ops.kaplan_meier_survival(spark).collect()
    users = (
        spark.table("events")
        .select((F.col("user_id") % 2).cast("int").alias("v"), "user_id")
        .distinct()
        .groupBy("v")
        .count()
        .collect()
    )
    n_users = {r["v"]: r["count"] for r in users}
    by_variant: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["variant"], r["t_days"])):
        by_variant.setdefault(r["variant"], []).append(r)
    assert set(by_variant) == set(n_users)
    for v, rows in by_variant.items():
        assert rows[0]["n_at_risk"] == n_users[v]
        survs = [r["survival"] for r in rows]
        assert all(s <= 1.0 + 1e-9 for s in survs)
        assert all(a >= b - 1e-9 for a, b in zip(survs, survs[1:]))
        # life-table conservation: everyone leaves the risk set exactly once
        assert sum(r["n_churned"] + r["n_censored"] for r in rows) == n_users[v]


# ---------------------------------------------------------------------------
# ev_diff_in_diff
# ---------------------------------------------------------------------------


def test_diff_in_diff_recovers_planted_effect(spark):
    """Control moves 10→20 pre→post, treated 10→30: DiD must read the
    extra +10 exactly; zero within-cell variance → se 0 and z NULL (the
    nullif guard). A non-purchase event with a huge value must not leak
    into the metric."""
    rows = [
        # span pins: days 1..10, split offset floor(9/2)=4 → post = day>=5
        _ev(0, 1, 10, "purchase", 10.0), _ev(1, 8, 10, "purchase", 20.0),
        _ev(2, 1, 12, "purchase", 10.0), _ev(3, 8, 12, "purchase", 20.0),
        _ev(4, 1, 11, "purchase", 10.0), _ev(5, 8, 11, "purchase", 30.0),
        _ev(6, 1, 13, "purchase", 10.0), _ev(7, 10, 13, "purchase", 30.0),
        _ev(8, 2, 10, "click", 999.0),  # must not count
    ]
    orig = _with_events(spark, rows)
    try:
        out = events_ops.diff_in_diff_readout(spark).collect()
        cells = {(r["variant"], r["period"]): r for r in out}
        assert set(cells) == {(0, 0), (0, 1), (1, 0), (1, 1)}
        assert cells[(0, 0)]["mean_y"] == pytest.approx(10.0)
        assert cells[(0, 1)]["mean_y"] == pytest.approx(20.0)
        assert cells[(1, 0)]["mean_y"] == pytest.approx(10.0)
        assert cells[(1, 1)]["mean_y"] == pytest.approx(30.0)
        for r in out:
            assert r["did_estimate"] == pytest.approx(10.0)
            assert r["did_se"] == pytest.approx(0.0)
            assert r["did_z"] is None  # nullif(se, 0) guard
    finally:
        orig.createOrReplaceTempView("events")


def test_diff_in_diff_panel_is_balanced(spark):
    """A user silent in one period still contributes a y=0 row: with one
    user purchasing only pre, the post cell must exist with mean 0, not
    vanish."""
    rows = [
        _ev(0, 1, 10, "purchase", 50.0),   # v0, pre only
        _ev(1, 1, 11, "purchase", 50.0),
        _ev(2, 9, 11, "purchase", 50.0),   # v1 both periods; pins max day
    ]
    orig = _with_events(spark, rows)
    try:
        out = events_ops.diff_in_diff_readout(spark).collect()
        cells = {(r["variant"], r["period"]): r for r in out}
        assert cells[(0, 1)]["n_users"] == 1
        assert cells[(0, 1)]["mean_y"] == pytest.approx(0.0)
    finally:
        orig.createOrReplaceTempView("events")


# ---------------------------------------------------------------------------
# text_distinct_ngrams / text_kneser_ney
# ---------------------------------------------------------------------------

from uav_streamprocessor_spark.operators import text  # noqa: E402


def _with_docs(spark, rows):
    orig = spark.table("documents")
    planted = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    planted.createOrReplaceTempView("documents")
    return orig


def test_distinct_ngrams_hand_counts_and_short_doc_guard(spark):
    """'a a a a' → 4 unigrams/1 type, 3 bigrams/1 type, 2 trigrams/1
    type; 'w x y z' → all ratios 1.0; a single-token doc contributes to
    n=1 only (the sequence guard — Spark's sequence(1, 0) counts DOWN,
    so an unguarded build would explode garbage grams)."""
    rows = [
        (1, "a a a a", "en", "rep", 7),
        (2, "w x y z", "en", "div", 7),
        (3, "q", "en", "div", 1),
    ]
    orig = _with_docs(spark, rows)
    try:
        out = {(r["source"], r["n"]): r
               for r in text.distinct_ngram_diversity(spark).collect()}
        assert out[("rep", 1)]["n_total"] == 4 and out[("rep", 1)]["n_distinct"] == 1
        assert out[("rep", 2)]["n_total"] == 3 and out[("rep", 2)]["n_distinct"] == 1
        assert out[("rep", 3)]["n_total"] == 2 and out[("rep", 3)]["n_distinct"] == 1
        assert out[("div", 1)]["n_total"] == 5  # w x y z + q
        assert out[("div", 2)]["n_total"] == 3  # from doc 2 only
        assert out[("div", 2)]["distinct_ratio"] == pytest.approx(1.0)
        assert ("div", 3) in out and out[("div", 3)]["n_total"] == 2
    finally:
        orig.createOrReplaceTempView("documents")


def test_kneser_ney_continuation_beats_frequency(spark):
    """The Francisco effect: 'francisco' appears twice but only ever
    after 'san' → its continuation probability must be HALF of
    'york''s (seen after two distinct contexts, once each). Hand
    check: P_kn(francisco|san) = (2−.75)/2 + .75·(1/2)·(1/3) = 0.75,
    P_kn(york|new) = .25/1 + .75·1·(2/3) = 0.75."""
    rows = [
        (1, "san francisco", "en", "s", 13),
        (2, "san francisco", "en", "s", 13),
        (3, "new york", "en", "s", 8),
        (4, "old york", "en", "s", 8),
    ]
    orig = _with_docs(spark, rows)
    try:
        out = {(r["w1"], r["w2"]): r
               for r in text.kneser_ney_bigrams(spark).collect()}
        sf, ny = out[("san", "francisco")], out[("new", "york")]
        assert sf["c12"] == 2 and sf["p_mle"] == pytest.approx(1.0)
        assert sf["p_cont"] == pytest.approx(1 / 3, abs=1e-6)
        assert ny["p_cont"] == pytest.approx(2 / 3, abs=1e-6)
        assert sf["p_kn"] == pytest.approx(0.75, abs=1e-6)
        assert ny["p_kn"] == pytest.approx(0.75, abs=1e-6)
        # discounting: observed-bigram mass is strictly below MLE
        assert sf["p_kn"] < sf["p_mle"]
    finally:
        orig.createOrReplaceTempView("documents")


def test_kneser_ney_real_corpus_probability_bounds(spark):
    """On the real corpus: every reported probability is in (0, 1] and
    p_kn stays below p_mle + backoff headroom (sanity on the discount
    arithmetic)."""
    out = text.kneser_ney_bigrams(spark).collect()
    assert len(out) == 50
    for r in out:
        assert 0.0 < r["p_kn"] <= 1.0
        assert 0.0 < r["p_mle"] <= 1.0
        assert 0.0 < r["p_cont"] < 1.0


# ---------------------------------------------------------------------------
# emb_silhouette
# ---------------------------------------------------------------------------

from uav_streamprocessor_spark.operators import relational, similarity  # noqa: E402


def _with_embeddings(spark, rows):
    orig = spark.table("embeddings")
    planted = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    planted.createOrReplaceTempView("embeddings")
    return orig


def test_silhouette_separated_vs_misplaced_point(spark):
    """Two tight well-separated clusters → silhouette near 1 and no
    negatives; then a label-0 point sitting ON the label-1 centroid
    must score negative (b < a) — the interleaving that
    centroid_separation alone cannot see."""
    tight = [
        (0, [0.0, 0.0], 0), (1, [0.2, 0.0], 0),
        (2, [10.0, 0.0], 1), (3, [10.2, 0.0], 1),
    ]
    orig = _with_embeddings(spark, tight)
    try:
        out = {r["label"]: r for r in similarity.silhouette_by_label(spark).collect()}
        assert out[0]["avg_silhouette"] > 0.9
        assert out[1]["avg_silhouette"] > 0.9
        assert out[0]["frac_negative"] == 0.0

        misplaced = tight + [(4, [10.1, 0.0], 0)]  # label 0, inside cluster 1
        _with_embeddings(spark, misplaced)
        out2 = {r["label"]: r for r in similarity.silhouette_by_label(spark).collect()}
        assert out2[0]["min_silhouette"] < 0
        assert out2[0]["frac_negative"] == pytest.approx(1 / 3, abs=1e-6)
    finally:
        orig.createOrReplaceTempView("embeddings")


def test_silhouette_degenerate_single_label_zero_guard(spark):
    """With only one label there is no 'other' centroid: b is NULL, so
    the score collapses through the coalesce to the defined-neutral 0.0
    (same convention as the a==b==0 tie) — never a crash."""
    rows = [(0, [1.0, 1.0], 7), (1, [1.0, 1.0], 7)]
    orig = _with_embeddings(spark, rows)
    try:
        out = similarity.silhouette_by_label(spark).collect()
        assert len(out) == 1 and out[0]["n_vecs"] == 2
        assert out[0]["avg_silhouette"] == 0.0
        assert out[0]["frac_negative"] == 0.0
    finally:
        orig.createOrReplaceTempView("embeddings")


# ---------------------------------------------------------------------------
# rel_zone_map_pruning
# ---------------------------------------------------------------------------


def test_zone_map_prunes_planted_layout_exactly(spark):
    """Three planted ship-months: 1997-06 (qty ≤ 45), 1998-03 (has a
    50), 1999-01 (qty ≤ 45, discount 0.2). shipdate_1998 must prune
    exactly the two non-1998 zones; quantity_gt45 the two ≤45 zones;
    discount_05_07 the two zones whose whole range sits OUTSIDE
    [0.05, 0.07] — 1998-03 entirely below it, 1999-01 entirely above —
    while 1997-06 (0.06 inside the band) must survive."""
    li0 = spark.table("lineitem")
    rows = [
        # (orderkey, partkey, suppkey, linenumber, qty, price, disc, tax, rf, ls, shipdate)
        (1, 1, 1, 1, 10.0, 100.0, 0.06, 0.0, "N", "O", "1997-06-10"),
        (2, 1, 1, 1, 45.0, 100.0, 0.06, 0.0, "N", "O", "1997-06-20"),
        (3, 1, 1, 1, 50.0, 100.0, 0.00, 0.0, "N", "O", "1998-03-05"),
        (4, 1, 1, 1, 20.0, 100.0, 0.00, 0.0, "N", "O", "1998-03-06"),
        (5, 1, 1, 1, 30.0, 100.0, 0.20, 0.0, "N", "O", "1999-01-15"),
    ]
    planted = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate_s string",
    ).withColumn("l_shipdate", F.col("l_shipdate_s").cast("timestamp")).drop(
        "l_shipdate_s"
    )
    try:
        planted.createOrReplaceTempView("lineitem")
        out = {r["predicate"]: r
               for r in relational.zone_map_pruning_audit(spark).collect()}
        assert out["shipdate_1998"]["n_zones"] == 3
        assert out["shipdate_1998"]["n_pruned"] == 2
        assert out["shipdate_1998"]["rows_skipped"] == 3  # 2 + 1 rows
        assert out["quantity_gt45"]["n_pruned"] == 2     # 1997-06, 1999-01
        assert out["discount_05_07"]["n_pruned"] == 2    # 1998-03 + 1999-01
        assert all(r["rows_total"] == 5 for r in out.values())
    finally:
        li0.createOrReplaceTempView("lineitem")


def test_zone_map_rows_conserved_on_real_corpus(spark):
    """rows_total is identical across predicates (same zone table) and
    the 1998 clustering-column predicate must skip a large majority of
    zones on the 1995–2001 corpus."""
    out = {r["predicate"]: r
           for r in relational.zone_map_pruning_audit(spark).collect()}
    totals = {r["rows_total"] for r in out.values()}
    assert len(totals) == 1
    ship = out["shipdate_1998"]
    assert ship["zone_prune_ratio"] > 0.7
    assert ship["rows_skipped"] < ship["rows_total"]


# ---------------------------------------------------------------------------
# dedup_winnowing
# ---------------------------------------------------------------------------

from uav_streamprocessor_spark.operators import dedup  # noqa: E402


def test_winnowing_guarantee_shared_substring_yields_shared_fp(spark):
    """The winnowing guarantee (Schleimer et al.): any shared substring
    of length >= k + w - 1 (= 11 at k=8, w=4) must yield at least one
    shared fingerprint — even when the docs are otherwise disjoint."""
    shared = "zqxjkvbwpmyg"  # 12 chars, > k+w-1, alphabet unlike filler
    rows = [
        (1, "aaaa bbbb cccc " + shared + " dddd eeee ffff", "en", "s", 40),
        (2, "1111 2222 3333 4444 " + shared + " 5555 6666", "en", "s", 40),
        (3, "pppp qqqq rrrr ssss tttt uuuu vvvv wwww xxxx", "en", "s", 44),
    ]
    orig = _with_docs(spark, rows)
    try:
        fp = dedup.winnowing_fingerprints(spark).collect()
        by_doc: dict[int, set] = {}
        for r in fp:
            by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
        assert by_doc[1] & by_doc[2], "guarantee violated: no shared fp"
        assert not (by_doc[1] & by_doc[3])
        assert not (by_doc[2] & by_doc[3])
    finally:
        orig.createOrReplaceTempView("documents")


def test_winnowing_identical_docs_score_full_overlap(spark):
    """Byte-identical docs select identical fingerprint sets → exactly
    one pair at overlap 1.0; a disjoint doc pairs with neither."""
    txt = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, txt, "en", "s", len(txt)),
        (2, txt, "en", "s", len(txt)),
        (3, "0000 1111 2222 3333 4444 5555 6666 7777 8888", "en", "s", 44),
    ]
    orig = _with_docs(spark, rows)
    try:
        out = dedup.winnowing_near_duplicates(spark).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["doc_a"], r["doc_b"]) == (1, 2)
        assert r["overlap"] == pytest.approx(1.0)
        assert r["n_shared"] == r["n_fp_a"] == r["n_fp_b"]
    finally:
        orig.createOrReplaceTempView("documents")


def test_winnowing_stop_fingerprint_guard_kills_boilerplate_pairs(spark):
    """30 docs sharing only a boilerplate sentence: its fingerprints
    appear in >25 docs and must be dropped before pairing (the LSH
    hot-bucket analogue), leaving NO pairs — without the guard this
    emits up to 30*29/2 quadratic junk pairs."""
    boiler = "subscribe to our newsletter for updates "
    rows = [
        (i, boiler + f"unique tail {i:04d} " + "x" * (i % 7), "en", "s", 60)
        for i in range(30)
    ]
    orig = _with_docs(spark, rows)
    try:
        out = dedup.winnowing_near_duplicates(spark).collect()
        assert out == []
    finally:
        orig.createOrReplaceTempView("documents")


def test_winnowing_density_matches_theory_on_real_corpus(spark):
    """Winnowing selects ~2/(w+1) of k-gram positions (density 0.4 at
    w=4); allow a generous band since short docs truncate windows."""
    fp_per_doc = (
        dedup.winnowing_fingerprints(spark)
        .groupBy("doc_id")
        .count()
        .join(
            spark.table("documents").select(
                "doc_id", (F.length("text") - 8 + 1).alias("n_grams")
            ),
            "doc_id",
        )
        .selectExpr("avg(count / n_grams) AS density")
        .collect()[0]["density"]
    )
    assert 0.2 < fp_per_doc < 0.6


# ---------------------------------------------------------------------------
# emb_random_projection
# ---------------------------------------------------------------------------


def test_random_projection_single_coordinate_pairs_distort_exactly_one(spark):
    """Vectors differing in ONE coordinate have distortion exactly 1.0
    under ANY ±1/√m sign matrix: d_proj = |δ|·√(Σ_k s_jk²)/√m =
    |δ|·√m/√m. Eleven colinear vectors → all 55 block pairs land in
    bin 1.0 with avg exactly 1.0 — the Parseval check on the
    projection arithmetic."""
    rows = [(i, [float(i * 2)] + [0.0] * 63, 0) for i in range(11)]
    orig = _with_embeddings(spark, rows)
    try:
        out = similarity.random_projection_distortion(spark).collect()
        assert len(out) == 1
        r = out[0]
        assert r["bin"] == 1.0
        assert r["n_pairs"] == 55
        assert r["avg_distortion"] == pytest.approx(1.0, abs=1e-6)
        assert r["min_distortion"] == pytest.approx(1.0, abs=1e-6)
    finally:
        orig.createOrReplaceTempView("embeddings")


def test_random_projection_real_corpus_pair_accounting(spark):
    """Every sampled pair lands in exactly one bin; the bin count total
    equals the cosine-histogram sample (same blocking) minus the
    d_orig=0 exclusions; distortions are strictly positive."""
    rp = similarity.random_projection_distortion(spark).collect()
    ch = similarity.cosine_histogram(spark).collect()
    n_rp = sum(r["n_pairs"] for r in rp)
    n_ch = sum(r["n_pairs"] for r in ch)
    assert 0 < n_rp <= n_ch
    for r in rp:
        assert r["min_distortion"] > 0
        assert r["bin"] <= r["min_distortion"] <= r["max_distortion"]
        assert r["max_distortion"] < r["bin"] + 0.1 + 1e-9


# ---------------------------------------------------------------------------
# text_burstiness / text_keyness
# ---------------------------------------------------------------------------


def test_burstiness_bunched_word_scores_below_spread_word(spark):
    """'bursty' carries 10 tokens in ONE doc of 10, 'spread' one token
    in EACH of 10: same Poisson expectation D(1−e⁻¹) ≈ 6.321, so their
    ratios must straddle 1 exactly as Church–Gale predicts."""
    import math
    rows = (
        [(1, "bursty " * 10, "en", "s", 60)]
        + [(i, "spread filler" + str(i), "en", "s", 10) for i in range(2, 11)]
    )
    # make 'spread' appear once in docs 2..10 AND once in doc 1's tail
    rows[0] = (1, ("bursty " * 10) + "spread", "en", "s", 66)
    orig = _with_docs(spark, rows)
    try:
        out = {r["word"]: r for r in text.word_burstiness(spark).collect()}
        exp = 10 * (1 - math.exp(-1))
        b, s = out["bursty"], out["spread"]
        assert (b["cf"], b["df"]) == (10, 1)
        assert (s["cf"], s["df"]) == (10, 10)
        assert b["expected_df"] == pytest.approx(exp, abs=1e-5)
        assert b["burstiness"] == pytest.approx(1 / exp, abs=1e-5)
        assert s["burstiness"] == pytest.approx(10 / exp, abs=1e-5)
        assert b["burstiness"] < 1 < s["burstiness"]
    finally:
        orig.createOrReplaceTempView("documents")


def test_keyness_hand_computed_g2_and_exclusivity(spark):
    """Two one-doc sources 'ml common' / 'law common': the exclusive
    words get G² = 2·ln 2 ≈ 1.386294 (a=1,b=0,c=2,d=2,E1=0.5) and rank
    first for their OWN source only; the shared word is never enriched
    in either."""
    rows = [
        (1, "ml common", "en", "A", 9),
        (2, "law common", "en", "B", 10),
    ]
    orig = _with_docs(spark, rows)
    try:
        out = text.source_keyness(spark).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r)
        a_words = {r["word"] for r in by_src["A"]}
        assert "ml" in a_words and "law" not in a_words and "common" not in a_words
        top_a = [r for r in by_src["A"] if r["rank"] == 1][0]
        assert top_a["word"] == "ml"
        assert top_a["g2"] == pytest.approx(2 * 0.6931471805599453, abs=1e-5)
        top_b = [r for r in by_src["B"] if r["rank"] == 1][0]
        assert top_b["word"] == "law"
    finally:
        orig.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# rel_bloom_join_audit / emb_knn_label_agreement
# ---------------------------------------------------------------------------


def test_bloom_join_audit_arithmetic_and_monotonicity(spark):
    """match_rows must equal the direct semi-join count; fpr and
    est_probe_out strictly decrease with bits/key; scan_reduction is
    exactly 1 − est/probe for every row."""
    out = sorted(
        relational.bloom_join_audit(spark).collect(),
        key=lambda r: r["bits_per_key"],
    )
    direct = (
        spark.table("orders")
        .join(
            spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .count()
    )
    assert all(r["match_rows"] == direct for r in out)
    fprs = [r["fpr"] for r in out]
    ests = [r["est_probe_out_rows"] for r in out]
    assert fprs == sorted(fprs, reverse=True) and len(set(fprs)) == 3
    assert ests == sorted(ests, reverse=True)
    for r in out:
        assert r["scan_reduction"] == pytest.approx(
            1 - r["est_probe_out_rows"] / r["probe_rows"], abs=1e-4
        )
        assert r["est_probe_out_rows"] >= r["match_rows"]


def test_knn_label_agreement_planted_neighborhoods(spark):
    """Two tight pairs of same-label vectors → agreement 1.0 for both
    labels; inserting a label-0 vector INSIDE cluster 1 flips cluster
    1's nearest neighbors to the intruder (agreement 0) and drops
    label 0 to 2/3 — the local scrambling the centroid screen misses."""
    clean = [
        (0, [0.0, 0.0], 0), (1, [0.1, 0.0], 0),
        (2, [10.0, 0.0], 1), (3, [10.1, 0.0], 1),
    ]
    orig = _with_embeddings(spark, clean)
    try:
        out = {r["label"]: r for r in similarity.knn_label_agreement(spark).collect()}
        assert out[0]["agreement"] == 1.0 and out[1]["agreement"] == 1.0

        _with_embeddings(spark, clean + [(4, [10.05, 0.0], 0)])
        out2 = {r["label"]: r for r in similarity.knn_label_agreement(spark).collect()}
        assert out2[1]["agreement"] == 0.0      # both NNs are the intruder
        assert out2[0]["agreement"] == pytest.approx(2 / 3, abs=1e-6)
    finally:
        orig.createOrReplaceTempView("embeddings")


def test_winnowing_spark_matches_python_mirror_on_corpus(spark):
    """The Spark fingerprint selection equals the pure-python mirror
    (tests/test_properties.winnow_reference) set-for-set on every real
    corpus doc — pinning the SQL window/substring arithmetic (1-based
    positions, full-window filter, hex tie behavior) to the reference
    the fuzzed guarantee property runs against."""
    from tests.test_properties import winnow_reference

    got: dict[int, set] = {}
    for r in dedup.winnowing_fingerprints(spark).collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    docs = spark.table("documents").select("doc_id", "text").collect()
    assert len(docs) > 50
    for d in docs:
        assert got.get(d["doc_id"], set()) == winnow_reference(d["text"]), d["doc_id"]


# ---------------------------------------------------------------------------
# ev_cohort_ltv / ev_wilson_ci
# ---------------------------------------------------------------------------


def test_cohort_ltv_two_cohorts_exact_curve_with_gap(spark):
    """Cohort A (day 1): 100 then nothing then 50 → curve 100, 100, 150
    per user (the gap week must appear with period 0 and a FLAT cum);
    cohort B (day 8): 30 → single point. Non-purchase events shape
    cohorts but add no value."""
    rows = [
        # cohort A = u10 (signup day 1, week w), purchases at w, w+2
        _ev(0, 1, 10, "purchase", 100.0),
        _ev(1, 15, 10, "purchase", 50.0),
        # cohort B = u11 (signup day 8 = next week), one purchase
        _ev(2, 8, 11, "purchase", 30.0),
        _ev(3, 9, 11, "view", 999.0),
    ]
    orig = _with_events(spark, rows)
    try:
        out = events_ops.cohort_ltv_curve(spark).collect()
        cohorts = sorted({r["cohort_w"] for r in out})
        assert len(cohorts) == 2
        a = [r for r in out if r["cohort_w"] == cohorts[0]]
        b = [r for r in out if r["cohort_w"] == cohorts[1]]
        assert [(r["age_w"], r["period_value"], r["cum_ltv_per_user"]) for r in a] == [
            (0, 100.0, 100.0),
            (1, 0.0, 100.0),     # gap week materialized, curve flat
            (2, 50.0, 150.0),
        ]
        assert [(r["age_w"], r["cum_ltv_per_user"]) for r in b] == [(0, 30.0)]
        assert all(r["n_users"] == 1 for r in out)
    finally:
        orig.createOrReplaceTempView("events")


def test_wilson_ci_brackets_p_and_never_collapses_at_zero(spark):
    """An all-converter arm and a zero-converter arm: the Wald interval
    is zero-width at both; Wilson must stay strictly inside [0, 1] with
    positive width, lo exactly 0 at p=0 and hi exactly 1 at p=1."""
    rows = []
    eid = 0
    for u in (2, 4):       # variant 0: 20 purchases each -> converted
        for i in range(20):
            rows.append(_ev(eid, 1 + (i % 9), u, "purchase", 1.0)); eid += 1
    for u in (1, 3):       # variant 1: views only -> not converted
        rows.append(_ev(eid, 1, u, "view", 1.0)); eid += 1
    orig = _with_events(spark, rows)
    try:
        out = {r["variant"]: r for r in events_ops.wilson_conversion_ci(spark).collect()}
        v0, v1 = out[0], out[1]
        assert v0["conversion"] == 1.0 and v1["conversion"] == 0.0
        assert v0["wilson_hi"] == pytest.approx(1.0, abs=1e-9)
        assert 0 < v0["wilson_lo"] < 1.0          # positive width at p=1
        assert v1["wilson_lo"] == pytest.approx(0.0, abs=1e-9)
        assert 0 < v1["wilson_hi"] < 1.0          # positive width at p=0
        # hand check v0's lower bound: n=2, x=2, z=1.959964
        import math
        z = 1.959964; n = 2.0; p = 1.0
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z / denom * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        assert v0["wilson_lo"] == pytest.approx(center - half, abs=1e-5)
    finally:
        orig.createOrReplaceTempView("events")


def test_wilson_ci_real_corpus_brackets_conversion(spark):
    out = events_ops.wilson_conversion_ci(spark).collect()
    assert len(out) == 2
    for r in out:
        assert 0.0 <= r["wilson_lo"] < r["conversion"] < r["wilson_hi"] <= 1.0


def test_distinct_ngrams_approx_tracks_exact_within_rsd_budget(spark):
    """The approx twin must agree with the exact op on group keys and
    totals exactly, and on distinct counts within 3× the configured 2%
    rsd — measuring the 100 TB swap's cost instead of asserting it."""
    exact = {(r["source"], r["n"]): r
             for r in text.distinct_ngram_diversity(spark).collect()}
    approx = {(r["source"], r["n"]): r
              for r in text.distinct_ngram_diversity_approx(spark).collect()}
    assert set(exact) == set(approx)
    for k, e in exact.items():
        a = approx[k]
        assert a["n_total"] == e["n_total"], k  # totals are exact either way
        rel = abs(a["n_distinct_approx"] - e["n_distinct"]) / e["n_distinct"]
        assert rel <= 0.06, (k, a["n_distinct_approx"], e["n_distinct"])


# ---------------------------------------------------------------------------
# ev_behavior_entropy / text_js_divergence
# ---------------------------------------------------------------------------


def test_behavior_entropy_flags_single_minded_not_uniform(spark):
    """A 40-event single-type user reads entropy exactly 0 and flags;
    a 30-event uniform 3-type user reads normalized entropy exactly 1
    and passes; a 5-event user is below min_events and absent."""
    import math
    rows = []
    eid = 0
    for i in range(40):
        rows.append(_ev(eid, 1 + i % 9, 100, "view")); eid += 1
    for t in ("view", "click", "purchase"):
        for i in range(10):
            rows.append(_ev(eid, 1 + i % 9, 101, t)); eid += 1
    for i in range(5):
        rows.append(_ev(eid, 1, 102, "view")); eid += 1
    orig = _with_events(spark, rows)
    try:
        out = {r["user_id"]: r
               for r in events_ops.behavior_entropy_screen(spark).collect()}
        assert set(out) == {100, 101}
        bot, human = out[100], out[101]
        assert bot["entropy"] == 0.0 and bot["entropy_norm"] == 0.0
        assert bot["low_entropy_flag"] is True
        assert human["entropy"] == pytest.approx(math.log(3), abs=1e-6)
        assert human["entropy_norm"] == pytest.approx(1.0, abs=1e-6)
        assert human["low_entropy_flag"] is False
    finally:
        orig.createOrReplaceTempView("events")


def test_js_divergence_zero_for_clones_ln2_for_disjoint(spark):
    """Identical distributions → JSD exactly 0; disjoint vocabularies →
    exactly ln 2 (the maximum); a half-overlapping pair sits strictly
    between."""
    import math
    rows = [
        (1, "alpha beta gamma", "en", "A", 16),
        (2, "alpha beta gamma", "en", "B", 16),   # clone of A
        (3, "delta epsilon zeta", "en", "C", 18), # disjoint from A/B
        (4, "alpha beta delta epsilon", "en", "D", 24),  # half overlap w/ A
    ]
    orig = _with_docs(spark, rows)
    try:
        out = {(r["source_a"], r["source_b"]): r
               for r in text.source_js_divergence(spark).collect()}
        assert len(out) == 6
        assert out[("A", "B")]["jsd_nats"] == 0.0
        assert out[("A", "C")]["jsd_nats"] == pytest.approx(math.log(2), abs=1e-6)
        assert out[("A", "C")]["n_words_union"] == 6
        mid = out[("A", "D")]["jsd_nats"]
        assert 0.0 < mid < math.log(2)
        for r in out.values():  # bounded by ln 2 everywhere
            assert 0.0 <= r["jsd_nats"] <= math.log(2) + 1e-9
    finally:
        orig.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# ev_funnel_windowed / ev_markov_absorption
# ---------------------------------------------------------------------------


def _ev_t(eid, day, hour, user, etype):
    return (eid, f"2099-06-{day:02d} {hour:02d}:00:00", user, etype, 1.0, "{}")


def test_funnel_windowed_enforces_the_attribution_window(spark):
    """u1 completes inside 24h (depth 3); u2's click lands 30h after
    the view (outside → depth 1); u3 clicks in-window but purchases
    30h after the view (outside → depth 2). The unwindowed funnel
    would count all three journeys complete or deeper."""
    rows = [
        _ev_t(0, 1, 6, 1, "view"), _ev_t(1, 1, 7, 1, "click"),
        _ev_t(2, 1, 8, 1, "purchase"),
        _ev_t(3, 1, 6, 2, "view"), _ev_t(4, 2, 12, 2, "click"),   # +30h
        _ev_t(5, 1, 6, 3, "view"), _ev_t(6, 1, 7, 3, "click"),
        _ev_t(7, 2, 12, 3, "purchase"),                            # +30h
    ]
    orig = _with_events(spark, rows)
    try:
        r = events_ops.funnel_windowed(spark).collect()[0]
        assert r["n_viewed"] == 3
        assert r["n_clicked_in_window"] == 2       # u1, u3
        assert r["n_purchased_in_window"] == 1     # u1 only
        assert r["view_to_click_rate"] == pytest.approx(2 / 3, abs=1e-6)
        assert r["full_funnel_rate"] == pytest.approx(1 / 3, abs=1e-6)
    finally:
        orig.createOrReplaceTempView("events")


def test_markov_absorption_solves_planted_chain_exactly(spark):
    """view→click always; click→purchase 2/3, click→(end) 1/3:
    p_conversion must read exactly 2/3 from BOTH transient states
    (view feeds click deterministically) and expected transient steps
    2 (view) / 1 (click). Post-purchase events must not leak back in
    (u1 gets a view AFTER purchasing — truncation must drop it)."""
    rows = [
        _ev_t(0, 1, 6, 1, "view"), _ev_t(1, 1, 7, 1, "click"),
        _ev_t(2, 1, 8, 1, "purchase"), _ev_t(3, 1, 9, 1, "view"),  # truncated
        _ev_t(4, 1, 6, 2, "view"), _ev_t(5, 1, 7, 2, "click"),
        _ev_t(6, 1, 8, 2, "purchase"),
        _ev_t(7, 1, 6, 3, "view"), _ev_t(8, 1, 7, 3, "click"),     # drop
    ]
    orig = _with_events(spark, rows)
    try:
        out = {r["state"]: r for r in events_ops.markov_absorption(spark).collect()}
        assert set(out) == {"view", "click"}
        for s in ("view", "click"):
            r = out[s]
            assert r["p_conversion"] == pytest.approx(2 / 3, abs=1e-6)
            assert r["p_drop"] == pytest.approx(1 / 3, abs=1e-6)
            assert r["p_conversion"] + r["p_drop"] == pytest.approx(1.0, abs=1e-6)
        assert out["view"]["expected_steps"] == pytest.approx(2.0, abs=1e-6)
        assert out["click"]["expected_steps"] == pytest.approx(1.0, abs=1e-6)
    finally:
        orig.createOrReplaceTempView("events")


def test_markov_absorption_rows_stochastic_on_real_corpus(spark):
    """Every transient state's absorption probabilities sum to 1 (the
    chain has no other exit) and expected steps are >= 1."""
    out = events_ops.markov_absorption(spark).collect()
    assert out
    for r in out:
        assert r["p_conversion"] + r["p_drop"] == pytest.approx(1.0, abs=1e-5)
        assert r["expected_steps"] >= 1.0 - 1e-9


# ---------------------------------------------------------------------------
# boundary exactness (the off-by-one class oracle parity can mask when
# both sides drift together)
# ---------------------------------------------------------------------------


def test_kaplan_meier_censor_boundary_is_strictly_less_than(spark):
    """censor_days=3: a user whose last event sits EXACTLY 3 days
    before the corpus end is NOT censored (datediff < 3, not <=) —
    they churned; 2 days before IS censored."""
    rows = [
        _ev(0, 1, 2), _ev(1, 27, 2),   # 3 days before the 30th → churn
        _ev(2, 1, 4), _ev(3, 28, 4),   # 2 days before → censored
        _ev(4, 30, 6),                 # pins obs_end at the 30th
    ]
    orig = _with_events(spark, rows)
    try:
        out = {(r["variant"], r["t_days"]): r
               for r in events_ops.kaplan_meier_survival(spark, censor_days=3).collect()}
        assert out[(0, 26)]["n_churned"] == 1 and out[(0, 26)]["n_censored"] == 0
        assert out[(0, 27)]["n_churned"] == 0 and out[(0, 27)]["n_censored"] == 1
    finally:
        orig.createOrReplaceTempView("events")


def test_diff_in_diff_midpoint_day_lands_in_post(spark):
    """Span days 1..9 → split offset floor(8/2)=4: an event EXACTLY on
    day 5 (offset 4) is POST (>=, not >) — the fencepost both engines
    must share."""
    rows = [
        _ev(0, 1, 10, "purchase", 7.0),   # pre
        _ev(1, 5, 10, "purchase", 11.0),  # exactly at the midpoint → post
        _ev(2, 9, 11, "purchase", 3.0),   # pins max day
    ]
    orig = _with_events(spark, rows)
    try:
        cells = {(r["variant"], r["period"]): r
                 for r in events_ops.diff_in_diff_readout(spark).collect()}
        assert cells[(0, 0)]["mean_y"] == pytest.approx(7.0)
        assert cells[(0, 1)]["mean_y"] == pytest.approx(11.0)
    finally:
        orig.createOrReplaceTempView("events")


def test_funnel_window_deadline_is_inclusive(spark):
    """A click landing EXACTLY 24h after the view counts (<=); one
    second later does not."""
    rows = [
        (0, "2099-06-01 06:00:00", 1, "view", 1.0, "{}"),
        (1, "2099-06-02 06:00:00", 1, "click", 1.0, "{}"),      # exactly +24h
        (2, "2099-06-01 06:00:00", 2, "view", 1.0, "{}"),
        (3, "2099-06-02 06:00:01", 2, "click", 1.0, "{}"),      # +24h 1s
    ]
    orig = _with_events(spark, rows)
    try:
        r = events_ops.funnel_windowed(spark).collect()[0]
        assert r["n_viewed"] == 2
        assert r["n_clicked_in_window"] == 1
    finally:
        orig.createOrReplaceTempView("events")
