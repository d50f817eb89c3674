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
