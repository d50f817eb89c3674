"""Round-7 curation additions: split leakage, source quota, length
buckets, exact source overlap. Each gets a planted positive (the
perturbation proves the op bites) plus corpus-level invariants; DuckDB
value parity rides the registry oracles in test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uav_streamprocessor_spark.fixtures import register_uav_views
from uav_streamprocessor_spark.operators import dedup, text

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _views(spark):
    register_uav_views(spark, SF_SMALL)


def _with_docs(spark, rows):
    """Swap the documents view for planted rows; returns the original."""
    orig = spark.table("documents")
    planted = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    planted.createOrReplaceTempView("documents")
    return orig


# ---------------------------------------------------------------------------
# dedup_split_leakage
# ---------------------------------------------------------------------------

def test_split_leakage_reports_planted_cross_split_pair_only(spark):
    """A near-identical pair straddling train(7)/test(9) must be
    reported; an equally similar pair inside train (1,2) must NOT."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base + " mu", "en", "s", len(base) + 3),   # train+train near-dup
        (7, base + " nu", "en", "s", len(base) + 3),   # train
        (9, base + " xi", "en", "s", len(base) + 3),   # test
        (40, "totally different words entirely unrelated content here now",
         "en", "s", 58),
    ]
    orig = _with_docs(spark, rows)
    try:
        out = {(r["doc_id_a"], r["doc_id_b"]): r
               for r in dedup.split_leakage_pairs(spark).collect()}
        assert (7, 9) in out
        r = out[(7, 9)]
        assert (r["split_a"], r["split_b"]) == ("train", "test")
        assert r["jaccard3"] > 0.5
        assert (1, 2) not in out  # same-split pair excluded
    finally:
        orig.createOrReplaceTempView("documents")


def test_split_assignment_is_80_10_10(spark):
    counts = dict(
        spark.table("documents")
        .select(dedup.doc_split().alias("split"))
        .groupBy("split").count().collect()
    )
    n = sum(counts.values())
    assert counts["train"] == pytest.approx(0.8 * n, rel=0.1)
    assert counts["val"] == pytest.approx(0.1 * n, rel=0.3)
    assert counts["test"] == pytest.approx(0.1 * n, rel=0.3)


# ---------------------------------------------------------------------------
# text_source_quota
# ---------------------------------------------------------------------------

def test_source_quota_caps_each_source(spark):
    out = text.source_quota(spark, cap=10)
    per = out.groupBy("source").agg(
        F.sum("kept").alias("n_kept"), F.count(F.lit(1)).alias("n_docs")
    ).collect()
    for r in per:
        assert r["n_kept"] == min(10, r["n_docs"])
    # rank 1 is the longest doc of its source
    top = out.filter("quota_rank = 1").join(
        spark.table("documents").select("doc_id", F.col("n_chars")), "doc_id"
    )
    mx = spark.table("documents").groupBy("source").agg(
        F.max("n_chars").alias("mx"))
    joined = top.join(mx, "source").collect()
    assert joined and all(r["n_chars"] == r["mx"] for r in joined)


def test_source_quota_drops_planted_flood(spark):
    """A source flooded with 50 short docs keeps exactly the cap, and the
    kept set is the longest-by-length prefix."""
    rows = [(i, f"doc {i} " + "x" * (i % 7), "en", "flood", 20 + (i % 7))
            for i in range(50)]
    rows += [(100 + i, "small source doc", "en", "tiny", 16) for i in range(3)]
    orig = _with_docs(spark, rows)
    try:
        out = text.source_quota(spark, cap=10).collect()
        flood = [r for r in out if r["source"] == "flood"]
        assert sum(r["kept"] for r in flood) == 10
        kept_min = min(r["quota_rank"] for r in flood if not r["kept"])
        assert kept_min == 11  # drop region starts right after the cap
        tiny = [r for r in out if r["source"] == "tiny"]
        assert all(r["kept"] == 1 for r in tiny)
    finally:
        orig.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# text_length_buckets
# ---------------------------------------------------------------------------

def test_length_buckets_partition_and_waste_invariants(spark):
    out = text.length_buckets(spark).collect()
    per_lang_docs = dict(
        spark.table("documents").groupBy("lang").count().collect()
    )
    got = {}
    for r in out:
        assert r["padding_waste"] == r["max_chars"] * r["n_docs"] - r["sum_chars"]
        assert r["padding_waste"] >= 0
        assert r["min_chars"] <= r["max_chars"]
        got[r["lang"]] = got.get(r["lang"], 0) + r["n_docs"]
    assert got == per_lang_docs
    # buckets are length-ordered within a lang: bucket k's max <= k+1's min
    # (ties may straddle, so compare max to max)
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for rs in by_lang.values():
        rs.sort(key=lambda r: r["bucket"])
        for a, b in zip(rs, rs[1:]):
            assert a["max_chars"] <= b["max_chars"]


def test_length_buckets_zero_waste_on_uniform_lengths(spark):
    rows = [(i, "word " * 10, "xx", "s", 50) for i in range(16)]
    orig = _with_docs(spark, rows)
    try:
        out = text.length_buckets(spark, n_buckets=4).collect()
        assert len(out) == 4
        assert all(r["padding_waste"] == 0 for r in out)
        assert all(r["n_docs"] == 4 for r in out)
    finally:
        orig.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# text_source_overlap
# ---------------------------------------------------------------------------

def test_source_overlap_full_containment_on_cloned_source(spark):
    """Cloning one source's docs into a second source must yield
    containment 1.0 both ways for that pair, and ~0 for an unrelated
    source with disjoint vocabulary."""
    doc = "one two three four five six seven eight nine ten"
    rows = [
        (1, doc, "en", "orig", len(doc)),
        (2, doc, "en", "clone", len(doc)),
        (3, "apfel birne kirsche pflaume traube zitrone melone banane kiwi mango",
         "de", "other", 66),
    ]
    orig = _with_docs(spark, rows)
    try:
        out = {(r["source_a"], r["source_b"]): r
               for r in text.source_overlap_exact(spark).collect()}
        r = out[("clone", "orig")]
        assert r["containment_a"] == 1.0 and r["containment_b"] == 1.0
        assert ("orig", "other") not in out  # disjoint vocab -> no shared grams
        assert ("clone", "other") not in out
    finally:
        orig.createOrReplaceTempView("documents")


def test_source_overlap_symmetric_bounds_on_corpus(spark):
    rows = text.source_overlap_exact(spark).collect()
    assert rows
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 < r["containment_a"] <= 1.0
        assert 0 < r["containment_b"] <= 1.0
        assert r["n_shared_grams"] > 0


# ---------------------------------------------------------------------------
# dedup_containment
# ---------------------------------------------------------------------------

def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    """A short doc quoted verbatim inside a much longer one must show
    containment_ab ≈ 1.0 from the short side while jaccard3 stays below
    a 0.5 threshold — the dup class the directional measure exists for."""
    short = "the quick brown fox jumps over the lazy dog today"
    filler = " ".join(f"filler{i} word{i} extra{i}" for i in range(40))
    rows = [
        (1, short, "en", "s", len(short)),
        (2, filler + " " + short + " " + filler, "en", "s", 500),
        (40, "unrelated totally different content entirely", "en", "s", 44),
    ]
    orig = _with_docs(spark, rows)
    try:
        out = {(r["doc_id_a"], r["doc_id_b"]): r
               for r in dedup.containment_pairs(spark).collect()}
        r = out[(1, 2)]
        assert r["containment_ab"] == 1.0          # short fully inside long
        assert r["containment_ba"] < 0.3           # long barely inside short
        assert r["jaccard3"] < 0.5                 # symmetric measure dilutes
    finally:
        orig.createOrReplaceTempView("documents")


def test_containment_excludes_gramless_docs_and_bounds(spark):
    """Docs shorter than n words carry no grams: containment against an
    empty set must yield NO pair, not a 1.0; corpus rows stay in (0,1]."""
    rows = [
        (1, "ab", "en", "s", 2),        # gram-less (1 word)
        (2, "ab cd", "en", "s", 5),     # gram-less (2 words)
        (3, "one two three four five", "en", "s", 23),
        (4, "one two three four five", "en", "s", 23),
    ]
    orig = _with_docs(spark, rows)
    try:
        out = dedup.containment_pairs(spark).collect()
        ids = {(r["doc_id_a"], r["doc_id_b"]) for r in out}
        assert ids == {(3, 4)}  # only the gram-bearing identical pair
        r = out[0]
        assert r["containment_ab"] == 1.0 == r["containment_ba"]
    finally:
        orig.createOrReplaceTempView("documents")
    rows = dedup.containment_pairs(spark).collect()
    for r in rows:
        assert 0 < r["containment_ab"] <= 1.0
        assert 0 < r["containment_ba"] <= 1.0
        assert r["jaccard3"] <= min(r["containment_ab"], r["containment_ba"])


# ---------------------------------------------------------------------------
# rel_compaction_plan
# ---------------------------------------------------------------------------

def test_compaction_plan_conserves_bytes_and_numbers_bins(spark):
    from uav_streamprocessor_spark.operators import relational

    plan = relational.compaction_plan(spark).collect()
    docs_bytes = dict(
        spark.table("documents").groupBy("source")
        .agg(F.sum("n_chars").alias("b")).collect()
    )
    by_source = {}
    for r in plan:
        by_source.setdefault(r["source"], []).append(r)
    for src, bins in by_source.items():
        assert sum(r["total_bytes"] for r in bins) == docs_bytes[src]
        ids = sorted(r["bin_id"] for r in bins)
        assert ids == list(range(len(ids)))  # contiguous from 0
        for r in bins:
            assert r["fill_ratio"] == pytest.approx(r["total_bytes"] / 4000, abs=1e-6)


def test_compaction_plan_next_fit_on_uniform_files(spark):
    """16 files of 1000 bytes at target 4000 → four bins of exactly 4
    files / 4000 bytes (fill 1.0): the boundary arithmetic is exact."""
    rows = [(i, "x", "en", "s", 1000) for i in range(16)]
    orig = _with_docs(spark, rows)
    try:
        from uav_streamprocessor_spark.operators import relational
        plan = relational.compaction_plan(spark, target_bytes=4000).collect()
        assert len(plan) == 4
        assert all(r["n_files"] == 4 and r["total_bytes"] == 4000
                   and r["fill_ratio"] == 1.0 for r in plan)
    finally:
        orig.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# ev_mad_outliers
# ---------------------------------------------------------------------------

def test_mad_flags_planted_spike_not_flat_series(spark):
    """A 10x spike day over a stable baseline must flag; a perfectly
    flat series (MAD=0) must produce NO flags and NULL robust_z rather
    than dividing by zero."""
    ev0 = spark.table("events")
    rows = []
    eid = 0
    for d in range(1, 29):
        n = 1000 if d == 15 else (100 + (d % 3))  # spiky type
        for i in range(n):
            rows.append((eid, f"2099-03-{d:02d} 12:00:00", 1, "spiky", 1.0, "{}"))
            eid += 1
        for i in range(50):  # flat type
            rows.append((eid, f"2099-03-{d:02d} 13:00:00", 1, "flat", 1.0, "{}"))
            eid += 1
    planted = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, "
              "value double, props string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value", "props")
    try:
        planted.createOrReplaceTempView("events")
        from uav_streamprocessor_spark.operators import events_ops
        out = events_ops.mad_outlier_days(spark).collect()
        spiky = [r for r in out if r["event_type"] == "spiky"]
        flagged = [r for r in spiky if r["is_outlier"]]
        assert len(flagged) == 1 and str(flagged[0]["day"]) == "2099-03-15"
        flat = [r for r in out if r["event_type"] == "flat"]
        assert all(r["is_outlier"] == 0 for r in flat)
        assert all(r["robust_z"] is None for r in flat)  # MAD=0 guard
    finally:
        ev0.createOrReplaceTempView("events")


# ---------------------------------------------------------------------------
# emb_cosine_histogram
# ---------------------------------------------------------------------------

def test_cosine_histogram_bins_planted_extremes(spark):
    """Identical vectors in one block must land in bin 1.0; orthogonal
    vectors in bin 0.0; pair counts conserve the block-sample size."""
    e0 = spark.table("embeddings")
    dim = 4
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 0.0, 0.0, 0.0], 0),   # identical to 0 -> cos 1.0
        (2, [0.0, 1.0, 0.0, 0.0], 1),   # orthogonal to both -> cos 0.0
    ]
    planted = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    try:
        planted.createOrReplaceTempView("embeddings")
        from uav_streamprocessor_spark.operators import similarity
        out = {r["bin"]: r for r in similarity.cosine_histogram(spark).collect()}
        assert out[1.0]["n_pairs"] == 1          # the identical pair
        assert out[0.0]["n_pairs"] == 2          # the two orthogonal pairs
        assert sum(r["n_pairs"] for r in out.values()) == 3
        assert out[1.0]["avg_cosine"] == 1.0
    finally:
        e0.createOrReplaceTempView("embeddings")


def test_cosine_histogram_corpus_conservation(spark):
    from uav_streamprocessor_spark.operators import similarity

    out = similarity.cosine_histogram(spark).collect()
    n = spark.table("embeddings").count()
    width = 25
    expected_pairs = sum(min(width, n - 1 - i) for i in range(n))
    assert sum(r["n_pairs"] for r in out) == expected_pairs
    for r in out:
        assert r["bin"] - 1e-9 <= r["min_cosine"] <= r["max_cosine"] < r["bin"] + 0.1 + 1e-9


# ---------------------------------------------------------------------------
# ev_bounce_rate
# ---------------------------------------------------------------------------

def test_bounce_rate_exact_on_planted_sessions(spark):
    """One user with 2 single-event sessions + 1 three-event session on
    one day → bounce rate exactly 2/3; session gap boundary (30 min)
    respected."""
    ev0 = spark.table("events")
    rows = [
        (1, "2099-05-01 08:00:00"),   # bounce 1
        (2, "2099-05-01 10:00:00"),   # bounce 2
        (3, "2099-05-01 12:00:00"),   # session of 3 (gaps < 30 min)
        (4, "2099-05-01 12:10:00"),
        (5, "2099-05-01 12:39:00"),
    ]
    planted = spark.createDataFrame(
        [(i, t, 7, "view", 1.0, "{}") for i, t in rows],
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value", "props")
    try:
        planted.createOrReplaceTempView("events")
        from uav_streamprocessor_spark.operators import events_ops
        out = events_ops.bounce_rate_daily(spark).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_sessions"] == 3 and r["n_bounces"] == 2
        assert r["bounce_rate"] == pytest.approx(2 / 3, abs=1e-6)
        assert r["avg_session_events"] == pytest.approx(5 / 3, abs=1e-6)
    finally:
        ev0.createOrReplaceTempView("events")


def test_bounce_rate_conserves_sessions(spark):
    from uav_streamprocessor_spark.operators import events_ops

    out = events_ops.bounce_rate_daily(spark)
    total = out.agg(F.sum("n_sessions")).first()[0]
    sess = events_ops.sessionize_gap_method(spark).count()
    assert total == sess


# ---------------------------------------------------------------------------
# text_chunk_manifest
# ---------------------------------------------------------------------------

def test_chunk_manifest_covers_tokens_with_exact_overlap(spark):
    """A 120-token doc at size 64 / overlap 8 (stride 56) must produce
    chunks [0,64) and [56,120): full coverage, exactly 8 overlapping
    tokens, no token past n_tokens; a 5-token doc gets one short chunk."""
    rows = [
        (1, " ".join(f"t{i}" for i in range(120)), "en", "s", 120 * 4),
        (2, "a b c d e", "en", "s", 9),
    ]
    orig = _with_docs(spark, rows)
    try:
        out = {}
        for r in text.chunk_manifest(spark).collect():
            out.setdefault(r["doc_id"], []).append(r)
        c1 = sorted(out[1], key=lambda r: r["chunk_id"])
        assert [(r["start_token"], r["end_token"]) for r in c1] == [(0, 64), (56, 120)]
        assert c1[0]["end_token"] - c1[1]["start_token"] == 8  # the overlap
        c2 = out[2]
        assert len(c2) == 1
        assert (c2[0]["start_token"], c2[0]["end_token"], c2[0]["n_chunk_tokens"]) \
            == (0, 5, 5)
    finally:
        orig.createOrReplaceTempView("documents")


def test_chunk_manifest_corpus_invariants(spark):
    rows = text.chunk_manifest(spark).collect()
    toks = dict(
        spark.table("documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    )
    per = {}
    for r in rows:
        per.setdefault(r["doc_id"], []).append(r)
        assert r["n_chunk_tokens"] == r["end_token"] - r["start_token"] > 0
    assert set(per) == set(toks)
    for did, cs in per.items():
        cs.sort(key=lambda r: r["chunk_id"])
        assert cs[0]["start_token"] == 0
        assert cs[-1]["end_token"] == toks[did]
        for a, b in zip(cs, cs[1:]):
            assert b["start_token"] < a["end_token"]  # overlap, no gaps


# ---------------------------------------------------------------------------
# emb_pca_spectrum
# ---------------------------------------------------------------------------

def test_pca_spectrum_recovers_planted_single_direction(spark):
    """Embeddings varying along exactly ONE axis must yield one dominant
    eigenvalue carrying ~100% of the variance."""
    e0 = spark.table("embeddings")
    rows = [(i, [float(i), 5.0, 5.0, 5.0], 0) for i in range(20)]
    planted = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    try:
        planted.createOrReplaceTempView("embeddings")
        from uav_streamprocessor_spark.operators import similarity
        out = sorted(similarity.pca_spectrum(spark).collect(),
                     key=lambda r: r["component"])
        assert out[0]["explained_ratio"] == pytest.approx(1.0, abs=1e-6)
        assert all(abs(r["eigenvalue"]) < 1e-6 for r in out[1:])
        # exact variance of 0..19 along the active axis: (n²-1)/12
        assert out[0]["eigenvalue"] == pytest.approx((20**2 - 1) / 12, abs=1e-4)
    finally:
        e0.createOrReplaceTempView("embeddings")


def test_pca_jacobi_converges_with_sweep_margin(spark):
    """The full oracle replays PCA_JACOBI_SWEEPS (10) sweeps; pin the
    margin: the off-diagonal mass of the quantized Jacobi must already
    be EXACTLY zero two sweeps earlier (snapped rotations hit a fixed
    point once every off-diagonal entry snaps to 0), and the converged
    diagonal must match LAPACK on the same quantized covariance to
    1e-9 — so the fixed round count is measured, not guessed."""
    import numpy as np

    from uav_streamprocessor_spark.operators import similarity

    n, dim, A0 = similarity._pca_quantized_cov(spark)
    A = similarity._pca_quantized_jacobi(
        A0, (similarity.PCA_JACOBI_SWEEPS - 2) * (A0.shape[0] - 1)
    )
    off = A - np.diag(np.diag(A))
    assert np.abs(off).max() == 0.0
    got = np.sort(np.diag(A))[::-1]
    want = np.linalg.eigvalsh(A0)[::-1]
    assert np.abs(got - want).max() < 1e-9


def test_pca_spectrum_trace_matches_total_variance(spark):
    """Σ eigenvalues == Σ per-dimension population variance (trace
    invariant) — the emb_pca_trace_identity shadow's arithmetic, kept
    alongside the full r15 Jacobi-replay oracle."""
    from uav_streamprocessor_spark.operators import similarity

    out = similarity.pca_spectrum(spark).collect()
    trace = sum(r["eigenvalue"] for r in out)
    flat = spark.table("embeddings").select(
        F.posexplode(F.col("embedding").cast("array<double>"))
    ).toDF("pos", "v")
    total_var = flat.groupBy("pos").agg(F.var_pop("v").alias("v")) \
        .agg(F.sum("v")).first()[0]
    assert trace == pytest.approx(total_var, rel=1e-3)
    rs = sorted(out, key=lambda r: r["component"])
    assert all(a["eigenvalue"] >= b["eigenvalue"] - 1e-9 for a, b in zip(rs, rs[1:]))
    assert rs[-1]["cumulative_ratio"] == pytest.approx(1.0, abs=1e-4)


def test_pca_partials_tree_combine_is_exact(spark, monkeypatch):
    """The bounded-collect tree path (partition count above
    PCA_PARTIALS_DIRECT_PARTS → fixed-fan-in combine of the tiny partial
    rows, VERDICT r15 'What's wrong' #2) must produce the BIT-IDENTICAL
    quantized covariance: the combine is exact Python-int addition, so
    partitioning and combine order can't move a single grid cell."""
    import numpy as np

    from uav_streamprocessor_spark.operators import similarity

    n0, dim0, A_direct = similarity._pca_quantized_cov(spark)
    e0 = spark.table("embeddings")
    try:
        e0.repartition(7).createOrReplaceTempView("embeddings")
        monkeypatch.setattr(similarity, "PCA_PARTIALS_DIRECT_PARTS", 1)
        monkeypatch.setattr(similarity, "PCA_TREE_COMBINERS", 3)
        n1, dim1, A_tree = similarity._pca_quantized_cov(spark)
    finally:
        e0.createOrReplaceTempView("embeddings")
    assert (n0, dim0) == (n1, dim1)
    assert np.array_equal(A_direct, A_tree)


def test_pca_spectrum_width_guard_fails_loudly(spark):
    """The registered emb_pca_spectrum surface pins the oracle's baked-in
    width: a non-64 embedding table must raise the regenerate-the-oracle
    error, not surface as a parity mismatch (ADVICE r15)."""
    from uav_streamprocessor_spark.operators import similarity

    e0 = spark.table("embeddings")
    rows = [(i, [float(i), 1.0, 2.0, 3.0], 0) for i in range(8)]
    try:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).createOrReplaceTempView("embeddings")
        with pytest.raises(ValueError, match="regenerate"):
            similarity.pca_spectrum(
                spark, expected_dim=similarity.PCA_ORACLE_DIM
            )
    finally:
        e0.createOrReplaceTempView("embeddings")
