"""Behavioral invariants + perturbation controls for the round-5 second
batch of operators (VERDICT r4 #8 pattern: every new op ships with a
perturbed-input positive control proving its gate/threshold bites;
value-level correctness is the DuckDB oracle's job in
test_oracle_parity.py / PARITY artifacts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uav_streamprocessor_spark.fixtures import register_uav_views
from uav_streamprocessor_spark.operators import similarity

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _views(spark):
    register_uav_views(spark, SF_SMALL)


# ---------------------------------------------------------------------------
# emb_semantic_decontam
# ---------------------------------------------------------------------------

def test_semantic_decontam_threshold_monotone_and_excludes_test_set(spark):
    loose = similarity.semantic_decontamination(spark, threshold=0.30).collect()
    # derive the tighter threshold from the observed score distribution
    # (not a corpus-shape literal — ADVICE r4): median of the loose hits
    # splits them, so the tight run must return a strict non-empty subset
    cosines = sorted(r["cosine"] for r in loose)
    assert len(cosines) >= 2 and cosines[0] < cosines[-1]
    mid = cosines[len(cosines) // 2]
    tight = similarity.semantic_decontamination(spark, threshold=mid).collect()
    assert 0 < len(tight) < len(loose)
    assert {r["vec_id"] for r in tight} < {r["vec_id"] for r in loose}
    # held-out vectors are never flagged as their own contamination
    for r in loose:
        assert r["vec_id"] % 50 != 0
        assert r["closest_test_id"] % 50 == 0
        assert r["cosine"] >= 0.30
    # an impossible threshold yields nothing
    assert similarity.semantic_decontamination(spark, threshold=1.01).count() == 0


def test_semantic_decontam_flags_planted_paraphrase(spark):
    """Perturbation: plant a training vector that is a near-copy of a
    held-out test vector (tiny additive shift — a 'paraphrase' in
    embedding space). The decontamination pass must flag it, attribute
    it to THAT test vector, and score it above every organic hit."""
    emb = spark.table("embeddings")
    test_vec = emb.filter(F.col("vec_id") == 50)
    plant = test_vec.select(
        F.lit(999_999).cast("long").alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: (x + F.lit(0.001)).cast("float")
        ).alias("embedding"),
        F.col("label"),
    )
    organic_max = max(
        r["cosine"]
        for r in similarity.semantic_decontamination(spark).collect()
    )
    try:
        emb.unionByName(plant.select(emb.columns)).createOrReplaceTempView(
            "embeddings"
        )
        flagged = {
            r["vec_id"]: r
            for r in similarity.semantic_decontamination(spark).collect()
        }
        hit = flagged[999_999]
        assert hit["closest_test_id"] == 50
        assert hit["label_match"] is True
        assert hit["cosine"] > max(organic_max, 0.999)
    finally:
        emb.createOrReplaceTempView("embeddings")


# ---------------------------------------------------------------------------
# dedup_graph_triangles
# ---------------------------------------------------------------------------

def test_graph_triangles_corpus_invariants(spark):
    from uav_streamprocessor_spark.operators import dedup

    rows = dedup.doc_graph_triangles(spark).collect()
    assert len(rows) > 0
    clustered = {
        r["doc_id"] for r in dedup.doc_dup_clusters(spark).collect()
    }
    assert {r["doc_id"] for r in rows} == clustered
    for r in rows:
        assert 0.0 <= r["clustering_coeff"] <= 1.0
        assert r["n_triangles"] <= r["degree"] * (r["degree"] - 1) // 2
        if r["degree"] < 2:
            assert r["n_triangles"] == 0
    # triangle incidence sums to a multiple of 3 (each triangle counted
    # at exactly its three corners)
    assert sum(r["n_triangles"] for r in rows) % 3 == 0


def test_graph_triangles_planted_clique(spark):
    """Perturbation: plant three docs sharing a unique 5-word prefix —
    the blocking graph gains a 3-clique and each planted doc must report
    exactly one triangle with coefficient 1.0."""
    from uav_streamprocessor_spark.operators import dedup

    docs = spark.table("documents")
    prefix = "zzzq plantt trii uniq prefx"
    plant = spark.createDataFrame(
        [
            (9_000_001, prefix + " alpha one", "en", "plant", 40),
            (9_000_002, prefix + " beta two", "en", "plant", 39),
            (9_000_003, prefix + " gamma three", "en", "plant", 41),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    try:
        docs.unionByName(plant).createOrReplaceTempView("documents")
        t = {
            r["doc_id"]: r
            for r in dedup.doc_graph_triangles(spark).collect()
        }
        for did in (9_000_001, 9_000_002, 9_000_003):
            assert t[did]["degree"] == 2
            assert t[did]["n_triangles"] == 1
            assert t[did]["clustering_coeff"] == 1.0
    finally:
        docs.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# ev_ewma_deviation
# ---------------------------------------------------------------------------

def test_ewma_deviation_invariants(spark):
    from uav_streamprocessor_spark.operators import events_ops

    rows = events_ops.ewma_deviation(spark).collect()
    assert len(rows) == 50
    devs = [r["deviation"] for r in rows]
    assert devs == sorted(devs, reverse=True)
    for r in rows:
        # reported deviation reconciles with the reported smoothed value
        assert abs(abs(r["value"] - r["ewma_prev"]) - r["deviation"]) < 2e-6
    # first event of every user carries no prior state -> never scored
    first_ids = {
        r["event_id"]
        for r in spark.sql(
            "SELECT min_by(event_id, (ts, event_id)) AS event_id "
            "FROM events GROUP BY user_id"
        ).collect()
    }
    assert first_ids.isdisjoint({r["event_id"] for r in rows})


def test_ewma_deviation_flags_planted_level_shift(spark):
    """Perturbation: a user emitting value=2.0 forever then one 500.0 —
    the spike's deviation is 498 and must take rank 1; the constant
    prefix events must not appear at all (deviation 0)."""
    from uav_streamprocessor_spark.operators import events_ops

    ev = spark.table("events")
    seq = [(3_000_000 + i, f"2099-03-01 00:{i:02d}:00", 2.0) for i in range(20)]
    seq.append((3_000_020, "2099-03-01 00:20:00", 500.0))
    plant = spark.createDataFrame(
        [(eid, ts, 777_777, "meter", v, "{}") for eid, ts, v in seq],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    try:
        ev.unionByName(plant.select(ev.columns)).createOrReplaceTempView("events")
        rows = events_ops.ewma_deviation(spark).collect()
        top = rows[0]
        assert top["event_id"] == 3_000_020
        assert abs(top["deviation"] - 498.0) < 1e-6
        assert abs(top["ewma_prev"] - 2.0) < 1e-6
        planted_scored = [
            r for r in rows if 3_000_000 <= r["event_id"] < 3_000_020
        ]
        assert planted_scored == []
    finally:
        ev.createOrReplaceTempView("events")


# ---------------------------------------------------------------------------
# text_bpe_train
# ---------------------------------------------------------------------------

def _bpe_reference(word_freq, rounds):
    """Canonical tuple-based BPE (Sennrich alg. 1): all adjacent pairs
    counted, argmax by (count desc, pair asc), greedy left-to-right
    non-overlapping merge per word."""
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for rnd in range(1, rounds + 1):
        counts = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + f
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), total = best
        merges.append((rnd, f"{a} {b}", a + b, total))
        new_vocab = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def test_bpe_train_matches_canonical_reference(spark):
    """The replace-chain merge equals canonical tuple-based BPE whenever
    same-pair runs stay under length 8 — verify end-to-end on the real
    corpus against a pure-Python implementation of Sennrich alg. 1."""
    from collections import Counter
    from uav_streamprocessor_spark.operators import text

    docs = [r["text"] for r in spark.table("documents").collect()]
    freq = Counter(
        w for t in docs for w in t.lower().split(" ") if len(w) >= 2
    )
    expected = _bpe_reference(freq, rounds=6)
    got = [
        (r["round"], r["pair"], r["new_symbol"], r["total"])
        for r in text.bpe_train_merges(spark).collect()
    ]
    assert got == expected


def test_bpe_train_prefix_consistency_and_planted_pair(spark):
    from uav_streamprocessor_spark.operators import text

    full = text.bpe_train_merges(spark, rounds=4).collect()
    short = text.bpe_train_merges(spark, rounds=2).collect()
    assert [tuple(r) for r in short] == [tuple(r) for r in full[:2]]

    # Perturbation: flood with a pair more frequent than any organic one
    docs = spark.table("documents")
    flood = spark.createDataFrame(
        [(8_500_000 + i, "qx " * 3000, "en", "plant", 9000) for i in range(2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    try:
        docs.unionByName(flood).createOrReplaceTempView("documents")
        planted = text.bpe_train_merges(spark, rounds=1).collect()[0]
        assert planted["pair"] == "q x"
        assert planted["new_symbol"] == "qx"
    finally:
        docs.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# text_group_holdout_split
# ---------------------------------------------------------------------------

def _split_rows(spark):
    from uav_streamprocessor_spark.operators import sampling

    return {
        (r["mode"], r["split"]): r
        for r in sampling.group_holdout_split(spark).collect()
    }


def test_group_holdout_split_invariants(spark):
    rows = _split_rows(spark)
    n_docs = spark.table("documents").count()
    for mode in ("grouped", "naive_doc_hash"):
        assert (
            rows[(mode, "train")]["n_docs"] + rows[(mode, "test")]["n_docs"]
            == n_docs
        )
    # cluster-level assignment can never straddle; doc-hash organically does
    assert rows[("grouped", "train")]["n_leaky_groups"] == 0
    assert rows[("grouped", "test")]["n_leaky_groups"] == 0
    assert rows[("naive_doc_hash", "train")]["n_leaky_groups"] > 0
    # a leaky group touches BOTH splits, so both rows report the same count
    assert (
        rows[("naive_doc_hash", "train")]["n_leaky_groups"]
        == rows[("naive_doc_hash", "test")]["n_leaky_groups"]
    )


def test_group_holdout_split_planted_twin_pair(spark):
    """Perturbation: plant two blocking-twin docs engineered to land in
    DIFFERENT doc-hash splits — naive leakage must rise by exactly one
    group; grouped stays at zero."""
    import hashlib

    docs = spark.table("documents")
    base_rows = _split_rows(spark)
    prefix = "zzzv leakk plnt uniq prefx"

    def nib(t):
        return "train" if hashlib.md5(t.encode()).hexdigest()[0] <= "c" else "test"

    # deterministic search for a suffix pair on opposite sides
    t_train = t_test = None
    for i in range(64):
        cand = f"{prefix} variant {i}"
        if nib(cand) == "train" and t_train is None:
            t_train = cand
        if nib(cand) == "test" and t_test is None:
            t_test = cand
        if t_train and t_test:
            break
    assert t_train and t_test
    plant = spark.createDataFrame(
        [
            (9_100_001, t_train, "en", "plant", len(t_train)),
            (9_100_002, t_test, "en", "plant", len(t_test)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    try:
        docs.unionByName(plant).createOrReplaceTempView("documents")
        rows = _split_rows(spark)
        assert (
            rows[("naive_doc_hash", "train")]["n_leaky_groups"]
            == base_rows[("naive_doc_hash", "train")]["n_leaky_groups"] + 1
        )
        assert rows[("grouped", "train")]["n_leaky_groups"] == 0
        assert rows[("grouped", "test")]["n_leaky_groups"] == 0
    finally:
        docs.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# dedup_ngram_containment
# ---------------------------------------------------------------------------

def test_containment_bounds_and_dominates_jaccard(spark):
    from uav_streamprocessor_spark.operators import dedup

    rows = dedup.ngram_containment_pairs(spark, threshold=0.0).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r["jaccard"] <= r["containment"] <= 1.0 + 1e-9


def test_containment_catches_planted_subset_dup(spark):
    """Perturbation: doc B = a verbatim chunk of doc A plus nothing else
    (adjacent ids so the block join pairs them). Containment must be 1.0
    while Jaccard stays low — the asymmetric case the operator exists
    for; the Jaccard screen at the same threshold misses it."""
    from uav_streamprocessor_spark.operators import dedup

    docs = spark.table("documents")
    chunk = "alpha beta gamma delta epsilon zeta eta theta"
    long_text = chunk + " " + " ".join(f"filler{i}" for i in range(80))
    plant = spark.createDataFrame(
        [
            (9_200_001, long_text, "en", "plant", len(long_text)),
            (9_200_002, chunk, "en", "plant", len(chunk)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    try:
        docs.unionByName(plant).createOrReplaceTempView("documents")
        pairs = {
            (r["doc_id_a"], r["doc_id_b"]): r
            for r in dedup.ngram_containment_pairs(spark).collect()
        }
        hit = pairs[(9_200_001, 9_200_002)]
        assert hit["containment"] == 1.0
        assert hit["jaccard"] < 0.1
        jac = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in dedup.ngram_jaccard_pairs(spark).collect()
            if r["jaccard3"] >= 0.5
        }
        assert (9_200_001, 9_200_002) not in jac
    finally:
        docs.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# text_bpe_fertility
# ---------------------------------------------------------------------------

def test_bpe_fertility_invariants_and_rounds_knob(spark):
    from uav_streamprocessor_spark.operators import text

    after = {r["lang"]: r for r in text.bpe_fertility(spark, rounds=6).collect()}
    # rounds=0: no merges — every char is a token, so fertility ==
    # chars/word exactly and chars_per_token == 1
    before = {r["lang"]: r for r in text.bpe_fertility(spark, rounds=0).collect()}
    assert set(after) == set(before) and len(after) > 0
    for lang, b in before.items():
        a = after[lang]
        assert b["chars_per_token"] == 1.0
        assert abs(
            b["fertility"] - b["total_tokens"] / b["n_words"]
        ) < 1e-6
        # merges only ever fuse tokens: fertility strictly drops, word
        # counts unchanged
        assert a["n_words"] == b["n_words"]
        assert a["fertility"] < b["fertility"]
        assert a["chars_per_token"] > 1.0
        # totals reconcile with the reported ratios
        assert abs(a["fertility"] - a["total_tokens"] / a["n_words"]) < 1e-6


# ---------------------------------------------------------------------------
# ev_hll_overlap
# ---------------------------------------------------------------------------

def test_hll_overlap_matches_exact_truth(spark):
    from uav_streamprocessor_spark.operators import sketches

    rows = sketches.hll_audience_overlap(spark).collect()
    types = [
        r["event_type"]
        for r in spark.table("events").select("event_type").distinct().collect()
    ]
    assert len(rows) == len(types) * (len(types) - 1) // 2
    users = {
        t: {
            r["user_id"]
            for r in spark.table("events")
            .filter(F.col("event_type") == t)
            .select("user_id")
            .distinct()
            .collect()
        }
        for t in types
    }
    # relative HLL error ~1.04/sqrt(2^12) per sketch; inclusion-exclusion
    # compounds three estimates -> tolerance 5 sigma on the largest term
    sigma = 1.04 / (2**12) ** 0.5
    for r in rows:
        exact_a = len(users[r["type_a"]])
        exact_b = len(users[r["type_b"]])
        exact_union = len(users[r["type_a"]] | users[r["type_b"]])
        exact_inter = len(users[r["type_a"]] & users[r["type_b"]])
        tol = 5 * sigma * exact_union + 2
        assert abs(r["est_users_a"] - exact_a) <= 5 * sigma * exact_a + 2
        assert abs(r["est_users_b"] - exact_b) <= 5 * sigma * exact_b + 2
        assert abs(r["est_union"] - exact_union) <= tol
        assert abs(r["est_overlap"] - exact_inter) <= tol
        assert 0.0 <= r["overlap_coeff"] <= 1.0 + 3 * sigma


def test_hll_overlap_planted_disjoint_type(spark):
    """Perturbation: a new event type whose users are entirely novel ids
    must show ~zero overlap with every existing type."""
    from uav_streamprocessor_spark.operators import sketches

    ev = spark.table("events")
    plant = spark.range(200).select(
        (F.lit(4_000_000) + F.col("id")).alias("event_id"),
        F.expr(
            "timestamp '2099-07-01 00:00:00' + make_interval(0,0,0,0,0,0,id)"
        ).alias("ts"),
        (F.lit(5_000_000) + F.col("id")).alias("user_id"),
        F.lit("zz_isolated").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    try:
        ev.unionByName(plant.select(ev.columns)).createOrReplaceTempView("events")
        rows = sketches.hll_audience_overlap(spark).collect()
        iso = [
            r
            for r in rows
            if r["type_a"] == "zz_isolated" or r["type_b"] == "zz_isolated"
        ]
        assert len(iso) > 0
        sigma = 1.04 / (2**12) ** 0.5
        for r in iso:
            assert r["overlap_coeff"] <= 5 * sigma + 0.02
    finally:
        ev.createOrReplaceTempView("events")


# ---------------------------------------------------------------------------
# text_typo_variants
# ---------------------------------------------------------------------------

def test_typo_variants_brute_force_recall(spark):
    """Deletion-neighborhood blocking must find EVERY edit-distance-1
    pair the brute-force vocabulary scan finds (recall 1.0). The
    synthetic corpus has a ~30-word vocabulary with no organic pairs
    (the registered query's 0-row result IS the corpus truth), so the
    comparison runs on a perturbed corpus seeded with realistic typo
    families — substitution, deletion, insertion, plus a decoy at
    distance 2 and a decoy below the frequency ratio."""
    from uav_streamprocessor_spark.operators import text

    docs = spark.table("documents")
    seeds = [
        ("receive " * 40).strip(),      # canonical x40
        "recieve noise",                 # transposition -> distance 2 decoy
        "receive0 noise",                # insertion variant x1
        "receve noise",                  # deletion variant x1
        "rezeive noise",                 # substitution variant x1
        ("beleive " * 8).strip(),       # second family, canonical x8
        "believe " * 3,                  # distance-2 from beleive? (check brute force)
    ]
    plant = spark.createDataFrame(
        [
            (9_400_000 + i, t, "en", "plant", len(t))
            for i, t in enumerate(seeds)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    perturbed = docs.unionByName(plant)
    perturbed.createOrReplaceTempView("documents")
    try:
        got = {
            (r["canonical"], r["variant"])
            for r in text.typo_variant_pairs(spark).collect()
        }
    finally:
        docs.createOrReplaceTempView("documents")
    assert len(got) >= 3
    vocab = {
        r["word"]: r["n"]
        for r in perturbed
        .select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.length("word") >= 3)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    def lev1(a, b):
        if abs(len(a) - len(b)) > 1 or a == b:
            return False
        if len(a) == len(b):
            return sum(x != y for x, y in zip(a, b)) == 1
        s, l_ = (a, b) if len(a) < len(b) else (b, a)
        for i in range(len(l_)):
            if l_[:i] + l_[i + 1:] == s:
                return True
        return False

    words = list(vocab)
    expected = set()
    for i, wa in enumerate(words):
        for wb in words[i + 1:]:
            for canon, var in ((wa, wb), (wb, wa)):
                if (
                    vocab[canon] >= 5 * vocab[var]
                    and vocab[canon] >= 5
                    and lev1(canon, var)
                ):
                    expected.add((canon, var))
    assert got == expected


def test_typo_variants_planted_ocr_noise(spark):
    """Perturbation: flood a word, plant one damaged copy — the pair
    must surface with the frequent form as canonical, and never the
    reverse attribution."""
    from uav_streamprocessor_spark.operators import text

    docs = spark.table("documents")
    plant = spark.createDataFrame(
        [
            (9_300_001, ("qvzwords " * 50).strip(), "en", "plant", 450),
            (9_300_002, "qvzw0rds appears once only", "en", "plant", 26),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    try:
        docs.unionByName(plant).createOrReplaceTempView("documents")
        pairs = {
            (r["canonical"], r["variant"]): r
            for r in text.typo_variant_pairs(spark).collect()
        }
        assert ("qvzwords", "qvzw0rds") in pairs
        assert ("qvzw0rds", "qvzwords") not in pairs
        hit = pairs[("qvzwords", "qvzw0rds")]
        assert hit["n_canonical"] == 50 and hit["n_variant"] == 1
    finally:
        docs.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# rel_l_diversity
# ---------------------------------------------------------------------------

def test_l_diversity_invariants_and_planted_homogeneous_class(spark):
    from uav_streamprocessor_spark.operators import relational

    rows = {r["c_nationkey"]: r for r in relational.l_diversity_audit(spark).collect()}
    assert len(rows) > 0
    for r in rows.values():
        # entropy-l (effective values) is bounded by distinct-l, >= 1
        assert 1.0 - 1e-9 <= r["entropy_l"] <= r["distinct_l"] + 1e-6
        assert r["below_l"] == (r["distinct_l"] < 3)
    # Perturbation: a new nation whose customers ALL share one segment —
    # k-anonymity-fine (large class) but maximally homogeneous
    cust = spark.table("customer")
    plant = spark.range(50).select(
        (F.lit(7_000_000) + F.col("id")).alias("c_custkey"),
        F.lit("Customer#plant").alias("c_name"),
        F.lit(99).cast("int").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("BUILDING").alias("c_mktsegment"),
    )
    try:
        cust.unionByName(plant.select(cust.columns)).createOrReplaceTempView(
            "customer"
        )
        audited = {
            r["c_nationkey"]: r
            for r in relational.l_diversity_audit(spark).collect()
        }
        hom = audited[99]
        assert hom["class_size"] == 50
        assert hom["distinct_l"] == 1
        assert hom["entropy_l"] == 1.0
        assert hom["below_l"] is True
    finally:
        cust.createOrReplaceTempView("customer")


# ---------------------------------------------------------------------------
# dedup_lsh_tuning
# ---------------------------------------------------------------------------

def test_lsh_tuning_corpus_curve(spark):
    from uav_streamprocessor_spark.operators import dedup

    pts = {(r["bands"], r["rows_per_band"]): r
           for r in dedup.lsh_band_tuning(spark).collect()}
    assert set(pts) == {(8, 8), (16, 4), (32, 2)}
    truths = {r["n_truth"] for r in pts.values()}
    assert len(truths) == 1 and truths.pop() > 0
    # organic near-dups sit at jaccard >= 0.9 where banding theory puts
    # every config near recall 1; candidate volume must grow with bands
    for r in pts.values():
        assert 0.9 <= r["recall"] <= 1.0
    assert pts[(32, 2)]["n_candidates"] > pts[(8, 8)]["n_candidates"]


def test_lsh_tuning_medium_similarity_separates_configs(spark):
    """Perturbation: plant ~15 doc pairs at jaccard ~0.55-0.6 (24 shared
    + 8 unique words). Banding theory: P(candidate | j=0.55) is ~3% for
    8x8, ~60% for 16x4, ~99.99% for 32x2 — with the medium band diluting
    the organic j>=0.9 truth, wide-band recall must fall well below 1
    while 32x2 stays near 1, and recall must be monotone in bands."""
    from uav_streamprocessor_spark.operators import dedup

    docs = spark.table("documents")
    rows = []
    for p in range(15):
        shared = " ".join(f"pl{p}w{i}" for i in range(24))
        ua = " ".join(f"pl{p}a{i}" for i in range(8))
        ub = " ".join(f"pl{p}b{i}" for i in range(8))
        rows.append((9_500_000 + 2 * p, f"{shared} {ua}", "en", "plant", 200))
        rows.append((9_500_001 + 2 * p, f"{shared} {ub}", "en", "plant", 200))
    plant = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    try:
        docs.unionByName(plant).createOrReplaceTempView("documents")
        pts = {(r["bands"], r["rows_per_band"]): r
               for r in dedup.lsh_band_tuning(spark, threshold=0.5).collect()}
        base_truth = pts[(8, 8)]["n_truth"]
        assert base_truth >= 40  # organic + the 15 planted medium pairs
        r8, r16, r32 = (pts[(8, 8)]["recall"], pts[(16, 4)]["recall"],
                        pts[(32, 2)]["recall"])
        assert r8 <= r16 <= r32
        assert r8 < 0.9          # wide bands provably miss medium pairs
        assert r32 > 0.95        # narrow bands catch nearly everything
    finally:
        docs.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# rel_benford_audit
# ---------------------------------------------------------------------------

def test_benford_math_and_planted_populations(spark):
    from uav_streamprocessor_spark.operators import relational

    rows = relational.benford_audit(spark).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["observed_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 1e-4
    assert all(r["chi2_term"] >= 0 for r in rows)

    orders = spark.table("orders")

    def run_with(prices):
        plant = spark.createDataFrame(
            [(i, 0, "O", p, "1995-01-01", "1-URGENT") for i, p in enumerate(prices)],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate string, o_orderpriority string",
        ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        try:
            plant.select(orders.columns).createOrReplaceTempView("orders")
            return relational.benford_audit(spark).collect()
        finally:
            orders.createOrReplaceTempView("orders")

    # population drawn EXACTLY at Benford proportions -> chi2 ~ 0
    import math

    benford = [
        (d, round(1000 * math.log10(1 + 1 / d))) for d in range(1, 10)
    ]
    conforming = [
        float(f"{d}{i % 7}{i % 10}.5") for d, n in benford for i in range(n)
    ]
    chi2_conf = sum(r["chi2_term"] for r in run_with(conforming))
    # fabricated population: every amount starts with 5 -> chi2 explodes
    fabricated = [500.0 + i for i in range(1000)]
    rows_fab = run_with(fabricated)
    chi2_fab = sum(r["chi2_term"] for r in rows_fab)
    assert chi2_conf < 1.0
    assert chi2_fab > 1000 * chi2_conf or chi2_conf == 0
    assert chi2_fab > 100


# ---------------------------------------------------------------------------
# ev_daily_autocorr
# ---------------------------------------------------------------------------

def test_autocorr_bounds_and_planted_weekly_period(spark):
    from uav_streamprocessor_spark.operators import events_ops

    rows = events_ops.daily_autocorrelation(spark).collect()
    assert [r["lag_days"] for r in rows] == list(range(1, 8))
    n_days = (
        spark.table("events").select(F.to_date("ts").alias("d")).distinct().count()
    )
    for r in rows:
        assert abs(r["autocorr"]) <= 1.0 + 1e-9
        assert r["n_points"] == n_days - r["lag_days"]

    # Perturbation: a strictly period-7 daily series -> lag-7 autocorr
    # is exactly 1, and every other lag is strictly lower
    ev = spark.table("events")
    import datetime

    rows_synth = []
    eid = 0
    d0 = datetime.date(2099, 1, 1)
    for day in range(35):
        stamp = (d0 + datetime.timedelta(days=day)).isoformat()
        for _ in range((day % 7) * 3 + 1):
            rows_synth.append((eid, f"{stamp} 12:00:00", 1, "tick", 1.0, "{}"))
            eid += 1
    plant = spark.createDataFrame(
        rows_synth,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    try:
        plant.select(ev.columns).createOrReplaceTempView("events")
        synth = {r["lag_days"]: r["autocorr"]
                 for r in events_ops.daily_autocorrelation(spark).collect()}
        assert synth[7] == 1.0
        for k in range(1, 7):
            assert synth[k] < 1.0
    finally:
        ev.createOrReplaceTempView("events")


# ---------------------------------------------------------------------------
# ev_cuped_readout
# ---------------------------------------------------------------------------

def test_cuped_reduces_variance_without_biasing_means(spark):
    from uav_streamprocessor_spark.operators import events_ops

    rows = {r["variant"]: r for r in events_ops.cuped_experiment_readout(spark).collect()}
    assert set(rows) == {0, 1}
    n_users = spark.table("events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows.values()) == n_users
    for r in rows.values():
        # the fixture's per-user pre/post sums are nearly uncorrelated,
        # so organic reduction is ~0 — bounded, never catastrophic
        assert -0.1 < r["var_reduction"] < 1.0
        assert abs(r["mean_y"] - r["mean_y_cuped"]) < abs(r["mean_y"])
    pooled_raw = sum(r["n_users"] * r["mean_y"] for r in rows.values())
    pooled_adj = sum(r["n_users"] * r["mean_y_cuped"] for r in rows.values())
    assert abs(pooled_raw - pooled_adj) / abs(pooled_raw) < 1e-3

    # Positive control for the variance-reduction property itself: plant
    # users whose activity SCALE varies widely and identically across
    # periods (X ~ Y) — corr ~ 1, so CUPED must strip most variance
    import datetime

    ev = spark.table("events")
    rows_plant = []
    eid = 8_000_000
    for u in range(40):
        m = 5 + 10 * u
        for period, day in (("pre", 1), ("post", 20)):
            for i in range(3):
                rows_plant.append(
                    (eid, datetime.datetime(2099, 8, day, 0, 0, i),
                     8_000_000 + u, "scale", float(m), "{}")
                )
                eid += 1
    plant = spark.createDataFrame(
        rows_plant,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    try:
        plant.select(ev.columns).createOrReplaceTempView("events")
        planted = {
            r["variant"]: r
            for r in events_ops.cuped_experiment_readout(spark).collect()
        }
        for r in planted.values():
            assert r["var_reduction"] > 0.9
    finally:
        ev.createOrReplaceTempView("events")


def test_cuped_flags_planted_treatment_effect(spark):
    """Perturbation: add a constant +25 post-period lift to every
    treatment user (odd user_id). The CUPED delta between variants must
    move by ~the lift, and variance reduction must not degrade."""
    from uav_streamprocessor_spark.operators import events_ops

    base = {r["variant"]: r for r in events_ops.cuped_experiment_readout(spark).collect()}
    ev = spark.table("events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = ev.agg(((F.min(us) + F.max(us)) / 2).alias("cut_us")).collect()[0]
    cut = bounds["cut_us"]
    treated_users = [
        r["user_id"]
        for r in ev.select("user_id").distinct().collect()
        if r["user_id"] % 2 == 1
    ]
    import datetime

    lift = spark.createDataFrame(
        [
            (6_000_000 + i, datetime.datetime.fromtimestamp(cut / 1e6 + 3600),
             u, "lift", 25.0, "{}")
            for i, u in enumerate(treated_users)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    try:
        ev.unionByName(lift.select(ev.columns)).createOrReplaceTempView("events")
        lifted = {r["variant"]: r
                  for r in events_ops.cuped_experiment_readout(spark).collect()}
        base_delta = base[1]["mean_y_cuped"] - base[0]["mean_y_cuped"]
        lift_delta = lifted[1]["mean_y_cuped"] - lifted[0]["mean_y_cuped"]
        assert abs((lift_delta - base_delta) - 25.0) < 2.0
        # a constant additive lift can't change X/Y covariance structure
        # materially (variance property proven by the scale-users control)
        assert lifted[1]["var_reduction"] > -0.1
    finally:
        ev.createOrReplaceTempView("events")


# ---------------------------------------------------------------------------
# rel_snapshot_diff
# ---------------------------------------------------------------------------

def test_snapshot_diff_reconciles_with_derivation(spark):
    from uav_streamprocessor_spark.operators import relational

    rows = {r["change"]: r for r in relational.snapshot_diff(spark).collect()}
    assert set(rows) == {"unchanged", "updated", "deleted", "inserted"}
    orders = spark.table("orders")
    keys = [r["o_orderkey"] for r in orders.select("o_orderkey").collect()]
    exp_deleted = sum(1 for k in keys if k % 1000 == 7)
    exp_inserted = sum(1 for k in keys if k % 100 == 0)
    exp_updated = sum(1 for k in keys if k % 10 == 0 and k % 1000 != 7)
    assert rows["deleted"]["n_keys"] == exp_deleted
    assert rows["inserted"]["n_keys"] == exp_inserted
    assert rows["updated"]["n_keys"] == exp_updated
    assert (
        sum(r["n_keys"] for r in rows.values())
        == len(keys) + exp_inserted
    )
    # every update adds exactly +100; deletes subtract old price
    assert abs(rows["updated"]["price_delta"] - 100.0 * exp_updated) < 0.01
    assert rows["unchanged"]["price_delta"] == 0.0
    assert rows["inserted"]["price_delta"] == 1000.0 * exp_inserted
    assert rows["deleted"]["price_delta"] < 0


# ---------------------------------------------------------------------------
# dedup_minhash_estimate
# ---------------------------------------------------------------------------

def test_minhash_estimate_within_sampling_bound(spark):
    """Every candidate pair's estimate must sit within 5 sigma of the
    exact Jaccard (sigma = sqrt(j(1-j)/64)) plus a small collision
    allowance — the unbiased-estimator guarantee the banding math
    assumes."""
    from uav_streamprocessor_spark.operators import dedup

    rows = dedup.minhash_estimate_audit(spark).collect()
    assert len(rows) > 0
    for r in rows:
        j = r["exact_jaccard"]
        sigma = (j * (1 - j) / 64) ** 0.5
        assert r["abs_err"] <= 5 * sigma + 0.05, (r, sigma)
        assert abs(abs(r["est_jaccard"] - j) - r["abs_err"]) < 2e-6
    # the mean error across pairs must be far tighter than the per-pair
    # bound (errors are zero-mean)
    mean_err = sum(r["est_jaccard"] - r["exact_jaccard"] for r in rows) / len(rows)
    assert abs(mean_err) < 0.05


# ---------------------------------------------------------------------------
# text_score_normalization
# ---------------------------------------------------------------------------

def test_score_normalization_invariants_and_planted_weak_source(spark):
    from uav_streamprocessor_spark.operators import text

    rows = text.score_quantile_normalization(spark).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, qs in by_src.items():
        qs.sort(key=lambda r: r["local_q"])
        assert [r["local_q"] for r in qs] == [1, 2, 3, 4, 5]
        # ntile balance: bucket sizes differ by at most 1
        sizes = [r["n_docs"] for r in qs]
        assert max(sizes) - min(sizes) <= 1
        # raw score and global quintile are monotone in the local rank
        scores = [r["mean_score"] for r in qs]
        gq = [r["mean_global_q"] for r in qs]
        assert scores == sorted(scores)
        assert gq == sorted(gq)
        assert all(1.0 <= g <= 5.0 for g in gq)

    # Perturbation: a source of uniformly junk (tiny, stopword-free)
    # docs — even its TOP local quintile must sit in the global bottom,
    # the exact mis-calibration the readout exists to expose
    docs = spark.table("documents")
    junk = spark.createDataFrame(
        [
            (9_600_000 + i, f"qq{i} zz{i}", "en", "junksrc", 10)
            for i in range(50)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    try:
        docs.unionByName(junk).createOrReplaceTempView("documents")
        rows2 = {
            (r["source"], r["local_q"]): r
            for r in text.score_quantile_normalization(spark).collect()
        }
        assert rows2[("junksrc", 5)]["mean_global_q"] <= 2.0
    finally:
        docs.createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# emb_label_noise
# ---------------------------------------------------------------------------

def test_label_noise_knob_and_planted_mislabel(spark):
    from uav_streamprocessor_spark.operators import similarity

    strict = similarity.label_noise_screen(spark, min_disagree=7).collect()
    loose = similarity.label_noise_screen(spark, min_disagree=5).collect()
    assert {r["vec_id"] for r in strict} <= {r["vec_id"] for r in loose}
    for r in loose:
        assert 5 <= r["n_disagree"] <= 7
        assert r["suggested_label"] != r["label"] or r["n_disagree"] < 7

    # Perturbation: clone an existing vector 8 times under label A, then
    # plant a 9th copy labeled B — its whole neighborhood is A, so it
    # must be flagged with n_disagree == 7 and suggestion A
    emb = spark.table("embeddings")
    src = emb.filter(F.col("vec_id") == 3).select("embedding").collect()[0]
    vec = src["embedding"]
    clones = [(9_700_000 + i, vec, 2) for i in range(8)]
    clones.append((9_700_008, vec, 5))
    plant = spark.createDataFrame(
        clones, "vec_id long, embedding array<float>, label int"
    )
    try:
        emb.unionByName(plant.select(emb.columns)).createOrReplaceTempView(
            "embeddings"
        )
        flagged = {
            r["vec_id"]: r
            for r in similarity.label_noise_screen(spark).collect()
        }
        hit = flagged[9_700_008]
        assert hit["n_disagree"] == 7
        assert hit["suggested_label"] == 2
        # the consistent clones must NOT be flagged (their neighbors are
        # overwhelmingly their own label)
        for i in range(8):
            assert 9_700_000 + i not in flagged
    finally:
        emb.createOrReplaceTempView("embeddings")


# ---------------------------------------------------------------------------
# ev_power_analysis
# ---------------------------------------------------------------------------

def test_power_analysis_scaling_and_cuped_gain(spark):
    from uav_streamprocessor_spark.operators import events_ops

    rows = {r["n_per_variant"]: r
            for r in events_ops.experiment_power_analysis(spark).collect()}
    assert set(rows) == {100, 500, 1000, 5000, 10000}
    base = rows[100]
    for n, r in rows.items():
        # MDE scales exactly as 1/sqrt(n)
        assert abs(r["mde"] - base["mde"] * (100 / n) ** 0.5) < 1e-4
        assert r["mde_cuped"] <= r["mde"] + 1e-9
        assert abs(
            r["mde_cuped"] - r["mde"] * (1 - r["cuped_r2"]) ** 0.5
        ) < 1e-4

    # Perturbation: wide-activity-scale users (X ~ Y, corr ~ 1) must
    # collapse the CUPED MDE far below the raw MDE
    import datetime

    ev = spark.table("events")
    rows_plant = []
    eid = 8_100_000
    for u in range(40):
        m = 5 + 10 * u
        for day in (1, 20):
            for i in range(3):
                rows_plant.append(
                    (eid, datetime.datetime(2099, 8, day, 0, 0, i),
                     8_100_000 + u, "scale", float(m), "{}")
                )
                eid += 1
    plant = spark.createDataFrame(
        rows_plant,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    try:
        plant.select(ev.columns).createOrReplaceTempView("events")
        planted = {r["n_per_variant"]: r
                   for r in events_ops.experiment_power_analysis(spark).collect()}
        p = planted[1000]
        assert p["cuped_r2"] > 0.9
        assert p["mde_cuped"] < 0.35 * p["mde"]
    finally:
        ev.createOrReplaceTempView("events")


# ---------------------------------------------------------------------------
# text_score_psi
# ---------------------------------------------------------------------------

def test_score_psi_bounds_and_planted_drifted_source(spark):
    from uav_streamprocessor_spark.operators import text

    rows = {r["source"]: r for r in text.score_psi_by_source(spark).collect()}
    assert len(rows) > 1
    n_docs = spark.table("documents").count()
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    for r in rows.values():
        assert r["psi"] >= 0.0  # PSI is a (smoothed) f-divergence
        # sample-size-aware flag: max(conventional 0.2, 3x null mean)
        assert r["drifted"] == (r["psi"] > max(0.2, 27.0 / r["n_docs"]))
    # organic sources draw from the same generator: PSI is pure sampling
    # noise, which the size-aware flag must absorb
    assert not any(r["drifted"] for r in rows.values())

    # Perturbation: a source whose scores all land in the global top
    # decile (long, stopword-heavy docs) must blow past the 0.2 flag
    docs = spark.table("documents")
    txt = ("the a of and " * 120).strip()
    plant = spark.createDataFrame(
        [(9_800_000 + i, txt, "en", "driftsrc", len(txt)) for i in range(40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    try:
        docs.unionByName(plant).createOrReplaceTempView("documents")
        rows2 = {r["source"]: r for r in text.score_psi_by_source(spark).collect()}
        assert rows2["driftsrc"]["drifted"] is True
        assert rows2["driftsrc"]["psi"] > 1.0
    finally:
        docs.createOrReplaceTempView("documents")
