"""Invariant tests for the training-pipeline compliance/maintenance ops:
PII redaction, URL blocklist analytics, MERGE upsert, SemDeDup.

Oracle parity (value-hash vs DuckDB) is covered by test_oracle_parity;
these pin the non-vacuous properties parity alone can't distinguish —
that the scrubber actually matched something, that the blocklist actually
dropped rows, that MERGE prefers the update side, and that SemDeDup's
removal set is exactly the brute-force within-cluster answer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from uav_streamprocessor_spark.fixtures import register_uav_views
from uav_streamprocessor_spark.operators import relational, similarity, text


def test_pii_redaction_matches_and_scrubs(spark):
    register_uav_views(spark, SF_SMALL)
    rows = text.pii_redaction_stats(spark).collect()
    assert rows, "per-source audit must be non-empty"
    # positive control: the injection fixture guarantees matches exist,
    # so a broken regex (0 matches) or broken scrub (residual > 0) fails
    assert sum(r["docs_with_email"] for r in rows) > 0
    assert sum(r["docs_with_phone"] for r in rows) > 0
    assert sum(r["docs_with_ip"] for r in rows) > 0
    assert sum(r["chars_redacted"] for r in rows) > 0
    assert all(r["residual_pii"] == 0 for r in rows)


def test_redact_pii_is_idempotent(spark):
    register_uav_views(spark, SF_SMALL)
    docs = text._with_injected_pii(spark.table("documents"))
    once = text.redact_pii(docs).select(F.col("redacted").alias("text"))
    twice = text.redact_pii(once)
    assert twice.filter(F.col("text") != F.col("redacted")).count() == 0


def test_url_blocklist_actually_drops(spark):
    register_uav_views(spark, SF_SMALL)
    domains = {r["domain"] for r in text.url_domain_stats(spark, top_k=100).collect()}
    assert domains, "extraction must find injected URLs"
    blocked = {f"site{i}.example.com" for i in (0, 10, 20, 30)}
    assert not (domains & blocked), "blocklisted domains must be absent"
    # a non-blocked injected domain must survive (doc_id % 40 == 3 exists)
    assert "site3.example.com" in domains


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "key int, s string, v double"
    )
    upd = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "key int, s string, v double"
    )
    got = {
        r["key"]: (r["s"], r["v"])
        for r in relational.merge_upsert(base, upd, "key").collect()
    }
    assert got == {
        1: ("a", 10.0),  # untouched passes through
        2: ("B", 99.0),  # update wins over base
        3: ("c", 30.0),
        4: ("d", 40.0),  # insert appears
    }


def test_semdedup_matches_bruteforce_within_clusters(spark):
    register_uav_views(spark, SF_SMALL)
    k, iters, thr = 5, 2, 0.4
    profile = similarity.semdedup_profile(spark, k=k, iters=iters, threshold=thr)
    got = {r["cluster"]: (r["n_docs"], r["n_removed"]) for r in profile.collect()}
    # conservation: survivors + removed = cluster size (column arithmetic)
    for r in profile.collect():
        assert r["n_survivors"] + r["n_removed"] == r["n_docs"]
    # brute-force reference: same assignment, python pair scan per cluster
    assigned, _ = similarity.kmeans_lloyd(spark, k, iters)
    import numpy as np

    rows = assigned.select("vec_id", "cluster", "embedding").collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(
            (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
        )
    for c, members in by_cluster.items():
        members.sort()
        removed = 0
        for i, (_, vi) in enumerate(members):
            for j in range(i):
                vj = members[j][1]
                cos = float(vi @ vj / (np.linalg.norm(vi) * np.linalg.norm(vj)))
                if cos >= thr:
                    removed += 1
                    break
        assert got[c] == (len(members), removed), f"cluster {c} mismatch"
    # non-vacuous: at least one removal somewhere at this threshold
    assert sum(v[1] for v in got.values()) > 0


def test_ahash_neardups_match_bruteforce_and_planted_groups(spark):
    """Two layers: (1) the banded join's output EQUALS the brute-force
    all-pairs hamming<=3 answer (recall 1.0 by pigeonhole + no false
    positives after verify — same proof obligation as the SimHash test);
    (2) the planted dup groups (doc_id // 8 share a base image) are
    actually recovered — non-vacuity — and nothing crosses groups."""
    from uav_streamprocessor_spark.operators import multimodal

    register_uav_views(spark, SF_SMALL)
    hashes = {
        r["media_id"]: r["ahash"]
        for r in multimodal.image_ahash(
            multimodal.documents_as_media(spark)
        ).collect()
    }
    ids = sorted(hashes)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    found = {
        (r["media_id_a"], r["media_id_b"])
        for r in multimodal.image_ahash_neardups(spark).collect()
    }
    assert found == brute, (
        f"banded != brute force: missed={len(brute - found)} "
        f"extra={len(found - brute)}"
    )
    assert found, "planted dup groups must produce near-dup pairs"
    assert all(a // 8 == b // 8 for a, b in found), "cross-group false positive"


def test_decontamination_prefilter_broadcasts_eval_hashes(spark):
    """The scale property the bloom variant exists for: the eval-gram
    hash set reaches the corpus side via a BroadcastExchange (map-side
    semi-join), not a shuffle."""
    from uav_streamprocessor_spark.operators import repetition

    register_uav_views(spark, SF_SMALL)
    plan = repetition.decontamination_prefiltered(spark)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "LeftSemi, BuildRight" in plan


def test_scd2_ranges_partition_each_customer_timeline(spark):
    """SCD2 invariants oracle parity can't see: per customer, exactly one
    open (is_current) range; ranges chain exactly (next effective_from ==
    previous effective_to); no run of equal priorities survives."""
    register_uav_views(spark, SF_SMALL)
    hist = relational.scd2_order_priority_history(spark)
    one_current = (
        hist.groupBy("o_custkey")
        .agg(F.sum("is_current").alias("n_open"))
        .filter(F.col("n_open") != 1)
        .count()
    )
    assert one_current == 0
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("effective_from")
    chained = hist.select(
        "o_custkey",
        "priority",
        "effective_from",
        "effective_to",
        F.lag("effective_to").over(w).alias("prev_to"),
        F.lag("priority").over(w).alias("prev_priority"),
    ).filter(F.col("prev_to").isNotNull())
    assert chained.filter(F.col("prev_to") != F.col("effective_from")).count() == 0
    assert chained.filter(F.col("prev_priority") == F.col("priority")).count() == 0


def test_hll_rollup_merge_equals_whole_and_error_bound(spark):
    """The mergeability contract: union-agg over per-day sketches must
    give EXACTLY the same estimate as one sketch over all rows (both
    deterministic), and the estimate must sit within 5% of exact."""
    from uav_streamprocessor_spark.operators import sketches

    register_uav_views(spark, SF_SMALL)
    rolled = {r["event_type"]: r for r in sketches.hll_rollup(spark).collect()}
    whole = {
        r["event_type"]: r["est"]
        for r in spark.table("events")
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    assert rolled, "events corpus must have event types"
    for et, r in rolled.items():
        assert r["n_days"] > 1, "rollup must actually merge multiple days"
        assert r["est_users"] == whole[et], (
            f"{et}: merged {r['est_users']} != whole-corpus {whole[et]}"
        )
        rel_err = abs(r["est_users"] - r["exact_users"]) / r["exact_users"]
        assert rel_err < 0.05, f"{et}: HLL error {rel_err:.3f} >= 5%"


def test_kll_quantiles_within_rank_error(spark):
    """KLL rank-error contract: the reported p50/p90 must lie between the
    exact (p-eps) and (p+eps) percentiles with eps=0.05 (k=200 bounds
    ~1.65%; 5% leaves merge slack). n must equal the row count."""
    from uav_streamprocessor_spark.operators import sketches

    register_uav_views(spark, SF_SMALL)
    got = {r["event_type"]: r for r in sketches.kll_value_quantiles(spark).collect()}
    eps = 0.05
    for et, r in got.items():
        vals = [
            x["value"]
            for x in spark.table("events")
            .filter((F.col("event_type") == et) & F.col("value").isNotNull())
            .select("value")
            .collect()
        ]
        vals.sort()
        assert r["n"] == len(vals)
        for p, q in ((0.5, r["p50"]), (0.9, r["p90"])):
            lo = vals[max(0, int((p - eps) * len(vals)) - 1)]
            hi = vals[min(len(vals) - 1, int((p + eps) * len(vals)))]
            assert lo <= q <= hi, f"{et} p{int(p*100)}={q} outside [{lo}, {hi}]"


def test_interval_join_bucketed_no_blowup_and_covers_all_events(spark):
    """Plan: the join must be a hash/merge join on (user_id, bucket) —
    no BroadcastNestedLoopJoin/CartesianProduct (what a raw range join
    degenerates to without an equi-key). Semantics: every event lands in
    exactly one session, so sum(n_contained) == |events| and per-session
    counts equal the sessionizer's n_events."""
    from uav_streamprocessor_spark.operators import events_ops

    register_uav_views(spark, SF_SMALL)
    df = events_ops.interval_join_bucketed(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    total = df.agg(F.sum("n_contained")).collect()[0][0]
    n_events = spark.table("events").count()
    assert total == n_events, f"{total} contained != {n_events} events"


def test_curation_funnel_monotone_and_gates_bite(spark):
    """Funnel sanity parity can't see: stages only shrink, the quality
    gate actually drops documents, both splits are non-empty, and
    train_clean + eval <= quality (nothing invented)."""
    from uav_streamprocessor_spark.operators import repetition

    register_uav_views(spark, SF_SMALL)
    got = {r["stage"]: r["n_docs"] for r in repetition.curation_funnel(spark).collect()}
    assert got["00_raw"] >= got["10_exact_dedup"] >= got["20_quality"]
    assert got["20_quality"] < got["10_exact_dedup"] or got["20_quality"] < got["00_raw"]
    assert got["30_train_split"] + got["41_eval_held_out"] == got["20_quality"]
    assert 0 < got["40_train_decontaminated"] <= got["30_train_split"]
    assert got["41_eval_held_out"] > 0


def test_nms_actually_suppresses_and_keeps_best(spark):
    """Non-vacuity (overlapping same-class boxes exist, so survivors <
    detections) and the invariant parity can't see: within every
    (camera, frame, class) group the highest-confidence box ALWAYS
    survives (nothing dominates it)."""
    from uav_streamprocessor_spark.operators import uav_extra

    register_uav_views(spark, SF_SMALL)
    det = spark.table("detections")
    surv = uav_extra.nms_one_pass_survivors(det)
    n_det, n_surv = det.count(), surv.count()
    assert 0 < n_surv < n_det, f"suppression vacuous: {n_surv}/{n_det}"
    from pyspark.sql import Window

    w = Window.partitionBy("camera_id", "frame_number", "class_name").orderBy(
        F.col("confidence").desc(), "det_id"
    )
    best = (
        det.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("det_id")
    )
    missing_best = best.join(surv.select("det_id"), "det_id", "left_anti").count()
    assert missing_best == 0, "a group's top box was suppressed"


def test_greedy_nms_matches_reference_and_contains_one_pass(spark):
    """Greedy survivors == a pure-python reference walk (exact), and the
    relational one-pass survivors are a subset (one-pass over-suppresses
    by design, never the reverse)."""
    from uav_streamprocessor_spark.operators import uav_extra

    register_uav_views(spark, SF_SMALL)
    det = spark.table("detections")
    greedy = {r["det_id"] for r in uav_extra.nms_greedy_survivors(det).collect()}
    one_pass = {
        r["det_id"] for r in uav_extra.nms_one_pass_survivors(det).collect()
    }
    assert one_pass <= greedy
    assert greedy, "greedy NMS must keep boxes"

    rows = det.select(
        "det_id", "camera_id", "frame_number", "class_name", "confidence",
        "x_min", "y_min", "x_max", "y_max",
    ).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(
            (r["camera_id"], r["frame_number"], r["class_name"]), []
        ).append(r)
    ref = set()
    for members in groups.values():
        members.sort(key=lambda r: (-r["confidence"], r["det_id"]))
        kept = []
        for r in members:
            area = (r["x_max"] - r["x_min"]) * (r["y_max"] - r["y_min"])
            ok = True
            for k in kept:
                iw = max(0, min(r["x_max"], k["x_max"]) - max(r["x_min"], k["x_min"]))
                ih = max(0, min(r["y_max"], k["y_max"]) - max(r["y_min"], k["y_min"]))
                inter = iw * ih
                karea = (k["x_max"] - k["x_min"]) * (k["y_max"] - k["y_min"])
                if inter * 100 >= 10 * (area + karea - inter):
                    ok = False
                    break
            if ok:
                kept.append(r)
                ref.add(r["det_id"])
    assert greedy == ref
