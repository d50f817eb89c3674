"""Round-11 additions: oracled shadows for the rows-only LSH/sketch set
(VERDICT r10 #5) — banding-partition law, bit-exact bucket codes, the
percentile_approx rank-error contract — plus the emb_ann_lsh promotion.

The cross-engine halves are proven by drive_driver (PARITY_sf*.json);
these tests pin the SINGLE-engine semantics the oracles rely on.
"""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_SMALL

from uav_streamprocessor_spark import registry


def _q(name, spark, sf=SF_SMALL):
    return registry.queries()[name](spark, sf)


def test_minhash_band_partition_law(spark):
    """Every document emits exactly one non-null (band, band_sig) row per
    band; band ids are 0..15 — the conservation law the oracle asserts."""
    rows = {r["band"]: r for r in _q("dedup_minhash_band_partition", spark).collect()}
    n_docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    )
    assert sorted(rows) == list(range(16))
    for r in rows.values():
        assert r["n_rows"] == r["n_docs"] == r["n_sigs"] == n_docs


def test_lsh_bucket_assignment_matches_sequential_fold(spark):
    """Bucket codes equal a Python sequential left-fold over the same
    plane constants — the operation order the DuckDB oracle replays.
    (numpy's pairwise-summation dot is deliberately NOT the reference:
    a near-zero dot may sign-flip under a different fold order.)"""
    from uav_streamprocessor_spark.operators.similarity import _planes

    planes = _planes()
    got = {
        r["vec_id"]: r["bucket"]
        for r in _q("emb_lsh_bucket_assignment", spark)
        .filter("vec_id < 20")
        .collect()
    }
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .filter("vec_id < 20")
        .collect()
    }
    assert len(got) == 20
    for vid, vec in emb.items():
        code = 0
        for i in range(planes.shape[0]):
            acc = 0.0
            for x, p in zip(vec, planes[i]):
                acc += float(x) * float(p)
            if acc >= 0:
                code += 1 << i
        assert got[vid] == code


def test_approx_percentile_bound_holds(spark):
    """percentile_approx's documented rank-error contract holds on the
    fixture data for every (group, quantile) — the constant-true table
    the oracle asserts."""
    rows = _q("rel_approx_percentile_bound", spark).collect()
    assert len(rows) > 0
    qs = {r["q"] for r in rows}
    assert qs == {0.25, 0.5, 0.75}
    assert all(r["within_bound"] for r in rows)
    # n_rows is the exact group size (the oracled integer anchor)
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    sizes = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    for r in rows:
        assert r["n_rows"] == sizes[r["o_orderstatus"]]


def test_simhash_band_partition_law(spark):
    """SimHash banding conservation: one row per doc per band, bands
    0..3, every band value inside the 16-bit mask."""
    rows = {r["band"]: r for r in _q("dedup_simhash_band_partition", spark).collect()}
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert sorted(rows) == [0, 1, 2, 3]
    for r in rows.values():
        assert r["n_rows"] == r["n_docs"] == r["n_in_range"] == n_docs


def test_approx_distinct_bound_holds(spark):
    """approx_count_distinct stays within 4*rsd of exact on the fixture
    data for every group — the constant-true table the oracle asserts —
    and the exact anchor matches a direct distinct count."""
    rows = _q("rel_approx_distinct_bound", spark).collect()
    assert len(rows) > 0
    assert all(r["within_bound"] for r in rows)
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    import pyspark.sql.functions as F

    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["exact_parts"] == exact[r["l_returnflag"]]


def test_hll_and_kll_bound_audits_hold(spark):
    """The HLL rollup and merged-KLL quantiles stay inside their
    documented accuracy contracts on the fixture data — the
    constant-true tables their oracles assert."""
    hll = _q("ev_hll_rollup_bound", spark).collect()
    assert len(hll) > 0 and all(r["within_bound"] for r in hll)
    kll = _q("ev_kll_rank_bound", spark).collect()
    assert {r["q"] for r in kll} == {0.5, 0.9, 0.99}
    assert all(r["within_bound"] for r in kll)


def test_topk_rollup_exact_regime_matches_sql(spark, duck):
    """ev_topk_users_rollup's promotion premise: at tested SFs every
    (type, day) group is far under maxItemsTracked, so the merged
    sketch output EQUALS the exact SQL top-k (count desc, user_id).
    Also pins the regime margin so a fixture change that breaks the
    premise fails loudly here rather than as an oracle mismatch."""
    got = [
        (r["event_type"], r["rnk"], r["user_id"], r["est_count"])
        for r in _q("ev_topk_users_rollup", spark).collect()
    ]
    want = duck.sql(
        """
        SELECT event_type, CAST(rnk AS INT), user_id, CAST(est_count AS BIGINT)
        FROM (
          SELECT event_type, user_id, count(*) AS est_count,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY count(*) DESC, user_id) AS rnk
          FROM events GROUP BY 1, 2
        ) WHERE rnk <= 10 ORDER BY event_type, rnk
        """
    ).fetchall()
    assert sorted(got) == sorted([tuple(r) for r in want])
    margin = duck.sql(
        """
        SELECT max(c) FROM (
          SELECT event_type, CAST(ts AS DATE), count(DISTINCT user_id) AS c
          FROM events GROUP BY 1, 2)
        """
    ).fetchone()[0]
    assert margin <= 4096  # the exact-regime premise


def test_media_metadata_stats_is_docid_arithmetic(spark):
    """media_metadata_stats' promotion premise: the metadata columns
    derive from doc_id arithmetic alone (modality = doc_id % 3,
    constant dims, payload always present)."""
    rows = {r["media_type"]: r for r in _q("media_metadata_stats", spark).collect()}
    assert set(rows) == {"image", "video", "audio"}
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert sum(r["n_items"] for r in rows.values()) == n_docs
    for r in rows.values():
        assert r["with_payload"] == r["n_items"]
    assert rows["image"]["avg_width"] == 32.0
    assert rows["video"]["avg_width"] == 16.0
    assert rows["audio"]["avg_width"] is None


def test_hll_overlap_bound_holds(spark):
    """The inclusion-exclusion overlap stays inside its compounded
    accuracy contract for every type pair, and the exact anchor counts
    the true intersection."""
    rows = _q("ev_hll_overlap_bound", spark).collect()
    assert len(rows) > 0 and all(r["within_bound"] for r in rows)
    # pairs enumerate ALL type pairs, zero-overlap included
    import math

    n_types = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_type"
    ).distinct().count()
    assert len(rows) == math.comb(n_types, 2)


def test_zorder_layout_beats_linear_on_second_column(spark):
    """The audit's load-bearing claim: z-order keeps BOTH columns' per-
    file spans bounded, linear sort leaves column b at ~full range —
    the reason OPTIMIZE ZORDER exists."""
    import statistics

    rows = _q("rel_zorder_layout", spark, "/root/testdata/sf0.01").collect()
    by_layout = {}
    for r in rows:
        by_layout.setdefault(r["layout"], []).append(r)
    z_b = statistics.mean(r["b_span"] for r in by_layout["zorder"])
    lin_b = statistics.mean(r["b_span"] for r in by_layout["linear"])
    lin_a = statistics.mean(r["a_span"] for r in by_layout["linear"])
    # columns are min-max scaled to 0..1023 before interleaving, so the
    # spans are in scaled units at every SF: linear is tight on its
    # sort column and ~useless on the other
    assert lin_a < 64 and lin_b > 512
    # z-order keeps the second column's span well below linear's
    assert z_b < lin_b / 2
    # file assignment is total: every row lands in exactly one file
    n = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").count()
    assert sum(r["n_rows"] for r in by_layout["zorder"]) == n
    assert sum(r["n_rows"] for r in by_layout["linear"]) == n


def test_ann_lsh_oracle_sql_shape():
    """The generated ANN oracle embeds all 8 plane CASE terms with
    exponent-form double literals (DECIMAL parsing would change the
    arithmetic) and the hamming probe + re-rank structure."""
    from uav_streamprocessor_spark.operators.similarity import (
        _N_PLANES,
        ann_lsh_oracle_sql,
        lsh_bucket_oracle_sql,
    )

    for sql in (ann_lsh_oracle_sql(), lsh_bucket_oracle_sql()):
        assert sql.count("CASE WHEN") == _N_PLANES
        assert "e-" in sql or "e+" in sql  # exponent-form literals
    sql = ann_lsh_oracle_sql()
    assert "bit_count(xor(" in sql
    assert "row_number() OVER (PARTITION BY query_id" in sql
