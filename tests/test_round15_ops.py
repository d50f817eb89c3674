"""Round-15 additions: mechanical canary-normalized fuse arithmetic
(VERDICT r14 #4) and its source-consistency rule, plus the dedicated
--streaming seed path (ADVICE r14 #1)."""

from __future__ import annotations

import json

import bench


def _canary_dict(jvm_each: float, udf: float) -> dict:
    out = {q: jvm_each for q in bench.CANARY if q != "uav_pixel_detections"}
    out["uav_pixel_detections"] = udf
    return out


def test_normalized_ratios_use_source_consistent_denominators(tmp_path):
    """The prev artifact is a MERGE: headline values are the driver's,
    rotation values the builder's, and their box fingerprints differ.
    Each prev value must be normalized by the canary of the RUN THAT
    MEASURED IT — pairing a builder-measured rotation value with the
    driver canary inflated every rotation ratio ~1.65x on the first
    r15 write (caught and fixed same-day)."""
    prev = {
        "queries": {"headline_q": 1.0, "rotation_q": 1.0},
        # merged top-level canary == driver's (driver writes last)
        "canary": _canary_dict(0.4, 1.0),  # jvm total 2.0, udf 1.0
        "runs_by_source": {
            "driver": {"headline_q": 1.0, **_canary_dict(0.4, 1.0)},
            # builder box ran 2x faster: jvm total 1.0, udf 0.5
            "builder": {"rotation_q": 1.0, **_canary_dict(0.2, 0.5)},
        },
    }
    prev_p = tmp_path / "BENCH_full_r14.json"
    prev_p.write_text(json.dumps(prev))
    out = {"canary": _canary_dict(0.2, 0.5)}  # cur box == builder speed
    measured = {"headline_q": 1.0, "rotation_q": 1.0}
    bench._normalized_ratios(
        out, measured, tmp_path / "BENCH_full_r15.json"
    )
    nr = out["normalized_ratios"]
    # headline_q: prev measured by the DRIVER (jvm canary 2.0) ->
    # normalized (1.0/1.0)/(1.0/2.0) = 2.0 -> fuse
    assert nr["headline_q"]["prev_source"] == "driver"
    assert nr["headline_q"]["normalized"] == 2.0
    # rotation_q: prev measured by the BUILDER (jvm canary 1.0) ->
    # normalized (1.0/1.0)/(1.0/1.0) = 1.0 -> no fuse
    assert nr["rotation_q"]["prev_source"] == "builder"
    assert nr["rotation_q"]["normalized"] == 1.0
    assert out["normalized_fuses"] == ["headline_q"]


def test_normalized_ratios_lane_split(tmp_path):
    """UDF-lane queries normalize against the pixel canary, JVM queries
    against the 5-query total — the lanes drift independently (r14)."""
    prev = {
        "queries": {"emb_kmeans_profile": 1.0, "rel_orders_rollup": 1.0},
        "canary": _canary_dict(0.2, 0.5),
        "runs_by_source": {
            "driver": {
                "emb_kmeans_profile": 1.0,
                "rel_orders_rollup": 1.0,
                **_canary_dict(0.2, 0.5),
            }
        },
    }
    (tmp_path / "BENCH_full_r14.json").write_text(json.dumps(prev))
    # cur: JVM lane unchanged (1.0 total), UDF lane 2x slower (1.0)
    out = {"canary": _canary_dict(0.2, 1.0)}
    measured = {"emb_kmeans_profile": 2.0, "rel_orders_rollup": 2.0}
    bench._normalized_ratios(
        out, measured, tmp_path / "BENCH_full_r15.json"
    )
    nr = out["normalized_ratios"]
    assert nr["emb_kmeans_profile"]["lane"] == "udf"
    # udf: (2.0/1.0)/(1.0/0.5) = 1.0 — excused by the pixel canary
    assert nr["emb_kmeans_profile"]["normalized"] == 1.0
    # jvm: (2.0/1.0)/(1.0/1.0) = 2.0 — a real fuse
    assert nr["rel_orders_rollup"]["lane"] == "jvm"
    assert nr["rel_orders_rollup"]["normalized"] == 2.0
    assert out["normalized_fuses"] == ["rel_orders_rollup"]


def test_normalized_ratios_skip_trivia_and_missing(tmp_path):
    """Sub-0.2s readings never open fuses (jitter), and queries absent
    from the prev artifact are skipped."""
    prev = {
        "queries": {"tiny_q": 0.05},
        "canary": _canary_dict(0.2, 0.5),
        "runs_by_source": {"driver": {"tiny_q": 0.05, **_canary_dict(0.2, 0.5)}},
    }
    (tmp_path / "BENCH_full_r14.json").write_text(json.dumps(prev))
    out = {"canary": _canary_dict(0.2, 0.5)}
    bench._normalized_ratios(
        out, {"tiny_q": 0.15, "new_q": 1.0}, tmp_path / "BENCH_full_r15.json"
    )
    assert out["normalized_ratios"]["tiny_q"]["normalized"] == 3.0
    assert out["normalized_fuses"] == []  # 3x but sub-0.2s both sides
    assert "new_q" not in out["normalized_ratios"]


def test_streaming_seed_artifact_survives_merge(tmp_path):
    """ADVICE r14 #1: a dedicated --streaming session that runs BEFORE
    any full run seeds a minimal artifact; _merge_full_artifact's
    precedence rule must then protect the dedicated reading from a
    later full run's in-session numbers."""
    seed = {
        "metric": "streaming_only_seed",
        "sf": 0.1,
        "streaming": {"ann_index": {"sec": 3.4}},
        "streaming_dedicated_session": True,
        "streaming_source": "builder",
    }
    p = tmp_path / "BENCH_full_r15.json"
    p.write_text(json.dumps(seed))
    out = {
        "queries": {"q": 1.0},
        "spread": {},
        "runs_by_source": {"driver": {"q": 1.0}},
        "canary_by_source": {"driver": 2.0},
        "streaming": {"ann_index": {"sec": 9.9}},  # polluted in-session
    }
    bench._merge_full_artifact(p, out)
    assert out["streaming"]["ann_index"]["sec"] == 3.4
    assert out["streaming_dedicated_session"] is True
    assert out["streaming_in_session"]["ann_index"]["sec"] == 9.9
