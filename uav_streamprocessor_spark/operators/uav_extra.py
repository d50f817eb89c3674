"""Additional UAV-surface operators: coordinate un-letterboxing, array
projections of the frame→detections nesting, frame-file export (U1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uav_streamprocessor_spark.config import DEFAULT_CONFIG, PipelineConfig
from uav_streamprocessor_spark.functions.geometry import letterbox_columns
from uav_streamprocessor_spark.operators.uav_core import filter_detections


def detections_in_original_coords(
    frames: DataFrame, detections: DataFrame, target: int = 640
) -> DataFrame:
    """Inverse letterbox: map detection boxes from the 640×640 canvas back
    to original frame pixels — the operator a consumer of the reference's
    output needs, since detection ran on the letterboxed frame
    (uav/main.py:122-125) while the recorded video is original-size
    (uav/main.py:113). x_orig = floor((x - pad_left) / scale), clamped to
    the frame; all Catalyst expressions, joined via the tiny per-frame
    geometry (broadcastable after distinct on (w, h))."""
    geo = letterbox_columns(F.col("width"), F.col("height"), target)
    fgeo = frames.select(
        "camera_id",
        "frame_number",
        "width",
        "height",
        geo["scale"].alias("scale"),
        geo["pad_left"].alias("pad_left"),
        geo["pad_top"].alias("pad_top"),
    )

    def unmap(c, pad, limit):
        v = F.floor((F.col(c) - F.col(pad)) / F.col("scale")).cast("int")
        return F.least(F.greatest(v, F.lit(0)), F.col(limit))

    return (
        detections.join(fgeo, ["camera_id", "frame_number"])
        .select(
            "det_id",
            "camera_id",
            "frame_number",
            "class_name",
            unmap("x_min", "pad_left", "width").alias("x_min_orig"),
            unmap("y_min", "pad_top", "height").alias("y_min_orig"),
            unmap("x_max", "pad_left", "width").alias("x_max_orig"),
            unmap("y_max", "pad_top", "height").alias("y_max_orig"),
        )
    )


def frame_detection_summary(
    detections: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """The reference's per-keyframe log line (uav/main.py:126-129):
    len(bboxes) and the class-name list. Array built via sort_array
    (det_id order) then projected to a string so the result is
    engine-portable; size() = main.py:127's len()."""
    det = filter_detections(detections, cfg)
    per_frame = (
        det.groupBy("camera_id", "frame_number")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("det_id", "class_name"))
            ).alias("ds")
        )
    )
    names = F.transform(F.col("ds"), lambda x: x["class_name"])
    return per_frame.select(
        "camera_id",
        "frame_number",
        F.size(F.col("ds")).alias("n_boxes"),
        F.concat_ws(",", names).alias("class_names"),
        F.size(F.array_distinct(names)).alias("n_distinct_classes"),
        F.array_contains(names, "car").cast("int").alias("has_car"),
    )


def export_frame_files(frames_with_images: DataFrame, out_dir: str) -> int:
    """U1 extract_frames (uav/video_splitter.py:6-25): write each frame's
    image bytes as `frame_%05d` files under out_dir/camera_id/. Runs
    per-partition on executors (foreachPartition) — the distributed form
    of the reference's sequential decode-and-write loop. Returns the row
    count written, from an accumulator, so the input scans exactly once."""
    import os

    acc = frames_with_images.sparkSession.sparkContext.accumulator(0)

    def write_partition(rows):
        n = 0
        for r in rows:
            d = os.path.join(out_dir, r["camera_id"])
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"frame_{r['frame_number']:05d}.raw"), "wb") as f:
                f.write(bytes(r["image"]))
            n += 1
        acc.add(n)

    frames_with_images.select(
        "camera_id", "frame_number", "image"
    ).foreachPartition(write_partition)
    return acc.value


def camera_frame_gaps(frames: DataFrame) -> DataFrame:
    """Per-camera continuity audit via applyInPandas (grouped-map): find
    gaps in the frame_number sequence — the streaming-health check a real
    deployment of the reference needs (its RTSP reader silently ends the
    stream on a failed grab, uav/frame_reader.py:184-190).

    NOTE: the built-in lead() window over (camera_id) expresses this
    exact query JVM-side — it IS the registered oracle — and is what a
    production pipeline should use. This function deliberately keeps the
    applyInPandas form as the engine's grouped-map showcase (per-group
    ordered logic, cameras as the parallelism unit), verified against the
    built-in twin."""
    import pandas as pd

    def find_gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        nums = pdf["frame_number"].sort_values().to_numpy()
        out = []
        if len(nums):
            diffs = nums[1:] - nums[:-1]
            for i in (diffs > 1).nonzero()[0]:
                out.append((pdf["camera_id"].iloc[0], int(nums[i]),
                            int(nums[i + 1]), int(nums[i + 1] - nums[i] - 1)))
        return pd.DataFrame(
            out, columns=["camera_id", "gap_after", "resume_at", "missing"]
        )

    return frames.select("camera_id", "frame_number").groupBy("camera_id").applyInPandas(
        find_gaps,
        schema="camera_id string, gap_after long, resume_at long, missing long",
    )


def detection_labels(detections: DataFrame, cfg=None) -> DataFrame:
    """T3's label strings ("{class}: {conf:.2f}", uav/frame_processing.py:
    126, custom_types.py:18-20) as a relational projection — format_string
    over a 2dp-rounded confidence (rounding first keeps Java vs C printf
    half-rounding differences out of the formatted text)."""
    from uav_streamprocessor_spark.config import DEFAULT_CONFIG
    from uav_streamprocessor_spark.operators.uav_core import filter_detections

    det = filter_detections(detections, cfg or DEFAULT_CONFIG)
    return det.select(
        "det_id",
        "camera_id",
        "frame_number",
        # round via integer scaling: Spark's round(x, 2) goes through a
        # decimal-string HALF_UP while DuckDB rounds the binary value —
        # they disagree on exact .xx5 doubles. round(x*100)/100 sees the
        # same IEEE product in both engines.
        F.format_string(
            "%s: %.2f",
            F.col("class_name"),
            F.round(F.col("confidence") * 100) / 100,
        ).alias("label"),
    )


def nms_one_pass_survivors(detections: DataFrame, iou_pct: int = 10) -> DataFrame:
    """One-pass non-maximum suppression: a detection is suppressed when a
    HIGHER-confidence detection of the same (camera, frame, class) has
    IoU >= iou_pct/100 with it (ties break on lower det_id, so dominance
    is a strict total order). Relational NMS — the detector post-step the
    reference's YOLO applies internally (uav/frame_processing.py:88-120
    consumes already-suppressed boxes); one pass differs from greedy NMS
    only when a suppressed box would itself have suppressed a third box
    (one-pass suppresses MORE; documented, deterministic).

    Exactness: IoU >= t is evaluated as 100*inter >= iou_pct*union in
    INTEGER arithmetic — no float division, so Spark and the DuckDB
    oracle agree to the bit. Join keys are the (camera, frame, class)
    equi-columns; candidates per task are bounded by per-frame box
    counts, never the table."""
    d = detections.select(
        "det_id", "camera_id", "frame_number", "class_name", "confidence",
        "x_min", "y_min", "x_max", "y_max",
    )
    a, b = d.alias("a"), d.alias("b")
    ix = F.greatest(
        F.lit(0),
        F.least(F.col("a.x_max"), F.col("b.x_max"))
        - F.greatest(F.col("a.x_min"), F.col("b.x_min")),
    )
    iy = F.greatest(
        F.lit(0),
        F.least(F.col("a.y_max"), F.col("b.y_max"))
        - F.greatest(F.col("a.y_min"), F.col("b.y_min")),
    )
    inter = ix * iy

    def area(p: str):
        return (F.col(f"{p}.x_max") - F.col(f"{p}.x_min")) * (
            F.col(f"{p}.y_max") - F.col(f"{p}.y_min")
        )

    dominates = (F.col("b.confidence") > F.col("a.confidence")) | (
        (F.col("b.confidence") == F.col("a.confidence"))
        & (F.col("b.det_id") < F.col("a.det_id"))
    )
    suppressed = a.join(
        b,
        (F.col("a.camera_id") == F.col("b.camera_id"))
        & (F.col("a.frame_number") == F.col("b.frame_number"))
        & (F.col("a.class_name") == F.col("b.class_name"))
        & dominates
        & (inter * 100 >= F.lit(iou_pct) * (area("a") + area("b") - inter)),
        "leftsemi",
    ).select("det_id")
    return (
        d.join(suppressed, "det_id", "left_anti")
        .select(
            "det_id", "camera_id", "frame_number", "class_name",
            F.round("confidence", 6).alias("confidence"),
        )
    )


def nms_greedy_survivors(detections: DataFrame, iou_pct: int = 10) -> DataFrame:
    """EXACT greedy non-maximum suppression via applyInPandas per
    (camera_id, frame_number, class_name) group: walk boxes in
    (confidence desc, det_id) order, keep a box only if its IoU with
    every ALREADY-KEPT box is < iou_pct/100. This is the sequential
    algorithm detector stacks implement; the relational twin
    (nms_one_pass_survivors) over-suppresses exactly when a suppressed
    box would itself have suppressed a third — greedy survivors are
    therefore a SUPERSET of one-pass survivors (pinned in tests).

    Scale: groups are per-frame-per-class (tens of boxes) — the
    iterative scan is O(kept * boxes) inside one Arrow batch; the only
    shuffle is the groupBy key. Integer IoU arithmetic, same as the
    relational form."""
    import pandas as pd

    out_schema = (
        "det_id long, camera_id string, frame_number long, "
        "class_name string, confidence double"
    )

    def suppress(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["confidence", "det_id"], ascending=[False, True])
        kept = []
        rows = pdf[["det_id", "x_min", "y_min", "x_max", "y_max"]].to_numpy()
        keep_mask = []
        for det_id, x0, y0, x1, y1 in rows:
            area = (x1 - x0) * (y1 - y0)
            ok = True
            for kx0, ky0, kx1, ky1, karea in kept:
                iw = max(0, min(x1, kx1) - max(x0, kx0))
                ih = max(0, min(y1, ky1) - max(y0, ky0))
                inter = iw * ih
                if inter * 100 >= iou_pct * (area + karea - inter):
                    ok = False
                    break
            keep_mask.append(ok)
            if ok:
                kept.append((x0, y0, x1, y1, area))
        out = pdf[keep_mask]
        return pd.DataFrame(
            {
                "det_id": out["det_id"],
                "camera_id": out["camera_id"],
                "frame_number": out["frame_number"],
                "class_name": out["class_name"],
                "confidence": out["confidence"].round(6),
            }
        )

    d = detections.select(
        "det_id", "camera_id", "frame_number", "class_name", "confidence",
        "x_min", "y_min", "x_max", "y_max",
    )
    return d.groupBy("camera_id", "frame_number", "class_name").applyInPandas(
        suppress, schema=out_schema
    )


def motion_vectors(detections: DataFrame) -> DataFrame:
    """Per-(camera, class) motion estimate from the detection stream —
    the tracking-lite analytics the reference's downstream command
    center would compute from its POSTed keyframes: follow the
    most-confident box of each class between consecutive keyframes and
    report its displacement statistics.

    Track proxy: per (camera_id, class_name, frame_number) keep the
    max-confidence detection (det_id tie-break — deterministic), then
    lag its center across the keyframe sequence. speed is px/frame
    (displacement over the actual frame gap, so missing keyframes don't
    inflate it). All window partitions are (camera, class) — bounded,
    shuffle-friendly; no global sort. Fully oracle-checkable: centers
    and hypot are exact arithmetic both engines."""
    best = Window.partitionBy(
        "camera_id", "class_name", "frame_number"
    ).orderBy(F.col("confidence").desc(), "det_id")
    track = Window.partitionBy("camera_id", "class_name").orderBy("frame_number")
    cx = (F.col("x_min") + F.col("x_max")) / 2.0
    cy = (F.col("y_min") + F.col("y_max")) / 2.0
    top = (
        filter_detections(detections)
        .withColumn("_rn", F.row_number().over(best))
        .filter(F.col("_rn") == 1)
        .select(
            "camera_id",
            "class_name",
            "frame_number",
            cx.alias("cx"),
            cy.alias("cy"),
        )
    )
    dx = F.col("cx") - F.lag("cx").over(track)
    dy = F.col("cy") - F.lag("cy").over(track)
    gap = F.col("frame_number") - F.lag("frame_number").over(track)
    moved = top.select(
        "camera_id",
        "class_name",
        "frame_number",
        (F.sqrt(dx * dx + dy * dy) / gap).alias("speed_px_per_frame"),
    ).filter(F.col("speed_px_per_frame").isNotNull())
    return (
        moved.groupBy("camera_id", "class_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_moves"),
            F.round(F.avg("speed_px_per_frame"), 6).alias("avg_speed"),
            F.round(F.max("speed_px_per_frame"), 6).alias("max_speed"),
        )
        .orderBy("camera_id", "class_name")
    )


def class_cooccurrence(detections: DataFrame) -> DataFrame:
    """Class co-occurrence lift across keyframes: for each unordered
    class pair, how often they share a (camera, frame) vs what
    independence predicts — lift = p(a∧b) / (p(a)·p(b)) over frames.
    Lift ≫ 1 is scene structure ('person' rides with 'car' at crossings)
    the per-class counts can't show; the command-center analytics the
    reference's per-frame POSTs feed into.

    Frame-level presence first (distinct class per frame — box counts
    don't inflate the statistic), then a self-join on the frame key:
    pair rows are bounded by (classes-per-frame choose 2) per frame,
    never all-pairs across frames. Lift denominators ride a 1-row
    broadcast scalar. All classes participate (only the confidence
    gate applies — a co-occurrence matrix restricted to the 2-class
    whitelist would be a single cell)."""
    present = (
        detections.filter(F.col("confidence") >= 0.4)
        .select("camera_id", "frame_number", "class_name")
        .distinct()
    )
    frames_total = (
        present.select("camera_id", "frame_number")
        .distinct()
        .agg(F.count(F.lit(1)).cast("double").alias("n_frames"))
    )
    per_class = present.groupBy("class_name").agg(
        F.count(F.lit(1)).alias("n_class")
    )
    a = present.select(
        "camera_id", "frame_number", F.col("class_name").alias("class_a")
    )
    b = present.select(
        "camera_id", "frame_number", F.col("class_name").alias("class_b")
    )
    pairs = (
        a.join(b, ["camera_id", "frame_number"])
        .filter(F.col("class_a") < F.col("class_b"))
        .groupBy("class_a", "class_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ca = per_class.select(
        F.col("class_name").alias("class_a"), F.col("n_class").alias("n_a")
    )
    cb = per_class.select(
        F.col("class_name").alias("class_b"), F.col("n_class").alias("n_b")
    )
    lift = (F.col("n_both") * F.col("n_frames")) / (
        F.col("n_a") * F.col("n_b")
    )
    return (
        pairs.join(F.broadcast(ca), "class_a")
        .join(F.broadcast(cb), "class_b")
        .crossJoin(F.broadcast(frames_total))
        .select(
            "class_a",
            "class_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(lift, 6).alias("lift"),
        )
        .orderBy("class_a", "class_b")
    )
