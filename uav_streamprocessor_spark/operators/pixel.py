"""Pixel-level UDF layer (SURVEY.md §2 ops T1/T2/T3, M3 of the build plan).

The reference does per-frame OpenCV calls in one Python thread
(uav/frame_processing.py:15-129); here the same transforms run as
Arrow-batched pandas UDFs / mapInPandas so pixels cross the JVM↔Python
boundary in columnar batches, not row-at-a-time.

No image codec ships in this container, so the engine uses a deterministic
raw-tensor "codec": images are uncompressed uint8 H*W*3 byte buffers with
an 8-byte (H, W) header — the Spark-side plumbing (binary columns, batch
shapes, UDF signatures, per-executor model lifecycle) is real and tested;
`cv2.imencode`-backed codecs drop in behind `encode_image`/`decode_image`.

The detector is the deterministic hash-based stub promised in SURVEY.md
§2 (T2): box geometry/confidence derive from a seed of the pixel checksum,
so results are reproducible and oracle-checkable via the detections table;
a YOLO model is a drop-in replacement for `_detect_batch` (same
per-executor load-once pattern, reference uav/frame_processing.py:70-76).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from uav_streamprocessor_spark.config import DEFAULT_CONFIG, PipelineConfig
from uav_streamprocessor_spark.schemas import BBOX_STRUCT

_HEADER = struct.Struct("<II")  # (height, width), little-endian


def encode_image(arr: np.ndarray) -> bytes:
    """Raw-tensor encode: 8-byte (H, W) header + uint8 HxWx3 payload.
    Stand-in for cv2.imencode('.jpg', ...) (uav/frame_processing.py:221)."""
    h, w = arr.shape[:2]
    return _HEADER.pack(h, w) + arr.astype(np.uint8).tobytes()


def decode_image(buf: bytes) -> np.ndarray:
    """Stand-in for cv2.imdecode (uav/frame_reader.py:98)."""
    h, w = _HEADER.unpack_from(buf, 0)
    return np.frombuffer(buf, dtype=np.uint8, offset=_HEADER.size).reshape(h, w, 3)


def make_test_image(seed: int, height: int, width: int) -> bytes:
    """Deterministic synthetic image for fixtures/tests."""
    rng = np.random.RandomState(seed % (2**31))
    return encode_image(rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8))


def letterbox_array(img: np.ndarray, target: int = 640) -> np.ndarray:
    """Reference letterbox semantics (uav/frame_processing.py:29-44):
    aspect-preserving nearest-neighbor resize + symmetric zero padding.
    (The reference uses cv2.INTER_AREA; nearest keeps the container
    dependency-free — the geometry, which is what the oracle checks, is
    identical.)"""
    h, w = img.shape[:2]
    scale = min(target / w, target / h)
    new_w, new_h = int(w * scale), int(h * scale)
    ys = (np.arange(new_h) / scale).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(new_w) / scale).astype(np.int64).clip(0, w - 1)
    resized = img[ys][:, xs]
    pad_top = (target - new_h) // 2
    pad_left = (target - new_w) // 2
    out = np.zeros((target, target, 3), dtype=np.uint8)
    out[pad_top : pad_top + new_h, pad_left : pad_left + new_w] = resized
    return out


@pandas_udf(T.BinaryType())
def letterbox_udf(images: pd.Series) -> pd.Series:
    """T1 as an Arrow-batched scalar pandas UDF. On error returns the
    input unchanged — the reference's fallback (frame_processing.py:53-57)."""
    out = []
    for buf in images:
        try:
            out.append(encode_image(letterbox_array(decode_image(bytes(buf)))))
        except Exception:
            out.append(buf)
    return pd.Series(out)


@pandas_udf(T.BinaryType())
def annotate_udf(images: pd.Series, boxes: pd.Series) -> pd.Series:
    """T3 _draw_boxes (uav/frame_processing.py:123-129): green box borders
    drawn into the pixel buffer. Labels become per-box metadata downstream
    (text rasterization needs a font stack this container lacks)."""
    out = []
    for buf, bxs in zip(images, boxes):
        try:
            img = decode_image(bytes(buf)).copy()
            for b in bxs or []:
                x1, y1, x2, y2 = (
                    int(b["x_min"]), int(b["y_min"]), int(b["x_max"]), int(b["y_max"])
                )
                x1, x2 = max(x1, 0), min(x2, img.shape[1] - 1)
                y1, y2 = max(y1, 0), min(y2, img.shape[0] - 1)
                green = np.array([0, 255, 0], dtype=np.uint8)
                img[y1 : y2 + 1, [x1, x2]] = green
                img[[y1, y2], x1 : x2 + 1] = green
            out.append(encode_image(img))
        except Exception:
            out.append(buf)
    return pd.Series(out)


class StubDetector:
    """Deterministic detector: derives boxes from a checksum of the pixels.
    Mirrors the reference detector's contract (uav/frame_processing.py:
    60-129): conf threshold pushed into the call (:93), class whitelist
    (:103), int corner coords (:105-111), [] on error (:113-115)."""

    CLASSES = {2: "car", 0: "person", 7: "truck", 1: "bicycle", 16: "dog"}

    def __init__(self, confidence: float, classes: tuple[str, ...]):
        self.confidence = confidence
        self.class_ids = {i for i, n in self.CLASSES.items() if n in classes}

    def detect(self, img: np.ndarray) -> list[dict]:
        h, w = img.shape[:2]
        seed = int(img[::16, ::16].sum()) + h * 31 + w * 7
        n_boxes = seed % 4
        boxes = []
        for i in range(n_boxes):
            s = seed * 131 + i * 17
            conf = (s % 1000) / 1000.0
            cls_id = list(self.CLASSES)[s % 5]
            if conf < self.confidence or cls_id not in self.class_ids:
                continue
            x_min, y_min = s % max(w - 8, 1), (s * 3) % max(h - 8, 1)
            boxes.append(
                {
                    "x_min": int(x_min),
                    "y_min": int(y_min),
                    "x_max": int(min(x_min + 8 + s % 37, w)),
                    "y_max": int(min(y_min + 8 + s % 29, h)),
                    "confidence": conf,
                    "class_id": int(cls_id),
                    "class_name": self.CLASSES[cls_id],
                }
            )
        return boxes


def detect_objects(
    frames: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    image_col: str = "image",
    decode=None,
) -> DataFrame:
    """T2 via mapInPandas (iterator form): the detector loads ONCE per
    executor Python worker and streams Arrow batches through — the engine's
    version of the reference's load-once-at-init (frame_processing.py:70-76).
    Adds `detections array<struct>`; explode downstream for the flat table.

    `decode` is the codec seam: any bytes→HxWx3-uint8 callable (e.g. a
    cv2.imdecode wrapper) drops in; defaults to the raw-tensor codec.
    Passed functions pickle by value to executors, so the swap needs no
    module-path gymnastics."""
    out_schema = T.StructType(
        frames.schema.fields
        + [T.StructField("detections", T.ArrayType(BBOX_STRUCT), False)]
    )
    conf, classes = cfg.confidence, cfg.classes
    dec = decode or decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        detector = StubDetector(conf, classes)  # one load per worker
        for pdf in batches:
            dets = []
            for buf in pdf[image_col]:
                try:
                    dets.append(detector.detect(dec(bytes(buf))))
                except Exception:
                    dets.append([])  # skip-and-continue (frame_processing.py:113-115)
            pdf = pdf.copy()
            pdf["detections"] = [
                [
                    (b["x_min"], b["y_min"], b["x_max"], b["y_max"],
                     b["confidence"], b["class_id"], b["class_name"])
                    for b in row
                ]
                for row in dets
            ]
            yield pdf

    return frames.mapInPandas(run, schema=out_schema)


def explode_detections(detected: DataFrame) -> DataFrame:
    """Flatten the 1:N nesting into the keyed detections table
    (SURVEY.md §1.3)."""
    return detected.select(
        "camera_id",
        "frame_number",
        F.posexplode_outer("detections").alias("pos", "d"),
    ).select("camera_id", "frame_number", "pos", "d.*")


def letterbox_and_detect(
    frames: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    image_col: str = "image",
    codec=None,
) -> DataFrame:
    """Fused T1+T2: decode → letterbox → detect → encode in ONE
    mapInPandas pass. The separate operators pay decode+encode twice and
    ship the intermediate 640×640 buffer across two UDF boundaries; fused,
    each image crosses the Arrow boundary once — the pixel path's dominant
    cost at scale. Both unfused operators remain available for pipelines
    that need the intermediate.

    `codec` is an (encode, decode) pair — the swap seam for real image
    codecs (cv2.imencode/imdecode at JPEG quality 90, the reference's
    frame_processing.py:221); defaults to the raw-tensor codec."""
    out_schema = T.StructType(
        frames.schema.fields
        + [T.StructField("detections", T.ArrayType(BBOX_STRUCT), False)]
    )
    conf, classes = cfg.confidence, cfg.classes
    target = cfg.target_resolution
    enc, dec = codec or (encode_image, decode_image)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        detector = StubDetector(conf, classes)
        for pdf in batches:
            images, dets = [], []
            for buf in pdf[image_col]:
                try:
                    boxed = letterbox_array(dec(bytes(buf)), target)
                    images.append(enc(boxed))
                    dets.append(detector.detect(boxed))
                except Exception:
                    images.append(buf)  # frame_processing.py:53-57 fallback
                    dets.append([])     # frame_processing.py:113-115 fallback
            pdf = pdf.copy()
            pdf[image_col] = images
            pdf["detections"] = [
                [
                    (b["x_min"], b["y_min"], b["x_max"], b["y_max"],
                     b["confidence"], b["class_id"], b["class_name"])
                    for b in row
                ]
                for row in dets
            ]
            yield pdf

    return frames.mapInPandas(run, schema=out_schema)
