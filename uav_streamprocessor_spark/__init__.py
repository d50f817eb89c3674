"""uav_streamprocessor_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Rahimdzx/UAV-StreamProcessor.

The reference (read-only snapshot at /root/reference) is a single-threaded
Python video pipeline: read frames (image dir / video file / RTSP), record
to MP4, decimate to every-Nth keyframes, letterbox-resize to 640x640, run
object detection, and POST JPEG+JSON per keyframe to an HTTP endpoint
(reference README.md:3-12, uav/main.py:74-179).

This engine re-expresses that surface Spark-first:

- data model: `frames` / `detections` DataFrames (SURVEY.md §1.3) instead of
  per-frame Python objects (reference uav/custom_types.py:22-44, :5-20);
- operators: declarative DataFrame/SQL plans optimized by Catalyst instead of
  a hand-wired sequential loop (reference uav/main.py:109-141);
- pixel work: Arrow-batched pandas UDFs instead of per-frame OpenCV calls
  (reference uav/frame_processing.py:15-129);
- streams: Structured Streaming with watermarks + checkpointed sinks instead
  of a blocking RTSP iterator (reference uav/frame_reader.py:158-199).

Beyond the reference surface it adds large-scale training-data-pipeline
operators: exact/near dedup, embedding similarity search, text analysis, and
multimodal (binary) column plumbing.
"""

__version__ = "0.1.0"

from uav_streamprocessor_spark.config import PipelineConfig
from uav_streamprocessor_spark.session import get_spark

__all__ = ["PipelineConfig", "get_spark", "__version__"]
