"""Line-frame bounds for bulk NDJSON ingest.

The reference bounds newline framing at 128 KiB (512 KiB for the names dump) and
fails the stream on overflow (ref: common/src/main/scala/weco/concepts/common/
source/Scroll.scala:8-18, frame sizes at ingestor/IngestStream.scala:60-64,
overflow tested in ScrollTest.scala:14-63). ``spark.read.text`` has no max-line
option, so the guard runs as the first predicate after the scan: a corrupt
multi-hundred-MB line is rejected with a counted reason before it reaches the
JSON parser / shuffle, instead of ballooning downstream task memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ref: IngestStream.scala:60-64 — subjects dump framed at 128 KiB
DEFAULT_MAX_FRAME_BYTES = 128 * 1024

OVERFLOW_REASON = "frame_overflow"


def bounded_frames(
    lines: DataFrame,
    col: str = "value",
    max_bytes: int = DEFAULT_MAX_FRAME_BYTES,
    observation=None,
) -> tuple[DataFrame, DataFrame]:
    """Split a line DataFrame into (ok, overflow).

    ``overflow`` rows carry ``frame_bytes`` and ``reject_reason`` plus a
    truncated ``head`` of the offending line (enough to identify it in logs
    without shipping the whole frame around).

    Pass an ``Observation`` to get the overflow count for free off whatever
    action later consumes the ``ok`` side (metric key ``frame_overflow``) —
    no second scan of the raw input in the common zero-overflow case."""
    size = F.octet_length(F.col(col))
    tagged = lines.withColumn("__frame_bytes", size)
    if observation is not None:
        tagged = tagged.observe(
            observation,
            F.coalesce(
                F.sum((F.col("__frame_bytes") > max_bytes).cast("long")), F.lit(0)
            ).alias("frame_overflow"),
        )
    ok = tagged.filter(F.col("__frame_bytes") <= max_bytes).drop("__frame_bytes")
    overflow = tagged.filter(F.col("__frame_bytes") > max_bytes).select(
        F.col("__frame_bytes").alias("frame_bytes"),
        F.lit(OVERFLOW_REASON).alias("reject_reason"),
        F.substring(F.col(col), 1, 256).alias("head"),
    )
    return ok, overflow


class FrameOverflowError(RuntimeError):
    """Raised in strict mode when any line exceeds the frame bound
    (the reference's FramingException semantics)."""
