"""Crop-preprocess materialization job (X20 composed end-to-end).

The reference fixes scale variation ONCE before training: for every
image wider than 990 px it binarizes the Sobel gradient, closes +
erodes/dilates, crops to the largest contour's bounding box, and
rewrites the annotation coordinates shifted by the removed margin
(functional/data/preprocessing/split_labels.py:71-136). This module is
that job as a distributed build-once materialization:

* ``crop_offsets`` (operators/multimodal.py) computes the per-image
  crop decision inside an Arrow kernel — the only per-payload step;
* the annotation adjust (``adjust_label``, split_labels.py:38-68) is
  pure Catalyst: join offsets on media_id, subtract (dx, dy) from the
  quad coords, round half-up;
* ``materialize_crops`` writes offsets + adjusted annotations to
  parquet exactly once per (out_dir, snapshot_id) — re-invocations
  detect the committed marker row and read back instead of recomputing
  (same build-once semantics as plans/lineage.py's resume path).

At 100 TB the job is embarrassingly parallel (one image = one row, no
shuffle before the offsets join) and the offsets table is tiny next to
the payload bytes, so the downstream label-adjust join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import crop_offsets


def adjust_annotations(annotations: DataFrame, offsets: DataFrame,
                       coords_col: str = "coords") -> DataFrame:
    """Shift quad coordinates by the crop margin — the relational form
    of adjust_label (split_labels.py:38-68): even positions −dx, odd
    −dy, ``round`` half-up like the reference's ``str(round(coord))``.
    ``annotations``: (media_id, coords array<double>[8], ...);
    ``offsets``: crop_offsets output. Offsets are one row per image —
    small next to annotations — so the join broadcasts."""
    shifted = F.transform(
        F.col(coords_col),
        lambda c, i: F.round(
            c - F.when(i % 2 == 0, F.col("dx").cast("double"))
            .otherwise(F.col("dy").cast("double"))
        ).cast("long"),
    )
    return (
        annotations
        .join(F.broadcast(offsets.select("media_id", "dx", "dy")),
              "media_id")
        .withColumn(coords_col, shifted)
        .drop("dx", "dy")
    )


def _offsets_path(out_dir: str) -> str:
    return f"{out_dir}/crop_offsets"


def _annotations_path(out_dir: str) -> str:
    return f"{out_dir}/adjusted_annotations"


def _marker_path(out_dir: str) -> str:
    return f"{out_dir}/crop_commits"


def _committed(spark: SparkSession, out_dir: str, snapshot_id: str) -> bool:
    try:
        marker = spark.read.parquet(_marker_path(out_dir))
    except Exception:
        return False
    return marker.filter(F.col("snapshot_id") == snapshot_id).count() > 0


def materialize_crops(spark: SparkSession, media: DataFrame,
                      annotations: DataFrame, out_dir: str,
                      snapshot_id: str,
                      width_threshold: int = 990
                      ) -> tuple[DataFrame, DataFrame]:
    """Build-once: compute crop offsets + adjusted annotations for
    ``snapshot_id`` and write them under ``out_dir``; if the snapshot
    was already committed, read the materialized tables back without
    touching a payload byte. Returns (offsets, adjusted_annotations).
    """
    if not _committed(spark, out_dir, snapshot_id):
        # dynamic partition overwrite (per-write option, not a session
        # conf — a global setting would leak into later unrelated
        # overwrites): a re-run after a mid-job kill replaces this
        # snapshot's partition instead of appending dupes
        offsets = crop_offsets(media, width_threshold=width_threshold) \
            .withColumn("snapshot_id", F.lit(snapshot_id))
        offsets.write.mode("overwrite") \
            .option("partitionOverwriteMode", "dynamic") \
            .partitionBy("snapshot_id") \
            .parquet(_offsets_path(out_dir))
        committed_offsets = (
            spark.read.parquet(_offsets_path(out_dir))
            .filter(F.col("snapshot_id") == snapshot_id)
        )
        adjusted = adjust_annotations(annotations, committed_offsets) \
            .withColumn("snapshot_id", F.lit(snapshot_id))
        adjusted.write.mode("overwrite") \
            .option("partitionOverwriteMode", "dynamic") \
            .partitionBy("snapshot_id") \
            .parquet(_annotations_path(out_dir))
        # marker LAST: a kill between the writes re-runs the snapshot
        spark.createDataFrame([(snapshot_id,)], "snapshot_id string") \
            .write.mode("append").parquet(_marker_path(out_dir))
    offsets = spark.read.parquet(_offsets_path(out_dir)) \
        .filter(F.col("snapshot_id") == snapshot_id).drop("snapshot_id")
    adjusted = spark.read.parquet(_annotations_path(out_dir)) \
        .filter(F.col("snapshot_id") == snapshot_id).drop("snapshot_id")
    return offsets, adjusted
