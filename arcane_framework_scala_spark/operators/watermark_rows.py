"""In-band watermark rows (T7 residue).

The reference threads watermarks through the data pipe as special one-cell
rows named ``watermark`` carrying serialized JSON (``DataCell.scala:25-44``,
``JsonWatermarkRow`` at ``:49-53``); the staging processor splits them out
and turns them into watermark-only batches
(``StagingProcessor.scala:44-70``). This engine's native design carries the
watermark *out of band* (``MicroBatch.watermark``) — better fit for
DataFrames — but interop with feeds produced by the reference needs the
in-band convention: a batch whose rows mix data with watermark-marker rows.

Convention on a DataFrame: a watermark row has non-null ``__watermark``
(the JSON payload) and nulls elsewhere; data rows have ``__watermark`` null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from arcane_framework_scala_spark.streaming.watermark import Watermark

WATERMARK_ROW_COLUMN = "__watermark"


def version_sort_key(v: str) -> tuple:
    """Total order over version strings that ranks numeric versions by
    value: plain lexicographic order would put '9' above '10', and a caller
    committing the last element as furthest progress would regress the
    watermark. Numeric strings compare by (length, value) ≡ integer order;
    non-numerics sort lexicographically after all numerics."""
    if v.isdigit():
        return (0, len(v), v)
    return (1, 0, v)


def split_watermark_rows(df: DataFrame) -> tuple[DataFrame, list[Watermark]]:
    """(data_rows, watermarks): drop marker rows from the data and decode
    their payloads. Marker payloads are tiny (one row per source batch) —
    collecting them to the driver is metadata, not data."""
    if WATERMARK_ROW_COLUMN not in df.columns:
        return df, []
    marker = F.col(WATERMARK_ROW_COLUMN).isNotNull()
    payloads = [
        r[0]
        for r in df.filter(marker).select(WATERMARK_ROW_COLUMN).collect()
    ]
    wms = [w for w in (Watermark.from_json(p) for p in payloads) if w is not None]
    # order by version so the caller commits the furthest progress last
    wms.sort(key=lambda w: version_sort_key(w.version))
    return df.filter(~marker).drop(WATERMARK_ROW_COLUMN), wms


def attach_watermark_row(df: DataFrame, wm: Watermark) -> DataFrame:
    """Append one in-band watermark marker row (reference
    ``JsonWatermarkRow`` shape) — used to produce reference-compatible
    feeds and in tests. Composable: a feed that already carries marker
    rows keeps them (the marker column is only initialized when absent,
    and the payload column itself is never null-filled)."""
    spark = df.sparkSession
    data = (
        df
        if WATERMARK_ROW_COLUMN in df.columns
        else df.withColumn(WATERMARK_ROW_COLUMN, F.lit(None).cast("string"))
    )
    marker = spark.createDataFrame([(wm.to_json(),)], f"{WATERMARK_ROW_COLUMN} string")
    for c in data.columns:
        if c != WATERMARK_ROW_COLUMN:
            marker = marker.withColumn(c, F.lit(None).cast(data.schema[c].dataType))
    return data.unionByName(marker.select(data.columns))
