"""Multimodal (image/audio/video) column plumbing.

Treat media as opaque ``binary`` columns plus a typed metadata struct.
Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` — one
Python worker per partition, whole record-batches across the boundary, never
row-at-a-time. The actual codecs (PIL/ffmpeg/torchvision) are NOT installed
in this environment, so the decode step is a clearly-marked stub with a
deterministic fake; everything Spark-side — schema, partitioning, UDF
signature, batch shape — is real and tested.

Scale notes: binary payloads make rows wide; keep
``spark.sql.files.maxPartitionBytes`` small enough that a partition of blobs
fits executor memory, and never collect blob columns. Feature extraction is
CPU-bound map-side work with no shuffle — it scales linearly with executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata carried alongside every blob.
BLOB_META_SCHEMA = T.StructType([
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("format", T.StringType()),      # jpeg | wav | mp4 | ...
    T.StructField("n_bytes", T.LongType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("mean_byte", T.DoubleType()),
])


def attach_blob_metadata(df: DataFrame, blob_col: str, kind: str, fmt: str) -> DataFrame:
    """Add the typed metadata struct for an opaque binary column."""
    return df.withColumn(
        "blob_meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(fmt).alias("format"),
            F.octet_length(F.col(blob_col)).cast("long").alias("n_bytes"),
        ),
    )


def decode_image_stub(blob: bytes) -> dict:
    """STUB — real decode needs PIL/libjpeg, not present in this container.

    The deterministic fake derives plausible dimensions from the payload so
    the distributed pipeline (schema, batching, downstream aggregation) is
    fully exercisable. Swap the body for ``PIL.Image.open(BytesIO(blob))``
    in a real deployment.
    """
    n = len(blob)
    if n == 0:
        raise NotImplementedError("empty blob: nothing to decode (stub)")
    return {
        "width": n % 640 + 1,
        "height": (n * 7) % 480 + 1,
        "n_channels": 3,
        "mean_byte": float(sum(blob[:64]) / min(n, 64)),
    }


def extract_image_features(df: DataFrame, blob_col: str, id_col: str) -> DataFrame:
    """(id, width, height, n_channels, mean_byte) via Arrow-batched
    mapInPandas. The UDF sees pandas DataFrames of whole record batches —
    the shape a real decoder (vectorized over the batch) would use."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + list(IMAGE_FEATURES_SCHEMA.fields)
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(b) for b in pdf[blob_col]]
            out = pd.DataFrame(feats)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(F.col(id_col).alias(id_col), F.col(blob_col)).mapInPandas(
        decode_batches, schema=out_schema
    )
