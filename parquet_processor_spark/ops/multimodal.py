"""Multimodal columns (SURVEY.md §2.13): opaque binary payloads with
typed metadata, processed by Arrow-batched pandas stages.

The reference's media handling is per-page DOM scraping of typed media
records (media_type dispatch, test_parquet_processor.py:103-128,203-204).
The engine generalizes that: image/audio/video are `binary` columns
plus a metadata struct; decode/resize/frame-sample run as `mapInPandas`
stages so bytes never round-trip through Python row-by-row — Arrow
moves whole batches.

The actual codec step is STUBBED (no PIL/ffmpeg in this environment):
``decode_image`` raises NotImplementedError unless a deterministic fake
decoder is injected — the Spark-side plumbing (schema, batch shape,
partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_processor_spark.registry import query
from parquet_processor_spark.tables import t

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_image(content: bytes) -> dict[str, Any]:
    """Real image decode — requires an imaging library not present here.

    Inject ``fake_decoder`` (or your own) into ``extract_features``
    instead; this stub marks the seam.
    """
    raise NotImplementedError("image codec not available in this environment")


def fake_decoder(content: bytes) -> dict[str, Any]:
    """Deterministic stand-in decoder: derives dims/features from bytes."""
    n = len(content)
    return {
        "width": (n % 640) + 1,
        "height": (n % 480) + 1,
        "feature": [float(b) / 255.0 for b in content[:8]],
    }


def extract_features(
    media: DataFrame, decoder: Callable[[bytes], dict[str, Any]] = decode_image
) -> DataFrame:
    """mapInPandas feature extraction over binary media batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content) if row.content is not None else b""
                try:
                    d = decoder(content)
                    out.append(
                        {
                            "media_id": row.media_id,
                            "media_type": row.media_type,
                            "n_bytes": len(content),
                            "width": d.get("width"),
                            "height": d.get("height"),
                            "feature": d.get("feature"),
                        }
                    )
                except NotImplementedError:
                    out.append(
                        {
                            "media_id": row.media_id,
                            "media_type": row.media_type,
                            "n_bytes": len(content),
                            "width": None,
                            "height": None,
                            "feature": None,
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(run, FEATURE_SCHEMA)


def documents_as_media(spark: SparkSession, sf: str) -> DataFrame:
    """Synthesize a media table from documents (no binary testdata table):
    text bytes play the payload role; plumbing is identical."""
    return t(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("media_type"),
        F.col("text").cast("binary").alias("content"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


# Oracle-checkable slice of the multimodal path: binary length + magic
# bytes, all JVM-side.
@query(
    "multimodal_bytes",
    oracle="""
    select doc_id,
           octet_length(encode(text)) as n_bytes,
           hex(encode(substring(text, 1, 4))) as magic
    from documents
    """,
    tags=("multimodal",),
)
def multimodal_bytes(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "documents").select(
        "doc_id",
        F.octet_length(F.col("text").cast("binary")).alias("n_bytes"),
        F.hex(F.substring("text", 1, 4).cast("binary")).alias("magic"),
    )


# Full pandas-stage plumbing with the deterministic fake decoder. The
# fake derives every output from the payload bytes, so the oracle can
# replay it in SQL (documents are ASCII: code_point == byte value).
# The feature vector is emitted EXPLODED to scalar (idx, val) rows:
# harnesses canonicalize result frames with pandas sorts, and a raw
# array<double> cell is unhashable/unsortable there.
@query(
    "multimodal_features",
    oracle="""
    select doc_id as media_id,
           case when doc_id % 2 = 0 then 'image' else 'audio' end as media_type,
           cast(octet_length(encode(text)) as bigint) as n_bytes,
           cast((octet_length(encode(text)) % 640) + 1 as int) as width,
           cast((octet_length(encode(text)) % 480) + 1 as int) as height,
           unnest([{'feature_idx': cast(i - 1 as int),
                    'feature_val': ord(substring(text, cast(i as int), 1)) / 255.0}
                   for i in generate_series(1, least(8, octet_length(encode(text))))],
                  recursive := true)
    from documents
    """,
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    media = documents_as_media(spark, sf)
    feats = extract_features(media, decoder=fake_decoder)
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        "width",
        "height",
        F.posexplode("feature").alias("feature_idx", "feature_val"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def fake_resizer(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resampler: produces exactly
    width*height//64 bytes by cycling the payload."""
    target = max(width * height // 64, 1)
    if not content:
        return b"\x00" * target
    reps = target // len(content) + 1
    return (content * reps)[:target]


def resize_media(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    resizer: Callable[[bytes, int, int], bytes] = fake_resizer,
) -> DataFrame:
    """mapInPandas resize stage: batch in, batch out, 1:1 rows. A real
    deployment injects a PIL/libvips resizer; the Arrow plumbing,
    schema, and partitioning are identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content) if row.content is not None else b""
                out.append(
                    {
                        "media_id": row.media_id,
                        "media_type": row.media_type,
                        "content": resizer(content, width, height),
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """mapInPandas frame sampler: each payload row fans out to
    ``n_frames`` evenly spaced chunk rows (1:N — the video→frames
    explode). A real deployment decodes keyframes with ffmpeg; the
    deterministic fake slices the byte stream into equal windows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content) if row.content is not None else b""
                step = max(len(content) // n_frames, 1)
                for i in range(n_frames):
                    frame = content[i * step : (i + 1) * step]
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_idx": i,
                            "frame": frame,
                            "n_bytes": len(frame),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(run, FRAME_SCHEMA)


# Resize plumbing as a driver query: output sizes are deterministic, so
# the oracle recomputes the fake resizer's length/content contract in SQL.
@query(
    "multimodal_resize",
    oracle="""
    select doc_id as media_id,
           64 as width, 64 as height,
           cast(64 * 64 // 64 as bigint) as n_bytes
    from documents
    """,
    tags=("multimodal",),
)
def multimodal_resize(spark: SparkSession, sf: str) -> DataFrame:
    media = documents_as_media(spark, sf)
    resized = resize_media(media, 64, 64)
    return resized.select(
        "media_id",
        "width",
        "height",
        F.octet_length("content").cast("long").alias("n_bytes"),
    )


# Frame-sampling plumbing as a driver query. The binary frames
# themselves are unhashable for the harness, so the query projects the
# deterministic facts of the fake sampler's contract — per-frame byte
# count and head bytes — which the oracle replays in SQL (ASCII
# payloads: byte == code point, step = max(len//4, 1)).
@query(
    "multimodal_frames",
    oracle="""
    with m as (
      select doc_id, text,
             greatest(octet_length(encode(text)) // 4, 1) as step,
             octet_length(encode(text)) as total
      from documents where doc_id % 2 = 1
    )
    select doc_id as media_id,
           cast(i as int) as frame_idx,
           cast(least(greatest(total - i * step, 0), step) as bigint) as n_bytes,
           hex(encode(substring(text, cast(i * step + 1 as int),
                       cast(least(4, least(greatest(total - i * step, 0), step)) as int)))) as head
    from m, generate_series(0, 3) t(i)
    """,
    tags=("multimodal",),
)
def multimodal_frames(spark: SparkSession, sf: str) -> DataFrame:
    media = documents_as_media(spark, sf).where(F.col("media_type") == "audio")
    frames = sample_frames(media, n_frames=4)
    return frames.select(
        "media_id",
        "frame_idx",
        "n_bytes",
        F.hex(F.substring("frame", 1, 4)).alias("head"),
    )


# Exact media dedup by content hash — the FIRST dedup pass an image/
# audio corpus runs (byte-identical payloads under different ids:
# re-crawls, mirrors, re-uploads). The fixture has no duplicate
# payloads, so the operator INJECTS them deterministically (every
# 10th payload re-keyed +1e9 — the scan_csv_badrecords pattern) and
# the oracle replays the injection; the dedup logic itself is the
# production md5-of-bytes groupBy.
@query(
    "multimodal_dedup_bytes",
    oracle="""
    with media as (
      select doc_id as media_id, text as content from documents
      union all
      select doc_id + 1000000000 as media_id, text as content
      from documents where doc_id % 10 = 0
    )
    -- DuckDB md5 is VARCHAR-only; the payload bytes ARE the utf8 text
    -- bytes, so md5(text) equals Spark's md5 over the binary column.
    select md5(content) as fp,
           min(media_id) as keep_id,
           cast(count(*) as bigint) as n_copies
    from media group by 1
    """,
    tags=("multimodal", "dedup"),
)
def multimodal_dedup_bytes(spark: SparkSession, sf: str) -> DataFrame:
    """Group binary payloads by md5(bytes), keep the lowest media_id.

    100 TB shape: identical to dedup_exact but over the binary column
    — ONE map-side-combined groupBy on a 128-bit key; payload bytes
    never shuffle (the hash is computed beside the scan and only
    (fp, id) pairs cross the wire). For petabyte media at rest you'd
    hash at INGEST and store fp as a column; this operator is then a
    pure metadata aggregate.
    """
    base = documents_as_media(spark, sf.rstrip("/")).select("media_id", "content")
    dup = base.where(F.col("media_id") % 10 == 0).select(
        (F.col("media_id") + 1_000_000_000).alias("media_id"), "content"
    )
    media = base.unionByName(dup)
    return media.groupBy(F.md5("content").alias("fp")).agg(
        F.min("media_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
