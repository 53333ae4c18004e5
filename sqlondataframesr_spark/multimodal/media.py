"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the raw media is an
opaque ``binary`` column (or a pointer into object storage) riding
next to typed metadata (media_type, width/height/duration), and every
transform is either

- pure column expressions over the metadata (JVM-side, free), or
- an Arrow-batched ``mapInPandas`` over the payload bytes (the decode/
  featurize/resize family) — batch-at-a-time numpy, never row-at-a-time
  Python.

The decode step itself needs codec libraries (Pillow / ffmpeg / soundfile)
that are NOT in this environment, so it is stubbed behind
``NotImplementedError`` with a deterministic fake used by tests — the
Spark-side plumbing (schema, UDF signature, Arrow batch shape,
partition-preserving map) is real and tested.

Since the driver testdata has no binary table, :func:`media_frame`
manufactures one deterministically from ``documents`` (payload =
utf8 bytes of the text; media_type/width/height derived from
doc_id/n_chars) — both engines can rebuild it bit-for-bit, which is
what makes the checksum query oracle-checkable.

Scale notes: ``mapInPandas`` is a narrow (partition-local) transform —
no shuffle; payload bytes never cross the network except at scan.
Metadata-only queries prune the payload column at the parquet reader
(columnar layout means the binary column is never even read), which is
the whole point of carrying media as a column instead of files.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

HIST_BUCKETS = 16

#: media_type by doc_id residue — stand-in for a real modality column.
_MEDIA_TYPE = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media_type, payload binary, width, height)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_MEDIA_TYPE).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.lit(32) + F.col("n_chars") % 480).cast("int").alias("width"),
        (F.lit(32) + (F.col("n_chars") * 7) % 480).cast("int").alias("height"),
    )


def mm_media_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata + payload checksum — exercises the binary column
    end-to-end (encode, octet length, md5 over bytes) with an oracle."""
    return media_frame(spark, sf_dir).select(
        "doc_id",
        "media_type",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        "width",
        "height",
    ).orderBy("doc_id")


def byte_histogram(media: DataFrame, buckets: int = HIST_BUCKETS) -> DataFrame:
    """Per-payload normalized byte histogram via Arrow-batched
    ``mapInPandas`` — the featurize-binary shape (binary → fixed-size
    float vector), numpy over whole record batches."""
    import numpy as np

    out_schema = "doc_id long, hist array<double>"
    width = 256 // buckets

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            hists = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                h = np.bincount(arr // width, minlength=buckets)
                total = h.sum()
                hists.append((h / total if total else h).round(6).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "hist": hists})

    return media.select("doc_id", "payload").mapInPandas(featurize, out_schema)


def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return byte_histogram(media_frame(spark, sf_dir)).orderBy("doc_id")


# --- stubbed decoders (codec libs not installed here) ----------------


def decode_image(media: DataFrame) -> DataFrame:
    """STUB: real image decode needs Pillow/opencv (not in this
    environment). The schema and mapInPandas shape are what a real
    implementation would use."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - always taken here
        raise NotImplementedError(
            "image decode requires Pillow; install it and implement the "
            "mapInPandas body (payload → ndarray → features)"
        ) from exc
    raise NotImplementedError("decode body not implemented")  # pragma: no cover


def sample_frames(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """STUB: video frame sampling needs ffmpeg bindings."""
    try:
        import av  # noqa: F401
    except ImportError as exc:  # pragma: no cover - always taken here
        raise NotImplementedError(
            "frame sampling requires PyAV/ffmpeg; the operator contract is "
            "payload → exploded (doc_id, frame_idx, frame_png binary) rows"
        ) from exc
    raise NotImplementedError("sampling body not implemented")  # pragma: no cover


#: frame-sampling geometry: synthetic fps and per-doc duration
FPS = 25
_DURATION_S = "1 + doc_id % 30"


def mm_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling PLAN for the video rows: one output row per
    to-be-decoded frame (doc_id, frame_idx, t_ms) at 1 frame/second.
    This is the metadata half of :func:`sample_frames` — compute WHICH
    frames to decode as pure column expressions (sequence + explode,
    no payload read, no UDF), then feed the (doc_id, frame_idx) list
    to the Arrow decode stage. At 100 TB the planning pass never
    touches payload bytes: columnar parquet means the binary column
    is not even read (ReadSchema excludes it).

    Duration is derived deterministically from doc_id (no real
    containers in the testdata); a real table carries duration_s as
    probed metadata and the identical plan applies.
    """
    media = media_frame(spark, sf_dir).filter(F.col("media_type") == "video")
    return (
        media.withColumn("duration_s", F.expr(_DURATION_S).cast("int"))
        .select(
            "doc_id",
            "duration_s",
            F.explode(F.expr("sequence(0, duration_s - 1)")).alias("sec"),
        )
        .select(
            "doc_id",
            (F.col("sec") * FPS).cast("long").alias("frame_idx"),
            (F.col("sec") * 1000).cast("long").alias("t_ms"),
        )
        .orderBy("doc_id", "frame_idx")
    )


MM_FRAME_PLAN_ORACLE = f"""
WITH vids AS (
  SELECT doc_id, CAST({_DURATION_S} AS INT) AS duration_s
  FROM documents
  WHERE ({_MEDIA_TYPE}) = 'video'
),
secs AS (SELECT doc_id, unnest(range(0, duration_s)) AS sec FROM vids)
SELECT doc_id,
       CAST(sec * {FPS} AS BIGINT) AS frame_idx,
       CAST(sec * 1000 AS BIGINT) AS t_ms
FROM secs
ORDER BY doc_id, frame_idx
"""


MM_MEDIA_CHECKSUM_ORACLE = f"""
SELECT doc_id,
       {_MEDIA_TYPE.replace("doc_id", "doc_id")} AS media_type,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5,
       CAST(32 + n_chars % 480 AS INTEGER) AS width,
       CAST(32 + (n_chars * 7) % 480 AS INTEGER) AS height
FROM documents
ORDER BY doc_id
"""


QUERIES = {
    "mm_media_checksum": mm_media_checksum,
    "mm_frame_plan": mm_frame_plan,
    # mapInPandas featurizer: not SQL-expressible in DuckDB (byte-level
    # blob iteration) → rows-only driver check; pytest pins the values.
    "mm_byte_histogram": mm_byte_histogram,
}

ORACLES = {
    "mm_media_checksum": MM_MEDIA_CHECKSUM_ORACLE,
    "mm_frame_plan": MM_FRAME_PLAN_ORACLE,
}

SPARK_SQL: dict[str, str] = {}
