"""Multimodal columns (north-star addition): image/audio/video payloads
as opaque ``binary`` columns with a typed metadata struct.

The decode/feature-extract stages that need media libraries (PIL,
ffmpeg, torchaudio …) are STUBBED — this container has none of them —
but everything Spark-side is real and tested: the schema, the Arrow
batch shape through ``mapInPandas``, the partitioning guidance, and a
deterministic fake feature path so downstream operators (embedding
similarity, dedup) can be exercised end-to-end.

Layout guidance at 100 TB: keep payload bytes in their own column so
Parquet column pruning skips them for metadata-only queries; partition
by (modality, ingest date); size ``spark.sql.files.maxPartitionBytes``
for ~128 MB tasks of mostly-binary rows; never collect payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FEATURE_DIM = 16
_FEATURE_SCHEMA = (
    "media_id long, modality string, payload_bytes long, payload_md5 string, "
    f"feature array<float>"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for the test corpus: wrap documents.text as utf-8 binary
    payloads so the multimodal plumbing has real rows to flow."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("modality"),
        F.lit("text/plain").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(media: DataFrame) -> DataFrame:
    """REAL-DECODER STUB. In production: mapInPandas over payload with
    PIL → pixel arrays / resize / EXIF. The library is absent here by
    design; the signature and batch shape are the deliverable."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg — not available in this "
        "container; use extract_features(fake=True) for the plumbing path"
    )


def sample_video_frames(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """REAL-DECODER STUB (ffmpeg frame sampling)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg — not available in this "
        "container; use extract_features(fake=True) for the plumbing path"
    )


def extract_features(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """Per-payload feature extraction through ``mapInPandas`` — the real
    Arrow batch path a production extractor uses, with a deterministic
    md5-seeded fake feature vector standing in for the model forward
    pass. Columns: payload size + md5 (real), 16-dim float feature
    (fake-but-deterministic)."""
    if not fake:
        raise NotImplementedError(
            "real feature extraction needs a model runtime; fake=True "
            "exercises the identical Spark plumbing"
        )

    dim = _FEATURE_DIM

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure: executors may not have gibbon_spark
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            sizes, digests, feats = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                sizes.append(len(b))
                d = hashlib.md5(b).hexdigest()
                digests.append(d)
                # deterministic pseudo-feature: bytes of the digest,
                # centered and scaled — stands in for a model embedding
                raw = np.frombuffer(bytes.fromhex(d), dtype=np.uint8)
                f = ((raw.astype("float32") - 127.5) / 127.5)[:dim]
                feats.append(f)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": sizes,
                    "payload_md5": digests,
                    "feature": feats,
                }
            )

    return media.mapInPandas(extract, _FEATURE_SCHEMA)


def payload_stats(media: DataFrame) -> DataFrame:
    """Metadata-only scan: payload size + content hash per modality —
    pure expressions; Parquet column pruning means the payload column is
    read but nothing else, and at scale a metadata-only variant (length
    persisted at ingest) skips the bytes entirely."""
    return media.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.min(F.octet_length("payload")).alias("min_bytes"),
        F.max(F.octet_length("payload")).alias("max_bytes"),
    )
