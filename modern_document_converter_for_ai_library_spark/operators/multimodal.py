"""Multimodal column plumbing (training-data pipeline ops).

Media content is carried as opaque ``binary`` columns with typed metadata —
never materialized into driver memory, never stringified. The decode /
feature-extract / resize / frame-sample steps run as Arrow-batched kernels
over ``mapInPandas`` so the Spark-side shape (schema, partitioning, batch
boundaries) is production-real; the pixel/sample work itself is STUBBED
because image/audio libraries are not in this container:

  - ``decoder="fake"`` produces deterministic pseudo-metadata and features
    derived from the md5 of the bytes (stable across runs/engines) — used by
    tests to validate the plumbing;
  - ``decoder="pillow"`` (and friends) raise NotImplementedError with a
    clear marker until the real library is wired in.

MEDIA_SCHEMA is the companion table to the documents table: one row per
media span, joined back on (doc_id, media_ref).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("decode_error", T.StringType()),
    ]
)

_FEATURE_DIM = 8


def _fake_decode(content: bytes, media_type: str) -> dict:
    """Deterministic stand-in for a real decoder: metadata + an
    ``_FEATURE_DIM``-dim feature vector derived from the content digest."""
    digest = hashlib.md5(content or b"").hexdigest()
    b = bytes.fromhex(digest)
    feats = [round(x / 255.0, 6) for x in b[:_FEATURE_DIM]]
    return {
        "n_bytes": len(content or b""),
        "content_hash": digest,
        "width": 16 + b[0] % 64,
        "height": 16 + b[1] % 64,
        "n_frames": 1 if media_type == "image" else 1 + b[2] % 30,
        "features": feats,
        "decode_ok": True,
        "decode_error": None,
    }


def _real_decode(content: bytes, media_type: str) -> dict:
    raise NotImplementedError(
        "STUB: real media decode requires an image/audio library "
        "(Pillow/ffmpeg) that is not available in this environment. "
        "The Spark-side plumbing (schema, Arrow batching, partitioning) is "
        "real and tested with decoder='fake'."
    )


def decode_media(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode/feature-extract a MEDIA_SCHEMA table via one Arrow stage."""
    decode = _fake_decode if decoder == "fake" else _real_decode

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media_ref, media_type, content in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["media_type"], pdf["content"]
            ):
                try:
                    res = decode(bytes(content) if content is not None else b"", media_type)
                except NotImplementedError:
                    raise
                except Exception as exc:  # corrupt blob -> result-typed error
                    res = {
                        "n_bytes": len(content or b""),
                        "content_hash": None,
                        "width": None,
                        "height": None,
                        "n_frames": None,
                        "features": None,
                        "decode_ok": False,
                        "decode_error": f"{type(exc).__name__}: {exc}",
                    }
                res.update(
                    doc_id=str(doc_id), media_ref=str(media_ref), media_type=str(media_type)
                )
                rows.append(res)
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.select([f.name for f in MEDIA_SCHEMA.fields]).mapInPandas(
        _batches, schema=DECODED_SCHEMA
    )


def media_features_join(docs_df: DataFrame, decoded_df: DataFrame) -> DataFrame:
    """Attach per-document media feature aggregates back onto the docs table
    (broadcast-friendly: decoded media is a projection, not the blobs)."""
    from pyspark.sql import functions as F

    agg = decoded_df.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_media"),
        F.sum("n_bytes").cast("bigint").alias("media_bytes"),
        F.sum(F.when(F.col("decode_ok"), 0).otherwise(1)).cast("bigint").alias("n_decode_errors"),
    )
    return docs_df.join(agg, on="doc_id", how="left")
