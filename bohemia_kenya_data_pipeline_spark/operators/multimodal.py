"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

There is no multimodal data in the reference (an ODK pipeline skips
media at extraction — odk-form-extraction/R/utils.R:28-42 exports
with media omitted); this module is the scale-pack pattern a
training-data pipeline needs:

- payloads are ``BinaryType`` columns + a metadata struct (mime,
  n_bytes) — never parsed by Catalyst, shuffled as opaque bytes;
- decode / feature-extraction runs in ``mapInPandas`` so each Python
  batch sees a bounded slice (no row-at-a-time UDF, no whole-column
  collect);
- the actual image/audio decode is STUBBED (``decode_media``) because
  the codec libraries are not in this container — the Spark-side
  plumbing (schema, batching, partitioning) is real and tested, and
  ``extract_binary_features`` shows the end-to-end shape with a
  deterministic byte-level featurizer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("first_byte", IntegerType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary payload + metadata struct from a
    text column (stand-in for reading real media bytes): payload =
    unhex(md5(text)) (16 bytes), metadata = (mime, n_bytes)."""
    payload = F.unhex(F.md5(F.col(text_col)))
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).alias("n_bytes"),
        ),
    )


def decode_media(payload: bytes, mime: str):  # pragma: no cover - stub
    """STUB: decode an image/audio/video payload to pixels/samples.

    The codec libraries (Pillow, ffmpeg, torchaudio, …) are not
    available in this environment; at deployment, replace this with
    the real decoder. The Spark-side plumbing around it
    (``extract_binary_features``) does not change.
    """
    raise NotImplementedError(
        "media decode requires codec libraries not present in this container"
    )


def extract_binary_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched byte-level featurization via ``mapInPandas`` —
    the real plumbing a decode step plugs into. Emits one row per
    input row: (doc_id, mime, n_bytes, first_byte)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": pdf["media_meta"].map(lambda m: m["mime"]),
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                }
            )

    return df.mapInPandas(featurize, schema=FEATURE_SCHEMA)
