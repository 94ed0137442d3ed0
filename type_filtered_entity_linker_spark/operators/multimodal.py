"""Multimodal column plumbing: treat image/audio/video payloads as
opaque ``binary`` columns with typed metadata, and run decode /
feature-extraction as Arrow-batched pandas functions over
``mapInPandas``.

The actual media codecs are NOT in this container, so ``decode_media``
is a clearly-marked stub (NotImplementedError for real media types,
deterministic fake features for the 'text/plain' fixture payloads) —
the Spark-side plumbing (schema, batch shape, partitioning) is real and
tested, per the build brief.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, "
    "first_byte int, byte_checksum long"
)

REAL_CODECS_AVAILABLE = False  # no image/audio libs in this container


def with_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Attach an opaque binary payload + typed metadata (stands in for a
    WARC media record; fixture payload = utf-8 text bytes)."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def decode_media_batch(payloads: pd.Series, media_types: pd.Series) -> pd.DataFrame:
    """Stubbed decoder: real media types raise (codec libs absent);
    text/plain produces deterministic byte-level features, vectorized
    over the Arrow batch."""
    real = media_types[~media_types.isin(["text/plain"])]
    if len(real):
        raise NotImplementedError(
            f"media codecs unavailable in this environment: {set(real)}"
        )
    n_bytes = payloads.str.len().astype("int32")
    first = payloads.apply(lambda b: int(b[0]) if len(b) else -1).astype("int32")
    checksum = payloads.apply(
        lambda b: int(np.frombuffer(b, dtype=np.uint8).sum()) if len(b) else 0
    ).astype("int64")
    return pd.DataFrame(
        {"n_bytes": n_bytes, "first_byte": first, "byte_checksum": checksum}
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """(doc_id, media_type, n_bytes, first_byte, byte_checksum) via
    mapInPandas over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode_media_batch(pdf["payload"], pdf["media_type"])
            out = pd.concat(
                [pdf[["doc_id", "media_type"]].reset_index(drop=True), feats],
                axis=1,
            )
            yield out

    return media.mapInPandas(run, MEDIA_SCHEMA)
