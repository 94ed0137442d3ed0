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
    lens = payloads.str.len().to_numpy(dtype=np.int64)
    n = len(lens)
    total = int(lens.sum())
    if total == 0:
        first = np.full(n, -1, dtype=np.int32)
        checksum = np.zeros(n, dtype=np.int64)
    else:
        # one concatenated buffer + segmented reduction: no per-row
        # python in the hot path (np.add.reduceat over byte offsets)
        arr = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
        offs = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        empty = lens == 0
        checksum = np.zeros(n, dtype=np.int64)
        first = np.full(n, -1, dtype=np.int32)
        ne = ~empty
        if ne.any():
            # reduceat over the non-empty offsets only: strictly
            # increasing, so each segment sums [off_i, off_{i+1})
            checksum[ne] = np.add.reduceat(arr, offs[ne])
            first[ne] = arr[offs[ne]]
    return pd.DataFrame(
        {
            "n_bytes": lens.astype("int32"),
            "first_byte": first,
            "byte_checksum": checksum,
        }
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
