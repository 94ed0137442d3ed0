"""NIL-mention clustering edges.

Mentions with no surviving dictionary candidate (out-of-KB — the
reference just skips them, ``el/entity_disambiguator.py:24-27``) are
still clustered among themselves: within the same blocking key, two
NIL mentions whose context embeddings agree (cosine ≥ ``cfg.nil_tau``)
get a dedup edge. This produces genuine multi-hop components (m1–m2,
m2–m3 chains) for the connected-components stage — standard NIL
clustering in entity-linking systems.

Scale note: NIL blocks are self-joined all-pairs. Blocking keys bound
the quadratic term (a NIL block shares an exact normalized surface
form); the same salting/cap machinery as the candidate join applies if
a pathological NIL key appears — at that point switch to
sorted-neighborhood within the block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..config import LinkerConfig
from ..functions.strings import cosine_batch
from .scoring import decode_f32


@F.pandas_udf(DoubleType())
def _cos_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Context-embedding cosine over binary float32 columns."""
    n = len(a)
    if n == 0:
        return pd.Series([], dtype="float64")
    mask = np.ones(n, dtype=bool)
    A = decode_f32(a, mask)
    B = decode_f32(b, mask)
    return pd.Series(cosine_batch(A, B))


def nil_mentions(mentions: DataFrame, candidates: DataFrame) -> DataFrame:
    """Mentions with zero candidates after filtering (left-anti join)."""
    return mentions.join(
        candidates.select("url", "mention_id").distinct(),
        ["url", "mention_id"],
        "left_anti",
    )


def nil_edges(nils: DataFrame, cfg: LinkerConfig) -> DataFrame:
    """(src, dst) mention-key edges between same-block NIL mentions with
    context cosine ≥ nil_tau."""
    mkey = F.concat_ws("#", "url", "mention_id")
    n = nils.select(
        F.col("sf_norm").alias("k"), mkey.alias("mk"), F.col("m_emb").alias("e")
    )
    a = n.select(
        F.col("k"), F.col("mk").alias("src"), F.col("e").alias("ea")
    )
    b = n.select(
        F.col("k"), F.col("mk").alias("dst"), F.col("e").alias("eb")
    )
    pairs = a.join(b, "k").where(F.col("src") < F.col("dst"))
    return (
        pairs.withColumn("cos", _cos_udf("ea", "eb"))
        .where(F.col("cos") >= cfg.nil_tau)
        .select("src", "dst")
    )
