"""Candidate generation: the blocking equi-join (reference O9,
``el/candidate_generator.py:14-21`` — exact surface-form label lookup
against the alias dictionary) with explicit skew handling.

Scale design (north rule: "partitioning / shuffle / skew handled
explicitly"):

- The join key is the normalized surface form. Web-scale surface forms
  are Zipfian — a handful of head keys ("omni group") carry thousands
  of dictionary candidates and millions of mentions, which would pin a
  single shuffle partition.
- **Salting**: head keys (dictionary fanout > ``cfg.salt_threshold``,
  computed from a tiny aggregate that is broadcast) get their alias
  rows split into ``cfg.n_salt`` buckets by ``pmod(xxhash64(item_id))``;
  the mention side explodes those keys across all buckets. Non-head
  keys pay nothing (salt 0, no explosion). The salt never leaves this
  operator.
- AQE skew-join splitting stays on as the second line of defense for
  mention-side skew (many mentions, few candidates).
- The candidate table is kept narrow — (url, mention_id, sf_norm,
  ner_type, item_id) — so the ×fanout row multiplication never
  duplicates the 192-float mention embeddings; those are joined back
  at scoring time by mention key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import LinkerConfig

CAND_COLS = ["url", "mention_id", "sf_norm", "ner_type", "item_id"]


def head_keys(aliases: DataFrame, cfg: LinkerConfig) -> DataFrame:
    """Blocking keys whose dictionary fanout exceeds the salt threshold.
    Tiny by construction (the Zipf head) → always broadcastable."""
    return (
        aliases.groupBy("alias_norm")
        .count()
        .where(F.col("count") > cfg.salt_threshold)
        .select("alias_norm")
    )


def generate_candidates(
    mentions: DataFrame, aliases: DataFrame, cfg: LinkerConfig
) -> DataFrame:
    heads = head_keys(aliases, cfg)

    # dictionary side: only entity ids (Q-prefix, reference
    # inout/wikidata.py:69-72) — baked in at dictionary-build time
    dict_side = (
        aliases.where(F.col("item_id").startswith("Q"))
        .join(F.broadcast(heads.withColumn("is_head", F.lit(True))), "alias_norm", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("is_head"),
                F.pmod(F.xxhash64("item_id"), F.lit(cfg.n_salt)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .select("alias_norm", "item_id", "salt")
    )

    mention_side = (
        mentions.select("url", "mention_id", "sf_norm", "ner_type")
        .join(
            F.broadcast(heads.withColumn("is_head", F.lit(True))),
            mentions.sf_norm == heads.alias_norm,
            "left",
        )
        .withColumn(
            "salt",
            F.explode(
                F.when(
                    F.col("is_head"),
                    F.sequence(F.lit(0), F.lit(cfg.n_salt - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .select("url", "mention_id", "sf_norm", "ner_type", "salt")
    )

    return mention_side.join(
        dict_side,
        (mention_side.sf_norm == dict_side.alias_norm)
        & (mention_side.salt == dict_side.salt),
        "inner",
    ).select(*CAND_COLS)
