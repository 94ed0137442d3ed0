"""Wikidata identifier munging — URL → Q-id and back (reference O11
``inout/wikidata.py:77-85`` and O25 ``el/entity_disambiguator.py:81-84``),
as pure JVM column expressions (regex/string builtins, never a UDF).

The reference's ``__translate_from_url`` rules, reproduced exactly:
- URL with '/' and no '-'  → last path segment
  (http://www.wikidata.org/entity/Q42 → Q42)
- URL with '/' and '-'     → last segment, before the first '-'
  (…/statement/Q42-ABC-DEF → Q42 — statement-suffix strip)
- no '/'                   → unchanged (already an id)
Entity-vs-property filtering (keep only Q…, reference
``inout/wikidata.py:69-72``) stays a separate predicate so dictionary
builders can log what they drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WIKIDATA_ENTITY_PREFIX = "http://www.wikidata.org/entity/"


def qid_from_uri(col: F.Column | str) -> F.Column:
    """Dirty entity URI/id → bare id (Q…/P…/L…), reference
    ``inout/wikidata.py:77-85`` semantics."""
    c = F.col(col) if isinstance(col, str) else col
    seg = F.substring_index(c, "/", -1)
    has_slash = c.contains("/")
    has_dash = c.contains("-")
    return (
        F.when(has_slash & ~has_dash, seg)
        .when(has_slash & has_dash, F.substring_index(seg, "-", 1))
        .otherwise(c)
    )


def is_entity_qid(col: F.Column | str) -> F.Column:
    """Q-prefix predicate (drop properties/lexemes/statements —
    reference ``inout/wikidata.py:69-72``)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"^Q\d+$")


def clean_alias_dict(aliases: DataFrame, uri_col: str = "item_uri") -> DataFrame:
    """Alias dictionary with dirty URIs → (alias_norm, item_id) with
    munged Q-ids, non-entity rows dropped — the dictionary-build shape
    of the reference's candidate lookup (O9/O10/O11 composed)."""
    return (
        aliases.withColumn("item_id", qid_from_uri(F.col(uri_col)))
        .where(is_entity_qid("item_id"))
        .select("alias_norm", "item_id")
    )


def entity_url(col: F.Column | str) -> F.Column:
    """Q-id → canonical entity URL (reference
    ``el/entity_disambiguator.py:81-84``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(WIKIDATA_ENTITY_PREFIX), c)


def with_entity_urls(links: DataFrame, id_col: str = "item_id") -> DataFrame:
    """Links table + ``item_url`` column (reference O25,
    ``el/entity_disambiguator.py:62``)."""
    return links.withColumn("item_url", entity_url(id_col))
