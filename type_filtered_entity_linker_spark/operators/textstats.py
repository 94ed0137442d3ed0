"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All pure JVM
column expressions (codegen; no UDFs) so they run at scan speed and are
exactly reproducible in the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker vocabularies for the n-gram/markers language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "es": ["el", "la", "que", "de", "los"],
    "fr": ["le", "la", "et", "les", "des"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "on", "at", "for", "with"]

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

FP_MOD = 1_000_000_007


def tokens_col(text_col: str = "text") -> F.Column:
    return F.split(F.col(text_col), r"\s+")


def lang_scores(text_col: str = "text") -> list[tuple[str, F.Column]]:
    toks = tokens_col(text_col)
    out = []
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(
            F.filter(toks, lambda t: F.array_contains(marker_arr, t))
        )
        out.append((lang, score))
    return out


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, score): argmax marker-hit count; ties break
    to the alphabetically-first language; zero hits → 'und'."""
    scores = lang_scores(text_col)
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, s in sorted(scores, reverse=True):  # reverse → earliest wins last
        pred = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(pred)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("pred_lang"),
        best.cast("int").alias("marker_hits"),
    )


def quality_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Document-quality features + combined score: length, token stats,
    punctuation ratio, stopword ratio."""
    toks = tokens_col(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    avg_tok = n_chars.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double")
    stop_ratio = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double")
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    quality = F.round(
        F.lit(0.4) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.4) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.2) * F.least(n_tokens.cast("double") / 50.0, F.lit(1.0)),
        6,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        quality.alias("quality"),
    )


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text_col)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)).alias(
            "bpe_tokens"
        ),
    )


def fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Rolling polynomial token fingerprint:
    fold(tokens, 0, (acc, t) -> (acc*31 + len(t)*7 + ascii(t[0])) % M).
    Order-sensitive (unlike a bag-of-words hash) and reproducible in
    ANSI SQL (DuckDB list_reduce)."""
    fp = F.aggregate(
        tokens_col(text_col),
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * 31
            + F.length(t).cast("long") * 7
            + F.coalesce(F.ascii(F.substring(t, 1, 1)).cast("long"), F.lit(0)),
            F.lit(FP_MOD),
        ),
    )
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))
