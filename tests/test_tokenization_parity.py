"""Multi-whitespace tokenization parity pin (advice r03).

Every Spark-side text tokenizer splits on Java ``\\s+`` =
``[ \\t\\n\\x0B\\f\\r]+``; the paired DuckDB oracles spell that class
out explicitly (RE2's ``\\s`` lacks ``\\x0B``). Round 2's multiline
``extract_text`` bug and round 3's single-space ``string_split``
oracles were the same latent class: convention divergence masked by
single-space fixture text. This test runs representative operator /
oracle pairs on text that exercises EVERY whitespace character plus
runs, leading/trailing edges, and an empty-ish doc — if either engine
drifts from the shared class, the value hash splits here first."""

import hashlib
import json

import duckdb
import pandas as pd
import pytest

from type_filtered_entity_linker_spark.operators.lm_quality import lm_quality
from type_filtered_entity_linker_spark.operators.textstats import (
    fingerprints,
    repetition_signals,
    token_counts,
)
from type_filtered_entity_linker_spark.plans import driver_queries as dq

NASTY_DOCS = [
    (0, "plain single space tokens only here"),
    (1, "tab\tseparated\ttokens and  a double space"),
    (2, "newline\nbroken\nlines with trailing space "),
    (3, " leading space and\rcarriage\rreturns"),
    (4, "vertical\x0btab and form\ffeed mix"),
    (5, "runs   of\t\t tabs\n\n and newlines   everywhere"),
    (6, "x"),
    (7, "alpha beta alpha beta alpha beta gamma delta gamma"),
]


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: json.dumps(v, default=str, sort_keys=True)
                if isinstance(v, (list, dict, tuple)) or hasattr(v, "tolist")
                else v
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


@pytest.fixture(scope="module")
def nasty(spark):
    pdf = pd.DataFrame(NASTY_DOCS, columns=["doc_id", "text"])
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("documents", pdf)
    return sdf, con


def _compare(spark_df, con, sql):
    got = spark_df.toPandas()
    want = con.execute(sql).df()
    assert len(got) == len(want)
    assert sorted(got.columns) == sorted(want.columns)
    assert canon(got) == canon(want)


def test_token_counts_multiws(nasty):
    sdf, con = nasty
    _compare(token_counts(sdf), con, dq.TOKEN_COUNT_SQL)


def test_fingerprints_multiws(nasty):
    sdf, con = nasty
    _compare(fingerprints(sdf), con, dq.FINGERPRINT_SQL)


def test_repetition_multiws(nasty):
    sdf, con = nasty
    _compare(repetition_signals(sdf), con, dq.REPETITION_SQL)


def test_lm_quality_multiws(nasty):
    sdf, con = nasty
    _compare(lm_quality(sdf), con, dq.LM_PPL_SQL)
