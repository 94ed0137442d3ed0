"""Distributed BPE merge learning — tokenizer preparation over a web
corpus (Sennrich, Haddow & Birch, ACL'16 learn-BPE, the vocabulary
form): learn the first N byte-pair merge rules from word frequencies.

This is the training-data-pipeline operator that sits next to
vocab_topk (textstats.py): vocab_topk picks whole-word vocabulary,
bpe_merges learns the subword merge table a byte-pair tokenizer needs.
The reference repo tokenizes with a pretrained BERT WordPiece
vocabulary (disamb/model.py); learning the table itself is the
corpus-side step a from-scratch deployment runs first.

Shape, and why it scales: merge learning runs over the WORD-FREQUENCY
table, not the corpus — one explode+hash-aggregate pass over the
corpus builds (word, count) once, after which every merge round costs
O(vocabulary), corpus-size independent (the classic learn-BPE
optimization). Per round: one adjacent-pair explode + hash aggregate
(map-side partial: a frequent pair collapses before the shuffle), one
TakeOrdered(1) for the argmax (count DESC, pair ASC — deterministic
tie-break), and one fold projection applying the merge. The winning
pair is carried as a broadcast 1-row DataFrame, never a collected
literal — no driver round-trip, no string-escaping of corpus content
into SQL text.

Merge application is the EXACT greedy left-to-right non-overlapping
walk, expressed as an `aggregate` fold over the symbol array: append
each symbol unless the accumulator's last element is the pair's left
and the incoming symbol its right, in which case replace the last
element with the merged symbol. A run 'a a a' under pair (a,a)
correctly yields [aa, a] (the fold can never double-merge: the merged
symbol is strictly longer than the pair's left element).

Token contract: words are whitespace-separated, and only printable-
ASCII words ([!-~]+) enter the symbol alphabet — applied identically
in the DuckDB oracle. The guard is explicit because per-CHARACTER
splitting of non-BMP text diverges between engines (Java regex '.'
walks UTF-16 code units, RE2 walks codepoints); restricting the
alphabet makes the cross-engine contract exact rather than
fixture-lucky. A production variant would byte-encode first (GPT-2
byte-level BPE), which sidesteps the divergence the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_MARKER = "</w>"

_FOLD = """
aggregate(
  syms,
  cast(array() as array<string>),
  (acc, x) -> CASE
      WHEN size(acc) > 0 AND element_at(acc, -1) = pa AND x = pb
      THEN concat(slice(acc, 1, size(acc) - 1), array(concat(pa, pb)))
      ELSE concat(acc, array(x)) END)
"""


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules. Returns one row
    per rule: (merge_rank, pair_a, pair_b, merged, pair_count) where
    pair_count is the frequency-weighted adjacent-pair count at
    election time (i.e. AFTER all earlier merges were applied). Rounds
    past corpus exhaustion contribute no rows (their pair table is
    empty), so the output can have fewer than ``n_merges`` rules —
    never a crash, and the oracle's empty LIMIT 1 agrees."""
    assert n_merges >= 1, "bpe_merges: n_merges must be >= 1"
    bests, _ = _learn(docs, n_merges, text_col)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    return out.select(
        "merge_rank",
        F.col("pa").alias("pair_a"),
        F.col("pb").alias("pair_b"),
        F.concat("pa", "pb").alias("merged"),
        "pair_count",
    )


def bpe_subword_counts(
    docs: DataFrame,
    n_merges: int = 6,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """The APPLY side of the tokenizer loop: learn ``n_merges`` rules,
    tokenize the vocabulary with them, and report the top-k resulting
    subwords by frequency-weighted occurrence count — what the
    trained tokenizer's unit distribution actually looks like (the
    sanity check run before freezing a vocab). Same plumbing as
    bpe_merges; one extra explode + hash aggregate + top-k window at
    the end. Rank orders (count DESC, subword ASC)."""
    from pyspark.sql import Window

    _, words = _learn(docs, n_merges, text_col)
    counts = (
        words.select(
            "cnt", F.explode(F.col("syms")).alias("subword")
        )
        .groupBy("subword")
        .agg(F.sum("cnt").cast("long").alias("n_occurrences"))
    )
    # TakeOrdered first (scale-safe global top-k — no unpartitioned
    # window over the full subword vocabulary), THEN rank the k
    # surviving rows (a single tiny partition by construction)
    top = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("subword").asc()
    ).limit(top_k)
    w = Window.orderBy(
        F.col("n_occurrences").desc(), F.col("subword").asc()
    )
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def _learn(
    docs: DataFrame, n_merges: int, text_col: str
) -> "tuple[list[DataFrame], DataFrame]":
    """Shared learn loop: returns (per-round 1-row winner DataFrames,
    the fully-merged word-frequency table)."""
    words = (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .where((F.col("word") != "") & F.col("word").rlike("^[!-~]+$"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            "cnt",
            F.concat(
                F.regexp_extract_all(F.col("word"), F.lit("."), 0),
                F.array(F.lit(END_MARKER)),
            ).alias("syms"),
        )
        .localCheckpoint(eager=True)
    )
    bests: list[DataFrame] = []
    for r in range(1, n_merges + 1):
        # the size filter is load-bearing: Spark's sequence() counts
        # DOWN when start > stop, so a fully-merged single-symbol word
        # would enumerate indices [0, -1] and index out of bounds
        # (ANSI crash / phantom NULL pairs otherwise); DuckDB's
        # generate_series(1, 0) is empty, so the filter also keeps the
        # two engines on the same pair set (code-review r04 wave 16)
        pairs = words.where(F.size("syms") >= 2).select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2), "
                    "i -> struct(syms[i] AS a, syms[i + 1] AS b))"
                )
            ).alias("p"),
        )
        pc = pairs.groupBy("p.a", "p.b").agg(
            F.sum("cnt").cast("long").alias("pair_count")
        )
        best = (
            pc.orderBy(
                F.col("pair_count").desc(), F.col("a").asc(), F.col("b").asc()
            )
            .limit(1)
            .select(
                F.lit(r).cast("long").alias("merge_rank"),
                F.col("a").alias("pa"),
                F.col("b").alias("pb"),
                "pair_count",
            )
            # tiny (1 row) but referenced by BOTH the output union and
            # the next round's fold — the r4 both-sides-recompute rule
            .localCheckpoint(eager=True)
        )
        bests.append(best)
        # LEFT join on TRUE, not crossJoin: when the corpus exhausts
        # its pairs before n_merges rounds, `best` is 0 rows and a
        # cross join would EMPTY the word table (silent data loss for
        # bpe_subword_counts); the left join keeps every word with
        # NULL pa/pb, and the fold's equality test is never true on
        # NULL, so the words pass through unchanged
        words = (
            words.join(
                F.broadcast(best.select("pa", "pb")), F.lit(True), "left"
            )
            .select("cnt", F.expr(_FOLD).alias("syms"))
            .localCheckpoint(eager=True)
        )
    return bests, words


def bpe_fertility(
    docs: DataFrame,
    n_merges: int = 6,
    by_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility (subwords emitted per word) per corpus
    slice — THE comparative metric for judging a trained tokenizer
    across languages/sources: a slice whose fertility stays near the
    character count is one the vocabulary serves badly (its text
    fragments into singles), the classic under-served-language signal
    in multilingual tokenizer evaluation. Uses the merges learned on
    the WHOLE corpus (the production shape: one tokenizer, many
    slices).

    Scale shape: the learn loop is bpe_merges' (corpus pass once,
    rounds vocabulary-sized); fertility adds one (slice, word) count
    aggregate joined against the vocabulary-sized fully-merged word
    table (broadcast by size) — per-word subword counts are never
    recomputed per slice. Returns (by_col, n_words, n_subwords,
    fertility [6dp])."""
    _, words = _learn(docs, n_merges, text_col)
    joined = F.array_join(F.col("syms"), "")
    vocab = words.select(
        F.substring(
            joined, F.lit(1), F.length(joined) - len(END_MARKER)
        ).alias("word"),
        F.size("syms").cast("long").alias("n_sub"),
    )
    sw = (
        docs.select(
            F.col(by_col),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
        )
        .where((F.col("word") != "") & F.col("word").rlike("^[!-~]+$"))
        .groupBy(by_col, "word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt_sw"))
    )
    return (
        sw.join(vocab, "word")
        .groupBy(by_col)
        .agg(
            F.sum("cnt_sw").cast("long").alias("n_words"),
            F.sum(F.col("cnt_sw") * F.col("n_sub"))
            .cast("long")
            .alias("n_subwords"),
        )
        .withColumn(
            "fertility",
            F.round(
                F.col("n_subwords").cast("double")
                / F.col("n_words").cast("double"),
                6,
            ),
        )
    )
