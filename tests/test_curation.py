"""Corpus-curation operators (operators/curation.py): hash-stable
splits/samples, exact per-domain caps (incl. the salted two-phase
scale path), and PII redaction parity vs a pure-Python re reference."""

import hashlib
import re

import pandas as pd
from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.operators.curation import (
    EMAIL_RE,
    PHONE_RE,
    SPLIT_BUCKETS,
    decontaminate,
    deterministic_split,
    domain_cap,
    redact_pii,
    split_thresholds,
    stratified_sample,
)


def _py_bucket(key, salt):
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()
    return int(h[:15], 16) % SPLIT_BUCKETS


def test_split_thresholds_cover_all_buckets():
    ths = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    assert ths == [("train", 8000), ("val", 9000), ("test", 10000)]
    # unnormalized weights normalize; last split absorbs remainder
    ths = split_thresholds({"a": 2, "b": 1})
    assert ths == [("a", round(2 / 3 * SPLIT_BUCKETS)), ("b", SPLIT_BUCKETS)]


def test_split_matches_python_hash_and_is_partition_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = {
        r.doc_id: r.split
        for r in deterministic_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    for i in range(500):
        b = _py_bucket(i, "split")
        want = "train" if b < 8000 else ("val" if b < 9000 else "test")
        assert out[i] == want
    # identical assignment after an arbitrary repartition (df.sample
    # would rotate here — the whole point of hash keying)
    out2 = {
        r.doc_id: r.split
        for r in deterministic_split(
            df.repartition(7), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert out == out2
    # every row in exactly one split, proportions near the weights
    counts = pd.Series(list(out.values())).value_counts()
    assert counts.sum() == 500
    assert 0.7 < counts["train"] / 500 < 0.9


def test_stratified_sample_keeps_hash_subset_and_drops_unknown(spark):
    rows = [(i, ["en", "de", "xx"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = {
        r.doc_id
        for r in stratified_sample(df, "lang", {"en": 0.5, "de": 0.2}, "doc_id").collect()
    }
    for i, lang in rows:
        cut = {"en": 5000, "de": 2000}.get(lang, 0)
        assert (i in kept) == (_py_bucket(i, "sample") < cut)


def _skewed_docs(spark, n_head=400, n_tail_domains=20):
    rows = []
    did = 0
    for i in range(n_head):  # one head domain, many ties
        rows.append((did, "head.com", 100 + (i % 7)))
        did += 1
    for d in range(n_tail_domains):
        for i in range(3):  # tail domains below k
            rows.append((did, f"tail{d}.com", 10 * i))
            did += 1
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )


def test_domain_cap_exact_and_deterministic(spark):
    docs = _skewed_docs(spark)
    out = domain_cap(docs, "source", k=5).toPandas()
    per = out.groupby("source").size()
    assert per["head.com"] == 5
    assert all(per[f"tail{d}.com"] == 3 for d in range(20))
    # deterministic best-first: longest text, ties to lowest doc_id
    head = out[out.source == "head.com"].sort_values("rank_in_domain")
    assert list(head.n_chars) == [106, 106, 106, 106, 106][: len(head)] or (
        head.n_chars.iloc[0] == 106 and head.doc_id.is_monotonic_increasing
    )


def test_domain_cap_two_phase_identical_to_exact(spark):
    docs = _skewed_docs(spark)
    base = (
        domain_cap(docs, "source", k=5)
        .orderBy("source", "rank_in_domain")
        .collect()
    )
    fast = (
        domain_cap(docs, "source", k=5, two_phase=True)
        .orderBy("source", "rank_in_domain")
        .collect()
    )
    assert base == fast


def test_domain_cap_two_phase_exact_under_heavy_ties(spark):
    # heavy ties at the top + k > n_salts·(ties per bucket) shapes:
    # the salted split must still return the identical exact answer
    rows = [(i, "one.com", 50) for i in range(200)]
    rows += [(200 + i, "one.com", 50 + i) for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    base = domain_cap(docs, "source", k=10).collect()
    fast = domain_cap(docs, "source", k=10, two_phase=True, n_salts=4).collect()
    assert sorted(base) == sorted(fast)


def test_redact_pii_matches_python_re(spark):
    texts = [
        "mail me a.b-c@x-y.co.uk or +1 (415) 555-1234 now",
        "no pii here at all",
        "two mails a@b.io c@d.org and numbers 555-123-9876 12345678901",
        "edge bad@@x and +49 (0)30 1234 5678 done",
        # engine-divergent \s members: \x0b (Java-only) and \xa0
        # (Python-only) must NOT count as phone separators — pins the
        # explicit [ \t] class against a regression back to \s
        "vt +1 415\x0b555 1234 and nbsp +1 415\xa0555 1234 end",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = redact_pii(df).orderBy("i").collect()
    for r, t in zip(got, texts):
        e = re.findall(EMAIL_RE, t)
        t1 = re.sub(EMAIL_RE, "<EMAIL>", t)
        p = re.findall(PHONE_RE, t1)
        t2 = re.sub(PHONE_RE, "<PHONE>", t1)
        assert r.n_emails == len(e), t
        assert r.n_phones == len(p), t
        assert r.text_redacted == t2, t


def test_split_plus_sample_compose(spark):
    """The curation ops compose as narrow stages: split → sample the
    train stratum → no row leaks from val/test."""
    df = spark.createDataFrame([(i, "en") for i in range(400)], "doc_id long, lang string")
    s = deterministic_split(df, "doc_id", {"train": 0.5, "heldout": 0.5})
    train_half = stratified_sample(
        s.where(F.col("split") == "train"), "lang", {"en": 0.5}, "doc_id"
    ).collect()
    for r in train_half:
        assert _py_bucket(r.doc_id, "split") < 5000
        assert _py_bucket(r.doc_id, "sample") < 5000


def test_decontaminate_flags_13gram_overlap(spark):
    prompt = " ".join(f"w{i}" for i in range(20))  # 20-token eval prompt
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "prefix tokens here " + prompt + " suffix tokens",
                    " ".join(f"clean{i}" for i in range(30)),
                    # 12-token overlap only — BELOW the 13-gram rule
                    "lead " + " ".join(f"w{i}" for i in range(12)) + " out",
                ],
            }
        )
    )
    ev = spark.createDataFrame(pd.DataFrame({"text": [prompt]}))
    got = {
        r.doc_id: (r.n_contaminated, r.contaminated)
        for r in decontaminate(docs, ev, n=13).collect()
    }
    assert got[0][1] == 1 and got[0][0] == 8  # 20-13+1 grams all hit
    assert got[1] == (0, 0)
    assert got[2] == (0, 0)


def test_decontaminate_short_prompt_whole_doc_fallback(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "a b c d"]})
    )
    ev = spark.createDataFrame(pd.DataFrame({"text": ["a b c"]}))
    got = {
        r.doc_id: r.contaminated for r in decontaminate(docs, ev, n=13).collect()
    }
    # the verbatim short doc is caught via the whole-doc gram; the
    # 4-token doc's single whole-doc gram differs -> clean
    assert got == {0: 1, 1: 0}


def test_pack_sequences_spans_and_boundaries(spark):
    """Hand-checked packing: bucket-local cumsum, ctx windows, a doc
    straddling a boundary spans two packs, empty docs drop."""
    from type_filtered_entity_linker_spark.operators.curation import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c"),        # bucket 0: 3 toks  -> [0, 3)
            (8, "d e f g"),      # bucket 0: 4 toks  -> [3, 7) straddles
            (16, "h h"),         # bucket 0: 2 toks  -> [7, 9)
            (1, "x y"),          # bucket 1: 2 toks  -> [0, 2)
            (9, ""),             # empty: dropped
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (
            r["bucket"], r["start_tok"], r["end_tok"],
            r["pack_first"], r["pack_last"],
        )
        for r in pack_sequences(docs, ctx_len=5, n_buckets=8).collect()
    }
    assert out[0] == (0, 0, 3, 0, 0)
    assert out[8] == (0, 3, 7, 0, 1)   # straddles packs 0 and 1
    assert out[16] == (0, 7, 9, 1, 1)
    assert out[1] == (1, 0, 2, 0, 0)
    assert 9 not in out


def test_token_budget_mix_budgets_and_determinism(spark):
    """Budgets are integer-exact per (stratum, bucket); selection is a
    prefix of the hash order; excluded strata are absent."""
    from type_filtered_entity_linker_spark.operators.curation import (
        token_budget_mix,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "xx", "tok " * 10) for i in range(40)],
        "doc_id long, lang string, text string",
    )
    out = token_budget_mix(
        docs, {"en": 100}, budget_pct=50, n_buckets=1
    ).collect()
    # only 'en' rows appear (weight-less strata are excluded)
    assert {r["lang"] for r in out} == {"en"}
    # each doc has 20 bpe-ish tokens ('tok' + nothing; 'tok ' *10 -> 10
    # word tokens); 20 docs * 10 = 200 total, budget = 100 tokens ->
    # exactly the first 10 docs in hash order are selected
    assert sum(r["selected"] for r in out) == 10
    again = token_budget_mix(
        docs.repartition(7), {"en": 100}, budget_pct=50, n_buckets=1
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_snapshot_diff_statuses(spark):
    from type_filtered_entity_linker_spark.operators.curation import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_text_is_presence_not_digest(spark):
    """md5(NULL) is NULL: presence must come from the join side, not
    digest nullness, and NULL vs non-NULL text is 'changed'."""
    from type_filtered_entity_linker_spark.operators.curation import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "now has text"), (2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "changed", 2: "unchanged", 3: "removed"}


def test_weighted_sample_matches_pure_python_aes(spark):
    from math import log

    from type_filtered_entity_linker_spark.operators.curation import (
        weighted_sample,
    )

    rows = [(i, 10 + 7 * (i % 13)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")

    def py_key(doc_id, w):
        h = int(hashlib.md5(f"wsample:{doc_id}".encode()).hexdigest()[:15], 16)
        return log((h + 1) / float(1 << 60)) / w

    expect = sorted(rows, key=lambda r: (-py_key(*r), r[0]))[:10]
    got = weighted_sample(df, k=10, weight_col="n_chars").collect()
    assert [(r["doc_id"], r["n_chars"]) for r in got] == [
        (d, w) for d, w in expect
    ]
    for r in got:
        assert r["sample_key"] == round(py_key(r["doc_id"], r["n_chars"]), 6)


def test_weighted_sample_prefers_heavy_weights(spark):
    # one row with overwhelming weight must (essentially always) be
    # sampled: u^(1/w) -> 1 as w -> inf, and u is bounded away from 0
    rows = [(i, 1) for i in range(50)] + [(99, 10_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    from type_filtered_entity_linker_spark.operators.curation import (
        weighted_sample,
    )

    got = {r["doc_id"] for r in weighted_sample(df, k=5, weight_col="n_chars").collect()}
    assert 99 in got


def test_weighted_sample_fractional_and_nonpositive_weights(spark):
    # advice r03: w < 1 must stay proportional-to-weight (the old
    # greatest(w, 1) clamp flattened fractional weights to uniform),
    # and w <= 0 rows are excluded outright
    from math import log

    from type_filtered_entity_linker_spark.operators.curation import (
        weighted_sample,
    )

    rows = [(0, 0.001), (1, 0.5), (2, 2.0), (3, 0.0), (4, -3.0), (5, 0.25)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    def py_key(doc_id, w):
        h = int(hashlib.md5(f"wsample:{doc_id}".encode()).hexdigest()[:15], 16)
        return log((h + 1) / float(1 << 60)) / w

    positive = [(d, w) for d, w in rows if w > 0]
    expect = sorted(positive, key=lambda r: (-py_key(*r), r[0]))[:3]
    got = weighted_sample(df, k=3, weight_col="w").collect()
    assert [(r["doc_id"], r["w"]) for r in got] == expect
    assert {3, 4}.isdisjoint({r["doc_id"] for r in got})
    # a dominant fractional weight among fractional peers still wins
    # essentially always: key = ln(u)/w -> 0^- as w grows relatively
    rows2 = [(i, 0.001) for i in range(40)] + [(99, 50.0)]
    df2 = spark.createDataFrame(rows2, "doc_id long, w double")
    got2 = {r["doc_id"] for r in weighted_sample(df2, k=3, weight_col="w").collect()}
    assert 99 in got2


def test_split_leakage_policies(spark):
    """Group-aware splitting has zero duplicate leakage by
    construction; the naive per-doc split leaks some groups (copies
    straddle splits); both policies partition the whole corpus."""
    from type_filtered_entity_linker_spark.plans.driver_queries import (
        q_docs_split_leakage,
    )

    rows = {
        r["policy"]: r
        for r in q_docs_split_leakage(spark, "/root/testdata/sf0.001").collect()
    }
    ga, nd = rows["group_aware"], rows["naive_doc"]
    assert ga["leaked_groups"] == 0 and ga["leaked_pairs"] == 0
    assert nd["leaked_groups"] > 0 and nd["leaked_pairs"] > 0
    total = lambda r: r["n_train"] + r["n_val"] + r["n_test"]
    assert total(ga) == total(nd)
