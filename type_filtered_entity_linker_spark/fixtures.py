"""Deterministic synthetic corpus + dictionaries (FIXTURES.md).

Pure function of (seed, n_pages, n_entities): generates the pages table
(url, warc_ts, html, text, lang) per BASELINE.json ``input_hint``, the
entity dictionaries (aliases / types / closure / embeddings), ground
truth mentions, and labeled pairs for the pairwise-F1 gate.

Edge cases baked in (FIXTURES.md §8):
- gazetteer entries with zero dictionary candidates,
- MISC-band mentions → type OTHER → filter pass-all (el/filter.py:43-47),
- typeless candidates (el/filter.py:57-66),
- an alias whose candidates ALL lack embeddings → first-candidate
  fallback with score 0.0 (el/entity_disambiguator.py:49-55),
- a head alias with >500 candidates → top-K truncation + skew salt
  (el/entity_linker.py:94-108),
- Zipf-skewed entity popularity.
"""

from __future__ import annotations

import datetime as dt
import random

import numpy as np
import pandas as pd

from .functions.strings import embed_text
from .textlib import normalize_sf, rule_ner_type

# NER label → supertype (reference typerec/types.py:42-61 analog).
# 'MISC' deliberately unmapped → mention type OTHER.
NER_TO_SUPERTYPE = {"PERSON": "S1", "ORG": "S2", "GPE": "S3", "PRODUCT": "S4"}
SUPERTYPES = [f"S{i}" for i in range(1, 12)]  # 11 + OTHER (types.py:15-38)
OTHER_TYPE = "OTHER"
N_FINE_TYPES = 33

# First-token pools per NER band (first char drives rule_ner_type).
_BAND_FIRSTS = {
    "PERSON": ["alvar", "boris", "celia", "dmitri", "elena", "farid"],
    "ORG": ["global", "helix", "ionic", "jupiter", "kestrel", "lumen"],
    "GPE": ["marona", "nordvik", "ostia", "pellam", "quarzo", "rivena"],
    "PRODUCT": ["sparkon", "turbo", "ultra", "vertex"],
    "MISC": ["wexford", "xenia", "yolanda", "zephyr"],
}
_SECONDS = [
    "ramirez", "okafor", "lindqvist", "tanaka", "moreau", "castillo",
    "systems", "holdings", "dynamics", "labs", "works", "industries",
    "valley", "harbor", "heights", "junction", "province", "district",
]
_FILLER = (
    "the a of and to in on at for with from by about into over after "
    "market report quarterly revenue growth announced said during while "
    "meeting project update plan result data study group public local "
    "new old early late big small long short open close north south"
).split()


def fine_types_for(supertype: str) -> list[str]:
    """Fine types whose closure contains the supertype."""
    k = int(supertype[1:])
    return [f"T{i}" for i in range(N_FINE_TYPES) if i % 11 + 1 == k]


def build_type_closure() -> pd.DataFrame:
    """subclass → supertype map (P279* closure stand-in,
    typerec/types.py:102-144). Some fine types map to 2 supertypes
    (multi-supertype list semantics, types.py:130-144)."""
    rows = []
    for i in range(N_FINE_TYPES):
        rows.append((f"T{i}", f"S{i % 11 + 1}"))
        if i % 5 == 0:  # multi-supertype subclasses
            rows.append((f"T{i}", f"S{(i + 3) % 11 + 1}"))
    return pd.DataFrame(rows, columns=["subclass_id", "supertype_id"])


def _variants(canon_norm: str, rng: random.Random) -> list[str]:
    """Alias variants that preserve the first character (so the NER
    band — hence the predicted type — stays consistent)."""
    toks = canon_norm.split()
    out = []
    if len(toks[-1]) > 4:
        out.append(" ".join(toks[:-1] + [toks[-1][:-1]]))  # drop last char
    if len(toks) > 1 and len(toks[1]) > 4:
        out.append(f"{toks[0]} {toks[1][:3]}")  # abbreviation
    t0 = toks[0]
    if len(t0) > 3:
        i = rng.randrange(1, len(t0) - 1)
        out.append(" ".join([t0[:i] + t0[i] + t0[i:]] + toks[1:]))  # doubled char
    return sorted(set(out))


def _sep_for(d: int, i: int) -> str:
    """Inter-token separator for gap ``i`` of page ``d``. Every 13th
    page mixes in ``\\n`` / ``\\r\\n`` gaps so fixtures cover multiline
    bodies (byte-identity must hold on real web text, not just
    single-line fixtures)."""
    if d % 13 == 0:
        if i % 11 == 5:
            return "\r\n"
        if i % 7 == 3:
            return "\n"
    return " "


def make_fixtures(
    seed: int = 42,
    n_pages: int = 400,
    n_entities: int = 240,
    head_alias_fanout: int = 620,
    page_filler_tokens: int = 0,
) -> dict[str, pd.DataFrame]:
    rng = random.Random(seed)

    # --- entities ------------------------------------------------------
    bands = list(_BAND_FIRSTS)
    band_weights = [0.30, 0.25, 0.20, 0.15, 0.10]
    entities = []  # (item_id, canonical_norm, band, supertype, sig_words)
    seen_names = set()
    eid = 0
    while len(entities) < n_entities:
        band = rng.choices(bands, band_weights)[0]
        name = f"{rng.choice(_BAND_FIRSTS[band])} {rng.choice(_SECONDS)}"
        if name in seen_names:
            name = f"{name} {rng.randrange(10, 99)}"
            if name in seen_names:
                continue
        seen_names.add(name)
        supertype = NER_TO_SUPERTYPE.get(band) or rng.choice(SUPERTYPES[4:])
        # distinctive per-entity context signature words (no shared
        # prefixes — keeps char-3-gram embeddings decorrelated)
        sig = [
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(7))
            for _ in range(3)
        ]
        entities.append((f"Q{eid}", name, band, supertype, sig))
        eid += 1

    ent_by_id = {e[0]: e for e in entities}

    # --- entity_types (5% typeless → kept-by-default path) -------------
    type_rows = []
    for item_id, _, _, supertype, _ in entities:
        if rng.random() < 0.05:
            continue  # typeless candidate (el/filter.py:57-66)
        fines = fine_types_for(supertype)
        chosen = {rng.choice(fines)}
        if rng.random() < 0.4:  # extra unrelated fine type
            chosen.add(f"T{rng.randrange(N_FINE_TYPES)}")
        type_rows += [(item_id, t) for t in sorted(chosen)]
    entity_types = pd.DataFrame(type_rows, columns=["item_id", "type_id"])

    # --- aliases ---------------------------------------------------------
    alias_rows = []  # (alias_norm, item_id)
    ent_aliases: dict[str, list[str]] = {}
    for item_id, name, band, _, _ in entities:
        canon = normalize_sf(name)
        als = [canon] + _variants(canon, rng)[:2]
        ent_aliases[item_id] = als
        alias_rows += [(a, item_id) for a in als]

    # ambiguous aliases: same-band decoy shares the canonical alias
    # (same blocking key AND same type class → scorer must use context)
    by_band: dict[str, list[tuple]] = {}
    for e in entities:
        by_band.setdefault(e[2], []).append(e)
    ambiguous_aliases = []
    for e in entities:
        if rng.random() < 0.18 and len(by_band[e[2]]) > 1:
            decoy = rng.choice(by_band[e[2]])
            if decoy[0] != e[0]:
                canon = normalize_sf(e[1])
                alias_rows.append((canon, decoy[0]))
                ambiguous_aliases.append((canon, e[0], decoy[0]))
    # cross-band decoys: pruned by the type filter (the repo's thesis)
    for e in entities[:: max(1, n_entities // 30)]:
        others = [x for x in entities if x[2] != e[2] and NER_TO_SUPERTYPE.get(x[2])]
        if others:
            alias_rows.append((normalize_sf(e[1]), rng.choice(others)[0]))

    # head alias: >500 candidates → top-K truncation + salted join.
    # 'omni group' → first char 'o' → GPE band, so the ground-truth owner
    # must be a GPE entity or the type filter (correctly) prunes it.
    head_alias = "omni group"
    head_ids = [entities[i % n_entities][0] for i in range(head_alias_fanout)]
    head_ids = sorted(set(head_ids), key=lambda q: int(q[1:]))
    alias_rows += [(head_alias, q) for q in head_ids]
    head_owner = next(e[0] for e in entities if e[2] == "GPE")

    # ghost alias: all candidates lack embeddings → fallback path.
    # 'ghost corp' → 'g' → ORG band; owners must be ORG for consistency.
    ghost_alias = "ghost corp"
    ghost_ids = [e[0] for e in entities if e[2] == "ORG"][-2:]
    alias_rows += [(ghost_alias, q) for q in ghost_ids]

    entity_aliases = (
        pd.DataFrame(sorted(set(alias_rows)), columns=["alias_norm", "item_id"])
    )

    # --- embeddings (entity side: canonical + signature words) ----------
    no_emb = set(ghost_ids)
    for item_id, *_ in entities:
        if rng.random() < 0.03 and item_id != head_owner:
            no_emb.add(item_id)
    emb_rows = []
    for item_id, name, _, _, sig in entities:
        if item_id in no_emb:
            continue
        vec = embed_text(normalize_sf(name) + " | " + " ".join(sig))
        emb_rows.append((item_id, [float(x) for x in vec]))
    entity_embeddings = pd.DataFrame(emb_rows, columns=["item_id", "emb"])

    # --- pages + ground-truth mentions -----------------------------------
    # Entities lacking embeddings are never mention ground truth: the
    # scorer skips no-embedding candidates by reference semantics
    # (el/entity_disambiguator.py:36-39), so such truth would be
    # unreachable. They remain in the dictionaries as decoys; the ghost
    # alias exercises the all-missing fallback explicitly.
    zipf_w = np.array(
        [
            0.0 if entities[i][0] in no_emb else 1.0 / (i + 1) ** 1.1
            for i in range(n_entities)
        ]
    )
    zipf_w /= zipf_w.sum()
    langs = ["en"] * 23 + ["de", "fr", "es"]
    page_rows, gt_rows = [], []
    for d in range(n_pages):
        url = f"https://example{d % 7}.org/p/{d}"
        lang = langs[rng.randrange(len(langs))]
        n_m = rng.randrange(1, 6)
        toks: list[str] = []
        pending: list[tuple[int, str, str]] = []  # (token_idx, sf, item_id)
        for _ in range(n_m):
            toks += rng.choices(_FILLER, k=rng.randrange(2, 6))
            r = rng.random()
            if r < 0.04:
                item_id, alias = head_owner, head_alias
            elif r < 0.07:
                item_id, alias = ghost_ids[0], ghost_alias
            else:
                e = entities[rng.choices(range(n_entities), zipf_w)[0]]
                item_id = e[0]
                als = ent_aliases[item_id]
                alias = als[0] if rng.random() < 0.6 else rng.choice(als)
            sig = ent_by_id[item_id][4]
            # signature words flank the mention (inside the context window)
            toks.append(sig[rng.randrange(3)])
            toks.append(sig[rng.randrange(3)])
            sf = " ".join(w.capitalize() for w in alias.split())
            pending.append((len(toks), sf, item_id))
            toks.append(sf)
            toks.append(sig[rng.randrange(3)])
        toks += rng.choices(_FILLER, k=rng.randrange(2, 6))
        # realistic page bodies: trailing filler (after every mention,
        # so ground-truth offsets are unaffected) lets benches weight
        # per-page extract/detect compute like real web pages (KBs)
        if page_filler_tokens:
            toks += rng.choices(_FILLER, k=page_filler_tokens)
        # Every 13th page is MULTILINE: some inter-token gaps become \n
        # or \r\n (deterministic by position, no rng draws — keeps the
        # corpus stable for other pages). Real web text is full of
        # newlines; these pages pin extract_text's DOTALL semantics in
        # the byte-identity test (VERDICT r02 finding #1).
        pos, starts, parts = 0, {}, []
        for i, t in enumerate(toks):
            starts[i] = pos
            parts.append(t)
            pos += len(t)
            if i < len(toks) - 1:
                sep = _sep_for(d, i)
                parts.append(sep)
                pos += len(sep)
        text = "".join(parts)
        for tok_idx, sf, item_id in pending:
            s = starts[tok_idx]
            gt_rows.append((url, s, s + len(sf), sf, normalize_sf(sf), item_id, lang))
        from .textlib import make_html

        ts = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=d)
        page_rows.append((url, ts, make_html(text, title=url), text, lang))

    pages = pd.DataFrame(
        page_rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    gt = pd.DataFrame(
        gt_rows,
        columns=["url", "start", "end", "sf", "sf_norm", "item_id", "lang"],
    )
    gt = gt.sort_values(["url", "start"]).reset_index(drop=True)
    gt["mention_id"] = gt.groupby("url").cumcount()

    # --- labeled pairs (within blocking key = sf_norm; en only) ----------
    pair_rows = []
    gt_en = gt[gt.lang == "en"]
    for sf_norm, grp in gt_en.groupby("sf_norm"):
        ms = list(grp[["url", "mention_id", "item_id"]].itertuples(index=False))
        rng.shuffle(ms)
        for i in range(len(ms) - 1):
            a, b = ms[i], ms[i + 1]
            if (a.url, a.mention_id) == (b.url, b.mention_id):
                continue
            pair_rows.append(
                (a.url, a.mention_id, b.url, b.mention_id, a.item_id == b.item_id)
            )
    labeled_pairs = pd.DataFrame(
        pair_rows,
        columns=["url_a", "mention_id_a", "url_b", "mention_id_b", "same_entity"],
    ).drop_duplicates()

    ents = pd.DataFrame(
        [(e[0], e[1], normalize_sf(e[1]), e[3], " ".join(e[4])) for e in entities],
        columns=["item_id", "canonical", "canonical_norm", "supertype", "sig_words"],
    )

    gaz = sorted(set(entity_aliases.alias_norm) | {"unknown ville", "mystery box"})
    gazetteer = pd.DataFrame({"alias_norm": gaz})

    return {
        "pages": pages,
        "entity_aliases": entity_aliases,
        "entity_types": entity_types,
        "type_closure": build_type_closure(),
        "entity_embeddings": entity_embeddings,
        "entities": ents,
        "gazetteer": gazetteer,
        "gt_mentions": gt,
        "labeled_pairs": labeled_pairs,
    }


INPUT_TABLES = (
    "pages", "gazetteer", "entity_aliases", "entity_types",
    "type_closure", "entity_embeddings", "entities",
)


def fixtures_to_spark(spark, fx: dict[str, pd.DataFrame]):
    """Pipeline input DataFrames from the fixture dict (ground-truth
    tables stay pandas-side)."""
    return {k: spark.createDataFrame(fx[k]) for k in INPUT_TABLES}


def write_fixtures(fx: dict[str, pd.DataFrame], out_dir: str) -> None:
    import os

    os.makedirs(out_dir, exist_ok=True)
    for name, df in fx.items():
        # microsecond timestamps: Spark's reader rejects TIMESTAMP(NANOS)
        df.to_parquet(
            f"{out_dir}/{name}.parquet",
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
