"""Bench-scale pairwise-F1 acceptance run (BASELINE.json metric):
full pipeline on the seeded 6000-page / 2500-entity fixture, both
scorer heads, distributed F1 job vs the labeled pairs at the fixed
blocking key. Appends/updates the 'Pairwise F1 at bench scale' section
of BENCH/BASELINE.md (scripts/scaling_bench.py rewrites that file, so
run this after it)."""

from __future__ import annotations

import os
import re
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from type_filtered_entity_linker_spark.config import LinkerConfig
    from type_filtered_entity_linker_spark.fixtures import (
        fixtures_to_spark,
        make_fixtures,
    )
    from type_filtered_entity_linker_spark.operators.evaluation import (
        pairwise_f1_spark,
    )
    from type_filtered_entity_linker_spark.plans.pipeline import run_pipeline
    from type_filtered_entity_linker_spark.session import spark_session

    pages = int(os.environ.get("F1_PAGES", "6000"))
    entities = int(os.environ.get("F1_ENTITIES", "2500"))
    spark = spark_session(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    fx = make_fixtures(seed=42, n_pages=pages, n_entities=entities)
    inputs = fixtures_to_spark(spark, fx)
    lp = spark.createDataFrame(fx["labeled_pairs"])
    n_pairs = lp.count()
    rows = {}
    for head in ("cosine", "mlp"):
        wd = f"/dev/shm/f1b_{head}"
        shutil.rmtree(wd, ignore_errors=True)
        res = run_pipeline(
            spark, inputs, wd, LinkerConfig(scorer_head=head), resume=False
        )
        rows[head] = pairwise_f1_spark(res.clusters, lp).collect()[0]
    spark.stop()

    c, m = rows["cosine"], rows["mlp"]
    assert c.n_pairs_evaluated == n_pairs and m.n_pairs_evaluated == n_pairs
    section = f"""## Pairwise F1 at bench scale (acceptance metric)

Distributed F1 job (`operators/evaluation.py`) over the full pipeline's
clusters vs the fixture's labeled pairs at the same blocking key,
{pages} pages / {entities} entities / {n_pairs:,} labeled pairs, local[16]:

| scorer head | precision | recall | F1 | target |
|---|---|---|---|---|
| cosine | {c.precision:.5g} | {c.recall:.5f} | **{c.f1:.5f}** | >= 0.99 |
| mlp (neural comparator, h=768) | {m.precision:.5g} | {m.recall:.5f} | **{m.f1:.5f}** | >= 0.99 |

"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    text = open(path).read()
    pat = re.compile(
        r"## Pairwise F1 at bench scale.*?(?=## |\Z)", re.DOTALL
    )
    if pat.search(text):
        text = pat.sub(section, text)
    else:
        anchor = re.search(r"^## Per-level .*$", text, re.MULTILINE)
        assert anchor, "no per-level section to anchor the F1 table on"
        text = text[: anchor.start()] + section + text[anchor.start() :]
    open(path, "w").write(text)
    print(
        f"cosine f1={c.f1:.5f} mlp f1={m.f1:.5f} "
        f"(precision {c.precision}/{m.precision}, {n_pairs} pairs) -> {path}"
    )


if __name__ == "__main__":
    main()
