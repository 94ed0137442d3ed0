"""Pool every kept raw scaling study (BENCH/scaling_runs_*.json) into
one headline: per level, all fresh-JVM runs from all studies, nothing
discarded; the pooled MEDIAN run (by scorer pairs/s) carries the
headline and reports that single run's own (scorer, e2e) pair — the
r4 methodology, now recomputable from raw forever (VERDICT r04 item
5). Prints one JSON line."""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    files = sorted(glob.glob(os.path.join(REPO, "BENCH", "scaling_runs_*.json")))
    if not files:
        sys.exit("no raw scaling runs found")
    pooled: dict[str, list[dict]] = {}
    studies = []
    for f in files:
        d = json.load(open(f))
        studies.append(d["label"])
        for level, runs in d["levels"].items():
            pooled.setdefault(level, []).extend(
                {
                    "study": d["label"],
                    "scorer_pairs_per_sec": r["scorer_pairs_per_sec"],
                    "pipeline_e2e": r["pipeline_e2e"],
                    "copy_gbps_start": r["box_probe_start"]["copy_gbps"],
                }
                for r in runs
            )

    def median_run(level: str) -> dict:
        rs = sorted(pooled[level], key=lambda r: r["scorer_pairs_per_sec"])
        return rs[len(rs) // 2]

    out = {"studies": studies, "n_runs": {k: len(v) for k, v in pooled.items()}}
    for lo, hi in ((2, 8), (8, 32)):
        if str(lo) not in pooled or str(hi) not in pooled:
            continue
        m_lo, m_hi = median_run(str(lo)), median_run(str(hi))
        f = hi / lo
        best_lo = max(r["scorer_pairs_per_sec"] for r in pooled[str(lo)])
        best_hi = max(r["scorer_pairs_per_sec"] for r in pooled[str(hi)])
        out[f"{lo}v{hi}"] = {
            "pooled_median_pairs_per_sec": {
                str(lo): m_lo["scorer_pairs_per_sec"],
                str(hi): m_hi["scorer_pairs_per_sec"],
            },
            "median_from_studies": {str(lo): m_lo["study"], str(hi): m_hi["study"]},
            "efficiency_pooled_median": round(
                m_hi["scorer_pairs_per_sec"]
                / (m_lo["scorer_pairs_per_sec"] * f),
                3,
            ),
            "pipeline_e2e_median_run": {
                str(lo): m_lo["pipeline_e2e"],
                str(hi): m_hi["pipeline_e2e"],
            },
            "best_of_pool_pairs_per_sec": {str(lo): best_lo, str(hi): best_hi},
            "efficiency_best_of_pool": round(best_hi / (best_lo * f), 3),
            "spread": {
                str(c): round(
                    max(r["scorer_pairs_per_sec"] for r in pooled[str(c)])
                    / min(r["scorer_pairs_per_sec"] for r in pooled[str(c)]),
                    2,
                )
                for c in (lo, hi)
            },
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
