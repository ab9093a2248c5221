#!/usr/bin/env python3
"""Compose an idle-host ABAB bench A/B into BENCH_AB.json.

Usage: ab_compare.py <out.json> <label_a>=<a1.log>,<a2.log>,... \
                     <label_b>=<b1.log>,<b2.log>,...

Each log is a graft.Bench stdout capture (the FIRST JSON line is the
full query map). For each side: per-query MIN across its runs (the
noise-resistant estimator the bench itself uses), plus per-run totals
and controls so the ambience spread is visible. The comparison is
like-for-like: only queries present on BOTH sides enter the ratio.
"""

import json
import sys


def first_json(path):
    with open(path) as f:
        for ln in f:
            if ln.strip().startswith("{"):
                return json.loads(ln)
    raise SystemExit(f"no JSON line in {path}")


def side(paths):
    runs = [first_json(p) for p in paths]
    queries = {}
    for r in runs:
        for q, t in r["queries"].items():
            if t > 0:
                queries[q] = min(queries.get(q, t), t)
    return {
        "runs": [{
            "value": r["value"],
            "control_s": r["control_s"],
            "value_norm": r["value_norm"],
        } for r in runs],
        "queries_min": queries,
    }


def main():
    out = sys.argv[1]
    sides = {}
    for arg in sys.argv[2:]:
        label, paths = arg.split("=", 1)
        sides[label] = side(paths.split(","))
    (la, a), (lb, b) = list(sides.items())
    common = sorted(set(a["queries_min"]) & set(b["queries_min"]))
    asum = sum(a["queries_min"][q] for q in common)
    bsum = sum(b["queries_min"][q] for q in common)
    per = {q: round(b["queries_min"][q] / a["queries_min"][q], 3)
           for q in common if a["queries_min"][q] > 0}
    ratios = sorted(per.values())
    med = ratios[len(ratios) // 2] if ratios else None
    amed_ctl = sorted(r["control_s"] for r in a["runs"])[len(a["runs"]) // 2]
    bmed_ctl = sorted(r["control_s"] for r in b["runs"])[len(b["runs"]) // 2]
    report = {
        "protocol": ("ABAB alternation, fresh JVM per run, idle host, "
                     "full query set, per-query min across each side's "
                     "runs, like-for-like query intersection"),
        la: a, lb: b,
        "common_queries": len(common),
        f"sum_{la}_s": round(asum, 3),
        f"sum_{lb}_s": round(bsum, 3),
        f"like_for_like_ratio_{lb}_over_{la}": round(bsum / asum, 4),
        "median_per_query_ratio": med,
        "control_median_ratio": round(bmed_ctl / amed_ctl, 4)
        if amed_ctl > 0 else None,
        "worst_5": dict(sorted(per.items(), key=lambda kv: -kv[1])[:5]),
        "best_5": dict(sorted(per.items(), key=lambda kv: kv[1])[:5]),
    }
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in (la, lb)}, indent=1))


if __name__ == "__main__":
    main()
