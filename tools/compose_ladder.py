#!/usr/bin/env python3
"""Compose the scale-ladder bench artifacts from per-rung graft.Bench
JSON lines (the LAST line of each run's stdout).

Usage: compose_ladder.py <sf0.1.log> <sf1.log> [<sf10.log>]

Writes BENCH_SF1.json (2-rung, the round-12 format) and, when a third
log is given, BENCH_LADDER.json (all rungs + consecutive ratios)."""

import json
import sys


def last_json(path):
    with open(path) as f:
        lines = [ln for ln in f if ln.strip().startswith("{")]
    return json.loads(lines[-1])


def ratios(lo, hi):
    per = {}
    for q, t in hi["queries"].items():
        if q in lo["queries"] and lo["queries"][q] > 0:
            per[q] = round(t / lo["queries"][q], 3)
    out = {
        "total_ratio": round(hi["value"] / lo["value"], 3),
        "control_ratio": round(hi["control_s"] / lo["control_s"], 3)
        if lo["control_s"] > 0 else None,
        "worst_3": sorted(per, key=per.get, reverse=True)[:3],
        "per_query_ratio": dict(sorted(per.items())),
    }
    # rung-over-rung ratio of each ambience control (scan/shuffle/write/
    # stream), when both rungs carry it -- the per-family yardsticks
    for k in ("shuffle_control_s", "write_control_s", "stream_control_s"):
        if lo.get(k, -1) > 0 and hi.get(k, -1) > 0:
            out[k.replace("_s", "_ratio")] = round(hi[k] / lo[k], 3)
    return out


def main():
    logs = sys.argv[1:]
    runs = [last_json(p) for p in logs]
    protocol = ("tools/gen_sf.scala rungs = 10x chained replications of "
                "sf0.1 (join-preserving key shifts, per-replica doc/vector "
                "perturbation); graft.Bench headline subset (45 queries "
                "incl. all 8 TPC-DS shapes), local[32], min-of-two passes, "
                "per-family ambience controls, same host back-to-back; rungs may be "
                "per-family fresh-JVM merges (see each rung's rung_protocol, "
                "tools/merge_rung.py) so late-pass cache state cannot inflate "
                "write families")
    r01, r1 = runs[0], runs[1]
    two = {
        "protocol": protocol,
        "sf0.1": r01,
        "sf1": r1,
        "total_ratio_sf1_vs_sf0.1": round(r1["value"] / r01["value"], 3),
        "control_ratio": round(r1["control_s"] / r01["control_s"], 3)
        if r01["control_s"] > 0 else None,
        "per_query_ratio": ratios(r01, r1)["worst_3"],
    }
    with open("BENCH_SF1.json", "w") as f:
        json.dump(two, f, indent=1)
    print("BENCH_SF1.json:", two["total_ratio_sf1_vs_sf0.1"], "x for 10x")
    if len(runs) > 2:
        r10 = runs[2]
        ladder = {
            "protocol": protocol,
            "rungs": {"sf0.1": r01, "sf1": r1, "sf10": r10},
            "sf1_vs_sf0.1": ratios(r01, r1),
            "sf10_vs_sf1": ratios(r1, r10),
            "sf10_vs_sf0.1_total_ratio":
                round(r10["value"] / r01["value"], 3),
        }
        with open("BENCH_LADDER.json", "w") as f:
            json.dump(ladder, f, indent=1)
        print("BENCH_LADDER.json: sf10/sf1 =",
              ladder["sf10_vs_sf1"]["total_ratio"], "x; sf10/sf0.1 =",
              ladder["sf10_vs_sf0.1_total_ratio"], "x for 100x")


if __name__ == "__main__":
    main()
