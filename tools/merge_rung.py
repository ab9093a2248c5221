#!/usr/bin/env python3
"""Merge per-family graft.Bench runs of ONE ladder rung into a single
rung JSON for compose_ladder.py.

Why: a single-pass sf10 rung accumulates page-cache/disk state across
~45 queries, so write-family queries late in the pass read 30-90x
in-rung while isolated fresh-JVM probes show 1-7x per decade
(PROBE_WRITE_SF10.json). Running the rung as per-family FRESH-JVM
sessions (scan families first, write families last) keeps each family's
numbers within ~3x of its isolated minimum, so the ladder artifact stops
generating false alarms that each need a post-hoc probe.

Usage: merge_rung.py <out.log> <family1.log> [<family2.log> ...]

Each input log is a graft.Bench stdout (the LAST JSON line wins, i.e.
the headline line; the FIRST JSON line carries the full query map -- we
use the first line so subset runs merge their complete maps). The merged
output keeps, per control, the value from the family run that OWNS it
(scan control from the q* run, shuffle control from the corpus run,
write control from the graft_/sql_ run, stream control from the
stream_* run), recomputes the totals and family norms from the merged
query map, and ORs the ambient flags.
"""

import json
import sys


def family(name):
    if name.startswith("stream_"):
        return "stream"
    if name.startswith("graft_") or name.startswith("sql_"):
        return "write"
    if name.startswith("q"):
        return "scan"
    return "shuffle"


def first_json(path):
    with open(path) as f:
        for ln in f:
            if ln.strip().startswith("{"):
                return json.loads(ln)
    raise SystemExit(f"no JSON line in {path}")


def main():
    out_path, logs = sys.argv[1], sys.argv[2:]
    runs = [first_json(p) for p in logs]
    queries = {}
    for r in runs:
        queries.update(r["queries"])
    merged = dict(runs[0])
    merged["queries"] = dict(sorted(queries.items()))
    merged["value"] = round(sum(queries.values()), 3)
    merged["ambient"] = any(r.get("ambient", False) for r in runs)

    # each control comes from the run that exercises its family
    own = {"scan": "control_s", "shuffle": "shuffle_control_s",
           "write": "write_control_s", "stream": "stream_control_s"}
    for r in runs:
        fams = {family(q) for q in r["queries"]}
        for fam, key in own.items():
            if fam in fams:
                # A failed control (-1) in the owning run must poison the
                # merged artifact too — inheriting runs[0]'s control would
                # report a norm measured in a JVM that never ran the family.
                merged[key] = r[key] if r.get(key, -1) > 0 else -1.0

    def fam_total(f):
        return sum(t for q, t in queries.items() if family(q) == f)

    def fam_norm(f, ctl):
        t = fam_total(f)
        return round(t / ctl, 3) if ctl and ctl > 0 and t > 0 else \
            (0.0 if t == 0 else -1.0)

    merged["family_totals"] = {
        f: round(fam_total(f), 3) for f in own}
    merged["family_norms"] = {
        f: fam_norm(f, merged.get(own[f], -1)) for f in own}
    merged["value_norm"] = (
        round(merged["value"] / merged["control_s"], 3)
        if merged.get("control_s", -1) > 0 else -1.0)
    merged["stream_norm"] = merged["family_norms"]["stream"]
    merged["rung_protocol"] = (
        "merged per-family fresh-JVM sessions: " +
        ", ".join(sorted({family(q) for q in queries})))
    with open(out_path, "w") as f:
        f.write(json.dumps(merged) + "\n")
    print(f"{out_path}: {merged['value']}s over {len(queries)} queries, "
          f"ambient={merged['ambient']}")


if __name__ == "__main__":
    main()
