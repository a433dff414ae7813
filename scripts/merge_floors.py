#!/usr/bin/env python3
"""Merge a fresh sf0.1 Bench run into the committed bench_ref.json
floors: keep min(old, new) per query, seed queries new this round,
and RE-SEED explicitly adjudicated queries to the fresh measurement
(for floors that predate environment changes and no longer represent
any reproducible run — the adjudication is recorded in `what`).

Usage: merge_floors.py <fresh_bench.json> <bench_ref.json> \
       [reseed_q1,reseed_q2] [note]
"""
import json
import sys


def main():
    fresh_p, ref_p = sys.argv[1], sys.argv[2]
    reseed = set(sys.argv[3].split(",")) if len(sys.argv) > 3 and sys.argv[3] else set()
    note = sys.argv[4] if len(sys.argv) > 4 else ""
    fresh = json.load(open(fresh_p))["queries"]
    doc = json.load(open(ref_p))
    ref = doc.get("queries", doc)
    out = dict(ref)
    improved, seeded, reseeded = 0, 0, []
    for q, t in fresh.items():
        if not isinstance(t, (int, float)) or t <= 0:
            continue
        if q in reseed:
            reseeded.append(q)
            out[q] = round(t, 4)
        elif q not in ref or not isinstance(ref.get(q), (int, float)):
            seeded += 1
            out[q] = round(t, 4)
        elif t < ref[q]:
            improved += 1
            out[q] = round(t, 4)
    if note:
        doc["what"] = doc.get("what", "") + " " + note
    doc["queries"] = out
    json.dump(doc, open(ref_p, "w"), indent=1)
    print(f"improved={improved} seeded={seeded} reseeded={reseeded}")


if __name__ == "__main__":
    main()
