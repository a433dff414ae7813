#!/usr/bin/env python3
"""Assemble BENCH_sf10_subset.json from three Bench stdout JSON lines.

Usage: mk_sf10_subset.py <bench_sf01.json> <bench_sf1.json>
       <bench_sf10.json> <out.json>

The sf0.1 input may be a best-of-N record (the committed bench_ref /
BENCH_r*.json); sf1 and sf10 are single-pass runs over the GenScale
rungs. Emits per-query wall seconds at each rung plus the 10x and
100x data-scaling ratios, for PLANS.md adjudication.
"""
import json
import sys


def flat(path):
    d = json.load(open(path))
    qs = d.get("queries", d)
    return {k: v for k, v in qs.items()
            if isinstance(v, (int, float)) and v > 0}


def main():
    sf01, sf1, sf10, out = sys.argv[1:5]
    a, b, c = flat(sf01), flat(sf1), flat(sf10)
    queries = {}
    for q in sorted(c):
        e = {"sf10_single_pass": round(c[q], 2)}
        if q in a:
            e["sf0.1_best_of_n"] = round(a[q], 3)
            e["ratio_100x_data"] = round(c[q] / a[q], 2)
        if q in b:
            e["sf1_single_pass"] = round(b[q], 2)
            e["ratio_10x_from_sf1"] = round(c[q] / b[q], 2)
        queries[q] = e
    doc = {
        "what": ("100x scale evidence, round 13: the r12+r13 feature "
                 "gates PLUS the heaviest compute-bound non-TxTable "
                 "queries (graph family, dedup cascade, PQ training, "
                 "inverted index, BPE) at sf0.1 (best-of-N record), "
                 "sf1 (GenScale sf0.1 x10) and sf10 (x100), local[32], "
                 "SPARK_GRAFT_RETRY_FLOOR=1e9 at the scale rungs (no "
                 "best-of-N). Gate-query times include building their "
                 "scratch TxTables from the rung's base tables. "
                 "q_jaccard_prefix is excluded by its standing "
                 "adjudication: output-bound (the emitted pair set "
                 "itself grows superlinearly), sf1 evidence stands."),
        "queries": queries,
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(f"wrote {out} with {len(queries)} queries")


if __name__ == "__main__":
    main()
