#!/usr/bin/env python3
"""Build the sf0.1 -> sf1 scaling artifact.

Usage: python3 tools/bench_ratio.py <bench_sf01.out> <bench_sf1.out> [BENCH_sf1.json]

Each input is the stdout of `graft.Bench` (first line = full JSON with the
per-query map). Emits BENCH_sf1.json holding both runs plus per-query
ratios, and prints the slowest-at-sf1 table as markdown for README.
"""
import json, sys

def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"queries"'):
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")

a, b = load(sys.argv[1]), load(sys.argv[2])
out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_sf1.json"
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))
ratios = {q: round(qb[q] / qa[q], 2) for q in common}
artifact = {
    "metric": "sf_scaling",
    "sf_small": a["sf"], "sf_large": b["sf"],
    "total_small_sec": round(sum(qa[q] for q in common), 2),
    "total_large_sec": round(sum(qb[q] for q in common), 2),
    "total_ratio": round(sum(qb[q] for q in common) / sum(qa[q] for q in common), 2),
    "n_queries": len(common),
    "worst_ratio_query": max(common, key=lambda q: ratios[q]),
    "worst_ratio": max(ratios.values()),
    "queries_small": {q: round(qa[q], 3) for q in common},
    "queries_large": {q: round(qb[q], 3) for q in common},
    "ratios": ratios,
}
with open(out_path, "w") as f:
    json.dump(artifact, f, indent=1, sort_keys=True)
print(f"wrote {out_path}: {artifact['n_queries']} queries, "
      f"total {artifact['total_small_sec']}s -> {artifact['total_large_sec']}s "
      f"({artifact['total_ratio']}x)")
print("\nslowest at sf1:\n")
print("| query | sf0.1 (s) | sf1 (s) | ratio |")
print("|---|---|---|---|")
for q in sorted(common, key=lambda q: -qb[q])[:8]:
    print(f"| {q} | {qa[q]:.2f} | {qb[q]:.2f} | {ratios[q]:.1f}x |")
print("\nworst ratios:\n")
print("| query | sf0.1 (s) | sf1 (s) | ratio |")
print("|---|---|---|---|")
for q in sorted(common, key=lambda q: -ratios[q])[:8]:
    print(f"| {q} | {qa[q]:.2f} | {qb[q]:.2f} | {ratios[q]:.1f}x |")
