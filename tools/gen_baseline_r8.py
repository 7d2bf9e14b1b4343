#!/usr/bin/env python3
"""Rebuild the BASELINE.md main table from one full-pass measurement
(dev tooling only). Reads the four JSONs the round-8 measurement
script writes and emits the 194-row markdown table + headline totals.

Usage: python3 tools/gen_baseline_r8.py > /tmp/baseline_table.md
"""
import json

def load(p):
    # graft.Bench emits two JSON lines (per-query + summary); DuckDB's
    # bench emits one. Merge keys across lines, first line wins.
    out = {}
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line:
                for k, v in json.loads(line).items():
                    out.setdefault(k, v)
    return out

s01 = load("target/bench_r8_sf01.json")
s1 = load("target/bench_r8_sf1.json")
d01 = load("target/duck_r8_sf01.json")
d1 = load("target/duck_r8_sf1.json")

qs = sorted(s01["queries"])
assert set(qs) == set(s1["queries"]) == set(d01["queries"]) == set(d1["queries"]), (
    len(qs), len(d01["queries"]))

print(f"<!-- full pass: {len(qs)} queries -->")
print(f"<!-- spark sf0.1 warm {s01['value']:.1f} cold {s01.get('cold_total')} | "
      f"sf1 warm {s1['value']:.1f} cold {s1.get('cold_total')} -->")
print(f"<!-- duck sf0.1 warm {d01['warm_total']:.1f} cold {d01['cold_total']:.1f} | "
      f"sf1 warm {d1['warm_total']:.1f} cold {d1.get('cold_total', float('nan')):.1f} -->")
print(f"<!-- ratio sf0.1 {s01['value']/d01['warm_total']:.2f}x | "
      f"sf1 {s1['value']/d1['warm_total']:.3f}x | "
      f"spark growth {s1['value']/s01['value']:.2f}x | "
      f"duck growth {d1['warm_total']/d01['warm_total']:.1f}x -->")

print("| query | duckdb_s | spark_s (warm) | ratio | spark_sf1_s | spark growth | duckdb_sf1_s |")
print("|---|---|---|---|---|---|---|")
weak = []
for q in qs:
    a, b = d01["queries"][q], s01["queries"][q]
    c, e = s1["queries"][q], d1["queries"][q]
    ratio = b / a if a > 0 else float("inf")
    growth = c / b if b > 0 else float("inf")
    print(f"| {q} | {a:.3f} | {b:.3f} | {ratio:.1f} | {c:.3f} | {growth:.1f}× | {e:.3f} |")
    if c > 2 * e and c > 1.0:
        weak.append((q, c, e, c / e))
print()
print("<!-- perf-weak at sf1 (>2x duck AND >1s): -->")
for q, c, e, r in sorted(weak, key=lambda x: -x[3]):
    print(f"<!--   {q}: spark {c:.2f}s vs duck {e:.2f}s = {r:.1f}x -->")
