#!/usr/bin/env python3
"""Per-family sf-growth table from two graft.Bench full records.

Joins the per-query warm seconds of a smaller-SF and a larger-SF Bench
pass, maps each query to its SURVEY.md §2 family (the §2.x subsection
it is listed under), and prints a markdown table: per family the query
count, total seconds at each scale, the growth factor, and the top-3
per-query growth outliers (for the named-adjudication check).

Usage: growth_table.py SMALL.json LARGE.json SMALL_X LARGE_X
  (SMALL_X/LARGE_X are the data scale factors, e.g. 1 10 — the table
  annotates growth relative to the LARGE_X/SMALL_X data ratio)
"""
import json, re, sys


def load(path):
    best = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(d, dict) and d.get("queries"):
                best = d
    if best is None:
        best = json.load(open(path))
    return best["queries"]


def families(survey="SURVEY.md"):
    fam, cur = {}, None
    sec_re = re.compile(r"^### (2\.\d+) (.+)$")
    row_re = re.compile(r"^\| `(q_\w+)`")
    for line in open(survey):
        m = sec_re.match(line)
        if m:
            cur = f"{m.group(1)} {m.group(2).split('(')[0].strip()}"
        m = row_re.match(line)
        if m and cur:
            fam[m.group(1)] = cur
    return fam


def main():
    small, large = load(sys.argv[1]), load(sys.argv[2])
    sx, lx = float(sys.argv[3]), float(sys.argv[4])
    data_ratio = lx / sx
    fam = families()
    rows = {}
    missing = []
    for q, t_small in small.items():
        if q not in large:
            missing.append(q)
            continue
        f = fam.get(q, "unmapped")
        rows.setdefault(f, []).append((q, t_small, large[q]))
    print(f"| family | queries | sf{sx:g} s | sf{lx:g} s | growth (data {data_ratio:g}x) | top per-query growth |")
    print("|---|---|---|---|---|---|")
    tot_s = tot_l = 0.0
    for f in sorted(rows):
        qs = rows[f]
        s = sum(t for _, t, _ in qs)
        l = sum(t for _, _, t in qs)
        tot_s += s
        tot_l += l
        top = sorted(qs, key=lambda x: -(x[2] / max(x[1], 1e-9)))[:3]
        tops = ", ".join(f"{q} {b / max(a, 1e-9):.1f}x ({a:.2f}->{b:.2f}s)" for q, a, b in top)
        print(f"| {f} | {len(qs)} | {s:.1f} | {l:.1f} | **{l / s:.1f}x** | {tops} |")
    print(f"| **all** | {sum(len(v) for v in rows.values())} | {tot_s:.1f} | {tot_l:.1f} | **{tot_l / tot_s:.1f}x** | |")
    if missing:
        print(f"\nmissing from the large pass: {missing}")


if __name__ == "__main__":
    main()
