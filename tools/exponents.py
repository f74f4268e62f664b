#!/usr/bin/env python3
"""Build the per-query sf1-vs-sf0.1 scaling-exponent table for BASELINE.md.

Usage: python3 tools/exponents.py <sf01_bench.log> <sf1_bench.log>

Reads the first full-precision JSON record line from each bench log,
computes ratio = t_sf1 / t_sf01 and exponent = log10(ratio) (10x rows),
and prints a markdown table sorted by exponent descending, plus a
summary. Queries under MIN_BASE seconds at sf0.1 are overhead-bound:
their ratio is reported but flagged, not read as a scaling law.
"""
import json, math, re, sys

MIN_BASE = 0.5  # below this the sf0.1 time is job-setup, not data


def record(path):
    for line in open(path):
        # full records may carry trailing "reruns"/"failed" fields after
        # "cpus" — match to end-of-line, then json-parse (and refuse a
        # record whose failed list makes its numbers meaningless)
        m = re.search(r'\{"metric":"total".*"cpus":"\d+".*\}', line)
        if m:
            rec = json.loads(m.group(0))
            assert not rec.get("failed"), \
                f"{path}: record carries failed={rec['failed'][:3]}... — invalid run"
            return rec
    raise SystemExit(f"no bench record in {path}")


def main(p01, p1):
    a, b = record(p01), record(p1)
    qa, qb = a["queries"], b["queries"]
    rows = []
    for q in sorted(qa):
        if q not in qb:
            continue
        t0, t1 = qa[q], qb[q]
        ratio = t1 / t0 if t0 > 0 else float("inf")
        exp = math.log10(ratio) if ratio > 0 else float("-inf")
        rows.append((q, t0, t1, ratio, exp))
    rows.sort(key=lambda r: -r[4])
    print("| query | sf0.1 (s) | sf1 (s) | ratio | exp log10 | note |")
    print("|---|---|---|---|---|---|")
    over = sup = 0
    for q, t0, t1, ratio, exp in rows:
        note = ""
        if t0 < MIN_BASE:
            note = "overhead-bound base"
            over += 1
        elif exp > 1.0:
            note = "SUPERLINEAR"
            sup += 1
        print(f"| {q} | {t0:.2f} | {t1:.2f} | {ratio:.2f}x | {exp:.2f} | {note} |")
    n = len(rows)
    data_bound = [r for r in rows if r[1] >= MIN_BASE]
    worst = data_bound[0] if data_bound else None
    print()
    print(f"{n} shared queries; {over} overhead-bound at sf0.1 (< {MIN_BASE}s); "
          f"{sup} superlinear among data-bound; "
          + (f"worst data-bound exponent {worst[4]:.2f} ({worst[0]})" if worst else ""))
    print(f"totals: sf0.1 {sum(qa.values()):.1f}s -> sf1 {sum(qb[q] for q in qa if q in qb):.1f}s")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
