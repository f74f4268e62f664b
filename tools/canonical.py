#!/usr/bin/env python3
"""Refresh BASELINE_CANONICAL.json with a bench record's per-query MINs.

Usage: python3 tools/canonical.py <bench_record.json> [--dry]

The canonical map is the calm-estimate floor used by Bench's burst
guard: per query, min(existing canonical, new record). New queries
enter at their record value. The record must carry the same "sf"
basename as the canonical ("sf0.1"); refuses otherwise.
Prints a summary (added / improved / unchanged) and rewrites the file
with sorted keys (stable diffs).
"""
import json, sys

def main():
    rec_path = sys.argv[1]
    dry = "--dry" in sys.argv
    rec = json.load(open(rec_path))
    can = json.load(open("BASELINE_CANONICAL.json"))
    rec_sf = rec["sf"].rstrip("/").split("/")[-1]
    assert rec_sf == can["sf"], f"sf mismatch: record {rec_sf} vs canonical {can['sf']}"
    # the record must be the FULL bench line (full names, "cpus" field) —
    # the compact driver parse-target carries short "qNN" keys and only
    # the slowest 60, which would pollute the canonical as bogus adds
    assert "cpus" in rec, "not a full bench record (missing 'cpus' — compact line?)"
    import re
    bad = [k for k in rec["queries"] if not re.match(r"^q\d+_", k)]
    assert not bad, f"short/garbled query keys (compact record?): {bad[:5]}"
    q_old = can["queries"]
    q_new = rec["queries"]
    # "pinned" queries carry a deliberately NON-min canonical (e.g.
    # q301's suite-context floor, re-based r16: its selective-calm min
    # is a different measurable quantity) — the min-merge must not
    # silently undo a documented re-base; re-pinning is a hand edit.
    pinned = set(can.get("pinned", []))
    added = improved = unchanged = 0
    out = dict(q_old)
    for k, v in q_new.items():
        if k in pinned:
            unchanged += 1
        elif k not in out:
            out[k] = v; added += 1
        elif v < out[k]:
            out[k] = v; improved += 1
        else:
            unchanged += 1
    can["queries"] = {k: out[k] for k in sorted(out)}
    total = sum(can["queries"].values())
    can["total"] = round(total, 3)
    if "total_sec" in can:
        can["total_sec"] = round(total, 3)
    print(f"added {added}, improved {improved}, unchanged {unchanged}; "
          f"canonical total {total:.1f} s / {len(out)}")
    if not dry:
        json.dump(can, open("BASELINE_CANONICAL.json", "w"), indent=1)
        print("BASELINE_CANONICAL.json rewritten")

if __name__ == "__main__":
    main()
