#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare values exactly (columns sorted by name).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            exp = con.sql(sql).df()
            if sorted(got.columns) != sorted(exp.columns):
                print(f"FAIL {name}: cols {sorted(got.columns)} vs {sorted(exp.columns)}"); n_fail += 1; continue
            g = got[sorted(got.columns)]
            e = exp[sorted(exp.columns)]
            if len(g) != len(e):
                print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
            mismatch = None
            for c in g.columns:
                gv, ev = g[c].tolist(), e[c].tolist()
                for i, (a, b) in enumerate(zip(gv, ev)):
                    ok = (a == b) or (a is None and b is None) or (str(a) == str(b)) \
                        or (isinstance(a, float) and isinstance(b, float) and a != a and b != b)
                    if not ok:
                        mismatch = (c, i, a, b); break
                if mismatch: break
            if mismatch:
                c, i, a, b = mismatch
                print(f"FAIL {name}: col={c} row={i}: spark={a!r} oracle={b!r}"); n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        except Exception as ex:
            print(f"FAIL {name}: {ex}"); n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
