#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare CANONICAL CELL RENDERINGS strictly.

Asymmetry is deliberate and mirrors the driver: the Spark parquet side is
fetched natively (DECIMAL stays Decimal -> str keeps trailing zeros, e.g.
'460.50'), the oracle side goes through pandas (DECIMAL -> float64 -> repr
'460.5').  Round 1 proved a value-equality compare is blind to exactly this
mismatch; a DECIMAL column that survives to the output will now go RED here
just as it does in the driver's hash gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import decimal, glob, json, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    """Canonical string for one cell, as the driver hashes it."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if v != v:
            return "∅"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)  # keeps trailing zeros -> strict
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def spark_rows(con, files, cols):
    """Native duckdb fetch: Decimal/np types preserved as python objects."""
    sel = ", ".join(f'"{c}"' for c in cols)
    rows = con.sql(f"SELECT {sel} FROM read_parquet({files!r})").fetchall()
    return [tuple(canon(v) for v in row) for row in rows]


def oracle_rows(con, sql, cols):
    """Pandas fetch (the driver's oracle path): decimals collapse to float."""
    import pandas as pd
    df = con.sql(sql).df()
    out = []
    for t in df[cols].itertuples(index=False, name=None):
        row = []
        for v in t:
            try:
                if v is None or pd.isna(v):
                    row.append(canon(None))
                    continue
            except (TypeError, ValueError):
                pass  # arrays etc.
            if hasattr(v, "item"):
                try:
                    v = v.item()
                except Exception:
                    pass
            row.append(canon(v))
        out.append(tuple(row))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            got_cols = [d[0] for d in con.sql(
                f"SELECT * FROM read_parquet({files!r}) LIMIT 0").description]
            exp_cols = [d[0] for d in con.sql(
                f"SELECT * FROM ({sql}) LIMIT 0").description]
            if sorted(got_cols) != sorted(exp_cols):
                print(f"FAIL {name}: cols {sorted(got_cols)} vs {sorted(exp_cols)}")
                n_fail += 1; continue
            cols = sorted(got_cols)
            g = spark_rows(con, files, cols)
            e = oracle_rows(con, sql, cols)
            if len(g) != len(e):
                print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
            mismatch = None
            for i, (gr, er) in enumerate(zip(g, e)):
                if gr != er:
                    for c, a, b in zip(cols, gr, er):
                        if a != b:
                            mismatch = (c, i, a, b); break
                    break
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
