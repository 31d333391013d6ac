#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Runs DuckDB on each oracle SQL from Verify's oracle_sql.json against the
same sf parquet tables, loads the Spark parquet output, sorts columns by
name and rows by all columns, and compares values (exact, plus a
tolerance report so FP-rounding risks surface before the real gate).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def load_spark(outdir, name):
    ds = pads.dataset(f"{outdir}/{name}")
    tbl = ds.to_table()
    cols = sorted(tbl.column_names)
    types = {c: str(tbl.schema.field(c).type) for c in cols}
    rows = [tuple(norm(r[c]) for c in cols) for r in tbl.to_pylist()]
    return cols, types, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def load_oracle(con, sql):
    arr = con.sql(sql).arrow()
    cols_orig = arr.column_names
    order = sorted(range(len(cols_orig)), key=lambda i: cols_orig[i])
    cols = [cols_orig[i] for i in order]
    types = {c: str(arr.schema.field(c).type) for c in cols}
    rows = [tuple(norm(float(r[cols_orig[i]]) if isinstance(r[cols_orig[i]], __import__("decimal").Decimal) else r[cols_orig[i]]) for i in order)
            for r in arr.to_pylist()]
    return cols, types, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def close(a, b):
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, (int, float)):
        return math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(b, float) and isinstance(a, (int, float)):
        return math.isclose(float(a), b, rel_tol=1e-9, abs_tol=1e-9)
    return False


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            scols, stypes, srows = load_spark(outdir, name)
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            ocols, otypes, orows = load_oracle(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        # Arrow-level TYPE equality: the driver's hash compare distinguishes
        # int64 vs decimal128 vs double even when Python values compare ==
        # (round-1 lesson: q17/q25/q27 failed only on this).
        tdiff = {c: (stypes[c], otypes[c]) for c in scols
                 if stypes[c] != otypes[c]}
        if tdiff:
            print(f"FAIL {name}: arrow types differ {tdiff}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        exact = srows == orows
        if exact:
            print(f"PASS {name}: {len(srows)} rows exact")
            n_pass += 1
            continue
        # find first difference
        bad = None
        fuzzy_ok = True
        for i, (sr, orow) in enumerate(zip(srows, orows)):
            for c, (a, b) in enumerate(zip(sr, orow)):
                if a != b:
                    if not close(a, b):
                        fuzzy_ok = False
                    if bad is None:
                        bad = (i, scols[c], a, b)
        if fuzzy_ok:
            print(f"WARN {name}: {len(srows)} rows match within 1e-9 but NOT "
                  f"exact — first diff row {bad[0]} col {bad[1]}: "
                  f"{bad[2]!r} vs {bad[3]!r}")
            n_fail += 1
        else:
            print(f"FAIL {name}: value mismatch row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
