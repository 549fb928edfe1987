#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfdir> <verify_out_dir>

For each <name>/ parquet dir in verify_out and matching key in
oracle_sql.json: run the SQL in DuckDB (tables registered by basename
from sfdir), sort columns by name, sort rows, compare values.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq


def canon(rows, cols):
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if hasattr(v, "item"):  # numpy scalars
        return norm(v.item())
    return v


def values_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-12 * max(1.0, abs(a), abs(b))
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    with open(os.path.join(outdir, "oracle_sql.json")) as fh:
        oracle = json.load(fh)

    n_pass = n_fail = n_rowsonly = 0
    for d in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, d)
        if not os.path.isdir(path):
            continue
        t = pq.read_table(path)
        s_cols = t.column_names
        s_rows = [tuple(row[c] for c in s_cols) for row in t.to_pylist()]
        if d not in oracle:
            n_rowsonly += 1
            print(f"ROWS-ONLY {d}: {len(s_rows)} rows")
            continue
        try:
            res = con.execute(oracle[d])
            o_cols = [c[0] for c in res.description]
            o_rows = res.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"FAIL {d}: oracle SQL error: {e}")
            continue
        sc, sr = canon(s_rows, s_cols)
        oc, orr = canon(o_rows, o_cols)
        if sc != oc:
            n_fail += 1
            print(f"FAIL {d}: column mismatch spark={sc} oracle={oc}")
            continue
        if len(sr) != len(orr):
            n_fail += 1
            print(f"FAIL {d}: row count spark={len(sr)} oracle={len(orr)}")
            continue
        bad = None
        exact = True
        for i, (a, b) in enumerate(zip(sr, orr)):
            if a != b:
                if all(values_equal(x, y) for x, y in zip(a, b)):
                    exact = False
                    continue
                bad = (i, a, b)
                break
        if bad:
            n_fail += 1
            i, a, b = bad
            print(f"FAIL {d}: first diff at sorted row {i}")
            print(f"  cols:   {sc}")
            print(f"  spark:  {a}")
            print(f"  oracle: {b}")
        else:
            n_pass += 1
            tag = "PASS" if exact else "PASS~(fp-tolerance)"
            print(f"{tag} {d}: {len(sr)} rows")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
