#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfdir> <verify_out_dir> [names...]

For each <name>/ parquet dir in verify_out and matching key in
oracle_sql.json: run the SQL in DuckDB (tables registered by basename
from sfdir), sort columns by name, and compare a TYPED hash of the
canonicalized rows — int64 and float64 hash differently, exactly like
the driver's hasher. The oracle side is materialized through pandas
(`.df()`) so DuckDB HUGEINT decays to float64 the same way it does in
the driver; an oracle twin missing a CAST(... AS BIGINT) fails HERE
before it fails the round.

On hash mismatch we fall back to a tolerant value-by-value diff for
diagnostics: "HASH-FAIL (values match within tolerance)" means a
type/precision slip, not a wrong answer.
"""
import glob
import hashlib
import json
import math
import os
import sys
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq


def typed(v):
    """Canonical (type-tag, value) for hashing. int vs float DISTINCT."""
    if v is None:
        return ("n",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        if math.isinf(v):
            return ("f", "Inf" if v > 0 else "-Inf")
        if v == 0.0:
            v = 0.0  # -0.0 -> 0.0
        # round to 12 significant digits: absorbs last-ulp engine noise
        # while keeping the int/float type distinction that the driver's
        # hasher enforces.
        return ("f", float(f"{v:.12g}"))
    if isinstance(v, Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, bytes):
        return ("y", v.hex())
    if isinstance(v, str):
        return ("s", v)
    if hasattr(v, "item") and not hasattr(v, "__len__"):  # numpy scalar
        return typed(v.item())
    if hasattr(v, "tolist"):  # numpy array
        return ("a",) + tuple(typed(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return ("a",) + tuple(typed(x) for x in v)
    if isinstance(v, dict):
        return ("m",) + tuple((k, typed(v[k])) for k in sorted(v))
    return ("s", str(v))


def canon(rows, cols):
    """Sort columns by name, type-canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(typed(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def table_hash(canon_rows):
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(repr(r).encode())
        h.update(b"\n")
    return h.hexdigest()


def loose(t):
    """Strip type tags for the tolerant diagnostic diff."""
    if t[0] == "a":
        return tuple(loose(x) for x in t[1:])
    if t[0] == "n":
        return None
    if t[0] == "d":
        return float(t[1])
    return t[1]


def values_equal(a, b):
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    # NULL-int decay: pandas materialization (.df()) turns a NULL-bearing
    # integer column into float64 with NaN, while the Spark side stays
    # int/None. For the TOLERANT diagnostic diff these are the same
    # value — the hash still fails (conservatively: a twin emitting NULL
    # in an int column is a portability bug to fix in the twin), but the
    # report must say "type slip", not "wrong answer".
    if a is None or b is None:
        def nullish(x):
            return x is None or x == "NaN"
        return nullish(a) and nullish(b)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)) \
            and not isinstance(a, bool) and not isinstance(b, bool):
        fa, fb = float(a), float(b)
        if fa == fb:
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def pandas_rows(df):
    cols = list(df.columns)
    rows = [tuple(rec) for rec in df.itertuples(index=False, name=None)]
    return rows, cols


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    with open(os.path.join(outdir, "oracle_sql.json")) as fh:
        oracle = json.load(fh)

    n_pass = n_fail = n_rowsonly = 0
    for d in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, d)
        if not os.path.isdir(path) or (only and d not in only):
            continue
        t = pq.read_table(path)
        s_cols = t.column_names
        s_rows = [tuple(row[c] for c in s_cols) for row in t.to_pylist()]
        if d not in oracle:
            n_rowsonly += 1
            print(f"ROWS-ONLY {d}: {len(s_rows)} rows")
            continue
        try:
            # .df() on purpose: HUGEINT -> float64, as in the driver.
            odf = con.execute(oracle[d]).df()
            o_rows, o_cols = pandas_rows(odf)
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
        if table_hash(sr) == table_hash(orr):
            n_pass += 1
            print(f"PASS {d}: {len(sr)} rows (hash)")
            continue
        # Hash mismatch: diagnose.
        n_fail += 1
        tolerant_ok = True
        bad = None
        for i, (a, b) in enumerate(zip(sr, orr)):
            if a != b and not all(
                values_equal(loose(x), loose(y)) for x, y in zip(a, b)
            ):
                tolerant_ok = False
                bad = (i, a, b)
                break
        if tolerant_ok:
            print(f"FAIL {d}: HASH-FAIL (values match within tolerance — "
                  f"type or precision slip, e.g. int64 vs float64)")
            for i, (a, b) in enumerate(zip(sr, orr)):
                if a != b:
                    print(f"  first typed diff at sorted row {i}:")
                    print(f"  cols:   {sc}")
                    print(f"  spark:  {a}")
                    print(f"  oracle: {b}")
                    pairs = list(zip(a, b))
                    if any(x == ("n",) and y == ("f", "NaN") for x, y in pairs) or \
                       any(y == ("n",) and x == ("f", "NaN") for x, y in pairs):
                        print("  hint: NULL in an integer column decays to NaN/float64 "
                              "through pandas — rewrite the oracle twin (and the Spark "
                              "side) with COALESCE or CAST(... AS DOUBLE) so no int "
                              "column is nullable")
                    break
        else:
            i, a, b = bad
            print(f"FAIL {d}: first diff at sorted row {i}")
            print(f"  cols:   {sc}")
            print(f"  spark:  {a}")
            print(f"  oracle: {b}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
