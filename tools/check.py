#!/usr/bin/env python3
"""Local stand-in for the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each <verifyOutDir>/<name>/ parquet dir with an entry in
oracle_sql.json: run the oracle SQL in DuckDB (tables = views over the
sfDir parquet), load the Spark result, sort columns by name, sort rows,
and compare values cell-by-cell (exact for ints/strings, tiny epsilon
for floats so we see *how* close we are; the real driver hashes).
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            # The real driver loads results via pandas, where DuckDB's
            # HUGEINT (e.g. SUM over any integer type) becomes float64 and
            # hash-mismatches Spark's int64 even on equal values. fetchall()
            # hides that (HUGEINT -> Python int), so flag it structurally.
            lossy = [
                c
                for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper()
            ]
            if lossy:
                print(
                    f"FAIL {name}: oracle cols {lossy} are HUGEINT "
                    "(pandas renders as float64; CAST to BIGINT in the oracle)"
                )
                n_fail += 1
                continue
            odf = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchall()
            scols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        oc, orows = normalize(odf, ocols)
        sc, srows = normalize(sdf, scols)
        if oc != sc:
            print(f"FAIL {name}: columns differ: spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: row count spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            for j, (x, y) in enumerate(zip(a, b)):
                if x is None and y is None:
                    continue
                if isinstance(x, float) and isinstance(y, float):
                    if x != y and not (
                        math.isfinite(x)
                        and math.isfinite(y)
                        and abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
                    ):
                        bad = (i, oc[j], x, y)
                        break
                    if x != y:
                        # close but not bit-equal: warn, the driver hash would fail
                        bad = (i, oc[j], x, y)
                        break
                elif x != y:
                    bad = (i, oc[j], x, y)
                    break
            if bad:
                break
        if bad:
            i, colname, x, y = bad
            print(f"FAIL {name}: row {i} col {colname}: spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
