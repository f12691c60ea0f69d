#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json against DuckDB views over
the sf parquet tables, loads the engine's parquet dump for the same query,
sorts columns by name and rows by all values, and compares cell-by-cell.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return v


def rows_of(table):
    cols = sorted(table.column_names)
    pyd = table.select(cols).to_pylist()
    return cols, sorted((tuple(canon(r[c]) for c in cols) for r in pyd), key=repr)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        try:
            got = pads.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"FAIL {name}: engine output missing: {e}")
            continue
        wc, wr = rows_of(want)
        gc, gr = rows_of(got)
        if wc != gc:
            print(f"FAIL {name}: columns differ: oracle={wc} engine={gc}")
            continue
        if len(wr) != len(gr):
            print(f"FAIL {name}: row counts differ: oracle={len(wr)} engine={len(gr)}")
            continue
        bad = [(a, b) for a, b in zip(wr, gr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(wr)} rows differ; first: oracle={bad[0][0]} engine={bad[0][1]}")
            continue
        print(f"OK   {name}: {len(wr)} rows, cols={wc}")
        n_ok += 1
    print(f"== {n_ok}/{len(oracles)} queries match ==")
    return 0 if n_ok == len(oracles) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
