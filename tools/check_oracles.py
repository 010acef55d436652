#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracles.py <verify_out_dir> <sf_dir> [query ...]

Reads each <verify_out_dir>/<query>/ parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB over the parquet tables in
<sf_dir>, then compares row count, sorted column names, and a hash of the
value matrix with columns sorted by name and rows sorted lexicographically —
the same shape of check the driver applies. Dev tool only (DuckDB is a
driver-side dependency, not an engine one).
"""
import sys, os, json, glob, hashlib

import duckdb


def canon(v):
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "%.9g" % v
    # DuckDB's date_trunc('day'+) yields DATE where Spark yields a midnight
    # TIMESTAMP — normalize both to the same instant string
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in mat:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t)[: -len(".parquet")]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}/*.parquet')"
            if os.path.isdir(t)
            else f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')"
        )
    failures = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"{name}: MISSING spark result")
            failures += 1
            continue
        sr = con.execute(
            f"SELECT * FROM read_parquet({files!r})"
        ).fetchall()
        scols = [d[0] for d in con.description]
        orr = con.execute(oracles[name])
        ocols = [d[0] for d in orr.description]
        orows = orr.fetchall()
        ok_rows = len(sr) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = ok_schema and table_hash(scols, sr) == table_hash(ocols, orows)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} rows={len(sr)}/{len(orows)} "
            f"schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"hash={'ok' if ok_hash else 'MISMATCH'}"
        )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
