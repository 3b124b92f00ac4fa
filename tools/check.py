#!/usr/bin/env python3
"""Dev-only oracle cross-checker (mirrors the driver's DuckDB compare).

Usage: python3 tools/check.py [sfDir] [outDir]
Runs each oracle SQL from outDir/oracle_sql.json in DuckDB against the
parquet tables in sfDir, loads the Spark result parquet from outDir/<name>,
sorts columns by name + rows by all columns, and value-compares.

This is tooling for the build loop, NOT part of the shipped library.
"""
import sys, os, json, glob
import duckdb

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [colnames[i] for i in order], out

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    n_ok = n_bad = 0
    dirs = sorted(d for d in os.listdir(out)
                  if os.path.isdir(os.path.join(out, d)))
    for name in dirs:
        files = glob.glob(os.path.join(out, name, "*.parquet"))
        if not files:
            print(f"MISS  {name}: no spark parquet"); n_bad += 1; continue
        sq = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in sq.description]
        srows = sq.fetchall()
        if name not in oracles:
            print(f"NOORC {name}: rows={len(srows)} (rows-only check)")
            n_ok += 1
            continue
        try:
            oq = con.execute(oracles[name])
            ocols = [d[0] for d in oq.description]
            orows = oq.fetchall()
        except Exception as e:
            print(f"OERR  {name}: {e}"); n_bad += 1; continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            print(f"SCHEMA {name}: spark={sc} oracle={oc}"); n_bad += 1; continue
        if sr != orr:
            n_bad += 1
            print(f"DIFF  {name}: spark_rows={len(sr)} oracle_rows={len(orr)}")
            sset, oset = set(sr), set(orr)
            for x in list(sset - oset)[:3]: print(f"   spark-only:  {x}")
            for x in list(oset - sset)[:3]: print(f"   oracle-only: {x}")
            continue
        print(f"OK    {name}: rows={len(sr)}")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
