#!/usr/bin/env python3
"""Dev-only oracle cross-checker (mirrors the driver's DuckDB compare).

Usage: python3 tools/check.py [sfDir] [outDir]
Runs each oracle SQL from outDir/oracle_sql.json in DuckDB against the
parquet tables in sfDir, loads the Spark result parquet from outDir/<name>,
and compares TWICE:

  1. loose  — fetchall() rows, floats rounded to 9 dp (value sanity);
  2. strict — the DRIVER-FAITHFUL path: pandas frames (spark via
     pd.read_parquet, oracle via con.execute(sql).df()), columns sorted
     by name, rows sorted by all columns, then a dtype-sensitive
     whole-frame compare. This is the mode that catches what the loose
     path can't: dtype drift (e.g. DuckDB sum(INT) → HUGEINT → float64
     vs Spark int64 — the q32 bug) and unsortable array cells (the
     ss6/ss8/ss11/mm5 bug). A query is OK only if BOTH pass.

This is tooling for the build loop, NOT part of the shipped library.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

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

def _norm(df):
    """Column order by name, rows sorted by all columns — the driver's
    canonical form (its sort_values is what raises on ndarray cells).
    Integer widths unify to int64: round-2 evidence says the driver
    accepts int32-vs-int64 (q16 green with negative int32 values) but
    not int-vs-float (q32 red on 302 vs 302.0)."""
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)

def strict_compare(files, con, sql):
    """Driver-faithful compare: BOTH frames come out of DuckDB .df()
    (so parquet logical types land identically), rows sorted by all
    columns, then pd.util.hash_pandas_object — which unifies integer
    widths (int32 == int64) but NOT int vs float (the q32 bug class)
    and raises on array cells (the ss6/ss8/ss11/mm5 bug class).
    Returns None on pass, else a reason string."""
    try:
        sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
        odf = con.execute(sql).df()
        if sorted(sdf.columns) != sorted(odf.columns):
            return f"schema spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        sdf, odf = _norm(sdf), _norm(odf)
        if len(sdf) != len(odf):
            return f"rows spark={len(sdf)} oracle={len(odf)}"
        sh = pd.util.hash_pandas_object(sdf, index=False).values
        oh = pd.util.hash_pandas_object(odf, index=False).values
    except Exception as e:  # unsortable/unhashable cells, like the driver
        return f"harness {type(e).__name__}: {e}"
    if not (sh == oh).all():
        bad = [c for c in sdf.columns
               if not (pd.util.hash_pandas_object(sdf[c], index=False).values ==
                       pd.util.hash_pandas_object(odf[c], index=False).values).all()]
        dt = [(c, str(sdf[c].dtype), str(odf[c].dtype)) for c in bad]
        return f"hash cols={dt}"
    return None

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
        why = strict_compare(files, con, oracles[name])
        if why is not None:
            print(f"STRICT {name}: {why}"); n_bad += 1; continue
        print(f"OK    {name}: rows={len(sr)}")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
