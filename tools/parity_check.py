#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Loads each query's parquet output from the Verify dump, runs the matching
oracle SQL in DuckDB against the same scale-factor tables, sorts columns by
name, canonicalizes values, and compares row multisets.

Usage: parity_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, hashlib
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)

def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(out).encode()).hexdigest()[:16]
    return sorted(cols), len(out), h, out

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"MISS  {name}: no spark output")
        fails += 1
        continue
    got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
    gcols, grows = got.columns, got.fetchall()
    try:
        want = con.sql(oracle[name])
        wcols, wrows = want.columns, want.fetchall()
    except Exception as e:
        print(f"SQLERR {name}: {e}")
        fails += 1
        continue
    gc, gn, gh, gout = rowset(gcols, grows)
    wc, wn, wh, wout = rowset(wcols, wrows)
    if gc != wc:
        print(f"SCHEMA {name}: spark={gc} oracle={wc}")
        fails += 1
    elif gh != wh:
        print(f"HASH  {name}: rows {gn} vs {wn}")
        gs, ws = set(gout), set(wout)
        for d in sorted(gs - ws)[:3]:
            print(f"   spark-only: {d}")
        for d in sorted(ws - gs)[:3]:
            print(f"   oracle-only: {d}")
        fails += 1
    else:
        print(f"OK    {name}: {gn} rows")
print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
