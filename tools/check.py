#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: reads Verify's parquet
outputs + oracle_sql.json, runs each oracle SQL in DuckDB over the sfDir
parquet tables, and compares (columns sorted by name, rows sorted, values
normalized). Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb, pyarrow.parquet as pq
import pathlib

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in pathlib.Path(sfdir).glob("*.parquet"):
    con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bytes): return v.hex()
    return str(v)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}"); fails += 1; continue
    try:
        got = pq.read_table(f"{outdir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: no spark output {e}"); fails += 1; continue
    ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
    if ecols != gcols:
        print(f"FAIL {name}: cols exp={ecols} got={gcols}"); fails += 1; continue
    # strict physical-type compare: the driver hashes values in a way that is
    # sensitive to the arrow type (round 1: decimal(28,2) vs (38,2) and
    # int64 vs int128 were value-equal but hash-mismatched). Surface that
    # here so type drift never survives to the driver run.
    def tnorm(t):
        s = str(t)
        return {"large_string": "string", "large_binary": "binary"}.get(s, s)
    etypes = {c: tnorm(exp.schema.field(c).type) for c in ecols}
    gtypes = {c: tnorm(got.schema.field(c).type) for c in gcols}
    if etypes != gtypes:
        diff = {c: (etypes[c], gtypes[c]) for c in ecols if etypes[c] != gtypes[c]}
        print(f"FAIL {name}: type drift {diff}"); fails += 1; continue
    erows = sorted(tuple(norm(r[c]) for c in ecols) for r in exp.to_pylist())
    grows = sorted(tuple(norm(r[c]) for c in ecols) for r in got.to_pylist())
    if len(erows) != len(grows):
        print(f"FAIL {name}: rowcount exp={len(erows)} got={len(grows)}"); fails += 1; continue
    if erows != grows:
        bad = [(e, g) for e, g in zip(erows, grows) if e != g][:3]
        print(f"FAIL {name}: {sum(1 for e,g in zip(erows,grows) if e!=g)} mismatched rows; first: {bad}")
        fails += 1; continue
    print(f"OK   {name}: {len(erows)} rows")
sys.exit(1 if fails else 0)
