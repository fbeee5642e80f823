#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt runMain graft.Verify <sfdir> <outdir>`:
for each query dir in <outdir>, executes the matching oracle SQL from
oracle_sql.json in DuckDB over the same parquet tables, and compares
row count, column names, and exact values (columns sorted by name,
rows in dumped order). Purely a dev tool — NOT part of the library.
"""
import json, math, sys, glob, os
import duckdb

def canon(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v): rr.append("NaN")
                else: rr.append(repr(v))
            else: rr.append(str(v))
        out.append(tuple(rr))
    return out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails, passes, skipped = [], [], []
    for qdir in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        spark_files = glob.glob(f"{qdir}/*.parquet")
        if not spark_files:
            fails.append((name, "no spark output")); continue
        sdf = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        if name not in oracle:
            skipped.append((name, sdf.shape[0])); continue
        try:
            odf = con.sql(oracle[name])
        except Exception as e:
            fails.append((name, f"oracle error: {e}")); continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            fails.append((name, f"cols spark={scols} oracle={ocols}")); continue
        srows = canon(sdf.select(", ".join(f'"{c}"' for c in scols)).fetchall())
        orows = canon(odf.select(", ".join(f'"{c}"' for c in ocols)).fetchall())
        if len(srows) != len(orows):
            fails.append((name, f"rows spark={len(srows)} oracle={len(orows)}")); continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        if bad:
            i, a, b = bad[0]
            fails.append((name, f"{len(bad)}/{len(srows)} rows differ; first@{i}: spark={a} oracle={b}"))
        else:
            passes.append((name, len(srows)))
    for n, c in passes: print(f"PASS {n} ({c} rows)")
    for n, c in skipped: print(f"SKIP (no oracle) {n} ({c} rows)")
    for n, m in fails: print(f"FAIL {n}: {m}")
    print(f"\n{len(passes)} pass, {len(skipped)} skipped, {len(fails)} fail")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
