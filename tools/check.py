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

def type_class(t):
    """Bucket a DuckDB type into the classes that matter for driver
    canonicalization (which goes through pandas: HUGEINT and DECIMAL
    render as float64/objects and hash-mismatch against Spark's int64
    even when fetchall() values compare equal as Python ints)."""
    t = str(t).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    return t

def type_parity_errors(sdf, odf, cols):
    """Oracle-vs-Spark column type lint. Returns a list of fatal drift
    messages: an oracle column whose DuckDB type is HUGEINT or DECIMAL
    while the Spark parquet dump holds a plain int/float is exactly the
    class of bug that passes fetchall() comparison but goes red in any
    dataframe-based canonicalization."""
    stypes = dict(zip(sdf.columns, sdf.types))
    otypes = dict(zip(odf.columns, odf.types))
    errs = []
    for c in cols:
        sc, oc = type_class(stypes[c]), type_class(otypes[c])
        if oc in ("hugeint", "decimal") and sc in ("int", "float"):
            errs.append(f"col {c}: oracle {otypes[c]} vs spark {stypes[c]}"
                        f" — cast the oracle to BIGINT/DOUBLE")
    return errs

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
    dirs = sorted(glob.glob(f"{outdir}/*/"))
    dirnames = {os.path.basename(d.rstrip("/")) for d in dirs}
    # Registry coverage: Verify dumps lanes.json = the lane set it ran.
    # Output dirs != that set means a lane was silently LOST between
    # Verify and this compare (the r12 l19 hole) — hard fail, not absence.
    lanes_path = f"{outdir}/lanes.json"
    if os.path.exists(lanes_path):
        lanes = set(json.load(open(lanes_path)))
        for missing in sorted(lanes - dirnames):
            fails.append((missing, "lane in registry but NO output dir"))
        for extra in sorted(dirnames - lanes):
            fails.append((extra, "output dir not in lane registry"))
    else:
        fails.append(("lanes.json", "missing — Verify did not record its lane registry"))
    for qdir in dirs:
        name = os.path.basename(qdir.rstrip("/"))
        err_file = os.path.join(qdir, "_ERROR")
        if os.path.exists(err_file):
            fails.append((name, "lane crashed: " + open(err_file).read().strip())); continue
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
        terrs = type_parity_errors(sdf, odf, scols)
        if terrs:
            fails.append((name, "type drift: " + "; ".join(terrs))); continue
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
