#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query output
parquet written by graft.Verify, run the corresponding oracle SQL in
DuckDB and compare (column-name-sorted, row-sorted, value-level).
Usage: check_oracle.py <outDir> <sfDir>
"""
import sys, json, math, glob
import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# register sf tables like the driver presumably does
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes = [], []


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def arrow_rows(name):
    """Second reader path: pyarrow sees parquet DECIMAL as Decimal objects
    (str keeps trailing zeros) while DuckDB fetch may surface floats —
    the round-1 hash_match failure mode. Checking BOTH readers catches
    any output type whose stringification is reader-dependent."""
    import pyarrow.parquet as pa_pq
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    tbl = pa_pq.read_table(files)
    names = tbl.column_names
    cols = [tbl.column(c).to_pylist() for c in names]
    return names, list(zip(*cols)) if cols else []


for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        scols = spark_rel.description
        sdata = spark_rel.fetchall()
        an, adata = arrow_rows(name)
        duck_rel = con.execute(sql)
        dcols = duck_rel.description
        ddata = duck_rel.fetchall()
    except Exception as e:
        fails.append((name, f"EXEC: {e}"))
        continue
    sn = [c[0] for c in scols]
    dn = [c[0] for c in dcols]
    if sorted(sn) != sorted(dn):
        fails.append((name, f"SCHEMA: spark={sorted(sn)} duck={sorted(dn)}"))
        continue
    sidx = sorted(range(len(sn)), key=lambda i: sn[i])
    aidx = sorted(range(len(an)), key=lambda i: an[i])
    didx = sorted(range(len(dn)), key=lambda i: dn[i])
    srows = sorted(tuple(norm(r[i]) for i in sidx) for r in sdata)
    arows = sorted(tuple(norm(r[i]) for i in aidx) for r in adata)
    drows = sorted(tuple(norm(r[i]) for i in didx) for r in ddata)
    if len(srows) != len(drows):
        fails.append((name, f"ROWCOUNT: spark={len(srows)} duck={len(drows)}"))
        continue
    if srows != drows:
        diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
        fails.append((name, f"VALUES(duck-read): first diffs {diff}"))
        continue
    if arows != drows:
        diff = [(a, b) for a, b in zip(arows, drows) if a != b][:3]
        fails.append((name, f"VALUES(arrow-read): first diffs {diff}"))
        continue
    passes.append((name, len(srows)))

for n, c in passes:
    print(f"PASS {n} ({c} rows)")
for n, m in fails:
    print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
