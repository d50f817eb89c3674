"""Simulate the driver: import __spark_entry__ by path, run entry() smoke,
then every queries() entry at sf0.01 against its oracle_sql() via DuckDB.

Writes a per-query report to PARITY_SF001.json (or $PARITY_OUT) so every
round commits a full-registry sf0.01 parity artifact — the driver's own
CORRECTNESS window covers 50 queries/round, and this closes the gap for
scale-dependent divergences (overflow, percentile interpolation) that
sf0.001 pytest parity could miss (VERDICT r3 #7)."""
import importlib.util, json, math, os, sys

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession
# driver-like plain session (NOT our tuned builder — prove conf independence)
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = mod.entry(spark)
rows = df.collect()
print(f"ENTRY OK: {len(rows)} rows, schema={df.columns}", flush=True)

import duckdb
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    return v

q, o = mod.queries(), mod.oracle_sql()
# $PARITY_SUBSET: comma-separated query names — the sf0.1 spot-check
# (VERDICT r4 #7) runs the heaviest oracled queries at 10x the driver's
# scale factor to catch scale-dependent divergence (overflow, percentile
# interpolation) that sf0.01 can't.
subset = os.environ.get("PARITY_SUBSET")
if subset:
    names = [n.strip() for n in subset.split(",") if n.strip()]
    unknown = [n for n in names if n not in q]
    if unknown:
        raise SystemExit(f"unknown queries in PARITY_SUBSET: {unknown}")
    q = {n: q[n] for n in names}
n_ok = n_rows_only = 0
fails = []
report = {}
for name, fn in q.items():
    sdf = fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in o:
        # replicate the driver's pandas value-hash canonicalization even on
        # rows-only queries — r6's media_image_features driver ERR (unhashable
        # ArrayType cells) was invisible here because this path only counted
        # rows. A crash below is a FAIL, exactly as it is for the driver.
        try:
            import pandas as pd
            pdf = sdf.toPandas()
            if len(pdf):
                pd.util.hash_pandas_object(pdf, index=False)
        except Exception as exc:
            fails.append(name)
            report[name] = {"check": "rows_only", "rows": len(srows),
                            "canon_err": repr(exc)[:200]}
            print(f"  FAIL {name}: canonicalization error {exc!r}", flush=True)
            continue
        n_rows_only += 1
        report[name] = {"check": "rows_only", "rows": len(srows)}
        print(f"  rows-only {name}: {len(srows)} rows", flush=True)
        continue
    rel = con.sql(o[name])
    drows, dcols = rel.fetchall(), rel.columns
    scols = sdf.columns
    ok = sorted(scols) == sorted(dcols) and len(srows) == len(drows)
    if ok:
        idx_s = sorted(range(len(scols)), key=lambda i: scols[i])
        idx_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
        cs = sorted([tuple(norm(r[i]) for i in idx_s) for r in srows], key=repr)
        cd = sorted([tuple(norm(r[i]) for i in idx_d) for r in drows], key=repr)
        ok = cs == cd
    if ok: n_ok += 1
    else: fails.append(name)
    report[name] = {
        "check": "oracle", "match": ok,
        "rows": len(srows), "oracle_rows": len(drows),
    }
    print(f"  {'OK  ' if ok else 'FAIL'} {name}: {len(srows)} rows", flush=True)
sf_name = os.path.basename(SF.rstrip("/"))
out_path = os.environ.get("PARITY_OUT", f"/root/repo/PARITY_{sf_name}.json")
with open(out_path, "w") as fh:
    json.dump(
        {
            "sf_dir": SF,
            "n_queries": len(q),
            "n_oracle_matched": n_ok,
            "n_rows_only": n_rows_only,
            "fails": fails,
            "queries": report,
        },
        fh, indent=1,
    )
print(f"RESULT: {n_ok} oracle-matched, {n_rows_only} rows-only, FAILS={fails}", flush=True)
print(f"REPORT: {out_path}", flush=True)
sys.exit(1 if fails else 0)
