"""Drive the driver contract exactly as the round harness would:
fresh SparkSession, import __spark_entry__, smoke entry(), then for each
queries() entry run Spark vs DuckDB oracle and compare rowcount+cols+valuehash."""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e

SF = os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.01")

# plain session, like an external driver: no spark-graft configs preapplied
spark = (
    SparkSession.builder.master("local[8]")
    .appName("contract-driver")
    .config("spark.driver.memory", "6g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")
print("  head:", [(r[0], r[1]) for r in rows[:3]])
assert len(rows) > 0

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def value_hash(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    cells = []
    for _, row in pdf.iterrows():
        cells.append("|".join(_norm(v) for v in row))
    return hashlib.md5("\n".join(sorted(cells)).encode()).hexdigest()


def _norm(v):
    import math
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    return str(v)


q = e.queries()
o = e.oracle_sql()
only = [a for a in sys.argv[1:] if not a.startswith("-")]
if only:
    q = {k: v for k, v in q.items() if k in only}
from url_counter_mapreduce_spark.operators import skew_guard  # noqa: E402

skew_guard.pop_decisions()  # start each gate run with a clean record


def _engagements(name):
    """Drain skew-guard decisions made while running `name`; an ENGAGED
    cap means the query ran a documented approximation — a hash diff on
    such a query is an engaged-cap divergence, not (necessarily) a defect
    (ADVICE r10: make the two distinguishable in gate output)."""
    engaged = [d for d in skew_guard.pop_decisions() if d["engaged"]]
    for d in engaged:
        print(
            f"  [skew-guard] {name}: {d['name']} ENGAGED cap={d['cap']} "
            f"policy={d['policy']} pairs={d['pairs']} rows={d['rows']}"
        )
    return engaged


fails = []
results = {}
for name in sorted(q):
    spdf = q[name](spark, SF).toPandas()
    caps = _engagements(name)
    if name not in o:
        print(f"{name}: rows-only, {len(spdf)} rows")
        results[name] = {"status": "rows-only", "rows": len(spdf)}
        if caps:
            results[name]["skew_caps_engaged"] = caps
        continue
    opdf = con.sql(o[name]).df()
    ok_rows = len(spdf) == len(opdf)
    ok_cols = sorted(spdf.columns) == sorted(opdf.columns)
    ok_hash = value_hash(spdf) == value_hash(opdf)
    status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
    if status == "MISMATCH" and caps:
        status = "MISMATCH-CAP-ENGAGED"
    print(f"{name}: {status} rows={len(spdf)}/{len(opdf)} cols={ok_cols} hash={ok_hash}")
    results[name] = {
        "status": status,
        "rows": len(spdf),
        "oracle_rows": len(opdf),
        "cols_match": ok_cols,
        "hash_match": ok_hash,
    }
    if caps:
        results[name]["skew_caps_engaged"] = caps
    if status != "OK":
        fails.append(name)

out_path = os.environ.get("CONTRACT_JSON_OUT")
if out_path:
    import json

    with open(out_path, "w") as fh:
        json.dump(
            {
                "sf_dir": SF,
                "n_queries": len(results),
                "n_exact_ok": sum(1 for r in results.values() if r["status"] == "OK"),
                "n_rows_only": sum(1 for r in results.values() if r["status"] == "rows-only"),
                "fails": fails,
                "queries": results,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    print(f"wrote {out_path}")

print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
