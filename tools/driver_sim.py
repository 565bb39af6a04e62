"""Simulate the driver harness: plain SparkSession (driver's own configs,
NOT our session factory), entry() smoke, then per-query DuckDB oracle compare
at sf0.01 — row count + schema + order-insensitive value hash."""
import hashlib, math, sys
import duckdb
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod

# 1. smoke: entry()
df = entry_mod.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): rows={len(rows)} schema={df.schema.simpleString()}")
assert len(rows) >= 0

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{round(v,6):.6f}"
    if hasattr(v, "isoformat"): return v.isoformat()
    if isinstance(v, list): return "[" + ",".join(str(norm(x)) for x in v) + "]"
    return str(v)

qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
only = set(sys.argv[1:])
if only:
    qs = {k: v for k, v in qs.items() if k in only}
fails = 0
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF)
    cols = sorted(sdf.columns)
    srows = sorted("|".join(norm(r[c]) for c in cols) for r in sdf.collect())
    shash = hashlib.sha256("\n".join(srows).encode()).hexdigest()[:12]
    if name in os_:
        ddf = con.execute(os_[name]).df()
        dcols = sorted(ddf.columns.tolist())
        if dcols != cols:
            print(f"FAIL {name}: schema spark={cols} duck={dcols}"); fails += 1; continue
        drows = sorted("|".join(norm(v) for v in row) for row in ddf[cols].itertuples(index=False, name=None))
        dhash = hashlib.sha256("\n".join(drows).encode()).hexdigest()[:12]
        status = "OK  " if (shash == dhash and len(srows) == len(drows)) else "FAIL"
        if status == "FAIL":
            fails += 1
            diff = [(a,b) for a,b in zip(srows,drows) if a!=b][:2]
            print(f"FAIL {name}: rows {len(srows)}/{len(drows)} hash {shash}/{dhash} first_diff={diff}")
        else:
            print(f"{status} {name}: rows={len(srows)} hash={shash}")
    else:
        print(f"ROWS {name}: rows={len(srows)} (no oracle)")
print("RESULT:", "FAIL" if fails else "ALL-MATCH", f"({len(qs)} queries)")
sys.exit(1 if fails else 0)
