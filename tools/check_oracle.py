#!/usr/bin/env python3
"""Pre-validate SparkEntry.oracleSql vs Verify.scala parquet dumps, mimicking
the driver's DuckDB compare (sort columns by name, compare values)."""
import duckdb, json, sys, glob, math, datetime
from decimal import Decimal

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
def norm(v):
    if isinstance(v, Decimal): return float(v)
    if isinstance(v, float): return round(v, 9)
    if isinstance(v, datetime.datetime): return v.isoformat()
    return v

fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"MISSING SPARK OUTPUT: {name}"); fails += 1; continue
    got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
    want = con.sql(sql).fetchdf()
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        print(f"FAIL {name}: columns {gcols} != {wcols}"); fails += 1; continue
    g = [tuple(norm(v) for v in row) for row in got[gcols].itertuples(index=False)]
    w = [tuple(norm(v) for v in row) for row in want[wcols].itertuples(index=False)]
    if sorted(map(repr,g)) != sorted(map(repr,w)):
        print(f"FAIL {name}: rows differ (spark={len(g)}, oracle={len(w)})")
        sg, sw = set(map(repr,g)), set(map(repr,w))
        for x in list(sg - sw)[:3]: print("  spark-only:", x[:200])
        for x in list(sw - sg)[:3]: print("  oracle-only:", x[:200])
        fails += 1
    else:
        order_ok = "order-ok" if list(map(repr,g)) == list(map(repr,w)) else "ORDER-DIFFERS"
        print(f"OK   {name}: {len(g)} rows  [{order_ok}]")
# rows-only queries
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = d.rstrip("/").split("/")[-1]
    if name.startswith("_"):
        continue
    if name not in oracle:
        n = con.sql(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
        print(f"ROWS {name}: {n} rows {'OK' if n>0 else 'EMPTY!'}")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
