import sys
sys.path.insert(0, "/root/repo")
from crypto_streaming_lakehouse_spark.registry import REGISTRY
from crypto_streaming_lakehouse_spark.session import get_spark
from tests.oracle import canonical_rows, duckdb_connect

sf = "/root/testdata/sf0.01"
spark = get_spark("check-two")
con = duckdb_connect(sf)
for name in sys.argv[1:]:
    d = REGISTRY[name]
    sdf = d.fn(spark, sf)
    s_cols = sdf.columns; s_rows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(d.sql); d_cols = rel.columns; d_rows = rel.fetchall()
    ok_rows = len(s_rows) == len(d_rows)
    ok_schema = sorted(s_cols) == sorted(d_cols)
    ok_hash = ok_rows and ok_schema and canonical_rows(s_cols, s_rows) == canonical_rows(d_cols, d_rows)
    print(name, "rows", len(s_rows), "vs", len(d_rows), "schema", ok_schema, "hash", ok_hash)
    if not ok_hash:
        print(" spark:", sorted(s_rows)[:5])
        print(" duck :", sorted(d_rows)[:5])
spark.stop()
