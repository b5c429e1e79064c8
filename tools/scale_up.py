#!/usr/bin/env python3
"""Build an sf1-scale dataset by replicating sf0.1 with disjoint id ranges.

Usage: python3 tools/scale_up.py [mult] [srcDir] [dstDir]

Replicas get ids offset by r*10_000_000 (far above any real key range and the
100000+nationkey CC hub ids). Replica r>0 documents get a ' r<r>' text suffix
so cross-replica texts are not byte-identical (otherwise every doc would gain 9
exact dups and the dedup result would measure replication, not the operator);
embeddings get a deterministic per-replica component shift for the same reason.
The oracle (tools/check.py) reads the same parquet, so the compare stays exact.
"""
import shutil, sys, os
import duckdb

STRIDE = 10_000_000

def main(mult=10, src="/root/testdata/sf0.1", dst="/tmp/graft_sf1"):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    reps = f"(SELECT unnest(range({mult})) AS r)"
    con.execute(f"""
      COPY (SELECT doc_id + r*{STRIDE} AS doc_id,
                   CASE WHEN r = 0 THEN text ELSE text || ' r' || r END AS text,
                   lang, source,
                   CASE WHEN r = 0 THEN n_chars ELSE n_chars + 2 + length(CAST(r AS VARCHAR)) END AS n_chars
            FROM read_parquet('{src}/documents.parquet'), {reps})
      TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (SELECT vec_id + r*{STRIDE} AS vec_id,
                   list_transform(embedding, x -> CAST(x + r*0.0011 AS FLOAT)) AS embedding,
                   label
            FROM read_parquet('{src}/embeddings.parquet'), {reps})
      TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (SELECT c_custkey + r*{STRIDE} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM read_parquet('{src}/customer.parquet'), {reps})
      TO '{dst}/customer.parquet' (FORMAT PARQUET)""")
    # fact tables replicate with offsets CONSISTENT with customer's, so the
    # c_custkey = o_custkey = ... join chains stay 1:1 per replica; dims
    # (supplier/part/nation/region) stay fixed — each replica's lineitems
    # join the same dim rows, like TPC-H's sub-linear dim growth.
    # lineitem: 600k -> 6M at mult=10 (TPC-H sf1 size).
    con.execute(f"""
      COPY (SELECT o_orderkey + r*{STRIDE} AS o_orderkey,
                   o_custkey + r*{STRIDE} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{src}/orders.parquet'), {reps})
      TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (SELECT l_orderkey + r*{STRIDE} AS l_orderkey, l_partkey, l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{src}/lineitem.parquet'), {reps})
      TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")
    # events: replica users repeat the same activity pattern on the same
    # timeline — per-user window/gap/session structure is preserved, the
    # row count and user count scale by mult. Replicated via pyarrow, NOT
    # DuckDB: the driver writes ts as TIMESTAMP(NANOS) in some rounds and
    # MICROS in others, and DuckDB coerces either to µs on read — pyarrow
    # round-trips the source's logical type exactly, so the Spark read
    # path (Tables.normalizeEventTs) sees the same type at every SF.
    import pyarrow as pa, pyarrow.parquet as pq, pyarrow.compute as pc
    ev = pq.read_table(f"{src}/events.parquet")
    parts = []
    for r in range(mult):
        t = ev.set_column(ev.schema.get_field_index("event_id"), "event_id",
                          pc.add(ev["event_id"], r * STRIDE))
        t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                         pc.add(ev["user_id"], r * STRIDE))
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{dst}/events.parquet", version="2.6")
    for t in "region nation supplier part".split():
        p = f"{src}/{t}.parquet"
        if os.path.exists(p):
            shutil.copy(p, f"{dst}/{t}.parquet")
    for t in "documents embeddings customer orders lineitem events".split():
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 10, a[1] if len(a) > 1 else "/root/testdata/sf0.1",
         a[2] if len(a) > 2 else "/tmp/graft_sf1")
