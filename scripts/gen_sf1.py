#!/usr/bin/env python3
"""Generate an sf1 dataset by tiling sf0.1 ten times with shifted keys.

Dev tooling for the sf1 scaling dry-run (round-6 advice item 6) — the
driver provides sf{0.001,0.01,0.1} only. Each copy k shifts every
surrogate key by k*OFFSET consistently across fact/dim tables, so joins
fan out exactly as in sf0.1 (10x rows, 10x join work, same selectivities).
nation/region stay fixed (TPC-H semantics: dims don't scale). Text and
embedding payloads are tiled VERBATIM: sf1 is a deliberately dup-heavy
corpus (each document/vector appears 10x under distinct ids), which is the
realistic web-crawl shape the dedup operators must survive — near-dup and
ANN queries therefore do MORE than 10x work at sf1 by design; the bench
note calls this out.

Usage: python3 scripts/gen_sf1.py [outdir]   (default /root/repo/.sf1)
"""
import os, shutil, sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
COPIES = 10

# key offsets, all safely above the sf0.1 maxima (cust 15e3, supp 1e3,
# part 20e3, order 150e3, lineitem rows 600e3, event 100e3, doc 5e3,
# vec 2e3)
C, S, P, O, E, D, V = (1_000_000,) * 4 + (10_000_000,) + (1_000_000,) * 2

TABLES = {
    # name-bearing dims regenerate the name from the shifted key so the
    # name<->key invariant (d09/d11/d12 rely on it) survives the tiling
    "customer": f"""SELECT c_custkey + k*{C} AS c_custkey,
        'Customer#' || lpad(CAST(c_custkey + k*{C} AS VARCHAR), 9, '0') AS c_name,
        c_nationkey, c_acctbal, c_mktsegment
        FROM read_parquet('{SRC}/customer.parquet'), range({COPIES}) t(k)""",
    "supplier": f"""SELECT s_suppkey + k*{S} AS s_suppkey,
        'Supplier#' || lpad(CAST(s_suppkey + k*{S} AS VARCHAR), 9, '0') AS s_name,
        s_nationkey, s_acctbal
        FROM read_parquet('{SRC}/supplier.parquet'), range({COPIES}) t(k)""",
    "part": f"""SELECT p_partkey + k*{P} AS p_partkey, p_name, p_brand,
        p_type, p_size, p_retailprice
        FROM read_parquet('{SRC}/part.parquet'), range({COPIES}) t(k)""",
    "orders": f"""SELECT o_orderkey + k*{O} AS o_orderkey,
        o_custkey + k*{C} AS o_custkey, o_orderstatus, o_totalprice,
        o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet'), range({COPIES}) t(k)""",
    "lineitem": f"""SELECT l_orderkey + k*{O} AS l_orderkey,
        l_partkey + k*{P} AS l_partkey, l_suppkey + k*{S} AS l_suppkey,
        l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
        l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet'), range({COPIES}) t(k)""",
    "documents": f"""SELECT doc_id + k*{D} AS doc_id, text, lang, source, n_chars
        FROM read_parquet('{SRC}/documents.parquet'), range({COPIES}) t(k)""",
    "embeddings": f"""SELECT vec_id + k*{V} AS vec_id, embedding, label
        FROM read_parquet('{SRC}/embeddings.parquet'), range({COPIES}) t(k)""",
}

def gen_events():
    # tile events with pyarrow so ts keeps the EXACT physical type of the
    # source file (a DuckDB round-trip could rewrite it); the Spark read
    # path (graft.Tables.normalizeTs) adapts to whatever the footer says,
    # and the sf1 file must exercise the same branch as the sf0.1 one.
    import pyarrow as pa, pyarrow.parquet as pq, pyarrow.compute as pc
    src = pq.read_table(f"{SRC}/events.parquet")
    parts = []
    for k in range(COPIES):
        t = src
        t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                         pc.add(t["event_id"], k * E))
        t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                         pc.add(t["user_id"], k * C))
        parts.append(t)
    out = pa.concat_tables(parts).sort_by("event_id").replace_schema_metadata(None)
    pq.write_table(out, f"{OUT}/events.parquet")
    print(f"events: {out.num_rows} rows (ns timestamps preserved)")

def main():
    os.makedirs(OUT, exist_ok=True)
    for t in ("region", "nation"):  # fixed dims: copy verbatim
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
        print(f"{t}: copied")
    con = duckdb.connect()
    for t, sql in TABLES.items():
        key = sql.split(" AS ")[0].split("SELECT ")[1].split(" + ")[0].strip()
        con.execute(f"COPY ({sql} ORDER BY {key}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    gen_events()

if __name__ == "__main__":
    main()
