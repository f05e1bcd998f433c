#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <out>/oracle_sql.json in DuckDB against views over the
sf_dir parquet tables, and compares: row count, column names (sorted),
and values (rows sorted, columns sorted by name). Exact equality.
"""
import sys, json, glob, os, time, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Per-ORACLE-query wall budget. A single slow oracle once stalled the whole
# gate into an empty artifact (rounds 3-4); now it becomes a named TIMEOUT
# FAIL and the suite moves on. con.interrupt() aborts the running DuckDB
# query from a watchdog thread.
QUERY_TIMEOUT_SEC = float(os.environ.get("ORACLE_TIMEOUT_SEC", "30"))

def run_with_timeout(con, sql, timeout=QUERY_TIMEOUT_SEC):
    """Execute sql; returns (rows, cols). Raises TimeoutError past budget."""
    timer = threading.Timer(timeout, con.interrupt)
    timer.start()
    try:
        cur = con.execute(sql)
        rows = cur.fetchall()
        cols = [c[0] for c in con.description]
        return rows, cols
    except duckdb.InterruptException:
        raise TimeoutError(f"oracle exceeded {timeout:.0f}s budget")
    finally:
        timer.cancel()

def norm(v):
    # canonical sortable cell: both sides come through duckdb fetch, so
    # identical values stringify identically (float via repr for exactness;
    # None sorts first). Equality on these strings == equality on values.
    if v is None:
        return (0, "")
    if isinstance(v, float):
        return (1, repr(v))
    return (1, str(v))

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = {n for n in os.environ.get("CHECK_ONLY", "").split(",") if n}
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    results = {}
    elapsed = {}
    for name in sorted(oracle):
        d = f"{out_dir}/{name}"
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "MISSING spark output"
            continue
        t0 = time.time()
        try:
            spark_rows, spark_cols = run_with_timeout(
                con, f"SELECT * FROM read_parquet({files!r})")
            duck_rows, duck_cols = run_with_timeout(con, oracle[name])
        except TimeoutError as e:
            results[name] = f"TIMEOUT {e}"
            elapsed[name] = time.time() - t0
            continue
        except Exception as e:
            results[name] = f"ERROR {e}"
            elapsed[name] = time.time() - t0
            continue
        elapsed[name] = time.time() - t0
        if sorted(spark_cols) != sorted(duck_cols):
            results[name] = f"COLS spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
            continue
        if len(spark_rows) != len(duck_rows):
            results[name] = f"ROWS spark={len(spark_rows)} duck={len(duck_rows)}"
            continue
        # reorder columns by sorted name, then sort rows
        sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
        didx = [duck_cols.index(c) for c in sorted(duck_cols)]
        s = sorted(tuple(norm(r[i]) for i in sidx) for r in spark_rows)
        dk = sorted(tuple(norm(r[i]) for i in didx) for r in duck_rows)
        if s == dk:
            results[name] = f"OK ({len(s)} rows)"
        else:
            diffs = [(a, b) for a, b in zip(s, dk) if a != b][:3]
            results[name] = f"VALUES diff; first diffs: {diffs}"
    bad = 0
    for name, r in results.items():
        flag = "PASS" if r.startswith("OK") else "FAIL"
        if flag == "FAIL":
            bad += 1
        print(f"{flag} {name} [{elapsed.get(name, 0.0):.2f}s]: {r}")
    # queries with no oracle get a rows-only note
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet({glob.glob(d + '*.parquet')!r})"
            ).fetchone()[0]
            print(f"INFO {name}: rows-only check, {n} rows")
    print(f"\n{len(oracle) - bad}/{len(oracle)} oracle queries pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
