package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Modern ANSI-SQL surface the reference era lacked but its users ask for
  * first when they move: recursive CTEs, SQL-defined functions (scalar and
  * table-valued — reference UDFs are always JVM closures, `SQL/UDFRegistration
  * .scala:45`), session variables, and parameterized EXECUTE IMMEDIATE.
  * Spark parses all four natively since 4.x, so each query is pure
  * `spark.sql` over temp views, oracle-gated like everything else.
  *
  *  - h04: WITH RECURSIVE month spine + gap-fill — the canonical
  *    time-series densification. Spark requires UNION ALL recursion
  *    (UNION-distinct is rejected), so the spine recursion carries an
  *    explicit (year, month) terminator rather than relying on dedup.
  *  - h05: CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN <expr> — the
  *    SQL scalar UDF. The body inlines into the plan (no JVM closure, no
  *    codegen break), which is exactly why it beats a registered Scala UDF
  *    for expressible logic; the oracle proves the inlining is semantic
  *    identity.
  *  - h06: RETURNS TABLE — the SQL table-valued function, resolved lazily
  *    against the session catalog at call time.
  *  - h07: DECLARE VARIABLE + SET VAR (scalar-subquery initializer) +
  *    EXECUTE IMMEDIATE ... USING — parameterized SQL without string
  *    splicing. The threshold is an avg over exact cents (BIGINT sum, one
  *    final division) so both engines derive the identical double.
  *
  * Scale notes: the h04 spine is 24 rows built by the recursion operator
  * and broadcast to the monthly aggregate (one map-side-combined hash agg
  * over orders — the fact table is scanned once); h05's function body
  * inlines so the per-returnflag rollup stays one whole-stage-codegen
  * pass; h06 pushes the band predicate into the parquet scan exactly as
  * the inlined form would; h07's threshold is ONE 1-row subquery job, then
  * the main scan filters on a broadcast scalar.
  */
object ModernSql {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Recursive month spine (2000-07 .. 2002-06) left-joined to monthly
    // order revenue: months past the data's 2001-08 horizon surface as
    // explicit zero rows — the gap-fill contract.
    "h04_recursive_cte" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("ms_orders")
      s.sql(
        """WITH RECURSIVE mon(y, m) AS (
          |  SELECT 2000, 7
          |  UNION ALL
          |  SELECT CASE WHEN m = 12 THEN y + 1 ELSE y END,
          |         CASE WHEN m = 12 THEN 1 ELSE m + 1 END
          |  FROM mon WHERE NOT (y = 2002 AND m = 6)
          |)
          |SELECT make_date(y, m, 1) AS month,
          |  CAST(coalesce(r.n_orders, 0) AS BIGINT) AS n_orders,
          |  CAST(coalesce(r.rev_cents, 0) AS BIGINT) AS rev_cents
          |FROM mon
          |LEFT JOIN (
          |  SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
          |         count(*) AS n_orders,
          |         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
          |  FROM ms_orders GROUP BY 1, 2) r
          |USING (y, m)
          |ORDER BY month""".stripMargin)
    },

    // SQL scalar UDF: net price in exact cents, summed per return flag.
    // The double expression is evaluated in source order on both engines
    // before the one round-to-cents quantization, so the BIGINT sum is
    // partition-order-free.
    "h05_sql_scalar_udf" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("ms_lineitem")
      s.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION ms_net_cents(
          |  price DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS BIGINT
          |RETURN CAST(round(price * (1 - disc) * (1 + tax) * 100) AS BIGINT)""".stripMargin)
      s.sql(
        """SELECT l_returnflag,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(ms_net_cents(l_extendedprice, l_discount, l_tax)) AS BIGINT) AS net_cents
          |FROM ms_lineitem
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    },

    // SQL table-valued function: a price-band slice of orders,
    // parameterized at the call site. The band predicate reaches the
    // parquet scan exactly as the inlined query's would.
    "h06_sql_table_udf" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("ms_orders")
      s.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION ms_orders_in_band(
          |  lo DOUBLE, hi DOUBLE)
          |RETURNS TABLE (o_orderkey BIGINT, o_custkey BIGINT, price_cents BIGINT)
          |RETURN SELECT o_orderkey, o_custkey,
          |  CAST(round(o_totalprice * 100) AS BIGINT)
          |FROM ms_orders WHERE o_totalprice >= lo AND o_totalprice < hi""".stripMargin)
      s.sql(
        """SELECT o_orderkey, o_custkey, price_cents
          |FROM ms_orders_in_band(100000.0D, 120000.0D)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // Session variable + parameterized EXECUTE IMMEDIATE. The threshold
    // avg is computed over exact cents (BIGINT sum / count — one final
    // IEEE division) so Spark and DuckDB derive the bit-identical double
    // regardless of partitioning.
    "h07_execute_immediate" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("ms_orders")
      s.sql("DECLARE OR REPLACE VARIABLE ms_thr DOUBLE")
      s.sql(
        """SET VAR ms_thr =
          |  (SELECT avg(CAST(round(o_totalprice * 100) AS BIGINT)) FROM ms_orders)""".stripMargin)
      s.sql(
        """EXECUTE IMMEDIATE
          |  'SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
          |     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          |   FROM ms_orders
          |   WHERE CAST(round(o_totalprice * 100) AS BIGINT) > ?
          |   GROUP BY o_orderpriority ORDER BY o_orderpriority'
          |USING ms_thr""".stripMargin)
    },

    // LATERAL correlated subquery — per-nation top-2 customers by balance.
    // Same semantics as w01's window top-k, different front-end: the
    // planner rewrites the correlated LIMIT into a partitioned rank, so
    // the lateral form costs ONE shuffle, not a per-nation re-scan.
    "h08_lateral_topk" -> { (s, dir) =>
      Tables.nation(s, dir).createOrReplaceTempView("ms_nation")
      Tables.customer(s, dir).createOrReplaceTempView("ms_customer")
      s.sql(
        """SELECT n_name, l.c_custkey, l.bal_cents
          |FROM ms_nation,
          |LATERAL (
          |  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
          |  FROM ms_customer WHERE c_nationkey = n_nationkey
          |  ORDER BY bal_cents DESC, c_custkey LIMIT 2) l
          |ORDER BY n_name, bal_cents DESC, c_custkey""".stripMargin)
    },

    // GROUP BY ALL / ORDER BY ALL — the analyst shorthand that infers the
    // grouping keys from the non-aggregate select list.
    "h09_group_by_all" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("ms_orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM ms_orders GROUP BY ALL ORDER BY ALL""".stripMargin)
    },

    // SQL pipe syntax: the ETL chain written in dataflow order (FROM |>
    // WHERE |> AGGREGATE |> WHERE |> ORDER BY) — each |> stage lowers to
    // the identical relational operator, so the plan matches the nested
    // standard-SQL form the oracle states (a post-AGGREGATE WHERE is
    // HAVING).
    "h10_pipe_syntax" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("ms_orders")
      s.sql(
        """FROM ms_orders
          ||> WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          ||> AGGREGATE CAST(count(*) AS BIGINT) AS n,
          |     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          |   GROUP BY o_orderstatus, o_orderpriority
          ||> WHERE n > 100
          ||> ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
    },

    // Named WINDOW clause (analyzer WindowsSubstitution — the last §3.1
    // analyzer surface without a dedicated gate): one window spec declared
    // once, referenced by TWO expressions. Substitution is purely
    // syntactic, so both functions land in the SAME Window operator — one
    // shuffle on the partition key, not one per OVER (ModernSqlSpec pins
    // the single-Window plan). The ORDER BY carries a unique tiebreak
    // (cents DESC, o_orderkey), so the running sum's RANGE frame is
    // deterministic cross-engine.
    "h12_named_window" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("ms_orders")
      s.sql(
        """SELECT * FROM (
          |  SELECT o_orderpriority, o_orderkey,
          |    CAST(rank() OVER w AS BIGINT) AS rnk,
          |    CAST(sum(cents) OVER w AS BIGINT) AS run_cents
          |  FROM (SELECT o_orderpriority, o_orderkey,
          |          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          |        FROM ms_orders)
          |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents DESC, o_orderkey))
          |WHERE rnk <= 5
          |ORDER BY o_orderpriority, rnk""".stripMargin)
    },

    // Parameterized spark.sql(sql, args): named-placeholder binding at the
    // API boundary — no string splicing, the literal arrives as a typed
    // parameter (the programmatic sibling of h07's EXECUTE IMMEDIATE).
    "h11_parameterized_sql" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("ms_lineitem")
      s.sql(
        """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM ms_lineitem
          |WHERE l_quantity >= :minq AND l_discount <= :maxd
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
        Map("minq" -> 30, "maxd" -> 0.05))
    }
  )

  // ---- DuckDB mirrors ----------------------------------------------------

  val oracles: Map[String, String] = Map(
    "h04_recursive_cte" ->
      """WITH RECURSIVE mon(y, m) AS (
        |  SELECT 2000, 7
        |  UNION ALL
        |  SELECT CASE WHEN m = 12 THEN y + 1 ELSE y END,
        |         CASE WHEN m = 12 THEN 1 ELSE m + 1 END
        |  FROM mon WHERE NOT (y = 2002 AND m = 6)
        |)
        |SELECT make_date(y, m, 1) AS month,
        |  CAST(coalesce(r.n_orders, 0) AS BIGINT) AS n_orders,
        |  CAST(coalesce(r.rev_cents, 0) AS BIGINT) AS rev_cents
        |FROM mon
        |LEFT JOIN (
        |  SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |         count(*) AS n_orders,
        |         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
        |  FROM orders GROUP BY 1, 2) r
        |USING (y, m)
        |ORDER BY month""".stripMargin,

    // The SQL UDF body, inlined — proving CREATE FUNCTION is semantic
    // identity with the expression it wraps.
    "h05_sql_scalar_udf" ->
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS net_cents
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "h06_sql_table_udf" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM orders WHERE o_totalprice >= 100000.0 AND o_totalprice < 120000.0
        |ORDER BY o_orderkey""".stripMargin,

    "h07_execute_immediate" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) >
        |  (SELECT avg(CAST(round(o_totalprice * 100) AS BIGINT)) FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "h08_lateral_topk" ->
      """SELECT n_name, l.c_custkey, l.bal_cents
        |FROM nation,
        |LATERAL (
        |  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer WHERE c_nationkey = n_nationkey
        |  ORDER BY bal_cents DESC, c_custkey LIMIT 2) l
        |ORDER BY n_name, bal_cents DESC, c_custkey""".stripMargin,

    "h09_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin,

    // pipe AGGREGATE emits the grouping columns ahead of the aggregates
    "h10_pipe_syntax" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY o_orderstatus, o_orderpriority
        |HAVING count(*) > 100
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "h12_named_window" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(rank() OVER w AS BIGINT) AS rnk,
        |    CAST(sum(cents) OVER w AS BIGINT) AS run_cents
        |  FROM (SELECT o_orderpriority, o_orderkey,
        |          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |        FROM orders)
        |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents DESC, o_orderkey))
        |WHERE rnk <= 5
        |ORDER BY o_orderpriority, rnk""".stripMargin,

    "h11_parameterized_sql" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem
        |WHERE l_quantity >= 30 AND l_discount <= 0.05
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
