package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator surface: scan, filter/project, hash & broadcast
  * joins (all join types), aggregation (partial+final hash agg), sort,
  * limit/top-k, set ops, distinct.
  *
  * Reference semantics: Spark 1.6.1 DataFrame API
  * (sql/core/src/main/scala/org/apache/spark/sql/DataFrame.scala:386-530 joins,
  * :755 filter, :813 groupBy; execution/joins and execution/aggregate).
  * Re-expressed as declarative Spark 4 DataFrame plans so Catalyst keeps
  * pushdown/pruning and AQE picks broadcast vs SMJ at runtime.
  *
  * Numeric policy for oracle parity: monetary math is done in DECIMAL from
  * the first operation (cast each double column, then combine), so sums are
  * exact and deterministic under any partitioning / any addition order —
  * a double SUM would be nondeterministic at 1000 executors.
  *
  * Output canonicalization: final projections emit only BIGINT / DOUBLE /
  * STRING / TIMESTAMP — never DECIMAL. Exact decimal aggregates are scaled
  * by 10^scale and cast to BIGINT (fixed-point integer units) on BOTH the
  * Spark and oracle side, because equal decimals stay equal as int64 while
  * decimal->double conversion paths differ across engines by a ulp.
  */
object Relational {

  // dollar-free column helpers (queries take an externally-built session)
  private def dec2(c: String) = col(c).cast("decimal(18,2)")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan → filter (pushed to parquet) → hash agg → sort.
    "q01_pricing_summary" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(dec2("l_quantity")) * 100).cast("bigint").as("sum_qty"),
          (sum(dec2("l_extendedprice")) * 100).cast("bigint").as("sum_base_price"),
          (sum(dec2("l_extendedprice") * (lit(1) - dec2("l_discount"))) * 10000)
            .cast("bigint").as("sum_disc_price"),
          (sum(dec2("l_extendedprice") * (lit(1) - dec2("l_discount")) * (lit(1) + dec2("l_tax"))) * 1000000)
            .cast("bigint").as("sum_charge"),
          ((sum(dec2("l_quantity")).cast("decimal(18,2)") / count(lit(1)))
            .cast("decimal(38,6)") * 1000000).cast("bigint").as("avg_qty"),
          ((sum(dec2("l_extendedprice")).cast("decimal(18,2)") / count(lit(1)))
            .cast("decimal(38,6)") * 1000000).cast("bigint").as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Projection + expression eval + filter pushdown (TPC-H Q6 shape).
    "q02_forecast_revenue" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg((sum(dec2("l_extendedprice") * dec2("l_discount")) * 10000)
          .cast("bigint").as("revenue"),
          count(lit(1)).as("n"))
    },

    // Inner equi-join, small build side: planner should broadcast customer.
    "q03_top_orders" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg((sum(dec2("o_totalprice")) * 100).cast("bigint").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // Multi-way star join lineitem⋈orders⋈customer⋈nation⋈region (Q5 shape):
    // the two big tables meet in one shuffled join; dims broadcast.
    "q04_local_supplier_volume" -> { (s, dir) =>
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg((sum(dec2("l_extendedprice") * (lit(1) - dec2("l_discount"))) * 10000)
          .cast("bigint").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Left outer join + agg preserving unmatched left rows.
    "q05_customer_order_counts" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      // Pre-aggregate BELOW the outer join (Catalyst won't push an agg
      // through a join on its own): the join's big side shrinks from one
      // row per order to one row per customer — map-side combined, and at
      // sf1 the difference between shuffling the fact table and
      // broadcasting a count table. Unmatched customers coalesce to 0,
      // exactly count(o_orderkey)'s null handling in the joined-first form.
      val oc = o.groupBy(col("o_custkey"))
        .agg(count(col("o_orderkey")).as("cnt"))
      c.join(oc, c("c_custkey") === oc("o_custkey"), "left_outer")
        .select(col("c_custkey"), col("c_name"),
          coalesce(col("cnt"), lit(0L)).as("order_count"))
        .orderBy(col("order_count").desc, col("c_custkey"))
        .limit(100)
    },

    // Left semi join (reference: EXEC/joins/LeftSemiJoinHash.scala:31).
    "q06_customers_with_big_order" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 400000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // Left anti join — 1.6 spelled this NOT IN/except (SURVEY §2.3); the
    // modern named type gives the same semantics in one shuffle.
    "q07_customers_without_orders" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Full outer join over two aggregated sides.
    "q08_nation_customer_supplier" -> { (s, dir) =>
      val cn = Tables.customer(s, dir).groupBy("c_nationkey")
        .agg(count(lit(1)).as("customers"))
      val sn = Tables.supplier(s, dir).groupBy("s_nationkey")
        .agg(count(lit(1)).as("suppliers"))
      cn.join(sn, cn("c_nationkey") === sn("s_nationkey"), "full_outer")
        .select(
          coalesce(cn("c_nationkey"), sn("s_nationkey")).as("nationkey"),
          coalesce(col("customers"), lit(0L)).as("customers"),
          coalesce(col("suppliers"), lit(0L)).as("suppliers"))
        .orderBy("nationkey")
    },

    // Cross join (reference: EXEC/joins/CartesianProduct.scala:27) — tiny
    // dims only; a cartesian of big tables would never survive at scale.
    "q09_region_nation_matrix" -> { (s, dir) =>
      Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    },

    // Non-equi theta join → BroadcastNestedLoopJoin on the small side.
    "q10_parts_pricier_than_region_avg" -> { (s, dir) =>
      val p = Tables.part(s, dir)
      val avgp = p.agg(avg(dec2("p_retailprice")).cast("decimal(38,6)").as("avg_price"))
      p.join(broadcast(avgp), dec2("p_retailprice") > col("avg_price"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },

    // Set ops: UNION ALL / INTERSECT / EXCEPT (distinct semantics, SURVEY §2.7).
    "q11_setops_nations" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey")).distinct()
      val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")).distinct()
      val both = c.intersect(sup).withColumn("tag", lit("both"))
      val custOnly = c.except(sup).withColumn("tag", lit("cust_only"))
      both.union(custOnly).orderBy("tag", "nationkey")
    },

    // BAG-semantics set operations (INTERSECT ALL / EXCEPT ALL — the
    // multiplicity-preserving forms 1.6 lacked; q11 covers the distinct
    // forms): priority multisets of two customer segments' orders.
    // INTERSECT ALL keeps each priority min(multiplicity) times, EXCEPT
    // ALL the surplus — rolled up to counts per (op, priority). Both
    // lower to aggregate + generate (replicate-rows) plans, never a
    // distinct that would destroy the bag.
    "q19_bag_setops" -> { (s, dir) =>
      import org.apache.spark.sql.DataFrame
      def prios(seg: String): DataFrame =
        Tables.orders(s, dir)
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .filter(col("c_mktsegment") === seg)
          .select(col("o_orderpriority").as("priority"))
      val a = prios("BUILDING"); val b = prios("AUTOMOBILE")
      a.intersectAll(b).groupBy("priority").agg(count(lit(1)).as("n"))
        .select(lit("intersect_all").as("op"), col("priority"), col("n"))
        .unionByName(
          a.exceptAll(b).groupBy("priority").agg(count(lit(1)).as("n"))
            .select(lit("except_all").as("op"), col("priority"), col("n")))
        .orderBy("op", "priority")
    },

    // Distinct projection (Distinct → Aggregate rewrite, Optimizer.scala:912).
    "q12_distinct_order_status" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    },

    // Top-K: orderBy+limit fuses to TakeOrderedAndProject
    // (reference EXEC/basicOperators.scala:192) — no global sort shuffle.
    "q13_top_value_items" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          (dec2("l_extendedprice") * 100).cast("bigint").as("price_cents"))
        .orderBy(col("price_cents").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(25)
    },

    // GROUP BY + HAVING (analyzer ResolveHaving path in 1.6).
    "q14_busy_suppliers" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("items"),
          (sum(dec2("l_quantity")) * 100).cast("bigint").as("qty"))
        .filter(col("items") > 500)
        .orderBy(col("items").desc, col("l_suppkey"))
    },

    // Scalar "subquery": global aggregate joined back (broadcast of 1 row).
    "q15_above_avg_orders" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val stats = o.agg((sum(dec2("o_totalprice")).cast("decimal(18,2)") / count(lit(1)))
        .cast("decimal(38,6)").as("avg_total"))
      o.join(broadcast(stats), dec2("o_totalprice") * 2 > col("avg_total") * 3)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // Correlated EXISTS (TPC-H Q4 shape): Catalyst decorrelates the
    // subquery into a left-semi join on the correlation key.
    "q16_exists_returned" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("q16_orders")
      Tables.lineitem(s, dir).createOrReplaceTempView("q16_lineitem")
      s.sql("""SELECT o_orderpriority, count(*) AS n FROM q16_orders o
              |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01' AND EXISTS (
              |  SELECT 1 FROM q16_lineitem l
              |  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // Correlated SCALAR subquery (TPC-H Q17 shape): per-part average
    // decorrelates into an aggregate + equi-join. The quantity sums stay
    // exact in double (small integers), so the 0.5*avg threshold is
    // engine-portable.
    "q17_below_avg_quantity" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("q17_lineitem")
      s.sql("""SELECT l_returnflag, count(*) AS n,
              |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
              |FROM q17_lineitem l1
              |WHERE l1.l_quantity < 0.5 * (
              |  SELECT avg(l2.l_quantity) FROM q17_lineitem l2
              |  WHERE l2.l_partkey = l1.l_partkey)
              |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // IN-subquery with HAVING (TPC-H Q18 shape): big-quantity orders
    // found by a grouped subquery, re-joined to customer + lineitem.
    "q18_big_quantity_orders" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("q18_orders")
      Tables.lineitem(s, dir).createOrReplaceTempView("q18_lineitem")
      Tables.customer(s, dir).createOrReplaceTempView("q18_customer")
      s.sql("""SELECT c_custkey, o_orderkey,
              |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
              |FROM q18_customer c
              |JOIN q18_orders o ON c.c_custkey = o.o_custkey
              |JOIN q18_lineitem l ON o.o_orderkey = l.l_orderkey
              |WHERE o.o_orderkey IN (
              |  SELECT l_orderkey FROM q18_lineitem
              |  GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
              |GROUP BY c_custkey, o_orderkey
              |ORDER BY total_qty DESC, o_orderkey
              |LIMIT 100""".stripMargin)
    }
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) * 1000000 AS BIGINT) AS sum_charge,
        |  CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) / COUNT(*) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS avg_qty,
        |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) / COUNT(*) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q03_top_orders" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q04_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q05_customer_order_counts" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_count
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY order_count DESC, c_custkey
        |LIMIT 100""".stripMargin,

    "q06_customers_with_big_order" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q07_customers_without_orders" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q08_nation_customer_supplier" ->
      """WITH cn AS (SELECT c_nationkey, COUNT(*) AS customers FROM customer GROUP BY c_nationkey),
        |     sn AS (SELECT s_nationkey, COUNT(*) AS suppliers FROM supplier GROUP BY s_nationkey)
        |SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
        |       COALESCE(customers, 0) AS customers,
        |       COALESCE(suppliers, 0) AS suppliers
        |FROM cn FULL OUTER JOIN sn ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,

    "q09_region_nation_matrix" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q10_parts_pricier_than_region_avg" ->
      """SELECT p_partkey, p_name
        |FROM part,
        |  (SELECT CAST(AVG(CAST(p_retailprice AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS avg_price FROM part) t
        |WHERE CAST(p_retailprice AS DECIMAL(18,2)) > avg_price
        |ORDER BY p_partkey""".stripMargin,

    "q11_setops_nations" ->
      """WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
        |     s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier),
        |     b AS (SELECT nationkey, 'both' AS tag FROM (SELECT * FROM c INTERSECT SELECT * FROM s)),
        |     co AS (SELECT nationkey, 'cust_only' AS tag FROM (SELECT * FROM c EXCEPT SELECT * FROM s))
        |SELECT * FROM b UNION ALL SELECT * FROM co
        |ORDER BY tag, nationkey""".stripMargin,

    "q19_bag_setops" ->
      """WITH a AS (SELECT o_orderpriority AS priority FROM orders
        |           JOIN customer ON o_custkey = c_custkey
        |           WHERE c_mktsegment = 'BUILDING'),
        |     b AS (SELECT o_orderpriority FROM orders
        |           JOIN customer ON o_custkey = c_custkey
        |           WHERE c_mktsegment = 'AUTOMOBILE')
        |SELECT 'intersect_all' AS op, priority, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY priority
        |UNION ALL
        |SELECT 'except_all', priority, CAST(count(*) AS BIGINT)
        |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY priority
        |ORDER BY op, priority""".stripMargin,

    "q12_distinct_order_status" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q13_top_value_items" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
        |FROM lineitem
        |ORDER BY price_cents DESC, l_orderkey, l_linenumber
        |LIMIT 25""".stripMargin,

    "q14_busy_suppliers" ->
      """SELECT l_suppkey, COUNT(*) AS items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qty
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING COUNT(*) > 500
        |ORDER BY items DESC, l_suppkey""".stripMargin,

    "q15_above_avg_orders" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders,
        |  (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) / COUNT(*) AS DECIMAL(38,6)) AS avg_total FROM orders) t
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 2 > avg_total * 3
        |ORDER BY o_orderkey""".stripMargin,

    "q16_exists_returned" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01' AND EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q17_below_avg_quantity" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem l1
        |WHERE l1.l_quantity < 0.5 * (
        |  SELECT avg(l2.l_quantity) FROM lineitem l2
        |  WHERE l2.l_partkey = l1.l_partkey)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q18_big_quantity_orders" ->
      """SELECT c_custkey, o_orderkey,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
        |GROUP BY c_custkey, o_orderkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 100""".stripMargin
  )
}
