package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional aggregation surface: ROLLUP / CUBE / GROUPING SETS /
  * PIVOT / DISTINCT aggregates.
  *
  * Reference: logical Expand/GroupingSets/Cube/Rollup nodes
  * (CAT/plans/logical/basicOperators.scala:308-398), analyzer
  * ResolveGroupingAnalytics (CAT/analysis/Analyzer.scala:182), ResolvePivot
  * (:260), physical EXEC/Expand.scala:34. Modern Spark plans the same
  * Expand; at scale note Expand multiplies input rows by the number of
  * grouping sets BEFORE the shuffle — keep grouping-set counts small on
  * wide fact tables, which these queries do (≤4 sets).
  *
  * 1.6 allowed only ONE distinct aggregate column-set
  * (EXEC/aggregate/utils.scala:134); g05 exercises the modern superset
  * (two distinct sets) deliberately.
  */
object Grouping {

  private def dec2(c: String) = col(c).cast("decimal(18,2)")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_rollup_returns" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          (sum(dec2("l_quantity")) * 100).cast("bigint").as("qty"),
          grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"))
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    },

    "g02_cube_order_status" -> { (s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          (sum(dec2("o_totalprice")) * 100).cast("bigint").as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // GROUPING SETS via the SQL entry point (SURVEY §2.11 — temp view +
    // spark.sql is part of the reference surface too).
    "g03_grouping_sets_events" -> { (s, dir) =>
      Tables.events(s, dir).createOrReplaceTempView("events_gs")
      s.sql(
        """SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
          |  COUNT(*) AS n
          |FROM events_gs
          |GROUP BY GROUPING SETS ((event_type), (user_bucket), ())
          |ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST""".stripMargin)
    },

    // Pivot (reference CORE/GroupedData.scala:301): explicit value list so
    // the plan never needs the driver-side distinct-value collect.
    "g04_pivot_priority" -> { (s, dir) =>
      val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", priorities)
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderstatus")
    },

    // Exact distinct aggregates, two distinct column-sets in one Aggregate.
    "g05_distinct_aggregates" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("parts"),
          countDistinct(col("l_suppkey")).as("supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // HyperLogLog++ approximate distinct (reference
    // CAT/expressions/aggregate/HyperLogLogPlusPlus.scala:51). Sketch
    // values differ across engines, so the oracle encodes the accuracy
    // CONTRACT instead: the estimate must sit within 5 standard errors
    // (rsd 0.02 -> 10%) of the exact distinct count, which both engines
    // can agree is TRUE. The estimate itself is additionally rsd-bound in
    // the spec suite.
    "g06_approx_distinct_users" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          (abs(col("approx_users") - col("exact_users"))
            <= col("exact_users") * 0.10).as("within_5se"))
        .orderBy("event_type")
    },

    // Modern aggregate battery: median / percentile (exact sorted-value
    // interpolation — quantile fractions are powers of two so the IEEE
    // arithmetic is exact and engine-identical), deterministic mode
    // (lowest value wins ties — orders statuses TIE at some SFs, so the
    // nondeterministic default would be ungateable), count_if, bool_and /
    // bool_or. All run as one hash-aggregate pass per priority.
    "g07_modern_aggregates" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("gx_orders")
      s.sql(
        """SELECT o_orderpriority,
          |  median(CAST(round(o_totalprice * 100) AS BIGINT)) AS med_cents,
          |  percentile(CAST(round(o_totalprice * 100) AS BIGINT), 0.25D) AS p25_cents,
          |  mode(o_orderstatus, true) AS top_status,
          |  CAST(count_if(o_totalprice > 300000.0D) AS BIGINT) AS n_big,
          |  bool_and(o_totalprice > 0.0D) AS all_positive,
          |  bool_or(o_totalprice > 550000.0D) AS any_huge
          |FROM gx_orders GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    },

    // Bitwise aggregates (bit_and / bit_or / bit_xor): flag-mask rollups
    // in one exact-integer pass — both engines share the definition
    // bit-for-bit.
    "g08_bit_aggregates" -> { (s, dir) =>
      Tables.events(s, dir).createOrReplaceTempView("gx_events")
      s.sql(
        """SELECT event_type,
          |  bit_and(user_id) AS all_bits,
          |  bit_or(user_id) AS any_bits,
          |  bit_xor(user_id) AS parity_bits
          |FROM gx_events GROUP BY event_type ORDER BY event_type""".stripMargin)
    }
  )

  val oracles: Map[String, String] = Map(
    "g01_rollup_returns" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qty,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin,

    "g02_cube_order_status" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "g03_grouping_sets_events" ->
      """SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket, COUNT(*) AS n
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_bucket), ())
        |ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST""".stripMargin,

    "g04_pivot_priority" ->
      """SELECT o_orderstatus,
        |  COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS "1-URGENT",
        |  COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS "2-HIGH",
        |  COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS "3-MEDIUM",
        |  COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS "4-NOT SPECIFIED",
        |  COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS "5-LOW"
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "g05_distinct_aggregates" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS parts,
        |  COUNT(DISTINCT l_suppkey) AS supps,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "g06_approx_distinct_users" ->
      """SELECT event_type, COUNT(*) AS n, TRUE AS within_5se
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // mode(x, true) == the (count DESC, value ASC) argmax; count_if ==
    // FILTERed count; quantile_cont matches percentile at power-of-two
    // fractions exactly.
    "g07_modern_aggregates" ->
      """WITH c AS (SELECT o_orderpriority, o_orderstatus, o_totalprice,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT o_orderpriority,
        |  median(cents) AS med_cents,
        |  quantile_cont(cents, 0.25) AS p25_cents,
        |  (SELECT o_orderstatus FROM c i WHERE i.o_orderpriority = g.o_orderpriority
        |   GROUP BY o_orderstatus ORDER BY count(*) DESC, o_orderstatus LIMIT 1) AS top_status,
        |  CAST(count(*) FILTER (WHERE o_totalprice > 300000.0) AS BIGINT) AS n_big,
        |  bool_and(o_totalprice > 0.0) AS all_positive,
        |  bool_or(o_totalprice > 550000.0) AS any_huge
        |FROM c g GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "g08_bit_aggregates" ->
      """SELECT event_type,
        |  bit_and(user_id) AS all_bits,
        |  bit_or(user_id) AS any_bits,
        |  bit_xor(user_id) AS parity_bits
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
