package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window-function surface.
  *
  * Reference: 1.6's window operator (EXEC/Window.scala:74 — sliding /
  * unbounded / offset frame processors, ROWS vs RANGE orderings at :338,:346)
  * with ranking functions routed through the Hive bridge
  * (HIVE/hiveUDFs.scala:266). Modern Spark has all of it native; each frame
  * kind from the reference's processor factory gets a query here.
  *
  * Determinism policy: every ORDER BY inside a window spec ends with a
  * unique key so rank/lag/running results are total-order stable; running
  * sums use DECIMAL so accumulation order can't produce float drift.
  * At scale, a window shuffles once on partitionBy keys — all these specs
  * partition on real keys (never an empty partitionBy, which would
  * single-task the whole table).
  */
object Windows {

  private def dec2(c: String) = col(c).cast("decimal(18,2)")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ranking trio over per-customer order history; top-3 per customer.
    "w01_top_orders_per_customer" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn", "rnk", "drnk")
        .orderBy("o_custkey", "rn")
    },

    // Running total: ROWS UNBOUNDED PRECEDING..CURRENT (SlidingWindowFrame
    // analogue, reference EXEC/Window.scala:504).
    "w02_running_order_total" -> { (s, dir) =>
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
      // the order key ends with l_extendedprice: rows tying on the full key
      // contribute equal amounts, making the running sum order-independent.
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_linenumber"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          (sum(dec2("l_extendedprice")).over(w) * 100).cast("bigint").as("running_total"))
        .orderBy("l_orderkey", "l_linenumber", "running_total")
    },

    // Offset frames: lead/lag with default, per user event stream.
    "w03_event_prev_next" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          lag("event_type", 1).over(w).as("prev_type"),
          lead("event_type", 1, "none").over(w).as("next_type"),
          lag("value", 2).over(w).as("prev2_value"))
        .orderBy("user_id", "ts", "event_id")
    },

    // RANGE frame with value offsets (RangeBoundOrdering analogue :346):
    // per-supplier sum of quantities within 5 units below current.
    "w04_range_frame_quantity" -> { (s, dir) =>
      val w = Window.partitionBy("l_suppkey").orderBy(col("l_quantity"))
        .rangeBetween(-5, 0)
      Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          (sum(dec2("l_quantity")).over(w) * 100).cast("bigint").as("qty_window"))
        .orderBy("l_suppkey", "l_quantity", "l_orderkey", "l_linenumber")
    },

    // Distribution functions: ntile / percent_rank / cume_dist.
    "w05_order_value_distribution" -> { (s, dir) =>
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_orderstatus"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderstatus", "o_orderkey")
    },

    // Unbounded frame aggregates + first/last value over full partition.
    "w06_partition_extremes" -> { (s, dir) =>
      val full = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          first_value(col("o_orderkey")).over(full).as("first_order"),
          last_value(col("o_orderkey")).over(full).as("last_order"),
          (max(dec2("o_totalprice")).over(full) * 100).cast("bigint").as("max_total"),
          count(lit(1)).over(full).as("n_orders"))
        .orderBy("o_custkey", "o_orderkey")
    }
  )

  val oracles: Map[String, String] = Map(
    "w01_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, rn, rnk, drnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER w AS rn,
        |    RANK() OVER w AS rnk,
        |    DENSE_RANK() OVER w AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) t WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "w02_running_order_total" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 AS BIGINT) AS running_total
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, running_total""".stripMargin,

    "w03_event_prev_next" ->
      """SELECT user_id, event_id, event_type,
        |  LAG(event_type, 1) OVER w AS prev_type,
        |  LEAD(event_type, 1, 'none') OVER w AS next_type,
        |  LAG(value, 2) OVER w AS prev2_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY user_id, CAST(ts AS TIMESTAMP), event_id""".stripMargin,

    "w04_range_frame_quantity" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_quantity
        |    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) * 100 AS BIGINT) AS qty_window
        |FROM lineitem
        |ORDER BY l_suppkey, l_quantity, l_orderkey, l_linenumber""".stripMargin,

    "w05_order_value_distribution" ->
      """SELECT o_orderstatus, o_orderkey,
        |  NTILE(4) OVER w AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,

    "w06_partition_extremes" ->
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_order,
        |  LAST_VALUE(o_orderkey) OVER w AS last_order,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) OVER w * 100 AS BIGINT) AS max_total,
        |  COUNT(*) OVER w AS n_orders
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
