package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Dataset row for orders (encoder-backed; reference:
  * CAT/encoders/ExpressionEncoder.scala:182 — modern Encoders.product). */
case class OrderRow(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                    o_totalprice: Double, o_orderpriority: String)

/** Typed aggregation buffer/result: exact integer cents so the result is
  * identical under any partitioning / merge order. */
case class PriceStats(n: Long, total_cents: Long)

/** Narrow orders row for the reduceGroups argmax: reduceGroups shuffles and
  * deserializes WHOLE objects per row, so payload width is the dominant
  * cost — only the three columns the reduction reads ride along. */
case class OrderSlim(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)

/** Typed Aggregator (reference: CORE/expressions/Aggregator.scala:52 —
  * zero/reduce/merge/finish; modern adds bufferEncoder/outputEncoder).
  * Also serves as the UserDefinedAggregateFunction replacement via
  * functions.udaf (SURVEY §7.3). */
object CentsAggregator extends Aggregator[OrderRow, PriceStats, PriceStats] {
  def zero: PriceStats = PriceStats(0L, 0L)
  def reduce(b: PriceStats, a: OrderRow): PriceStats =
    PriceStats(b.n + 1, b.total_cents + math.round(a.o_totalprice * 100))
  def merge(x: PriceStats, y: PriceStats): PriceStats =
    PriceStats(x.n + y.n, x.total_cents + y.total_cents)
  def finish(r: PriceStats): PriceStats = r
  def bufferEncoder: Encoder[PriceStats] = Encoders.product
  def outputEncoder: Encoder[PriceStats] = Encoders.product
}

/** Min/max pair carried by [[SpreadAggregator]]. */
case class Spread(min_c: Long, max_c: Long)

/** The same Aggregator contract registered for SQL via functions.udaf —
  * the modern replacement for 1.6-era Hive UDAFs: callable by NAME from
  * any SQL text, partial-merge distributed like a built-in. */
object SpreadAggregator extends Aggregator[Long, Spread, Long] {
  def zero: Spread = Spread(Long.MaxValue, Long.MinValue)
  def reduce(b: Spread, a: Long): Spread =
    Spread(math.min(b.min_c, a), math.max(b.max_c, a))
  def merge(x: Spread, y: Spread): Spread =
    Spread(math.min(x.min_c, y.min_c), math.max(x.max_c, y.max_c))
  def finish(r: Spread): Long = if (r.max_c == Long.MinValue) 0L else r.max_c - r.min_c
  def bufferEncoder: Encoder[Spread] = Encoders.product
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Typed API surface (SURVEY §2.10, §7.2 step 5): Dataset[T] with
  * case-class encoders, KeyValueGroupedDataset (mapGroups / reduceGroups /
  * cogroup), typed Aggregator, and registered Scala UDFs.
  *
  * Scale note: mapGroups/cogroup shuffle on the grouping key exactly like
  * a relational groupBy; the typed lambda runs per key group streaming.
  * UDFs are used only where built-ins can't express the logic — they break
  * codegen, so these queries keep them on already-reduced data.
  */
object Typed {

  private def ordersDs(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .as[OrderRow]
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Typed Aggregator via groupByKey(...).agg(agg.toColumn).
    "y01_typed_aggregator" -> { (s, dir) =>
      import s.implicits._
      ordersDs(s, dir)
        .groupByKey(_.o_orderstatus)
        .agg(CentsAggregator.toColumn)
        .map { case (status, ps) => (status, ps.n, ps.total_cents) }
        .toDF("o_orderstatus", "n_orders", "total_cents")
        .orderBy("o_orderstatus")
    },

    // mapGroups: arbitrary per-group Scala logic with explicit determinism
    // (sorted statuses, exact cents max).
    "y02_map_groups" -> { (s, dir) =>
      import s.implicits._
      ordersDs(s, dir)
        .groupByKey(_.o_custkey)
        .mapGroups { (cust, rows) =>
          val rs = rows.toSeq
          (cust, rs.size.toLong,
            rs.map(r => math.round(r.o_totalprice * 100)).max,
            rs.map(_.o_orderstatus).distinct.sorted.mkString)
        }
        .toDF("custkey", "n_orders", "max_cents", "statuses")
        .orderBy("custkey")
    },

    // reduceGroups: argmax order per customer with explicit tie-break.
    // Exists to prove the typed surface (the reference's
    // GroupedDataset.reduce); the relational argmax window (w01 shape) is
    // the production path — this keeps the typed cost bounded by shuffling
    // only the 3-column OrderSlim payload instead of full OrderRow objects.
    "y03_reduce_groups" -> { (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .as[OrderSlim]
        .groupByKey(_.o_custkey)
        .reduceGroups { (a: OrderSlim, b: OrderSlim) =>
          if (a.o_totalprice > b.o_totalprice) a
          else if (a.o_totalprice < b.o_totalprice) b
          else if (a.o_orderkey < b.o_orderkey) a else b
        }
        .map { case (cust, best) =>
          (cust, best.o_orderkey, math.round(best.o_totalprice * 100)) }
        .toDF("custkey", "best_orderkey", "best_cents")
        .orderBy("custkey")
    },

    // cogroup customers x orders on the customer key.
    "y04_cogroup" -> { (s, dir) =>
      import s.implicits._
      val custs = Tables.customer(s, dir)
        .select($"c_custkey".as[Long], $"c_acctbal".as[Double])
        .groupByKey(_._1)
      val ords = ordersDs(s, dir).groupByKey(_.o_custkey)
      custs.cogroup(ords) { (key, cs, os) =>
        val cl = cs.toSeq; val ol = os.toSeq
        Iterator((key, cl.size.toLong, ol.size.toLong,
          ol.map(r => math.round(r.o_totalprice * 100)).sum))
      }
        .toDF("custkey", "n_cust", "n_orders", "sum_cents")
        .orderBy("custkey")
    },

    // Registered Scala UDF used from SQL over a temp view (SURVEY §2.10:
    // CORE/UDFRegistration.scala; modern spark.udf.register).
    "y05_registered_udf" -> { (s, dir) =>
      s.udf.register("priority_num", (p: String) => p.split("-")(0).toInt)
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT priority_num(o_orderpriority) AS prio_num,
          |       count(*) AS n,
          |       sum(cast(round(o_totalprice * 100) as bigint)) AS cents
          |FROM orders_v GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // Typed joinWith: pair-typed inner join (CORE/Dataset.scala:643).
    "y06_join_with" -> { (s, dir) =>
      import s.implicits._
      val o = ordersDs(s, dir)
      val c = Tables.customer(s, dir)
        .select($"c_custkey".as[Long], $"c_mktsegment".as[String])
        .map { case (k, seg) => (k, seg) }
      o.joinWith(c, o("o_custkey") === c("_1"))
        .map { case (ord, (_, seg)) => (ord.o_orderkey, seg, math.round(ord.o_totalprice * 100)) }
        .toDF("o_orderkey", "segment", "cents")
        .orderBy("o_orderkey")
    },

    // The Aggregator registered as a SQL UDAF (functions.udaf + register):
    // callable by name from SQL text, executed with partial aggregation
    // like a built-in — the 1.6 Hive-UDAF surface on the modern contract.
    "y07_sql_udaf" -> { (s, dir) =>
      s.udf.register("cents_spread",
        org.apache.spark.sql.functions.udaf(SpreadAggregator))
      Tables.orders(s, dir).createOrReplaceTempView("ty_orders")
      s.sql(
        """SELECT o_orderstatus,
          |  cents_spread(CAST(round(o_totalprice * 100) AS BIGINT)) AS spread_cents,
          |  CAST(count(*) AS BIGINT) AS n
          |FROM ty_orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }
  )

  val oracles: Map[String, String] = Map(
    "y01_typed_aggregator" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    "y02_map_groups" ->
      """SELECT o_custkey AS custkey, count(*) AS n_orders,
        |  max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents,
        |  array_to_string(list_sort(list_distinct(list(o_orderstatus))), '') AS statuses
        |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin,

    "y03_reduce_groups" ->
      """SELECT o_custkey AS custkey, o_orderkey AS best_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS best_cents
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey) rn FROM orders)
        |WHERE rn = 1 ORDER BY custkey""".stripMargin,

    "y04_cogroup" ->
      """SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
        |  COALESCE(c.n_cust, 0) AS n_cust,
        |  COALESCE(o.n_orders, 0) AS n_orders,
        |  COALESCE(o.sum_cents, 0) AS sum_cents
        |FROM (SELECT c_custkey, count(*) n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT o_custkey, count(*) n_orders,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) sum_cents
        |  FROM orders GROUP BY 1) o
        |ON c.c_custkey = o.o_custkey ORDER BY custkey""".stripMargin,

    "y05_registered_udf" ->
      """SELECT CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_num,
        |  count(*) AS n, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "y06_join_with" ->
      """SELECT o_orderkey, c_mktsegment AS segment,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "y07_sql_udaf" ->
      """WITH c AS (SELECT o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT) cents
        |           FROM orders)
        |SELECT o_orderstatus, max(cents) - min(cents) AS spread_cents,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM c GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
