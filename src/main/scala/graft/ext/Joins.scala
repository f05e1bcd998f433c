package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the built-in join strategies don't cover:
  * as-of (latest-right-row-at-or-before) and interval/range joins.
  *
  * Neither exists in the reference's join zoo (SURVEY §2.3 — the
  * reference stops at equi/theta/cartesian, ref
  * `core/src/main/scala/org/apache/spark/sql/execution/joins/`), but any
  * event-enrichment pipeline needs them, and a naive formulation is a
  * scale disaster: as-of as a theta join is O(events x orders) under
  * BroadcastNestedLoop, and a range join on time alone is a cartesian
  * with a post-filter. Both operators here are built from shuffle-once
  * primitives that survive 100 TB:
  *
  *  - [[asofJoin]] never joins at all — it UNIONs both sides, shuffles
  *    ONCE on the key, and carries the latest right payload forward with
  *    a running `last(_, ignoreNulls)` window. Cost: one hash shuffle +
  *    one in-partition sort, linear in rows, no match amplification.
  *    This is the distributed formulation of pandas merge_asof / KDB aj.
  *  - [[rangeJoin]] quantizes time into fixed-width buckets: the left
  *    row joins its single bucket, the right interval explodes into the
  *    buckets it covers (bounded by interval/width), and an equi-join on
  *    (key, bucket) + an exact residual filter replaces the theta join.
  *    Each match surfaces exactly once — the left row lives in exactly
  *    one bucket — so no post-dedup is needed.
  */
object Joins {

  /** Internal column names per operator; caller schemas must not collide
    * with the ones the operator they call actually uses. */
  private val AsofReserved = Seq("__k", "__t", "__side", "__payload", "__carried")
  private val RangeReserved = Seq("__bkt")

  private def requireNoReserved(df: DataFrame, which: String,
                                reserved: Seq[String]): Unit = {
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"$which input uses reserved internal column name(s) ${clash.mkString(", ")}; rename them before joining")
  }

  /** For each left row, attach the latest right row with the same key and
    * `rightTime <= leftTime` (KDB `aj` / pandas `merge_asof` semantics,
    * match-at-equality included).
    *
    * Right rows must be unique per (key, time) — pre-aggregate if not —
    * or the carried payload is partition-order nondeterministic (same
    * contract DuckDB's ASOF JOIN imposes for a deterministic result).
    *
    * `joinType`: "inner" drops left rows with no prior right row; "left"
    * keeps them with null right columns.
    *
    * Scale shape: `unionByName` is free (no shuffle); the window
    * partitions by key — ONE hash shuffle of both inputs combined, then
    * a per-partition sort. A key hot enough to swamp one reducer would
    * need two-level bucketing (coarse time bucket + per-bucket carry-in
    * prefix), the same refinement streamed state stores apply; at normal
    * key cardinality AQE balances the partitions. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asofJoin supports inner|left, got $joinType")
    requireNoReserved(left, "asofJoin left", AsofReserved)
    requireNoReserved(right, "asofJoin right", AsofReserved)
    val rightPayload = right.columns.filter(c => c != rightKey && c != rightTime)
    // One unified schema: (key, t, side, payload-struct, left columns).
    // side orders right (0) before left (1) at equal timestamps so a
    // same-instant right row is visible to the left row (>= semantics).
    val taggedRight = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      struct((col(rightTime).as(rightTime) +: rightPayload.map(col)).toIndexedSeq: _*).as("__payload"))
    val taggedLeft = left.select(
      Seq(col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(taggedRight.schema("__payload").dataType).as("__payload"))
        ++ left.columns.map(col): _*)
    val carried = taggedRight.unionByName(taggedLeft, allowMissingColumns = true)
      .withColumn("__carried", last("__payload", ignoreNulls = true).over(
        Window.partitionBy("__k").orderBy("__t", "__side")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__side") === 1)
    val matched = if (joinType == "inner") carried.filter(col("__carried").isNotNull) else carried
    val rightCols = (rightTime +: rightPayload.toSeq)
      .map(c => col(s"__carried.$c").as(c))
    matched.select((left.columns.map(col) ++ rightCols).toIndexedSeq: _*)
  }

  /** Equi-key interval join: left rows with `rightStart <= leftTime <
    * rightEnd` for the same key, as an equi-join on (key, time-bucket)
    * plus an exact residual filter — never a nested-loop theta join.
    *
    * `bucketSeconds` trades shuffle width against replication: each
    * right interval is replicated `ceil(len/bucket)+1` times, so pick a
    * bucket near the typical interval length. */
  def rangeJoin(left: DataFrame, right: DataFrame,
                leftKey: String, rightKey: String,
                leftTime: String, rightStart: String, rightEnd: String,
                bucketSeconds: Long): DataFrame = {
    requireNoReserved(left, "rangeJoin left", RangeReserved)
    requireNoReserved(right, "rangeJoin right", RangeReserved)
    val lb = left.withColumn("__bkt",
      floor(unix_timestamp(col(leftTime)) / bucketSeconds))
    // interval [start, end) covers buckets floor(start/w)..floor(end/w);
    // sequence is inclusive so the half-open end lands via the residual
    val rb = right.withColumn("__bkt", explode(sequence(
      floor(unix_timestamp(col(rightStart)) / bucketSeconds),
      floor(unix_timestamp(col(rightEnd)) / bucketSeconds))))
    lb.join(rb, lb("__bkt") === rb("__bkt") && lb(leftKey) === rb(rightKey))
      .filter(lb(leftTime) >= rb(rightStart) && lb(leftTime) < rb(rightEnd))
      .drop("__bkt")
  }
}
