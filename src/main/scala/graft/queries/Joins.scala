package graft.queries

import graft.Tables
import graft.ext.{Joins => TJoins}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal joins (as-of, interval/range) over the events stream —
  * the two enrichment shapes every event pipeline needs and the
  * reference's join surface (SURVEY §2.3) cannot express without a
  * nested-loop theta join. Implementations in [[graft.ext.Joins]]:
  * shuffle-once union+window for as-of, bucketed equi-join for range.
  *
  * DuckDB mirrors: native ASOF JOIN for j01 (same
  * greatest-right-time-at-or-before semantics, same unique-(key,time)
  * right-side contract), a BETWEEN theta join for j02 — small enough
  * at oracle scale, which is exactly the formulation that does NOT
  * survive 100 TB and why rangeJoin exists.
  */
object Joins {

  /** Purchases deduped to one row per (user_id, ts) — the determinism
    * contract both our asofJoin and DuckDB's ASOF JOIN require. */
  private def purchases(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .agg(max("event_id").as("purchase_id"),
        max(expr("cast(round(value * 100) as bigint)")).as("purchase_cents"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of enrichment: each click gets the user's latest purchase
    // at-or-before the click instant.
    "j01_asof_last_purchase" -> { (s, dir) =>
      val clicks = Tables.events(s, dir).filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      TJoins.asofJoin(clicks, purchases(s, dir),
          leftKey = "user_id", rightKey = "p_user",
          leftTime = "ts", rightTime = "p_ts")
        .select("event_id", "user_id", "ts", "p_ts", "purchase_id", "purchase_cents")
        .orderBy("event_id")
    },

    // Interval attribution: clicks inside each purchase's trailing
    // 6-hour window [p_ts - 6h, p_ts), counted per purchase.
    "j02_attribution_window" -> { (s, dir) =>
      val clicks = Tables.events(s, dir).filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          expr("cast(round(value * 100) as bigint)").as("c_cents"))
      val windows = purchases(s, dir)
        .select(col("p_user"), col("purchase_id"),
          (col("p_ts") - expr("INTERVAL 6 HOURS")).as("w_start"), col("p_ts").as("w_end"))
      TJoins.rangeJoin(clicks, windows,
          leftKey = "c_user", rightKey = "p_user",
          leftTime = "c_ts", rightStart = "w_start", rightEnd = "w_end",
          bucketSeconds = 6 * 3600L)
        .groupBy("purchase_id")
        .agg(count(lit(1)).as("n_clicks"), sum("c_cents").as("click_cents"))
        .orderBy("purchase_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "j01_asof_last_purchase" ->
      """WITH p AS (
        |  SELECT user_id AS p_user, ts AS p_ts,
        |    CAST(max(event_id) AS BIGINT) AS purchase_id,
        |    CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS purchase_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts, p.p_ts, p.purchase_id, p.purchase_cents
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') e
        |ASOF JOIN p ON e.user_id = p.p_user AND e.ts >= p.p_ts
        |ORDER BY event_id""".stripMargin,

    "j02_attribution_window" ->
      """WITH p AS (
        |  SELECT user_id AS p_user, ts AS p_ts,
        |    CAST(max(event_id) AS BIGINT) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT p.purchase_id, CAST(count(*) AS BIGINT) AS n_clicks,
        |  CAST(sum(CAST(round(c.value * 100) AS BIGINT)) AS BIGINT) AS click_cents
        |FROM p JOIN events c ON c.event_type = 'click' AND c.user_id = p.p_user
        |  AND c.ts >= p.p_ts - INTERVAL 6 HOUR AND c.ts < p.p_ts
        |GROUP BY 1 ORDER BY purchase_id""".stripMargin
  )
}
