package graft

import graft.ext.Joins
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // quotes: (sym, t, px) unique per (key, time); trades: (id, sym, t)
  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100L),
    ("A", ts("2024-01-01 10:00:05"), 101L),
    ("A", ts("2024-01-01 10:00:10"), 102L),
    ("B", ts("2024-01-01 10:00:03"), 200L)
  ).toDF("sym", "t", "px")

  private lazy val trades = Seq(
    (1L, "A", ts("2024-01-01 09:59:59")), // before any quote
    (2L, "A", ts("2024-01-01 10:00:05")), // exactly at a quote -> match it
    (3L, "A", ts("2024-01-01 10:00:07")), // between quotes -> 10:00:05
    (4L, "A", ts("2024-01-01 10:01:00")), // after all -> 10:00:10
    (5L, "B", ts("2024-01-01 10:00:04")),
    (6L, "C", ts("2024-01-01 10:00:00")) // key with no quotes at all
  ).toDF("id", "sym", "tt")

  test("asofJoin inner matches latest quote at-or-before, drops unmatched") {
    val got = Joins.asofJoin(trades, quotes, "sym", "sym", "tt", "t")
      .select("id", "px").as[(Long, Long)].collect().toMap
    assert(got === Map(2L -> 101L, 3L -> 101L, 4L -> 102L, 5L -> 200L))
  }

  test("asofJoin left keeps unmatched rows with null right columns") {
    val got = Joins.asofJoin(trades, quotes, "sym", "sym", "tt", "t", joinType = "left")
      .select("id", "px").collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> -1L, 2L -> 101L, 3L -> 101L, 4L -> 102L, 5L -> 200L, 6L -> -1L))
  }

  test("asofJoin agrees with brute-force greatest-prior-row join on real events") {
    val ev = Tables.events(spark, sf001)
    val left = ev.filter($"event_type" === "click").select($"event_id", $"user_id", $"ts")
    val right = ev.filter($"event_type" === "view")
      .groupBy($"user_id".as("rk"), $"ts".as("rt")).agg(max("event_id").as("view_id"))
    val got = Joins.asofJoin(left, right, "user_id", "rk", "ts", "rt")
      .select("event_id", "rt", "view_id")
    // brute force: theta join, keep the greatest rt (ties impossible: right
    // is unique per (key, time) and view_id is functionally dependent)
    val brute = left.join(right, $"user_id" === $"rk" && $"ts" >= $"rt")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_id")
          .orderBy($"rt".desc, $"view_id".desc)))
      .filter($"rn" === 1).select("event_id", "rt", "view_id")
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("rangeJoin matches theta join exactly once, half-open bounds") {
    // intervals engineered to span multiple buckets and to sit on bucket
    // and interval boundaries
    val intervals = Seq(
      ("A", 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      ("A", 2L, ts("2024-01-01 11:30:00"), ts("2024-01-01 11:45:00")),
      ("B", 3L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    ).toDF("k", "iid", "s", "e")
    val points = Seq(
      ("A", 10L, ts("2024-01-01 10:00:00")), // inclusive start of 1
      ("A", 11L, ts("2024-01-01 12:00:00")), // exclusive end of 1 -> no match
      ("A", 12L, ts("2024-01-01 11:40:00")), // inside 1 and 2
      ("B", 13L, ts("2024-01-01 23:59:59")),
      ("C", 14L, ts("2024-01-01 10:30:00")) // key without intervals
    ).toDF("k", "pid", "pt")
    for (bucket <- Seq(600L, 3600L, 86400L)) {
      val got = Joins.rangeJoin(points, intervals, "k", "k", "pt", "s", "e", bucket)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got === Seq((10L, 1L), (12L, 1L), (12L, 2L), (13L, 3L)),
        s"bucketSeconds=$bucket")
    }
  }
}
