package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events reader must read the schema the file DECLARES, not the
  * layout last month's writer produced — round 9's only breakage was a
  * hard-coded ns-as-long assumption meeting a regenerated µs file. All
  * three physical layouts seen in the wild must normalize to the same
  * UTC instants. */
class TablesSpec extends SparkSpec {

  // 2024-01-01T00:00:01.234567 UTC, in µs since epoch
  private val micros = 1704067201234567L

  test("normalizeTs: ns-as-long, NTZ-micros, and instant layouts agree") {
    import spark.implicits._
    val asLong = Seq((1L, micros * 1000L)).toDF("event_id", "ts") // legacy ns-as-long
    val asInstant = Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    val asNtz = asInstant.select(col("event_id"),
      col("ts").cast(TimestampNTZType).as("ts")) // µs file with isAdjustedToUTC=false
    val outs = Seq(asLong, asNtz, asInstant).map { df =>
      val n = Tables.normalizeTs(df)
      assert(n.schema("ts").dataType === TimestampType)
      n.select(unix_micros(col("ts"))).head().getLong(0)
    }
    assert(outs.forall(_ === micros), s"normalized instants diverge: $outs")
  }

  test("normalizeTs: ns-as-long floor-truncates (never rounds through double)") {
    import spark.implicits._
    // .999 µs of sub-µs noise must truncate DOWN, like DuckDB's ns->µs cast
    val noisy = Seq((1L, micros * 1000L + 999L)).toDF("event_id", "ts")
    val got = Tables.normalizeTs(noisy).select(unix_micros(col("ts"))).head().getLong(0)
    assert(got === micros)
  }

  test("events reader: the shipped testdata round-trips through the adaptive branch") {
    val e = Tables.events(spark, sf001)
    assert(e.schema("ts").dataType === TimestampType)
    assert(e.count() > 0)
  }
}
