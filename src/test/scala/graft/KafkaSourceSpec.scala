package graft

import graft.streaming.{Event, KafkaSource, Streaming}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Kafka-record-shaped row for MemoryStream substitution: field-for-field
  * the connector's fixed record schema ([[KafkaSource.recordSchema]]). */
case class KafkaRecord(key: Array[Byte], value: Array[Byte], topic: String,
                       partition: Int, offset: Long,
                       timestamp: java.sql.Timestamp, timestampType: Int)

/** Kafka direct-source wiring (SURVEY §2.9, ref
  * external/kafka/.../DirectKafkaInputDStream.scala:55). No broker or
  * connector jar ships in this sandbox, so the decode + downstream plan is
  * proven over a MemoryStream emitting connector-schema records — the
  * exact substitution [[KafkaSource.decodeEvents]] is split from
  * [[KafkaSource.read]] to make possible — and the source wiring itself is
  * pinned by asserting it fails only on provider lookup, not plan
  * construction. */
class KafkaSourceSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def sampleEvents: Seq[Event] =
    Tables.events(spark, sf001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id").limit(120)
      .collect().map { r =>
        Event(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))
      }.toSeq

  /** Events encoded exactly as the Kafka sink would write them. */
  private def asRecords(evs: Seq[Event], startOffset: Long): Seq[KafkaRecord] = {
    import spark.implicits._
    KafkaSource.encodeEvents(evs.toDF()).collect().zipWithIndex.map {
      case (r, i) =>
        KafkaRecord(r.getAs[Array[Byte]]("key"), r.getAs[Array[Byte]]("value"),
          "events", 0, startOffset + i, new java.sql.Timestamp(0L), 0)
    }.toSeq
  }

  test("memorystream-substituted records: decode matches the original events") {
    import spark.implicits._
    val evs = sampleEvents
    val ms = MemoryStream[KafkaRecord](spark)
    asRecords(evs, 0).grouped(50).foreach(ms.addData(_))
    // names + types must match the connector contract exactly; nullability
    // may differ (case-class primitives are non-nullable, the connector
    // declares everything nullable — a strictly narrower source is fine)
    assert(ms.toDF().schema.map(f => (f.name, f.dataType))
      === KafkaSource.recordSchema.map(f => (f.name, f.dataType)),
      "substitute source must emit the connector's record schema (names+types)")
    val q = KafkaSource.decodeEvents(ms.toDF())
      .drop("kafka_ts")
      .writeStream.format("memory").queryName("kafka_decode")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val decoded = spark.table("kafka_decode").as[Event].collect().toSet
    assert(decoded === evs.toSet)
  }

  test("decoded kafka stream feeds the source-agnostic transforms (tumbling parity)") {
    import spark.implicits._
    val evs = sampleEvents
    val ms = MemoryStream[KafkaRecord](spark)
    asRecords(evs, 0).grouped(40).foreach(ms.addData(_))
    val agg = Streaming.tumblingStats(
      KafkaSource.decodeEvents(ms.toDF()).drop("kafka_ts"), "1 hour")
    val q = agg.writeStream.format("memory").queryName("kafka_tumbling")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("kafka_tumbling").collect().toSet
      === Streaming.tumblingStats(evs.toDF(), "1 hour").collect().toSet)
  }

  test("malformed payloads decode to null-field rows (caller's dead-letter choice)") {
    import spark.implicits._
    val bad = Seq(KafkaRecord(null, "not json".getBytes("UTF-8"), "events", 0, 0L,
      new java.sql.Timestamp(0L), 0))
    val out = KafkaSource.decodeEvents(bad.toDF()).collect()
    assert(out.length === 1 && out.head.isNullAt(out.head.fieldIndex("event_id")))
  }

  test("kafka source wiring fails only on provider lookup in this sandbox") {
    // No spark-sql-kafka jar here: load() must fail at DataSource lookup
    // (proving the options/plumbing are structurally sound, not a typo that
    // would fail earlier), and the same wiring resolves unchanged on a
    // cluster with the connector on the classpath.
    val e = intercept[Exception] {
      KafkaSource.read(spark, "broker:9092", "events")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected provider-lookup failure naming kafka, got: ${e.getMessage}")
  }
}
