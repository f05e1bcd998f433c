package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka direct-source wiring (SURVEY §2.9 — the reference's direct Kafka
  * stream, ref
  * external/kafka/src/main/scala/org/apache/spark/streaming/kafka/DirectKafkaInputDStream.scala:55,
  * where each micro-batch computes its own offset ranges with no receiver).
  * Structured Streaming's `format("kafka")` source IS that design — offsets
  * tracked in the query checkpoint, partitions mapped 1:1 to Kafka
  * partitions — so the wiring here is a thin, correctly-optioned builder.
  *
  * The decode step is deliberately split from the source: it operates on
  * the connector's fixed record schema ([[recordSchema]]), so the SAME
  * decode + downstream transform plan runs against a MemoryStream (specs,
  * local runs) or the real connector (cluster). The sandbox ships no
  * kafka-sql connector jar or broker, so KafkaSourceSpec proves the decode
  * path on MemoryStream-substituted records and pins the exact wiring
  * options; on a cluster with spark-sql-kafka on the classpath, [[read]]
  * works unchanged.
  */
object KafkaSource {

  /** The fixed schema every record from the kafka source carries (public
    * contract of the Structured Streaming kafka connector). A substitute
    * source must produce exactly this shape for plan parity. */
  val recordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** JSON wire schema of an [[Event]] payload. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Unbounded DataFrame over a Kafka topic (direct source: no receiver,
    * offsets in the checkpoint — exactly-once with an idempotent sink).
    * `maxOffsetsPerTrigger` bounds each micro-batch at scale. */
  def read(spark: SparkSession, bootstrapServers: String, topic: String,
           startingOffsets: String = "earliest",
           maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val base = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
    maxOffsetsPerTrigger.fold(base)(n =>
      base.option("maxOffsetsPerTrigger", n.toString)).load()
  }

  /** JSON wire options: microsecond timestamps (the default format writes
    * milliseconds, silently truncating event times on a roundtrip). */
  private val wireOptions = Map(
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")

  /** Decode Kafka-shaped records (binary `value` holding an Event as JSON)
    * into typed event rows. Source-agnostic: any DataFrame matching
    * [[recordSchema]] works, batch or streaming — this is what keeps every
    * downstream transform in [[Streaming]] testable without a broker. Rows
    * whose payload fails to parse yield nulls (from_json semantics), kept
    * so the caller chooses the dead-letter policy. */
  def decodeEvents(records: DataFrame): DataFrame =
    records
      .select(from_json(col("value").cast("string"), eventSchema, wireOptions).as("e"),
        col("timestamp").as("kafka_ts"))
      .select(col("e.event_id"), col("e.ts"), col("e.user_id"),
        col("e.event_type"), col("e.value"), col("kafka_ts"))

  /** Encode an event-shaped DataFrame back to Kafka sink records
    * (key = user_id for per-user partition affinity, value = JSON). */
  def encodeEvents(events: DataFrame): DataFrame =
    events.select(
      col("user_id").cast("string").cast("binary").as("key"),
      to_json(struct(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")), wireOptions).cast("binary").as("value"))
}
