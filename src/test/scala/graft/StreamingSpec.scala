package graft

import graft.streaming.{Event, Streaming}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-streaming behavior the batch oracle can't see: MemoryStream
  * micro-batch parity with batch plans, watermark late-data handling, and
  * cross-batch GroupState (the mapWithState/updateStateByKey port —
  * reference STRM/dstream/PairDStreamFunctions.scala:379-497). */
class StreamingSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def sampleEvents: Seq[Event] =
    Tables.events(spark, sf001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id").limit(300)
      .collect().map { r =>
        Event(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))
      }.toSeq

  private def runToCompletion(df: org.apache.spark.sql.DataFrame,
                              name: String, mode: OutputMode): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("tumbling window aggregation: stream result equals batch result") {
    import spark.implicits._
    val evs = sampleEvents
    val ms = MemoryStream[Event](spark)
    // three micro-batches
    evs.grouped(100).foreach(ms.addData(_))
    runToCompletion(Streaming.tumblingStats(ms.toDF(), "1 hour"),
      "tumbling_stream", OutputMode.Complete())
    val streamed = spark.table("tumbling_stream").collect().toSet
    val batch = Streaming.tumblingStats(evs.toDF(), "1 hour").collect().toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("watermark drops data later than the allowed delay") {
    import spark.implicits._
    def at(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    val ms = MemoryStream[Event](spark)
    val agg = Streaming.tumblingStats(
      Streaming.withLateness(ms.toDF(), "10 minutes"), "15 minutes")
    val q = agg.writeStream.format("memory").queryName("wm_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      ms.addData(Event(1, at(0), 1, "a", 1.0), Event(2, at(5), 1, "a", 1.0))
      q.processAllAvailable()
      // advance watermark far past the first window
      ms.addData(Event(3, at(120), 1, "a", 1.0))
      q.processAllAvailable()
      // this event is 2h late — behind the watermark — and must be dropped
      ms.addData(Event(4, at(1), 1, "a", 1.0))
      q.processAllAvailable()
      ms.addData(Event(5, at(240), 1, "a", 1.0)) // close remaining windows
      q.processAllAvailable()
    } finally q.stop()
    val first = spark.table("wm_stream")
      .filter(col("window_start") === at(0)).collect()
    assert(first.length === 1)
    assert(first.head.getAs[Long]("n") === 2) // late event 4 NOT counted
  }

  test("sliding windows update incrementally per micro-batch (inverse-reduce parity)") {
    // The reference's ReducedWindowedDStream avoids recomputing whole
    // sliding windows via an inverse reduce; Structured Streaming gets the
    // same effect from the state store — a micro-batch only touches the
    // (window, key) state rows its events fall into. Assert exactly that:
    // a 5-event second batch updates at most 5 * (size/slide) keys, not
    // the whole window state.
    import spark.implicits._
    val evs = sampleEvents
    val ms = MemoryStream[Event](spark)
    val agg = Streaming.slidingStats(ms.toDF(), "1 hour", "15 minutes")
    val q = agg.writeStream.format("memory").queryName("slide_inc")
      .outputMode(OutputMode.Complete()).start()
    try {
      ms.addData(evs.dropRight(5)); q.processAllAvailable()
      ms.addData(evs.takeRight(5)); q.processAllAvailable()
      val progs = q.recentProgress.filter(_.numInputRows > 0)
      assert(progs.length === 2)
      val updated2 = progs.last.stateOperators.head.numRowsUpdated
      assert(updated2 > 0 && updated2 <= 5 * 4,
        s"second batch should only update touched (window,type) keys, got $updated2")
      val total = spark.table("slide_inc").count()
      assert(updated2 < total, "incremental update must touch fewer keys than total state")
    } finally q.stop()
    assert(spark.table("slide_inc").collect().toSet
      === Streaming.slidingStats(evs.toDF(), "1 hour", "15 minutes").collect().toSet)
  }

  test("mapGroupsWithState carries per-key state across micro-batches") {
    import spark.implicits._
    val evs = sampleEvents
    val ms = MemoryStream[Event](spark)
    evs.grouped(100).foreach(ms.addData(_))
    val counted = ms.toDS().groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + batch.size
          state.update(total)
          (uid, total)
      }
    runToCompletion(counted.toDF("user_id", "n"), "state_stream", OutputMode.Update())
    // last update per key equals the batch count
    val streamed = spark.table("state_stream").groupBy("user_id")
      .agg(max("n").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = evs.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    assert(streamed === batch)
  }

  test("file-stream source: parquet directory feeds the same aggregation") {
    import spark.implicits._
    val dir = "/tmp/graft_stream_src"
    val evs = sampleEvents
    evs.toDF().write.mode("overwrite").parquet(dir)
    val streamDf = spark.readStream.schema(evs.toDF().schema).parquet(dir)
    runToCompletion(Streaming.tumblingStats(streamDf, "1 hour"),
      "file_stream", OutputMode.Complete())
    assert(spark.table("file_stream").collect().toSet
      === Streaming.tumblingStats(evs.toDF(), "1 hour").collect().toSet)
  }

  test("foreachBatch sink sees every micro-batch once (foreachRDD parity)") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val ms = MemoryStream[Event](spark)
    val evs = sampleEvents
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = ms.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Event], id: Long) =>
        seen.add(id -> batch.count()); ()
      }.start()
    try {
      ms.addData(evs.take(50)); q.processAllAvailable()
      ms.addData(evs.slice(50, 80)); q.processAllAvailable()
    } finally q.stop()
    val sizes = seen.asScala.toSeq.sortBy(_._1).map(_._2)
    assert(sizes === Seq(50L, 30L))
  }

  test("foldSessions splits on gaps and carries prior state") {
    def ev(id: Long, min: Int) =
      Event(id, java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00"), 7, "x", 0.0)
    val closed = Streaming.foldSessions(Nil, 7,
      Seq(ev(1, 0), ev(2, 10), ev(3, 55)), gapMs = 30 * 60000L)
    assert(closed.reverse.map(s => (s.session_idx, s.n_events)) === List((1L, 2L), (2L, 1L)))
    // continuing from carried state extends the open session
    val continued = Streaming.foldSessions(closed, 7, Seq(ev(4, 70)), 30 * 60000L)
    assert(continued.head.n_events === 2L) // joined session 2
  }
}
