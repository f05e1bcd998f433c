package graft

import graft.multimodal.{MediaRow, Multimodal}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.mediaCatalog(Tables.documents(spark, sf001))

  test("media catalog: schema and deterministic metadata") {
    val rows = media.collect()
    assert(rows.length === Tables.documents(spark, sf001).count())
    val r = rows.head
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    assert(r.getAs[Int]("width") >= 16 && r.getAs[Int]("width") < 80)
    assert(media.schema("payload").dataType.typeName === "binary")
  }

  test("decode runs once per partition and features are deterministic") {
    import spark.implicits._
    val ds = media.repartition(3).as[MediaRow]
    Multimodal.FakeCodec.initCount.set(0)
    val feats = Multimodal.decodeImages(ds).collect()
    assert(Multimodal.FakeCodec.initCount.get() <= 3) // one codec per partition max
    assert(feats.length === media.filter(col("kind") === "image").count())
    feats.foreach { f =>
      assert(f.n_pixels > 0)
      assert(f.mean_intensity > 0 && f.mean_intensity < 256)
      assert(f.payload_digest.length === 32)
    }
    // determinism: same input -> identical output regardless of partitioning
    val again = Multimodal.decodeImages(media.repartition(7).as[MediaRow])
      .collect().map(f => f.media_id -> f).toMap
    feats.foreach(f => assert(again(f.media_id) === f))
  }

  test("resize plan fits the target box and preserves aspect ordering") {
    Multimodal.resizePlan(media, maxSide = 32).collect().foreach { r =>
      val (w, h) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(w <= 32 && h <= 32 && w >= 1 && h >= 1)
      assert((r.getAs[Int]("width") >= r.getAs[Int]("height")) == (w >= h))
    }
  }

  test("frame sampling covers the payload with 256-byte windows") {
    val frames = Multimodal.sampleFrames(media, stride = 1)
    val byMedia = frames.groupBy("media_id")
      .agg(count(lit(1)).as("n"), max("byte_offset").as("last"))
      .join(media.select(col("media_id"), octet_length(col("payload")).as("len")), "media_id")
      .collect()
    assert(byMedia.nonEmpty)
    byMedia.foreach { r =>
      val (n, last, len) = (r.getAs[Long]("n"), r.getAs[Int]("last"), r.getAs[Int]("len"))
      assert(n === (len - 1) / 256 + 1) // ceil(len/256) windows
      assert(last < len)
    }
  }

  test("m04 binaryFile ingest: partition discovery supplies doc_id and prunes by it") {
    graft.queries.Media.defs("m04_binary_ingest")(spark, sf001).collect() // writes the export
    val one = spark.read.format("binaryFile").option("pathGlobFilter", "*.txt")
      .load(s"/tmp/graft_io/bin_docs_${graft.queries.Dedup.dirKey(sf001)}")
      .filter(col("doc_id") === 3)
    assert(one.count() === 1)
    // the doc_id predicate must be a directory-level partition filter,
    // never a content read + post-filter
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(doc_id"), s"expected partition filter in:\n$scan")
  }
}
