package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A media row: opaque binary payload + typed metadata. At 100 TB this is
  * the storage schema for images/audio/video in parquet — payloads as
  * `binary` (or object-store pointers), metadata as first-class columns so
  * pruning/filtering never touches the bytes. */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                    width: Int, height: Int, sample_rate: Int, duration_ms: Int)

/** Features produced by the (stubbed) image decode. */
case class ImageFeatures(media_id: Long, n_pixels: Int, mean_intensity: Double,
                         max_intensity: Int, payload_digest: String)

/** Multimodal-column plumbing: schema, partition-wise decode, feature
  * extraction, resize planning, frame sampling.
  *
  * The decode itself is a STUB — image/audio codecs are not available in
  * this environment — replaced by a deterministic fake
  * ([[Multimodal.FakeCodec]]). Everything around it is real and load-
  * bearing: the binary+metadata schema, the `Dataset.mapPartitions`
  * execution shape (ONE codec initialization per partition, streaming
  * iterator — never materializing a partition in memory), and the typed
  * encoder boundary. Swapping `FakeCodec` for a JNI/javacv codec changes
  * no plan shape.
  */
object Multimodal {

  /** Deterministic stand-in for a real image codec. Production: replace
    * `pixels` with an actual decoder call; the per-partition lifecycle
    * (expensive init amortized across the partition's rows) is the part
    * this class exists to exercise. */
  final class FakeCodec {
    FakeCodec.initCount.incrementAndGet()
    private val md = java.security.MessageDigest.getInstance("MD5")

    /** Fake decode: pixel i is byte (i mod len) of the payload, unsigned.
      * An empty payload decodes to zero pixels (a real codec would reject
      * the frame) — guards the mod-by-zero on empty documents. */
    def pixels(payload: Array[Byte], n: Int): Iterator[Int] =
      if (payload.isEmpty) Iterator.empty
      else Iterator.range(0, n).map(i => payload(i % payload.length) & 0xff)

    def digest(payload: Array[Byte]): String =
      md.digest(payload).map("%02x".format(_)).mkString
  }
  object FakeCodec {
    /** Test hook: how many codec instances were constructed. */
    val initCount = new java.util.concurrent.atomic.AtomicInteger(0)
  }

  /** Build the media table from the documents corpus: deterministic fake
    * payloads (UTF-8 text bytes) + metadata derived from n_chars. */
  def mediaCatalog(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (lit(16) + col("n_chars") % 64).cast("int").as("width"),
      (lit(16) + (col("n_chars") * 7) % 64).cast("int").as("height"),
      (lit(8000) + col("n_chars") % 8000).cast("int").as("sample_rate"),
      (octet_length(encode(col("text"), "UTF-8")) * 4).cast("int").as("duration_ms"))

  /** Decode + feature-extract every image row: one codec per partition,
    * streaming map over the iterator (constant memory per task). */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      lazy val codec = new FakeCodec // constructed once per non-empty partition
      rows.filter(_.kind == "image").map { m =>
        val n = m.width * m.height
        var sum = 0L; var max = 0
        codec.pixels(m.payload, n).foreach { p => sum += p; if (p > max) max = p }
        ImageFeatures(m.media_id, n, sum.toDouble / n, max, codec.digest(m.payload))
      }
    }
  }

  /** Resize plan: pure metadata math (no byte touching) — target box
    * fit preserving aspect ratio, plus the scale factor applied. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.filter(col("kind") === "image")
      .withColumn("scale", least(lit(1.0),
        lit(maxSide) / greatest(col("width"), col("height")).cast("double")))
      .select(col("media_id"), col("width"), col("height"),
        round(col("scale"), 6).as("scale"),
        greatest(floor(col("width") * col("scale")), lit(1)).cast("int").as("out_w"),
        greatest(floor(col("height") * col("scale")), lit(1)).cast("int").as("out_h"))

  /** Frame sampling for audio rows: every `stride`-th 256-byte window of
    * the payload, keyed by byte offset, digested for downstream dedup.
    * All column ops — explode + binary substring stay in codegen. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "audio")
      .withColumn("frame_idx", explode(expr(
        s"sequence(0, greatest(cast(floor((octet_length(payload) - 1) / ${256 * stride}) as int), 0))")))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * (256 * stride)).as("byte_offset"),
        md5(expr(s"substring(payload, frame_idx * ${256 * stride} + 1, 256)")).as("frame_digest"))
}
