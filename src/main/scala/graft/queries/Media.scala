package graft.queries

import graft.Tables
import graft.multimodal.{MediaRow, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal surface. m01 is fully SQL-mirrored; m02/m03 exercise the
  * mapPartitions decode path and binary frame slicing, whose logic lives in
  * Scala lambdas — the driver records rows-only checks for them. */
object Media {

  private def media(s: SparkSession, dir: String) =
    Multimodal.mediaCatalog(Tables.documents(s, dir))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata catalog over binary payloads (payload bytes not emitted).
    "m01_media_catalog" -> { (s, dir) =>
      media(s, dir)
        .select(col("media_id"), col("kind"),
          octet_length(col("payload")).as("payload_len"),
          col("width"), col("height"), col("sample_rate"), col("duration_ms"))
        .orderBy("media_id")
    },

    // Partition-wise stubbed decode -> per-image features.
    "m02_image_features" -> { (s, dir) =>
      import s.implicits._
      Multimodal.decodeImages(media(s, dir).as[MediaRow])
        .toDF().withColumn("mean_intensity", round(col("mean_intensity"), 6))
        .orderBy("media_id")
    },

    // Resize planning (metadata-only) joined with frame sampling counts.
    "m03_resize_and_frames" -> { (s, dir) =>
      val m = media(s, dir)
      val resize = Multimodal.resizePlan(m, maxSide = 32)
        .select(col("media_id"), lit("resize").as("op"),
          col("out_w").cast("long").as("v1"), col("out_h").cast("long").as("v2"))
      val frames = Multimodal.sampleFrames(m, stride = 1)
        .groupBy("media_id")
        .agg(count(lit(1)).as("v1"),
          max(col("byte_offset")).cast("long").as("v2"))
        .select(col("media_id"), lit("frames").as("op"), col("v1"), col("v2"))
      resize.unionByName(frames).orderBy("media_id", "op")
    }
  )

  val oracles: Map[String, String] = Map(
    "m01_media_catalog" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |  CAST(octet_length(encode(text)) AS INT) AS payload_len,
        |  CAST(16 + n_chars % 64 AS INT) AS width,
        |  CAST(16 + (n_chars * 7) % 64 AS INT) AS height,
        |  CAST(8000 + n_chars % 8000 AS INT) AS sample_rate,
        |  CAST(octet_length(encode(text)) * 4 AS INT) AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
