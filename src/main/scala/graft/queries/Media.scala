package graft.queries

import graft.Tables
import graft.multimodal.{MediaRow, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal surface, fully SQL-mirrored: m01 covers the metadata
  * catalog, m02 the mapPartitions decode path (the deterministic fake
  * codec's byte arithmetic is reproduced in DuckDB over `ord()` of the
  * ASCII payload — cycles of the byte list, partial-prefix sums), m03 the
  * resize plan and binary frame sampling. */
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
    },

    // Raw-file ingestion via the binaryFile source — the path by which
    // real image/audio corpora enter the engine (one file per asset on a
    // shared store, listed and read distributed; partition-directory
    // discovery supplies the asset id without touching file contents).
    // A bounded 50-doc probe set is exported one-text-file-per-doc
    // (doc_id=N/part-*.txt via partitionBy — the corpus is single-line
    // ASCII, TablesSpec guards that), then re-ingested as opaque bytes:
    // per-file byte length + md5 digest against the source-of-truth text.
    // At 100 TB the listing is the driver-side cost; maxFilesPerTrigger /
    // streaming ingest bounds it per batch.
    "m04_binary_ingest" -> { (s, dir) =>
      // per-data-dir path: the write-then-read races a concurrent process
      // verifying a DIFFERENT dataset if the export root is shared
      val path = s"/tmp/graft_io/bin_docs_${Dedup.dirKey(dir)}"
      Tables.documents(s, dir).filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text"))
        .repartition(col("doc_id"))
        .write.mode("overwrite").partitionBy("doc_id").text(path)
      s.read.format("binaryFile").option("pathGlobFilter", "*.txt").load(path)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("length").as("n_bytes"),
          md5(col("content")).as("content_md5"))
        .orderBy("doc_id")
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
        |FROM documents ORDER BY media_id""".stripMargin,

    // Fake-codec mirror: pixel i = payload byte (i mod len); the mean is
    // (full cycles) * sum(bytes) + sum of the partial prefix, over n_pixels.
    // Text is ASCII in this corpus, so ord(char) == payload byte.
    "m02_image_features" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id, text,
        |    CAST((16 + n_chars % 64) * (16 + (n_chars * 7) % 64) AS BIGINT) AS np,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS len
        |  FROM documents WHERE doc_id % 2 = 0),
        |b AS (
        |  SELECT media_id, text, np, len,
        |    list_transform(range(1, len + 1), i -> ord(text[i])) AS bytes
        |  FROM img)
        |SELECT media_id,
        |  CAST(np AS INT) AS n_pixels,
        |  round(CASE WHEN len = 0 THEN 0.0::DOUBLE ELSE
        |    ((np // len) * COALESCE(list_sum(bytes), 0)
        |     + COALESCE(list_sum(list_slice(bytes, 1, np % len)), 0))::DOUBLE / np END,
        |    6) AS mean_intensity,
        |  CAST(CASE WHEN len = 0 THEN 0
        |       WHEN np >= len THEN list_max(bytes)
        |       ELSE list_max(list_slice(bytes, 1, np)) END AS INT) AS max_intensity,
        |  md5(text) AS payload_digest
        |FROM b ORDER BY media_id""".stripMargin,

    "m03_resize_and_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(16 + n_chars % 64 AS INT) AS w,
        |    CAST(16 + (n_chars * 7) % 64 AS INT) AS h,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS len
        |  FROM documents),
        |r AS (
        |  SELECT media_id, 'resize' AS op,
        |    CAST(greatest(floor(w * least(1.0::DOUBLE, 32.0 / greatest(w, h))), 1) AS BIGINT) AS v1,
        |    CAST(greatest(floor(h * least(1.0::DOUBLE, 32.0 / greatest(w, h))), 1) AS BIGINT) AS v2
        |  FROM m WHERE media_id % 2 = 0),
        |f AS (
        |  SELECT media_id, 'frames' AS op,
        |    greatest(CAST(floor((len - 1) / 256.0) AS BIGINT), 0) + 1 AS v1,
        |    greatest(CAST(floor((len - 1) / 256.0) AS BIGINT), 0) * 256 AS v2
        |  FROM m WHERE media_id % 2 = 1)
        |SELECT * FROM r UNION ALL SELECT * FROM f
        |ORDER BY media_id, op""".stripMargin,

    // The text exporter writes UTF-8 bytes + one trailing newline per
    // row; the corpus is single-line ASCII, so bytes = strlen + 1 and the
    // digest is md5(text || \n).
    "m04_binary_ingest" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(strlen(text) + 1 AS BIGINT) AS n_bytes,
        |  md5(text || chr(10)) AS content_md5
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin
  )
}
