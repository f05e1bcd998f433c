package graft.queries

import graft.Tables
import graft.ext.Pipeline._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib Pipeline thin-slice query (SURVEY §2.13; reference
  * mllib/.../ml/Pipeline.scala): a fitted, reusable
  * tokenize -> hashingTF -> idf -> normalize pipeline over documents.
  *
  * The fit/transform SPLIT is the point and is visible in the result: the
  * pipeline is fitted on the doc_id < 250 training slice only (a
  * FIXED-SIZE training set at any corpus scale — the idf weights are
  * learned parameters, not corpus-coupled state), then the fitted model
  * transforms the WHOLE corpus, exactly how a production curation job
  * trains once and applies everywhere. The oracle learns the same weights
  * from the same slice in SQL, so a fit that accidentally saw the full
  * corpus would hash-mismatch.
  */
object Ml {

  private val NumFeatures = 32

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s10_ml_pipeline" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pipe = new Chain(Seq(
        Tokenizer("text", "toks"),
        HashingTF("toks", "tf", NumFeatures),
        InverseDocFreq("tf", "tfidf", NumFeatures),
        L2Normalizer("tfidf", "nv")))
      val model = pipe.fit(docs.filter(col("doc_id") < 250))
      model.transform(docs)
        .select(col("doc_id"),
          (array_position(col("nv"), array_max(col("nv"))) - 1).as("top_feature"),
          round(array_max(col("nv")), 6).as("top_weight"),
          expr("cast(size(filter(tf, x -> x > 0)) as bigint)").as("n_active"))
        .orderBy("doc_id")
    }
  )

  val oracles: Map[String, String] = Map(
    // Unrolls the same pipeline: train-slice df counts -> smoothed
    // reciprocal idf -> whole-corpus tf -> rescale -> L2 -> argmax (first
    // index on ties, like array_position). COALESCE(toks, []) pins the
    // NULL-text parity: Spark's explode drops the row -> zero tf vector,
    // so the oracle must produce zeros too, not NULL-poisoned lists.
    "s10_ml_pipeline" ->
      s"""WITH tokall AS (
         |  SELECT doc_id,
         |    COALESCE(list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0),
         |             []) toks
         |  FROM documents),
         |idxall AS (
         |  SELECT doc_id, list_transform(toks,
         |    t -> (ord(t[1]) * 97 + ord(t[len(t)]) * 31
         |          + ord(t[(len(t) + 1) // 2]) * 13 + len(t) * 7) % $NumFeatures) idxs
         |  FROM tokall),
         |dfreq AS (
         |  SELECT j, count(*) dfn FROM (
         |    SELECT DISTINCT doc_id, unnest(idxs) j FROM idxall WHERE doc_id < 250)
         |  GROUP BY j),
         |ntrain AS (SELECT count(*) n FROM documents WHERE doc_id < 250),
         |idf AS (
         |  SELECT list((ntrain.n + 1)::DOUBLE / (COALESCE(d.dfn, 0) + 1)
         |    ORDER BY jj.j) ws
         |  FROM range(0, $NumFeatures) jj(j)
         |  LEFT JOIN dfreq d ON d.j = jj.j CROSS JOIN ntrain),
         |tf AS (
         |  SELECT doc_id, list_transform(range(0, $NumFeatures),
         |    j -> len(list_filter(idxs, x -> x = j))::DOUBLE) v
         |  FROM idxall),
         |tv AS (
         |  SELECT doc_id, v,
         |    list_transform(range(1, $NumFeatures + 1), j -> v[j] * idf.ws[j]) w
         |  FROM tf, idf),
         |nv AS (
         |  SELECT doc_id, v,
         |    list_transform(w, x -> CASE WHEN nr = 0.0 THEN 0.0 ELSE x / nr END) nv
         |  FROM (SELECT doc_id, v, w,
         |          sqrt(list_sum(list_transform(w, x -> x * x))) nr FROM tv))
         |SELECT doc_id,
         |  CAST(list_position(nv, list_max(nv)) - 1 AS BIGINT) AS top_feature,
         |  round(list_max(nv), 6) AS top_weight,
         |  CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_active
         |FROM nv ORDER BY doc_id""".stripMargin
  )
}
