package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib Pipeline thin-slice (reference mllib/src/main/scala/org/apache/
  * spark/ml/Pipeline.scala:25 — a Pipeline IS an Estimator[PipelineModel]
  * whose fit() walks the stages, transforming the running frame and
  * fitting each Estimator on it; Transformer.scala:35 / Estimator.scala:37
  * define the abstract pair). Same contract re-expressed over plain
  * DataFrames: fit and transform are SEPARATE, the fitted model is a
  * reusable Transformer chain, and a model fitted on one frame transforms
  * any other frame with the SAME learned parameters (the train/apply split
  * a production curation pipeline needs).
  *
  * Everything a stage computes is a Catalyst expression (HOFs over token /
  * feature arrays — codegen'd, no UDFs); the only driver-side state is the
  * fitted parameter vector itself (numFeatures doubles), which is the
  * definition of a fitted model, not a scale concern.
  */
object Pipeline {

  /** Reference ml/PipelineStage (Pipeline.scala:35). */
  sealed trait PipelineStage extends Serializable

  /** Reference ml/Transformer.scala:35 — DataFrame in, DataFrame out. */
  trait Transformer extends PipelineStage {
    def transform(df: DataFrame): DataFrame
  }

  /** Reference ml/Estimator.scala:37 — learns a Transformer from data. */
  trait Estimator extends PipelineStage {
    def fit(df: DataFrame): Transformer
  }

  /** Reference ml/Pipeline.scala:96 fit(): each Transformer stage
    * transforms the running frame; each Estimator stage is fitted ON the
    * running frame and its model then transforms it — so a downstream
    * estimator sees upstream features exactly as the final model will
    * produce them. */
  final class Chain(stages: Seq[PipelineStage]) extends Estimator {
    def fit(df: DataFrame): Model = {
      var cur = df
      val fitted = stages.map {
        case t: Transformer => cur = t.transform(cur); t
        case e: Estimator   => val m = e.fit(cur); cur = m.transform(cur); m
      }
      new Model(fitted)
    }
  }

  /** Reference ml/PipelineModel (Pipeline.scala:163): the fitted,
    * reusable artifact — a pure Transformer chain. */
  final class Model(val stages: Seq[Transformer]) extends Transformer {
    def transform(df: DataFrame): DataFrame =
      stages.foldLeft(df)((d, t) => t.transform(d))

    /** Persist the fitted model (reference ml/util/MLWritable — 1.6's
      * Pipeline/PipelineModel are saveable artifacts) as ONE parquet table
      * of stage parameter rows: (ordinal, kind, cols, numFeatures, idCol,
      * weights). Parquet rather than JSON text so the fitted IDF weights
      * round-trip BIT-EXACT — a decimal-printed double can lose the last
      * ulp, and the s10 oracle equality is exact, not approximate. The
      * write installs via [[IndexStore.atomically]], so a concurrent
      * load sees the previous complete artifact or the new one, never a
      * torn one. */
    def save(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
      import spark.implicits._
      val rows = stages.zipWithIndex.map {
        case (Tokenizer(in, out), i) =>
          (i, "tokenizer", in, out, None: Option[Int], None: Option[String], None: Option[Seq[Double]])
        case (HashingTF(in, out, nf, id), i) =>
          (i, "hashing_tf", in, out, Some(nf), Some(id), None)
        case (IdfModel(in, out, ws), i) =>
          (i, "idf_model", in, out, None, None, Some(ws))
        case (L2Normalizer(in, out), i) =>
          (i, "l2_normalizer", in, out, None, None, None)
        case (other, i) => throw new IllegalArgumentException(
          s"stage $i (${other.getClass.getName}) has no persistence mapping")
      }.toDF("ordinal", "kind", "input_col", "output_col",
        "num_features", "id_col", "weights")
      IndexStore.atomically(spark, path) { tmp =>
        rows.coalesce(1).write.mode("overwrite").parquet(tmp)
      }
    }
  }

  object Model {
    /** Rebuild a fitted model from [[Model.save]]'s artifact — the
      * train-once / apply-anywhere half of the persistence contract. The
      * collect is bounded by the stage count (a handful of rows). */
    def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
      val stages = spark.read.parquet(path).orderBy("ordinal").collect().map { r =>
        val (in, out) = (r.getAs[String]("input_col"), r.getAs[String]("output_col"))
        r.getAs[String]("kind") match {
          case "tokenizer"     => Tokenizer(in, out)
          case "hashing_tf"    => HashingTF(in, out,
            r.getAs[Int]("num_features"), r.getAs[String]("id_col"))
          case "idf_model"     =>
            IdfModel(in, out, r.getSeq[Double](r.fieldIndex("weights")).toIndexedSeq)
          case "l2_normalizer" => L2Normalizer(in, out)
          case k => throw new IllegalArgumentException(s"unknown stage kind '$k' in $path")
        }
      }
      new Model(stages.toSeq)
    }
  }

  /** Whitespace regex tokenizer (reference ml/feature/RegexTokenizer) —
    * split + drop empties, one codegen'd projection. */
  final case class Tokenizer(inputCol: String, outputCol: String) extends Transformer {
    def transform(df: DataFrame): DataFrame =
      df.withColumn(outputCol,
        expr(s"filter(split($inputCol, '\\\\s+'), t -> length(t) > 0)"))
  }

  /** Feature hasher + term-frequency vector (reference ml/feature/
    * HashingTF): token -> bucket by a weighted (first, middle, last,
    * length) codepoint mix mod `numFeatures` — deliberately NOT murmur3
    * (the reference's hash), so the DuckDB oracle can compute the
    * identical bucket with portable SQL; the pipeline mechanics
    * (fixed-width indexing by hash, collisions folded into the same
    * bucket) are the same. Output: dense array<double> of counts, length
    * `numFeatures`.
    *
    * Execution shape: explode tokens -> codegen'd scalar hash -> two-level
    * hash aggregate (per (id, bucket) count with map-side combine, then
    * per-id map assembly) -> left join back. Two shuffles, but every
    * per-token op is whole-stage codegen and the work is spread across
    * partitions. The obvious per-ROW formulation (HOF lambdas over the
    * token array) keeps the plan shuffle-free but runs INTERPRETED on
    * however many partitions the source file has — a single-file corpus
    * put the entire pipeline on one core (measured 27 s at sf0.1, vs
    * ~2 s this shape). Requires `idCol` to join the counts back — the
    * grouping key a distributed TF needs anyway — and `idCol` values MUST
    * be unique: two rows sharing an id would each silently receive the
    * MERGED count vector of both token arrays (the join fans the grouped
    * counts back out). Dedup upstream if ids can repeat; the check is not
    * done here because it would cost the very shuffle this stage already
    * pays once. Rows with no tokens get the zero vector. */
  final case class HashingTF(inputCol: String, outputCol: String,
                             numFeatures: Int,
                             idCol: String = "doc_id") extends Transformer {
    def transform(df: DataFrame): DataFrame = {
      val bucket = "(ascii(substring(__t, 1, 1)) * 97L + " +
        "ascii(substring(__t, length(__t), 1)) * 31L + " +
        "ascii(substring(__t, (length(__t) + 1) div 2, 1)) * 13L + " +
        s"length(__t) * 7L) % $numFeatures"
      val counts = df
        .select(col(idCol), explode(col(inputCol)).as("__t"))
        .select(col(idCol), expr(bucket).as("__j"))
        .groupBy(idCol, "__j").agg(count(lit(1)).as("__c"))
        .groupBy(idCol)
        .agg(map_from_entries(collect_list(struct(col("__j"), col("__c")))).as("__m"))
      df.join(counts, Seq(idCol), "left")
        .withColumn(outputCol,
          expr(s"transform(sequence(0, ${numFeatures - 1}), " +
            "j -> CAST(coalesce(element_at(__m, CAST(j AS BIGINT)), 0L) AS DOUBLE))"))
        .drop("__m")
    }
  }

  /** Inverse-document-frequency ESTIMATOR (reference ml/feature/IDF.scala:
    * fit counts per-feature document frequency, the model rescales tf).
    * Weight j = (N + 1) / (df_j + 1) — the smoothed reciprocal frequency
    * WITHOUT the reference's log damping: every arithmetic op here
    * (integer ratio, multiply) is exactly rounded in IEEE-754, so the
    * fitted weights and the rescaled vectors are bit-identical across
    * engines and the oracle equality is exact rather than
    * last-ulp-of-libm-log lucky. The log is a monotone per-feature
    * reparameterization a production tuning pass would re-add.
    *
    * fit() runs ONE distributed pass (posexplode + count per feature) and
    * collects exactly `numFeatures` rows — the fitted parameter vector,
    * bounded by construction. */
  final case class InverseDocFreq(inputCol: String, outputCol: String,
                                  numFeatures: Int) extends Estimator {
    def fit(df: DataFrame): IdfModel = {
      val n = df.count()
      val dfreq = df
        .select(posexplode(col(inputCol)).as(Seq("j", "x")))
        .filter(col("x") > 0)
        .groupBy("j").agg(count(lit(1)).as("df"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      IdfModel(inputCol, outputCol,
        (0 until numFeatures).map(j => (n + 1).toDouble / (dfreq.getOrElse(j, 0L) + 1).toDouble))
    }
  }

  /** The fitted IDF artifact: its weights are data, inspectable and
    * reusable on any frame with the same feature width. */
  final case class IdfModel(inputCol: String, outputCol: String,
                            weights: Seq[Double]) extends Transformer {
    def transform(df: DataFrame): DataFrame =
      df.withColumn(outputCol,
        zip_with(col(inputCol), array(weights.map(lit): _*), (x, w) => x * w))
  }

  /** L2 normalizer (reference ml/feature/Normalizer, p = 2): zero vectors
    * stay zero (no NaN). */
  final case class L2Normalizer(inputCol: String, outputCol: String) extends Transformer {
    def transform(df: DataFrame): DataFrame =
      df.withColumn("__nrm",
        expr(s"sqrt(aggregate($inputCol, 0.0D, (a, x) -> a + x * x))"))
        .withColumn(outputCol,
          expr(s"transform($inputCol, x -> CASE WHEN __nrm = 0.0 THEN 0.0 ELSE x / __nrm END)"))
        .drop("__nrm")
  }
}
