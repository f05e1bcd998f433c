package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader/writer surface (SURVEY §2.1: DataFrameReader/DataFrameWriter —
  * json/csv/text/parquet read+write, partitioned writes, save modes) plus
  * the temp-view + spark.sql entry point (§2.11).
  *
  * Each query does a real write to scratch space and reads its own output
  * back, then reduces to an aggregate the DuckDB oracle reproduces from
  * the ORIGINAL parquet — so the round trip itself is what's being
  * verified. Schemas are passed explicitly on read (json/csv carry no
  * types), which is also the 100 TB posture: schema-on-read inference over
  * a lake is a full extra scan you never want.
  */
object IO {

  private val scratch = "/tmp/graft_io"

  /** The constant PMML scaffolding (mirrors KMeansPMMLModelExport's
    * structure: header, 2-field DataDictionary, centerBased
    * ClusteringModel with absDiff fields) and the per-cluster fragment —
    * shared verbatim between the Spark query and the oracle, so document
    * equality gates the full serialization. */
  val pmmlHead: String =
    """<PMML version="4.2"><Header description="k-means clustering"/>""" +
      """<DataDictionary numberOfFields="2">""" +
      """<DataField name="field_0" optype="continuous" dataType="double"/>""" +
      """<DataField name="field_1" optype="continuous" dataType="double"/>""" +
      """</DataDictionary>""" +
      """<ClusteringModel modelName="k-means" functionName="clustering" modelClass="centerBased" numberOfClusters="3">""" +
      """<ComparisonMeasure kind="distance"><squaredEuclidean/></ComparisonMeasure>""" +
      """<ClusteringField field="field_0" compareFunction="absDiff"/>""" +
      """<ClusteringField field="field_1" compareFunction="absDiff"/>"""
  val pmmlTail: String = "</ClusteringModel></PMML>"
  val pmmlClusterFrag: String =
    "concat('<Cluster name=\"cluster_', CAST(cluster AS STRING), " +
      "'\"><Array n=\"2\" type=\"real\">', CAST(c1 AS STRING), ' ', " +
      "CAST(c2 AS STRING), '</Array></Cluster>')"

  /** GLM PMML scaffolding (reference mllib/pmml/export/
    * GeneralizedLinearPMMLModelExport.scala:39 — field_i continuous
    * DataDictionary plus a target field, active/target MiningSchema, one
    * RegressionTable with a NumericPredictor per weight; and
    * BinaryClassificationPMMLModelExport.scala:40 — functionName
    * classification, normalizationMethod logit, a targetCategory="1"
    * table carrying the weights and a predictor-free targetCategory="0"
    * table whose intercept is -ln(1/threshold - 1), :48-:56). All
    * fragments shared verbatim with the oracle so DOCUMENT equality is
    * the gate. Coefficients are emitted in the repo's integer
    * quantization units (micro weights, milli ln-intercepts) — a
    * DECLARED deviation from the reference's raw-double JAXB print,
    * the repo-wide cross-engine determinism policy. */
  private val pmmlGlmDict2: String =
    """<DataDictionary numberOfFields="3">""" +
      """<DataField name="field_0" optype="continuous" dataType="double"/>""" +
      """<DataField name="field_1" optype="continuous" dataType="double"/>"""
  private val pmmlGlmMining: String =
    """<MiningSchema><MiningField name="field_0" usageType="active"/>""" +
      """<MiningField name="field_1" usageType="active"/>""" +
      """<MiningField name="target" usageType="target"/></MiningSchema>"""
  val pmmlLinHead: String =
    """<PMML version="4.2"><Header description="linear regression"/>""" +
      pmmlGlmDict2 +
      """<DataField name="target" optype="continuous" dataType="double"/></DataDictionary>""" +
      """<RegressionModel functionName="regression" modelName="linear regression">""" +
      pmmlGlmMining
  val pmmlLogitHead: String =
    """<PMML version="4.2"><Header description="logistic regression"/>""" +
      pmmlGlmDict2 +
      """<DataField name="target" optype="categorical" dataType="string"/></DataDictionary>""" +
      """<RegressionModel functionName="classification" modelName="logistic regression" normalizationMethod="logit">""" +
      pmmlGlmMining
  val pmmlSvmHead: String =
    """<PMML version="4.2"><Header description="linear SVM"/>""" +
      pmmlGlmDict2 +
      """<DataField name="target" optype="categorical" dataType="string"/></DataDictionary>""" +
      """<RegressionModel functionName="classification" modelName="linear SVM" normalizationMethod="none">""" +
      pmmlGlmMining
  val pmmlGlmTail: String = "</RegressionModel></PMML>"

  /** The SVM NO table: interceptNO is the model's 0.0 threshold VERBATIM
    * (BinaryClassificationPMMLModelExport.scala:50 only inverts under
    * LOGIT normalization; under NONE the threshold passes through). */
  val pmmlSvmNoTableFrag: String =
    """'<RegressionTable intercept="0" targetCategory="0"/>'"""

  /** SQL expression assembling a RegressionTable element over intercept /
    * coefficient columns; `targetCat` empty for the regression doc. */
  def pmmlRegTable(icol: String, w1col: String, w2col: String,
                   targetCat: String): String = {
    val cat = if (targetCat.isEmpty) "" else s""" targetCategory="$targetCat""""
    s"""concat('<RegressionTable intercept="', CAST($icol AS STRING), '"$cat>', """ +
      s"""'<NumericPredictor name="field_0" coefficient="', CAST($w1col AS STRING), '"/>', """ +
      s"""'<NumericPredictor name="field_1" coefficient="', CAST($w2col AS STRING), '"/>', """ +
      "'</RegressionTable>')"
  }

  /** The predictor-free NO table (threshold 0.7 through the reference's
    * logit inversion) — one constant expression both engines evaluate on
    * identical doubles. */
  val pmmlNoTableFrag: String =
    """concat('<RegressionTable intercept="', """ +
      "CAST(CAST(round(-ln((CAST(1.0 AS DOUBLE) / CAST(0.7 AS DOUBLE)) - CAST(1.0 AS DOUBLE)) * 1000.0) AS BIGINT) AS STRING), " +
      """'" targetCategory="0"/>')"""

  /** Class-conditional logit "model" sufficient stats -> quantized
    * weights, parameterized on the integer-div token (Spark DIV, DuckDB
    * //). Weights are EXACT integers (mean-difference per feature in
    * micro units — sums and counts are BIGINT throughout; the
    * multiply-first form keeps exactness with ~9e12-row headroom at
    * price-scale features); the intercept is the milli-quantized prior
    * log-odds ln(n_pos/n_neg). */
  def logitWeightExprs(div: String): Seq[(String, String)] = Seq(
    "w0m" -> "CAST(round(ln(CAST(np AS DOUBLE) / CAST(nn AS DOUBLE)) * 1000.0) AS BIGINT)",
    "w1m" -> s"CAST(((s1p * 1000000) $div np) - ((s1n * 1000000) $div nn) AS BIGINT)",
    "w2m" -> s"CAST(((s2p * 1000000) $div np) - ((s2n * 1000000) $div nn) AS BIGINT)")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // JSON write -> schema'd read -> aggregate.
    "i01_json_roundtrip" -> { (s, dir) =>
      val path = s"$scratch/json_orders"
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .write.mode(SaveMode.Overwrite).json(path)
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType)))
      s.read.schema(schema).json(path)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
        .orderBy("o_orderstatus")
    },

    // CSV (header) write -> schema'd read -> aggregate.
    "i02_csv_roundtrip" -> { (s, dir) =>
      val path = s"$scratch/csv_customer"
      Tables.customer(s, dir)
        .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
        .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
      val schema = StructType(Seq(
        StructField("c_custkey", LongType), StructField("c_nationkey", LongType),
        StructField("c_mktsegment", StringType), StructField("c_acctbal", DoubleType)))
      s.read.schema(schema).option("header", "true").csv(path)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(round(c_acctbal * 100) as bigint)")).as("bal_cents"))
        .orderBy("c_mktsegment")
    },

    // text sink/source: one string column named `value`.
    "i03_text_roundtrip" -> { (s, dir) =>
      val path = s"$scratch/text_docs"
      Tables.documents(s, dir).select(col("text"))
        .write.mode(SaveMode.Overwrite).text(path)
      s.read.text(path)
        .select(size(split(col("value"), " ")).as("n_tokens"))
        .groupBy("n_tokens").agg(count(lit(1)).as("n_docs"))
        .orderBy("n_tokens")
    },

    // Hive-style partitioned parquet write; read back ONE partition — the
    // filter is satisfied by directory pruning, not data skipping.
    "i04_partitioned_write" -> { (s, dir) =>
      val path = s"$scratch/orders_by_status"
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .write.mode(SaveMode.Overwrite).partitionBy("o_orderstatus").parquet(path)
      s.read.parquet(path)
        .filter(col("o_orderstatus") === "F")
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
    },

    // Dynamic partition overwrite — the incremental-ETL write mode: with
    // partitionOverwriteMode=dynamic, an overwrite replaces ONLY the
    // partitions present in the incoming frame (here status 'F', with
    // cents bumped +100), leaving 'O'/'P' untouched. Static mode would
    // wipe the whole table first — the oracle's untouched O/P rows would
    // then be missing, so the row-level compare proves the mode.
    "i12_dynamic_partition_overwrite" -> { (s, dir) =>
      val path = s"$scratch/orders_dyn_overwrite"
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("cents"),
          col("o_orderstatus"))
      base.write.mode(SaveMode.Overwrite).partitionBy("o_orderstatus").parquet(path)
      val saved = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        base.filter(col("o_orderstatus") === "F")
          .withColumn("cents", col("cents") + 100L)
          .write.mode(SaveMode.Overwrite).partitionBy("o_orderstatus").parquet(path)
      } finally saved match {
        case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      s.read.parquet(path)
        .select("o_orderkey", "cents", "o_orderstatus")
        .orderBy("o_orderkey")
    },

    // Parquet schema evolution: two generations of a dataset written with
    // DIFFERENT schemas (the second gains o_custkey — the additive drift
    // every long-lived ingestion accumulates), read back as ONE table via
    // mergeSchema. Old-generation rows surface NULL for the new column;
    // the oracle is the union with explicit NULL padding. At 100 TB this
    // is what lets a reader span years of layout history without a
    // rewrite (merge-on-read; footers are reconciled at planning time).
    "i13_schema_evolution" -> { (s, dir) =>
      val path = s"$scratch/orders_evolved"
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), expr("cast(round(o_totalprice * 100) as bigint)").as("cents"),
          col("o_custkey"))
      base.filter(col("o_orderkey") % 2 === 0).drop("o_custkey")
        .write.mode(SaveMode.Overwrite).parquet(s"$path/gen=1")
      base.filter(col("o_orderkey") % 2 =!= 0)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/gen=2")
      s.read.option("mergeSchema", "true").parquet(path)
        .select("o_orderkey", "cents", "o_custkey", "gen")
        .orderBy("o_orderkey")
    },

    // XML write -> schema'd read -> aggregate (the document-interchange
    // format Spark 4 ships natively; DuckDB can't read XML, so the oracle
    // reproduces the aggregate from the original table — the round trip
    // is what's verified). The read declares an explicit schema: XML
    // element order is not column order and inference would widen
    // p_size to BIGINT.
    "i14_xml_roundtrip" -> { (s, dir) =>
      val path = s"$scratch/xml_part"
      Tables.part(s, dir)
        .select("p_partkey", "p_brand", "p_size", "p_retailprice")
        .write.mode(SaveMode.Overwrite).option("rowTag", "part").format("xml").save(path)
      val schema = StructType(Seq(
        StructField("p_partkey", LongType), StructField("p_brand", StringType),
        StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType)))
      s.read.schema(schema).option("rowTag", "part").format("xml").load(path)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(col("p_size").cast("long")).as("total_size"),
          sum(expr("cast(round(p_retailprice * 100) as bigint)")).as("price_cents"))
        .orderBy("p_brand")
    },

    // ORC write -> read -> aggregate (columnar sibling of parquet; DuckDB
    // can't read ORC, so the oracle reproduces the aggregate from the
    // original table — the round trip is what's verified).
    "i06_orc_roundtrip" -> { (s, dir) =>
      val path = s"$scratch/orc_supplier"
      Tables.supplier(s, dir)
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .write.mode(SaveMode.Overwrite).orc(path)
      s.read.orc(path)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(round(s_acctbal * 100) as bigint)")).as("bal_cents"))
        .orderBy("s_nationkey")
    },

    // Temp view + pure-SQL entry point over it.
    "i05_sql_over_view" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT l_returnflag, count(*) AS n,
          |  sum(cast(round(l_extendedprice * 100) as bigint)) AS cents
          |FROM lineitem_v
          |WHERE l_quantity >= 10
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // JDBC write -> partitioned range read (4 key-range partitions, the
    // reference's JDBCRelation split model) -> aggregate, against embedded
    // Derby. Exact cents go through the database as BIGINT; the oracle
    // reproduces the aggregate from the original parquet, so the JDBC
    // round trip is what's verified. Derby reports stored identifiers in
    // its own case, so the final projection pins the exact output names.
    "i07_jdbc_roundtrip" -> { (s, dir) =>
      System.setProperty("derby.system.home", "/tmp/graft_derby")
      val url = "jdbc:derby:memory:graft_i07;create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"),
          expr("cast(round(s_acctbal * 100) as bigint)").as("bal_cents"))
        .write.mode(SaveMode.Overwrite).jdbc(url, "i07_supplier", props)
      s.read.jdbc(url, "i07_supplier", "s_suppkey",
          lowerBound = 1L, upperBound = 100000L, numPartitions = 4, props)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), sum("bal_cents").as("bal_cents"))
        .select(col("s_nationkey").as("s_nationkey"), col("n"), col("bal_cents"))
        .orderBy("s_nationkey")
    },

    // In-memory columnar cache scan (the reference's
    // InMemoryColumnarTableScan): the aggregate reads from a cache()'d
    // projection — an InMemoryTableScan, not a parquet scan (CatalogSpec
    // pins the plan) — and caching must be invisible in the result.
    "i08_cached_scan" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_linestatus"),
          expr("cast(round(l_discount * 100) as bigint)").as("disc_cents"))
        .cache()
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"), sum("disc_cents").as("disc_cents"))
        .orderBy("l_linestatus")
    },

    // SQL TRANSFORM through an external process (reference:
    // HIVE/execution/ScriptTransformation.scala): rows stream through
    // /bin/cat and come back as tab-split strings.
    "i09_script_transform" -> { (s, dir) =>
      Tables.nation(s, dir).createOrReplaceTempView("nation_i09")
      s.sql(
        """SELECT k AS n_nationkey, v AS n_name FROM (
          |  SELECT TRANSFORM (n_nationkey, n_name) USING 'cat' AS (k, v)
          |  FROM nation_i09)
          |ORDER BY CAST(k AS BIGINT)""".stripMargin)
    },

    // saveAsTable persists through the session catalog (reference:
    // CORE/DataFrameWriter.scala:220); SQL reads it back by table name.
    // Catalog persistence must be invisible in the result.
    "i10_save_as_table" -> { (s, dir) =>
      graft.ext.Scale.dropManagedTable(s, "i10_orders")
      Tables.orders(s, dir)
        .select(col("o_orderstatus"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
        .write.mode(SaveMode.Overwrite).saveAsTable("i10_orders")
      s.sql(
        """SELECT o_orderstatus, count(*) AS n, sum(cents) AS cents
          |FROM i10_orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },

    // Parquet compression codec matrix: the same rows written under
    // zstd / snappy / gzip and read back — the storage knob a 100 TB
    // table tunes (zstd for cold data, snappy for hot) must be invisible
    // in query results. Three single-codec writes, one unioned readback.
    // PMML model export (reference mllib/pmml/export/
    // KMeansPMMLModelExport.scala:36 populateKMeansPMML — DataDictionary
    // of field_i doubles, ClusteringModel modelClass=centerBased with
    // absDiff ClusteringFields and one <Cluster> per centroid carrying
    // the space-delimited center array; PMMLExportable.toPMML writes the
    // document). The exporter serializes whatever KMeansModel it is
    // handed; the model here is the one-M-step centroid table of the
    // deterministic o_orderkey % 3 partition (exact floor-div integer
    // means), so the whole document is engine-exact. The XML is written
    // to a text sink and read back — the gated value IS the exported
    // document.
    "i20_pmml_export" -> { (s, dir) =>
      val path = s"$scratch/pmml_kmeans"
      val cents = Tables.orders(s, dir)
        .selectExpr("CAST(o_orderkey % 3 AS BIGINT) AS cluster",
          "CAST(round(o_totalprice) AS BIGINT) AS x1",
          "CAST(o_custkey % 100 AS BIGINT) AS x2")
        .groupBy("cluster")
        .agg(expr("CAST(sum(x1) DIV count(*) AS BIGINT)").as("c1"),
          expr("CAST(sum(x2) DIV count(*) AS BIGINT)").as("c2"))
      cents
        .selectExpr("cluster", s"$pmmlClusterFrag AS frag")
        .agg(expr("array_join(transform(array_sort(collect_list(struct(cluster, frag))), s -> s.frag), '')").as("clusters"),
          count(lit(1)).as("n_clusters"))
        .selectExpr(s"concat('$pmmlHead', clusters, '$pmmlTail') AS xml",
          "n_clusters")
        .write.mode(SaveMode.Overwrite).json(path) // json: keeps (xml, n) typed
      s.read.schema(StructType(Seq(StructField("xml", StringType),
          StructField("n_clusters", LongType)))).json(path)
    },

    // GLM + binary-classification PMML export (reference mllib/pmml/
    // export/GeneralizedLinearPMMLModelExport.scala:39 and
    // BinaryClassificationPMMLModelExport.scala:40 — the two remaining
    // exporter families next to i20's k-means; PMMLModelExportFactory
    // .scala routes LinearRegression/Ridge/Lasso to the first and
    // LogisticRegression/SVM to the second — BOTH binary routes
    // exercised: logit normalization with the threshold inversion, and
    // the SVM leg with normalizationMethod="none" and the raw 0.0
    // threshold as the NO-table intercept). The exporters serialize
    // whatever model they are handed; the models here are engine-exact —
    // the linear row is the closed-form OLS fit of extendedprice ~
    // quantity + partkey-bucket (ext.Learn.olsFit2, micro-quantized
    // betas), the logistic row a class-conditional mean-difference
    // direction over order status with the prior log-odds intercept
    // (exact integer micro weights) and the reference's logit threshold
    // inversion (-ln(1/0.7 - 1)) as the targetCategory="0" intercept.
    // Both documents are written to a text-typed sink and read back —
    // the gated value IS the exported XML, so DataDictionary shape,
    // MiningSchema, RegressionTable/NumericPredictor structure and the
    // normalizationMethod path are all on the hash.
    "i23_pmml_glm_export" -> { (s, dir) =>
      val path = s"$scratch/pmml_glm"
      val lin = graft.ext.Learn.olsFit2(
          Tables.lineitem(s, dir).selectExpr(
            "CAST(round(l_quantity) AS BIGINT) AS x1",
            "CAST(l_partkey % 100 AS BIGINT) AS x2",
            "CAST(round(l_extendedprice) AS BIGINT) AS y"))
        .selectExpr(
          "CAST(round(b0 * 1000000.0) AS BIGINT) AS b0m",
          "CAST(round(b1 * 1000000.0) AS BIGINT) AS b1m",
          "CAST(round(b2 * 1000000.0) AS BIGINT) AS b2m")
        .selectExpr("'linear regression' AS model",
          s"concat('$pmmlLinHead', ${pmmlRegTable("b0m", "b1m", "b2m", "")}, '$pmmlGlmTail') AS xml",
          "CAST(2 AS BIGINT) AS n_predictors")
      val binWeights = Tables.orders(s, dir)
        .selectExpr("CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos",
          "CAST(round(o_totalprice) AS BIGINT) AS x1",
          "CAST(o_custkey % 100 AS BIGINT) AS x2")
        .agg(sum("pos").as("np"), sum(expr("1 - pos")).as("nn"),
          sum(expr("pos * x1")).as("s1p"), sum(expr("(1 - pos) * x1")).as("s1n"),
          sum(expr("pos * x2")).as("s2p"), sum(expr("(1 - pos) * x2")).as("s2n"))
        .selectExpr(logitWeightExprs("DIV").map { case (n, e) => s"$e AS $n" }: _*)
      val logit = binWeights
        .selectExpr("'logistic regression' AS model",
          s"concat('$pmmlLogitHead', ${pmmlRegTable("w0m", "w1m", "w2m", "1")}, " +
            s"$pmmlNoTableFrag, '$pmmlGlmTail') AS xml",
          "CAST(2 AS BIGINT) AS n_predictors")
      // the factory's third route: SVMModel through the SAME binary
      // exporter with normalizationMethod="none" and the raw 0.0
      // threshold as the NO-table intercept
      val svm = binWeights
        .selectExpr("'linear svm' AS model",
          s"concat('$pmmlSvmHead', ${pmmlRegTable("w0m", "w1m", "w2m", "1")}, " +
            s"$pmmlSvmNoTableFrag, '$pmmlGlmTail') AS xml",
          "CAST(2 AS BIGINT) AS n_predictors")
      lin.union(logit).union(svm)
        .write.mode(SaveMode.Overwrite).json(path)
      s.read.schema(StructType(Seq(StructField("model", StringType),
          StructField("xml", StringType), StructField("n_predictors", LongType))))
        .json(path)
        .orderBy("model")
    },

    // LIBSVM text roundtrip (reference mllib/util/MLUtils.scala:66
    // loadLibSVMFile / :252 saveAsLibSVMFile; the DataFrame source is
    // ml/source/libsvm/LibSVMRelation.scala). Write the reference's
    // exact line format — `label 1:v 2:v ...`, 1-based ASCENDING indices,
    // zero-valued features OMITTED (foreachActive's sparse-skip), labels
    // and values as double literals — plus a `#` comment line and a
    // blank line the loader must drop (:73). Read back as text and parse
    // fully relationally: split/explode/pivot-by-index with the line
    // string itself as the reassembly key (feature 1 embeds the row key,
    // so lines are unique). Reduces to a per-label aggregate the oracle
    // reproduces from the ORIGINAL parquet, so format + sparse-skip +
    // filter + 1-based indexing are all on the gated path. At 100 TB the
    // parse is one shuffle-free codegen projection per line; the
    // reassembly groupBy shuffles only (key, idx, value) triples.
    // wholeTextFiles (reference core SparkContext.scala:867 — one
    // (path, content) pair PER FILE, the small-files ingestion API the
    // 1.6 docs point at for per-document corpora): nations written as
    // one text file per region directory, read back whole, regions
    // recovered from the PATH and keys re-parsed from the CONTENT — so
    // the gate catches both a torn file and a mis-paired path. The
    // anti-pattern warning stands in reverse: at 100 TB this API is for
    // MANY SMALL files (each file must fit one task); big inputs belong
    // to the splittable line reader (i03).
    "i22_whole_text_files" -> { (s, dir) =>
      import s.implicits._
      val path = s"$scratch/wtf_nation"
      Tables.nation(s, dir)
        .selectExpr("concat(CAST(n_nationkey AS STRING), '|', n_name) AS value",
          "n_regionkey AS r")
        .repartition(col("r"))
        .write.mode(SaveMode.Overwrite).partitionBy("r").text(path)
      s.sparkContext.wholeTextFiles(s"$path/r=*")
        .toDF("fname", "content")
        .selectExpr(
          "CAST(regexp_extract(fname, 'r=([0-9]+)', 1) AS BIGINT) AS region",
          "content")
        .select(col("region"), explode(split(col("content"), "\n")).as("line"))
        .filter(length(col("line")) > 0)
        .selectExpr("region", "CAST(split(line, '\\\\|')[0] AS BIGINT) AS k")
        .groupBy("region")
        .agg(count(lit(1)).as("n_lines"), sum("k").as("sum_keys"))
        .orderBy("region")
    },

    // Sequence-file + object-file roundtrip (reference core RDD binary IO:
    // rdd/SequenceFileRDDFunctions.scala:88 saveAsSequenceFile /
    // SparkContext.scala:1145 sequenceFile with the implicit
    // Long -> LongWritable converters, and rdd/RDD.scala:1481
    // saveAsObjectFile / SparkContext.scala:1217 objectFile — the
    // Java-serialized block format). Both formats carry the same
    // (orderkey, cents) pairs; the gate compares per-bucket aggregates
    // from BOTH read paths against the original parquet, so either
    // roundtrip corrupting a row hash-mismatches. The .rdd hop off the
    // parquet-backed frame is the point here — this IS the RDD API
    // surface, not a relational operator.
    "i21_sequence_object_files" -> { (s, dir) =>
      import s.implicits._
      val seqPath = s"$scratch/seqfile_orders"
      val objPath = s"$scratch/objfile_orders"
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      Seq(seqPath, objPath).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val pairs = Tables.orders(s, dir)
        .selectExpr("o_orderkey", "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
        .as[(Long, Long)].rdd
      pairs.saveAsSequenceFile(seqPath)
      pairs.saveAsObjectFile(objPath)
      val seq = s.sparkContext.sequenceFile[Long, Long](seqPath)
        .toDF("o_orderkey", "cents")
        .groupBy(expr("o_orderkey % 10").as("bucket"))
        .agg(count(lit(1)).as("n_seq"), sum("cents").as("cents_seq"))
      val obj = s.sparkContext.objectFile[(Long, Long)](objPath)
        .toDF("o_orderkey", "cents")
        .groupBy(expr("o_orderkey % 10").as("bucket"))
        .agg(count(lit(1)).as("n_obj"), sum("cents").as("cents_obj"))
      seq.join(obj, "bucket").orderBy("bucket")
    },

    "i19_libsvm_roundtrip" -> { (s, dir) =>
      val path = s"$scratch/libsvm_orders"
      val lines = Tables.orders(s, dir).selectExpr(
        """concat(
          |  CAST(CAST(o_orderkey % 3 AS DOUBLE) AS STRING),
          |  concat(' 1:', CAST(CAST(o_orderkey AS DOUBLE) AS STRING)),
          |  concat(' 2:', CAST(CAST(round(o_totalprice) AS DOUBLE) AS STRING)),
          |  CASE WHEN o_custkey % 7 <> 0
          |       THEN concat(' 3:', CAST(CAST(o_custkey % 7 AS DOUBLE) AS STRING))
          |       ELSE '' END) AS value""".stripMargin)
      lines.unionByName(s.sql("SELECT '# libsvm comment' AS value UNION ALL SELECT ''"))
        .write.mode(SaveMode.Overwrite).text(path)
      s.read.text(path)
        .selectExpr("trim(value) AS line")
        .filter("length(line) > 0 AND NOT startswith(line, '#')")
        .selectExpr("line",
          "CAST(element_at(split(line, ' '), 1) AS DOUBLE) AS label",
          "explode(slice(split(line, ' '), 2, 1000)) AS item")
        .selectExpr("line", "label",
          "CAST(element_at(split(item, ':'), 1) AS INT) - 1 AS idx",
          "CAST(element_at(split(item, ':'), 2) AS DOUBLE) AS v")
        .groupBy("line", "label")
        .agg(max(when(col("idx") === 0, col("v"))).as("okey"),
          max(when(col("idx") === 1, col("v"))).as("price"),
          coalesce(max(when(col("idx") === 2, col("v"))), lit(0.0)).as("f3"))
        .selectExpr("CAST(label AS BIGINT) AS label",
          "CAST(okey AS BIGINT) AS o_orderkey",
          "CAST(price AS BIGINT) AS price", "CAST(f3 AS BIGINT) AS f3")
        .groupBy("label")
        .agg(count(lit(1)).as("n"), sum("price").as("sum_price"),
          sum("f3").as("sum_f3"), min("o_orderkey").as("min_key"),
          max("o_orderkey").as("max_key"))
        .orderBy("label")
    },

    "i18_codec_roundtrip" -> { (s, dir) =>
      val base = Tables.supplier(s, dir)
        .select(col("s_suppkey"),
          expr("cast(round(s_acctbal * 100) as bigint)").as("bal_cents"))
      Seq("gzip", "snappy", "zstd").map { c =>
        val path = s"$scratch/codec_$c"
        base.write.mode(SaveMode.Overwrite).option("compression", c).parquet(path)
        s.read.parquet(path)
          .agg(count(lit(1)).as("n"), sum("bal_cents").as("cents"))
          .select(lit(c).as("codec"), col("n"), col("cents"))
      }.reduce(_.unionByName(_)).orderBy("codec")
    },

    // Malformed-record handling on CSV ingest — the error budget of a
    // 100 TB crawl load. A synthesized feed corrupts every 10th balance;
    // PERMISSIVE nulls the bad field and captures the raw line in the
    // corrupt-record column, DROPMALFORMED admits only clean rows. Both
    // modes' counts roll up into one result the oracle recomputes from
    // the corruption rule.
    "i17_csv_malformed" -> { (s, dir) =>
      val path = s"$scratch/csv_malformed"
      Tables.customer(s, dir)
        .select(concat_ws(",", col("c_custkey"),
          when(col("c_custkey") % 10 === 0, lit("notanumber"))
            .otherwise(col("c_acctbal").cast("string"))).as("value"))
        .write.mode(SaveMode.Overwrite).text(path)
      val schema = StructType(Seq(
        StructField("c_custkey", LongType), StructField("c_acctbal", DoubleType),
        StructField("_bad", StringType)))
      val permissive = s.read.schema(schema)
        .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_bad")
        .csv(path)
        .agg(count(lit(1)).as("n_rows"),
          count(col("_bad")).as("n_corrupt"),
          count(col("c_acctbal")).as("n_parsed"))
        .select(lit("permissive").as("mode"), col("n_rows"), col("n_corrupt"), col("n_parsed"))
      // the aggregate must REFERENCE the parsed column: CSV column pruning
      // otherwise skips parsing c_acctbal entirely and the malformed rows
      // are never detected (count(1) alone kept all 1500 rows)
      val dropped = s.read.schema(StructType(schema.dropRight(1)))
        .option("mode", "DROPMALFORMED").csv(path)
        .agg(count(lit(1)).as("n_rows"), count(col("c_acctbal")).as("n_parsed"))
        .select(lit("dropmalformed").as("mode"), col("n_rows"),
          lit(0L).as("n_corrupt"), col("n_parsed"))
      permissive.unionByName(dropped).orderBy("mode")
    },

    // DDL column DEFAULTs: a managed table whose unsupplied columns fill
    // from declared defaults — partial-column INSERT (defaults apply) and
    // full INSERT (values win) must coexist in one table.
    "i15_ddl_defaults" -> { (s, dir) =>
      graft.ext.Scale.dropManagedTable(s, "i15_flags")
      Tables.orders(s, dir).createOrReplaceTempView("io_orders")
      s.sql(
        """CREATE TABLE i15_flags (
          |  o_orderkey BIGINT,
          |  status STRING DEFAULT 'unreviewed',
          |  priority_score BIGINT DEFAULT 0) USING parquet""".stripMargin)
      s.sql(
        """INSERT INTO i15_flags (o_orderkey)
          |SELECT o_orderkey FROM io_orders WHERE o_orderkey % 100 = 0""".stripMargin)
      s.sql(
        """INSERT INTO i15_flags
          |SELECT o_orderkey, 'reviewed', o_orderkey % 7
          |FROM io_orders WHERE o_orderkey % 100 = 1""".stripMargin)
      s.sql("SELECT o_orderkey, status, priority_score FROM i15_flags ORDER BY o_orderkey")
    },

    // The _metadata hidden column: per-row file lineage (name, size) the
    // scan exposes without reading extra bytes — the provenance hook a
    // multi-file 100 TB table uses to trace rows to their source files
    // and retract a bad ingest batch by file. Single-file here, so the
    // lineage rollup is one deterministic row.
    "i16_file_metadata" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("_metadata.file_name").as("file_name"),
          (col("_metadata.file_size") > 0L).as("size_known"),
          col("l_orderkey"))
        .groupBy("file_name", "size_known")
        .agg(count(lit(1)).as("n_rows"), max("l_orderkey").as("max_key"))
        .orderBy("file_name")
    },

    // The 1.6 compat shim end-to-end: unionAll (bag union by position) +
    // registerTempTable + DataFrame.explode + rowNumber, each delegating
    // to the modern call with an identical plan (graft.compat.Legacy).
    "i11_legacy_api" -> { (s, dir) =>
      import graft.compat.Legacy._
      val r = Tables.region(s, dir).select("r_regionkey", "r_name")
      r.unionAll(r).registerTempTable("i11_region_v")
      s.table("i11_region_v")
        .explodeColumn("r_name", "variant")(n => Seq(n, n.toLowerCase))
        .withColumn("rn", graft.compat.Legacy.rowNumber().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("variant").orderBy("r_regionkey")))
        .groupBy("variant")
        .agg(count(lit(1)).as("n"), max(col("rn").cast("long")).as("max_rn"))
        .orderBy("variant")
    }
  )

  val oracles: Map[String, String] = Map(
    // Mirror of the exporter: the same centroid arithmetic and the SAME
    // scaffolding/fragment strings, aggregated in cluster order.
    "i20_pmml_export" -> {
      s"""WITH c AS (
         |  SELECT CAST(o_orderkey % 3 AS BIGINT) AS cluster,
         |    CAST(CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS c1,
         |    CAST(CAST(sum(o_custkey % 100) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS c2
         |  FROM orders GROUP BY 1),
         |f AS (SELECT cluster, $pmmlClusterFrag AS frag FROM c)
         |SELECT concat('$pmmlHead', string_agg(frag, '' ORDER BY cluster), '$pmmlTail') AS xml,
         |  CAST(count(*) AS BIGINT) AS n_clusters
         |FROM f""".stripMargin
    },

    // Mirror of both exporters: identical scaffolding/fragment strings,
    // the OLS closed form over the same nine integer sums (the x15
    // sharing pattern), and the same exact-integer logit weights.
    "i23_pmml_glm_export" -> {
      val betaSel = graft.ext.Learn.olsBetaExprs
        .map { case (n, e) => s"CAST(round($e * 1000000.0) AS BIGINT) AS ${n}m" }
        .mkString(",\n    ")
      val wSel = logitWeightExprs("//")
        .map { case (n, e) => s"$e AS $n" }.mkString(",\n    ")
      s"""WITH lf AS (SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
         |    CAST(l_partkey % 100 AS BIGINT) AS x2,
         |    CAST(round(l_extendedprice) AS BIGINT) AS y FROM lineitem),
         |ls AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         |    CAST(sum(x1 * x1) AS BIGINT) AS s11, CAST(sum(x1 * x2) AS BIGINT) AS s12,
         |    CAST(sum(x2 * x2) AS BIGINT) AS s22, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x1 * y) AS BIGINT) AS s1y, CAST(sum(x2 * y) AS BIGINT) AS s2y
         |  FROM lf),
         |lb AS (SELECT
         |    $betaSel
         |  FROM ls),
         |lx AS (SELECT 'linear regression' AS model,
         |    concat('$pmmlLinHead', ${pmmlRegTable("b0m", "b1m", "b2m", "")}, '$pmmlGlmTail') AS xml,
         |    CAST(2 AS BIGINT) AS n_predictors FROM lb),
         |os AS (SELECT CAST(sum(pos) AS BIGINT) AS np,
         |    CAST(sum(1 - pos) AS BIGINT) AS nn,
         |    CAST(sum(pos * x1) AS BIGINT) AS s1p, CAST(sum((1 - pos) * x1) AS BIGINT) AS s1n,
         |    CAST(sum(pos * x2) AS BIGINT) AS s2p, CAST(sum((1 - pos) * x2) AS BIGINT) AS s2n
         |  FROM (SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
         |      CAST(round(o_totalprice) AS BIGINT) AS x1,
         |      CAST(o_custkey % 100 AS BIGINT) AS x2 FROM orders)),
         |ob AS (SELECT
         |    $wSel
         |  FROM os),
         |ox AS (SELECT 'logistic regression' AS model,
         |    concat('$pmmlLogitHead', ${pmmlRegTable("w0m", "w1m", "w2m", "1")}, $pmmlNoTableFrag, '$pmmlGlmTail') AS xml,
         |    CAST(2 AS BIGINT) AS n_predictors FROM ob),
         |sx AS (SELECT 'linear svm' AS model,
         |    concat('$pmmlSvmHead', ${pmmlRegTable("w0m", "w1m", "w2m", "1")}, $pmmlSvmNoTableFrag, '$pmmlGlmTail') AS xml,
         |    CAST(2 AS BIGINT) AS n_predictors FROM ob)
         |SELECT * FROM lx UNION ALL SELECT * FROM ox UNION ALL SELECT * FROM sx
         |ORDER BY model""".stripMargin
    },

    // Reproduced from the ORIGINAL orders parquet: the roundtrip must
    // land exactly back on these per-label sums (f3's zero cases were
    // OMITTED from the written lines and reconstructed by coalesce).
    // The whole-file roundtrip must be invisible: per-region line counts
    // and key sums straight off the source table.
    "i22_whole_text_files" ->
      """SELECT n_regionkey AS region, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(n_nationkey) AS BIGINT) AS sum_keys
        |FROM nation GROUP BY 1 ORDER BY region""".stripMargin,

    // Both binary roundtrips must be invisible: the oracle reads the
    // original parquet once and emits identical seq/obj aggregate pairs.
    "i21_sequence_object_files" ->
      """WITH p AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT CAST(o_orderkey % 10 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_seq, CAST(sum(cents) AS BIGINT) AS cents_seq,
        |  CAST(count(*) AS BIGINT) AS n_obj, CAST(sum(cents) AS BIGINT) AS cents_obj
        |FROM p GROUP BY 1 ORDER BY bucket""".stripMargin,

    "i19_libsvm_roundtrip" ->
      """SELECT CAST(o_orderkey % 3 AS BIGINT) AS label,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_price,
        |  CAST(sum(o_custkey % 7) AS BIGINT) AS sum_f3,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM orders GROUP BY 1 ORDER BY label""".stripMargin,

    "i01_json_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    "i02_csv_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM customer GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    "i03_text_roundtrip" ->
      """SELECT CAST(len(string_split(text, ' ')) AS INT) AS n_tokens, count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY n_tokens""".stripMargin,

    "i04_partitioned_write" ->
      """SELECT count(*) AS n, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders WHERE o_orderstatus = 'F'""".stripMargin,

    "i14_xml_roundtrip" ->
      """SELECT p_brand, count(*) AS n,
        |  CAST(sum(p_size) AS BIGINT) AS total_size,
        |  CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM part GROUP BY 1 ORDER BY p_brand""".stripMargin,

    "i06_orc_roundtrip" ->
      """SELECT s_nationkey, count(*) AS n,
        |  CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM supplier GROUP BY 1 ORDER BY s_nationkey""".stripMargin,

    // Old-generation rows must surface NULL for the late-added column.
    "i13_schema_evolution" ->
      """SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_custkey END AS o_custkey,
        |  CAST(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS INT) AS gen
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // Only the F partition's rows carry the +100; O/P rows must survive
    // the overwrite verbatim (static mode would have deleted them).
    "i12_dynamic_partition_overwrite" ->
      """SELECT o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT)
        |    + CASE WHEN o_orderstatus = 'F' THEN 100 ELSE 0 END AS cents,
        |  o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "i05_sql_over_view" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem WHERE l_quantity >= 10
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "i07_jdbc_roundtrip" ->
      """SELECT s_nationkey, count(*) AS n,
        |  CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM supplier GROUP BY 1 ORDER BY s_nationkey""".stripMargin,

    "i08_cached_scan" ->
      """SELECT l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS disc_cents
        |FROM lineitem GROUP BY 1 ORDER BY l_linestatus""".stripMargin,

    "i09_script_transform" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey, n_name
        |FROM nation ORDER BY nation.n_nationkey""".stripMargin,

    "i18_codec_roundtrip" ->
      """SELECT codec, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM supplier, (VALUES ('gzip'), ('snappy'), ('zstd')) c(codec)
        |GROUP BY codec ORDER BY codec""".stripMargin,

    "i17_csv_malformed" ->
      """WITH t AS (SELECT count(*) n, count(*) FILTER (WHERE c_custkey % 10 = 0) bad
        |           FROM customer)
        |SELECT 'dropmalformed' AS mode, CAST(n - bad AS BIGINT) AS n_rows,
        |  CAST(0 AS BIGINT) AS n_corrupt, CAST(n - bad AS BIGINT) AS n_parsed FROM t
        |UNION ALL
        |SELECT 'permissive', CAST(n AS BIGINT), CAST(bad AS BIGINT),
        |  CAST(n - bad AS BIGINT) FROM t
        |ORDER BY mode""".stripMargin,

    "i15_ddl_defaults" ->
      """SELECT o_orderkey, 'unreviewed' AS status, CAST(0 AS BIGINT) AS priority_score
        |FROM orders WHERE o_orderkey % 100 = 0
        |UNION ALL
        |SELECT o_orderkey, 'reviewed', o_orderkey % 7
        |FROM orders WHERE o_orderkey % 100 = 1
        |ORDER BY o_orderkey""".stripMargin,

    "i16_file_metadata" ->
      """SELECT 'lineitem.parquet' AS file_name, TRUE AS size_known,
        |  CAST(count(*) AS BIGINT) AS n_rows, max(l_orderkey) AS max_key
        |FROM lineitem""".stripMargin,

    "i10_save_as_table" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    "i11_legacy_api" ->
      """WITH doubled AS (
        |  SELECT r_regionkey, r_name FROM region
        |  UNION ALL SELECT r_regionkey, r_name FROM region),
        |ex AS (SELECT r_regionkey, unnest([r_name, lower(r_name)]) AS variant FROM doubled)
        |SELECT variant, count(*) AS n, CAST(max(rn) AS BIGINT) AS max_rn FROM (
        |  SELECT variant, ROW_NUMBER() OVER (PARTITION BY variant ORDER BY r_regionkey) rn FROM ex)
        |GROUP BY 1 ORDER BY variant""".stripMargin
  )
}
