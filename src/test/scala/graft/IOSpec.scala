package graft

import org.apache.spark.sql.{AnalysisException, SaveMode}
import org.apache.spark.sql.functions._

/** Writer semantics the oracle can't see: save modes, partition layout and
  * partition pruning in the physical plan. */
class IOSpec extends SparkSpec {

  private def tmp(name: String) = {
    val d = s"/tmp/graft_io_spec/$name"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val f = new java.io.File(d)
    if (f.exists()) rm(f)
    d
  }

  test("save modes: ErrorIfExists throws, Ignore no-ops, Append doubles, Overwrite resets") {
    val path = tmp("modes")
    val df = Tables.nation(spark, sf001)
    val n = df.count()
    df.write.parquet(path) // default ErrorIfExists on fresh path
    intercept[AnalysisException] { df.write.parquet(path) }
    df.write.mode(SaveMode.Ignore).parquet(path)
    assert(spark.read.parquet(path).count() === n)
    df.write.mode(SaveMode.Append).parquet(path)
    assert(spark.read.parquet(path).count() === 2 * n)
    df.write.mode(SaveMode.Overwrite).parquet(path)
    assert(spark.read.parquet(path).count() === n)
  }

  test("partitionBy writes hive-style dirs and the reader prunes them") {
    val path = tmp("parts")
    Tables.orders(spark, sf001)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .write.partitionBy("o_orderstatus").parquet(path)
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"))
    val plan = spark.read.parquet(path).filter(col("o_orderstatus") === "F")
      .queryExecution.executedPlan.toString
    // partition filter, not a data filter: scan carries PartitionFilters
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderstatus"))
  }

  test("csv options: delimiter and null handling round-trip") {
    val path = tmp("csvopt")
    import spark.implicits._
    val df = Seq((1L, Option("x")), (2L, None)).toDF("id", "s")
    df.write.option("delimiter", "|").option("header", "true").csv(path)
    val back = spark.read.option("delimiter", "|").option("header", "true")
      .schema(df.schema).csv(path)
    assert(back.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      === Set((1L, Some("x")), (2L, None)))
  }

  test("orc write + read round-trips with identical rows") {
    val path = tmp("orc")
    val df = Tables.supplier(spark, sf001)
    df.write.orc(path)
    val back = spark.read.orc(path)
    assert(back.schema === df.schema)
    assert(back.collect().toSet === df.collect().toSet)
  }

  test("xml roundtrip: explicit schema restores types; null fields omit the element and read back null") {
    val path = tmp("xmlnull")
    import spark.implicits._
    val df = Seq((1L, Option("a"), 2.5), (2L, None: Option[String], 3.5)).toDF("id", "tag", "v")
    df.write.option("rowTag", "row").format("xml").save(path)
    val back = spark.read.schema(df.schema).option("rowTag", "row").format("xml").load(path)
      .orderBy("id").collect()
    assert(back(0).getString(1) === "a")
    assert(back(1).isNullAt(1), "a null field writes no element and must read back as null")
    assert(back.map(_.getDouble(2)).toSeq === Seq(2.5, 3.5))
  }

  test("libsvm lines carry the reference format; comments, blanks and sparse zeros handled") {
    import spark.implicits._
    // drive the full i19 roundtrip at sf0.001 and check the written file
    // itself for MLUtils.saveAsLibSVMFile's exact format
    val out = graft.queries.IO.defs("i19_libsvm_roundtrip")(spark, sf001).collect()
    val lines = spark.read.text("/tmp/graft_io/libsvm_orders")
      .as[String].collect()
    assert(lines.exists(_.startsWith("#"))) // comment survived the write
    assert(lines.exists(_.trim.isEmpty))    // blank line too
    val data = lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    // every data line: double label then ascending 1-based idx:value pairs
    assert(data.forall { l =>
      val items = l.split(' ')
      val idxs = items.tail.map(_.split(':')(0).toInt)
      items.head.toDouble >= 0.0 && idxs.sameElements(idxs.sorted) && idxs.head == 1
    })
    // sparse-skip really happened: some line has no feature 3
    assert(data.exists(l => !l.contains("3:")))
    // and the parsed aggregate equals the direct one from the table
    val direct = Tables.orders(spark, sf001)
      .groupBy(expr("CAST(o_orderkey % 3 AS BIGINT)").as("label"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice) AS BIGINT)")).as("sum_price"),
        sum(expr("o_custkey % 7")).as("sum_f3"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
      .orderBy("label").collect()
    assert(out.toSeq === direct.toSeq)
  }

  test("pmml export: reference document structure, clusters in order, centers match the data") {
    val row = graft.queries.IO.defs("i20_pmml_export")(spark, sf001).head()
    val xml = row.getString(0)
    assert(row.getLong(1) === 3L)
    assert(xml.startsWith("""<PMML version="4.2"><Header description="k-means clustering"/>"""))
    assert(xml.endsWith("</ClusteringModel></PMML>"))
    assert(xml.contains("""numberOfClusters="3""""))
    // clusters appear exactly once each, in id order
    val idxs = (0 to 2).map(i => xml.indexOf(s"""<Cluster name="cluster_$i">"""))
    assert(idxs.forall(_ >= 0) && idxs === idxs.sorted)
    // the serialized cluster_0 center equals the directly computed one
    val c0 = Tables.orders(spark, sf001)
      .filter(expr("o_orderkey % 3 = 0"))
      .selectExpr("CAST(sum(CAST(round(o_totalprice) AS BIGINT)) DIV count(*) AS BIGINT) AS c1",
        "CAST(sum(o_custkey % 100) DIV count(*) AS BIGINT) AS c2").head()
    assert(xml.contains(
      s"""<Cluster name="cluster_0"><Array n="2" type="real">${c0.getLong(0)} ${c0.getLong(1)}</Array></Cluster>"""))
  }

  test("pmml glm export: regression and classification documents carry the reference structure") {
    val rows = graft.queries.IO.defs("i23_pmml_glm_export")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.keySet === Set("linear regression", "logistic regression", "linear svm"))

    val lin = rows("linear regression")
    assert(lin.startsWith("""<PMML version="4.2"><Header description="linear regression"/>"""))
    assert(lin.contains("""<RegressionModel functionName="regression""""))
    assert(lin.contains("""<MiningField name="target" usageType="target"/>"""))
    assert(lin.contains("""<DataField name="target" optype="continuous" dataType="double"/>"""))
    assert("<NumericPredictor ".r.findAllIn(lin).size === 2)
    assert(lin.endsWith("</RegressionModel></PMML>"))
    // the serialized intercept equals the direct closed-form fit
    val b = graft.ext.Learn.olsFit2(Tables.lineitem(spark, sf001).selectExpr(
        "CAST(round(l_quantity) AS BIGINT) AS x1",
        "CAST(l_partkey % 100 AS BIGINT) AS x2",
        "CAST(round(l_extendedprice) AS BIGINT) AS y"))
      .selectExpr("CAST(round(b0 * 1000000.0) AS BIGINT)").head().getLong(0)
    assert(lin.contains(s"""<RegressionTable intercept="$b">"""))

    val log = rows("logistic regression")
    assert(log.contains("""functionName="classification""""))
    assert(log.contains("""normalizationMethod="logit""""))
    assert(log.contains("""<DataField name="target" optype="categorical" dataType="string"/>"""))
    assert(log.contains("""targetCategory="1""""))
    // the NO table is predictor-free with the logit-inverted threshold:
    // -ln(1/0.7 - 1) milli-quantized = 847
    assert(log.contains("""<RegressionTable intercept="847" targetCategory="0"/>"""))
    assert("<NumericPredictor ".r.findAllIn(log).size === 2)

    // the SVM route: same binary exporter, normalizationMethod="none",
    // the raw 0.0 threshold passes through as the NO-table intercept
    val svm = rows("linear svm")
    assert(svm.contains("""functionName="classification""""))
    assert(svm.contains("""normalizationMethod="none""""))
    assert(svm.contains("""<RegressionTable intercept="0" targetCategory="0"/>"""))
    assert("<NumericPredictor ".r.findAllIn(svm).size === 2)
    // identical weights as the logit row — only the normalization differs
    val wOf = (x: String) => x.split("coefficient=\"").drop(1).map(_.takeWhile(_ != '"')).toSeq
    assert(wOf(svm) === wOf(log))
  }

  test("json preserves nested structs and arrays") {
    val path = tmp("jsonnest")
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b"), ("x", 2.5))).toDF("id", "tags", "meta")
    df.write.json(path)
    val back = spark.read.schema(df.schema).json(path).collect().head
    assert(back.getSeq[String](1) === Seq("a", "b"))
    assert(back.getStruct(2).getDouble(1) === 2.5)
  }

  test("sequence/object files: row-exact roundtrips; SEQ magic on disk") {
    val seqPath = tmp("seqfile")
    val objPath = tmp("objfile")
    val pairs = (1L to 500L).map(i => (i, i * 7 % 101))
    val rdd = spark.sparkContext.parallelize(pairs, 4)
    rdd.saveAsSequenceFile(seqPath)
    rdd.saveAsObjectFile(objPath)
    // on-disk format really is a Hadoop SequenceFile (SEQ magic + the
    // LongWritable key/value classnames in the header)
    val part = new java.io.File(seqPath).listFiles()
      .filter(_.getName.startsWith("part-")).minBy(_.getName)
    val head = java.nio.file.Files.readAllBytes(part.toPath).take(200)
    assert(head.take(3).map(_.toChar).mkString === "SEQ")
    assert(new String(head, "ISO-8859-1").contains("org.apache.hadoop.io.LongWritable"))
    // both read paths recover every row
    val seqBack = spark.sparkContext.sequenceFile[Long, Long](seqPath).collect().sorted
    assert(seqBack.toSeq === pairs.sorted)
    val objBack = spark.sparkContext.objectFile[(Long, Long)](objPath).collect().sorted
    assert(objBack.toSeq === pairs.sorted)
  }
}
