package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions — the properties that decide whether these
  * pipelines survive a 100 TB / 1000-executor scale-up: filters reaching
  * the parquet scan, column pruning, broadcast choices, map-side partial
  * aggregation, and whole-stage codegen coverage. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: filter is pushed to parquet and schema is pruned") {
    val p = plan(SparkEntry.queries("q01_pricing_summary")(spark, sf001))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    // 7 of 11 lineitem columns read — partkey/suppkey/linenumber/shipdate
    // are needed, comment-ish ones are not
    assert(p.contains("ReadSchema") && !p.contains("l_partkey"))
  }

  test("q04: star join broadcasts every dimension, big tables meet once") {
    val p = plan(SparkEntry.queries("q04_local_supplier_volume")(spark, sf001))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3) // c, n, r broadcast
    assert(p.contains("HashAggregate"))
  }

  test("aggregations run partial then final (map-side combine)") {
    val p = plan(SparkEntry.queries("v01_tumbling_windows")(spark, sf001))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("partial_"))
  }

  test("d03: LSH candidates come from bucketed hash aggregation, no cross join, no window sort") {
    // materialize=false keeps the pipeline lazy so the physical plan is
    // inspectable (the production path localCheckpoints the small pair set)
    val lazyPairs = graft.ext.Dedup.minhashCandidates(
      Tables.documents(spark, sf001), "doc_id", "text", materialize = false)
    val p = plan(lazyPairs)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window"), "bucket cap must be an aggregate, not a sort+window pass")
    assert(p.contains("bkey"))
    assert(p.contains("collect_list"))
  }

  test("d18: incremental probe candidates come from a band equi-join, never a cross join") {
    import spark.implicits._
    val corpus = Seq(1L -> "a b c d e f", 2L -> "g h i j k l").toDF("doc_id", "text")
    val batch = Seq(10L -> "a b c d e f", 11L -> "m n o p q r").toDF("doc_id", "text")
    val idx = "/tmp/graft_scale/neardup_idx_planspec"
    graft.ext.Dedup.writeNeardupIndex(corpus, "doc_id", "text", idx)
    val p = plan(graft.ext.Dedup.incrementalNeardupPairs(
      spark, idx, batch, "doc_id", "text", materialize = false))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("bkey"), "candidates must join on the band key")
  }

  test("s09: sampled-IVF probes broadcast into the cluster join, corpus unshuffled by it") {
    val e = Tables.embeddings(spark, sf001)
    val p = plan(graft.ext.Similarity.ivfSampledTopK(
      e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", 64))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin"), "probe side must broadcast into the cluster join")
  }

  test("d09: fuzzy candidates come from a variant equi-join, never a cross join") {
    // materialize=false keeps the pipeline lazy so the plan is inspectable
    val p = plan(graft.ext.Dedup.fuzzyPairsEd1(
      Tables.customer(spark, sf001), "c_custkey", "c_name", materialize = false))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("variant"))
  }

  test("d12: blocked JW candidates come from a variant equi-join, never a nested loop") {
    val p = plan(graft.ext.Dedup.jaroWinklerBlocked(
      Tables.customer(spark, sf001), "c_custkey", "c_name",
      threshold = 0.9, materialize = false))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("variant"))
    assert(p.contains("jarowinkler") || p.contains("jaro_winkler") || p.contains("JaroWinkler"))
  }

  test("s06: PQ probes scan the code table via a broadcast join, corpus unshuffled") {
    val e = Tables.embeddings(spark, sf001)
    val p = plan(graft.ext.Similarity.pqTopK(e.filter(col("vec_id") % 50 === 0), e,
      "vec_id", "embedding", 64, materialize = false))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"), "the compressed-domain scan must not shuffle the corpus")
  }

  test("x05: the numbering window is partitioned, never the global-sort shape") {
    // a naive row_number() OVER (ORDER BY key) is a Window with an EMPTY
    // partition spec — one task sorts the world; globalRowIndex must
    // always partition its window by __pid
    val d = Tables.orders(spark, sf001).select("o_orderkey")
    val p = plan(graft.ext.Scale.globalRowIndex(d, "o_orderkey",
      numPartitions = 8, materialize = false))
    assert(p.contains("windowspecdefinition(__pid"))
    assert(!"windowspecdefinition\\(o_orderkey ASC".r.findFirstIn(p).isDefined,
      "window spec must lead with the partition column, not a bare global order")
  }

  test("x10: the packing prefix-sum window is partitioned, never the global-sort shape") {
    // a naive sum() OVER (ORDER BY key) is a Window with an EMPTY
    // partition spec — one task sorts the world; packByTokenBudget must
    // always partition its window by __pid (the x05 rule, weighted)
    val d = Tables.documents(spark, sf001)
      .select(col("doc_id"), expr("cast(size(split(text, ' ')) as bigint)").as("n_tokens"))
    val p = plan(graft.ext.Scale.packByTokenBudget(d, "doc_id", "n_tokens",
      budget = 512L, numPartitions = 8, materialize = false))
    assert(p.contains("windowspecdefinition(__pid"))
    assert(!"windowspecdefinition\\(doc_id ASC".r.findFirstIn(p).isDefined,
      "window spec must lead with the partition column, not a bare global order")
  }

  test("s01: probe side is broadcast for the all-pairs scoring join") {
    val p = plan(SparkEntry.queries("s01_cosine_topk")(spark, sf001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("scalar-function pipelines stay inside whole-stage codegen") {
    val df = SparkEntry.queries("f04_math_functions")(spark, sf001)
    df.collect() // finalize THIS df's adaptive plan (count() would plan anew)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("codegen id"))
  }

  test("i04: reading one partition back prunes by directory, not data filter") {
    val p = plan(SparkEntry.queries("i04_partitioned_write")(spark, sf001))
    assert(p.contains("PartitionFilters: [isnotnull(o_orderstatus") ||
      p.contains("PartitionFilters: [o_orderstatus"))
  }

  test("j01: as-of join is union+window — no join node, no match amplification") {
    val p = plan(SparkEntry.queries("j01_asof_last_purchase")(spark, sf001))
    assert(!p.contains("Join"), "asofJoin must not produce any join operator")
    assert(p.contains("Window") && p.contains("Union"))
  }

  test("j02: range join is a bucketed equi-join, never a nested loop") {
    val p = plan(SparkEntry.queries("j02_attribution_window")(spark, sf001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("__bkt"))
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    // The skew story has two layers: x01/x02 prove MANUAL salting for
    // pathological keys; this pins the AUTOMATIC layer — AQE's
    // OptimizeSkewedJoin re-plans an oversized shuffle partition into
    // splits at runtime, which at 100 TB is the first line of defense
    // before anyone reaches for salt. Broadcast is disabled so the join
    // must be a shuffle SMJ; thresholds are lowered to make the ~90%-one-
    // key left side register as skewed at test scale.
    import spark.implicits._
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      // the payload must be incompressible (md5 hex, unique per row): skew
      // detection reads SHUFFLE BYTES, and a constant-key long column
      // compresses below any realistic threshold
      val left = spark.range(300000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id") % 100).as("k"),
          md5(col("id").cast("string")).as("v"))
      val right = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("w"))
      // GLOBAL aggregate on purpose: a groupBy(k) right after the join
      // requires the join's hash partitioning, and OptimizeSkewedJoin
      // declines to split when that would force an extra shuffle — the
      // split must be distribution-requirement-free to fire
      // sum(length(v)), not count(1): the payload must survive column
      // pruning or it never reaches the shuffle it is there to inflate
      // (count(v) gets rewritten to count(1) for a non-nullable v)
      val agg = left.join(right, "k").agg(sum(length(col("v"))).as("n"))
      agg.collect() // finalize the adaptive plan
      val p = agg.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire; plan:\n${p.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("s10: TF counting is explode + hash aggregate, never an interpreted per-row fold") {
    // The per-row HOF formulation (filter/aggregate lambdas over the token
    // array) is interpreted AND shuffle-free — it inherits the source
    // file's split count and ran the whole pipeline on one core (27s at
    // sf0.1; BASELINE.md round-11 note). Pin the distributed shape:
    // explode (Generate) feeding codegen'd hash aggregates.
    val p = plan(SparkEntry.queries("s10_ml_pipeline")(spark, sf001))
    assert(p.contains("Generate explode"), "token explode missing")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "two-level (partial+final) count aggregate missing")
  }

  test("p08: pregel preAggregate pre-counts (vertex, msg) before the per-vertex merge") {
    // The hub-safety contract (reference graphx/lib/LabelPropagation
    // .scala:40 merges label->count maps, never raw label lists): with
    // preAggregate set, the message stage must run a (vertex, __msg)
    // hash aggregate — whose partial (map-side) phase collapses duplicate
    // labels BEFORE the shuffle — and only then the per-vertex
    // collect_list merge over the pre-counted structs. The plan is read
    // bottom-up: the grouped-by-[vertex, __msg] partial_count must appear
    // BELOW (after, in toString order) the per-vertex collect_list.
    import spark.implicits._
    val raw = Seq((1L, 5L), (1L, 5L), (1L, 6L), (2L, 5L)).toDF("vertex", "__msg")
    val staged = graft.ext.Graph.messageStage(
      raw, m => sort_array(collect_list(m)), Some(count(lit(1))))
    val p = plan(staged)
    val preCount = "HashAggregate.*keys=\\[vertex.*__msg.*partial_count".r
    val merge = "ObjectHashAggregate.*keys=\\[vertex#\\d+L?\\].*collect_list".r
    assert(preCount.findFirstIn(p).isDefined,
      s"(vertex, __msg) partial pre-count aggregate missing:\n$p")
    assert(merge.findFirstIn(p).isDefined,
      s"per-vertex collect_list merge missing:\n$p")
    assert(p.indexOf(merge.findFirstIn(p).get) < p.indexOf(preCount.findFirstIn(p).get),
      s"pre-count must feed the merge (appear below it in the plan):\n$p")
    // and the pre-count output is one row per distinct (vertex, msg)
    val rows = raw.groupBy("vertex", "__msg").agg(count(lit(1))).count()
    assert(rows === 3L)
  }

  test("t21: global rank rides a range repartition — no single-partition window sort") {
    // t21's query materializes the rank (globalRowIndex checkpoints), so
    // inspect the UNmaterialized ranking plan it is built from
    val scored = graft.ext.TextAnalysis.docLmScore(
        Tables.documents(spark, sf001), "doc_id", "text")
      .withColumn("ck", struct((col("avg_logp") * -1).as("neg_lp"), col("doc_id").as("d")))
    val ranked = graft.ext.Scale.globalRowIndex(scored, "ck",
      numPartitions = 8, materialize = false)
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(ck"),
      s"rank must ride a RANGE repartition:\n$plan")
    // the rank's Window partitions by the range-partition id — never a
    // whole-corpus single-partition sort
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty, s"expected the rank window in:\n$plan")
    windows.foreach { w =>
      assert(w.contains("__pid"), s"window must partition by __pid, got:\n$w")
    }
  }
}
