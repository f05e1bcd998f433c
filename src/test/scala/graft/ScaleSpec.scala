package graft

import graft.ext.Scale
import org.apache.spark.sql.functions._

/** Salting utilities must be result-transparent: same answer as the
  * direct aggregation/join, while spreading hot keys across buckets. */
class ScaleSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation on a skewed key") {
    val li = Tables.lineitem(spark, sf001) // l_returnflag is a 3-value hot key
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(l_extendedprice * 100) as bigint)")).as("cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Scale.saltedAggregate(li, Seq("l_returnflag"), saltBuckets = 8,
      partialAggs = Seq(count(lit(1)).as("n"),
        sum(expr("cast(round(l_extendedprice * 100) as bigint)")).as("cents")),
      mergeAggs = Seq(sum("n").as("n"), sum("cents").as("cents")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted === direct)
  }

  test("salted join equals direct join") {
    val o = Tables.orders(spark, sf001).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sf001).select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val direct = o.join(c, "o_custkey").count()
    val salted = Scale.saltedJoin(o, c, "o_custkey", saltBuckets = 4).count()
    assert(salted === direct)
    // every original row keeps exactly one salt copy
    assert(salted === o.count())
  }

  test("global row index equals the single-partition row_number, in parallel") {
    import spark.implicits._
    val keys = scala.util.Random.shuffle((1L to 997L).toList)
    val df = keys.toDF("k").repartition(7) // arbitrary incoming layout
    val got = Scale.globalRowIndex(df, "k", numPartitions = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 997L).map(k => k -> k).toMap) // keys are 1..n in order
  }

  test("global row index survives more partitions than rows (empty ranges)") {
    import spark.implicits._
    val df = Seq(30L, 10L, 20L).toDF("k")
    val got = Scale.globalRowIndex(df, "k", numPartitions = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 1L, 20L -> 2L, 30L -> 3L))
  }

  test("round-robin shards off the global index balance to within one row") {
    import spark.implicits._
    val df = (1L to 103L).map(k => (k, k * 10)).toDF("k", "payload")
    val sizes = Scale.globalRowIndex(df, "k", numPartitions = 8)
      .withColumn("shard", (col("global_index") - 1) % 8)
      .groupBy("shard").count()
      .collect().map(_.getLong(1))
    assert(sizes.length === 8)
    assert(sizes.sum === 103L)
    assert(sizes.max - sizes.min <= 1)
  }

  test("token packing equals the single-partition running sum, in parallel") {
    import spark.implicits._
    val rows = scala.util.Random.shuffle(
      (1L to 500L).map(k => (k, (k % 7) + 1)).toList) // weights 1..7
    val df = rows.toDF("k", "w").repartition(5)
    val got = Scale.packByTokenBudget(df, "k", "w", budget = 40L, numPartitions = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    var acc = 0L
    (1L to 500L).foreach { k =>
      val w = (k % 7) + 1
      assert(got(k) === ((acc, acc / 40L)), s"key $k")
      acc += w
    }
  }

  test("token packing: a straddling row stays in the pack it started in") {
    import spark.implicits._
    // weights 30, 30: second row starts at cum 30 < 40 -> pack 0 despite overflow
    val df = Seq((1L, 30L), (2L, 30L), (3L, 30L)).toDF("k", "w")
    val got = Scale.packByTokenBudget(df, "k", "w", budget = 40L, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L)) // cum_before 0, 30, 60
  }

  test("cdc merge: deletes drop, updates replace, inserts append, rest untouched") {
    import spark.implicits._
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq((2L, "b2", "U"), (3L, "c", "D"), (4L, "d", "I")).toDF("k", "v", "op")
    val got = Scale.applyChanges(snap, changes, "k", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a", 2L -> "b2", 4L -> "d"))
  }

  test("compaction: 64 fragments become 4 sorted files with disjoint key ranges") {
    import spark.implicits._
    val base = "/tmp/graft_scale/compact_spec"
    (1L to 5000L).map(k => (k, k % 97)).toDF("k", "v")
      .repartition(64).write.mode("overwrite").parquet(s"$base/frag")
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files(s"$base/frag").length === 64)
    val tidy = Scale.compact(spark, spark.read.parquet(s"$base/frag"), "k", 4, s"$base/tidy")
    assert(files(s"$base/tidy").length === 4)
    // same rows, and each compacted file covers a disjoint key range
    assert(tidy.count() === 5000L)
    assert(tidy.agg(sum("k")).head.getLong(0) === (1L to 5000L).sum)
    val ranges = files(s"$base/tidy").map { f =>
      val d = spark.read.parquet(f.getAbsolutePath).agg(min("k"), max("k")).head
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi < lo); case _ => }
  }

  test("dynamic partition overwrite rewrites only the incoming partition's files") {
    import spark.implicits._
    val base = "/tmp/graft_scale/dyn_overwrite_spec"
    val rows = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 30L), (4L, "B", 40L))
      .toDF("k", "p", "v")
    rows.write.mode("overwrite").partitionBy("p").parquet(base)
    def files(part: String) = new java.io.File(s"$base/p=$part").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
    val bBefore = files("B")
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((1L, "A", 11L)).toDF("k", "p", "v")
        .write.mode("overwrite").partitionBy("p").parquet(base)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // B's files are bit-untouched (same names, sizes, mtimes); A holds
    // exactly the incoming rows; nothing else was wiped
    assert(files("B") === bBefore, "untouched partition must keep its exact files")
    val after = spark.read.parquet(base).select("k", "p", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(after === Set((1L, "A", 11L), (3L, "B", 30L), (4L, "B", 40L)))
  }

  test("z-order layout: files bounded in BOTH dimensions, single-sort only in one") {
    import spark.implicits._
    val base = "/tmp/graft_scale/zorder_spec"
    // a 64x64 grid, both coordinates uniform — the worst case for a
    // single-column sort's second dimension
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b, a * 64 + b))
      .toDF("a", "b", "id")
    val n = 16
    val z = Scale.interleavedLayout(spark, grid, "a", "b", n, s"$base/z")
    // result-transparent: same rows
    assert(z.count() === 4096L)
    assert(z.agg(sum("id")).head.getLong(0) === (0L until 4096L).sum)
    def fileRanges(p: String, c: String) = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val d = spark.read.parquet(f.getAbsolutePath).agg(min(col(c)), max(col(c))).head
        (d.getLong(0), d.getLong(1))
      }
    // footer-stat pruning power: for a probe value in either dimension,
    // most files' [min, max] exclude it — the Z-curve bounds every file
    // to a sub-square, so each dimension's per-file span is a fraction
    // of the 0..63 range
    def hitting(ranges: Array[(Long, Long)], v: Long) =
      ranges.count { case (lo, hi) => lo <= v && v <= hi }
    val za = fileRanges(s"$base/z", "a"); val zb = fileRanges(s"$base/z", "b")
    assert(hitting(za, 13L) <= n / 2, s"a-probe should prune most files: ${za.toSeq}")
    assert(hitting(zb, 13L) <= n / 2, s"b-probe should prune most files: ${zb.toSeq}")
    // control: a single-column sort prunes perfectly on its key and NOT
    // AT ALL on the other dimension (every file spans b's full range)
    Scale.compact(spark, grid, "a", n, s"$base/flat")
    val fb = fileRanges(s"$base/flat", "b")
    assert(hitting(fb, 13L) === n, "single-sort files all span the full b range")
  }

  test("group sample: exact sizes, partition-independent picks, small groups whole") {
    import spark.implicits._
    val rows = ((1 to 50).map(i => ("big", i.toLong)) ++
      (1 to 3).map(i => ("tiny", 100L + i))).toDF("g", "id")
    val picked = Scale.groupSample(rows, "g", "id", m = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(picked.count(_._1 == "big") === 10)   // exactly m from a big group
    assert(picked.count(_._1 == "tiny") === 3)   // whole group when |g| < m
    // the pick is a function of ids, not of physical layout
    val reparted = Scale.groupSample(rows.repartition(7), "g", "id", m = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(picked.toSet === reparted.toSet)
  }

  test("poisson + gamma datagen recover the planted parameters") {
    val rows = graft.queries.Scale.defs("x27_poisson_gamma_datagen")(spark, sf001)
      .collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      // Poisson(3): mean ≈ 3, variance ≈ 3 (milli units; ~375 draws/group)
      val pm = r.getAs[Long]("sp") / n / 1000.0
      val pv = (r.getAs[Long]("spp") / n - math.pow(r.getAs[Long]("sp") / n, 2)) / 1e6
      assert(math.abs(pm - 3.0) < 0.35, s"poisson mean $pm")
      assert(math.abs(pv - 3.0) < 1.0, s"poisson var $pv")
      // Gamma(shape 3, scale 2): mean ≈ 6, variance ≈ 12
      val gm = r.getAs[Long]("sg") / n / 1000.0
      val gv = (r.getAs[Long]("sgg") / n - math.pow(r.getAs[Long]("sg") / n, 2)) / 1e6
      assert(math.abs(gm - 6.0) < 0.7, s"gamma mean $gm")
      assert(math.abs(gv - 12.0) < 5.0, s"gamma var $gv")
      assert(r.getAs[Long]("max_pois_milli") <= 12000L) // the declared cap
    }
  }

  test("groupSample regimes agree: offsets path == high-cardinality window fallback") {
    import spark.implicits._
    // 60 groups x 5 rows: force each regime via maxOffsetStrata and
    // compare picks — the two plans must be result-identical
    val rows = (1L to 300L).map(i => (s"g${i % 60}", i)).toDF("g", "id")
    val offsets = Scale.groupSample(rows, "g", "id", m = 2, maxOffsetStrata = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val window = Scale.groupSample(rows, "g", "id", m = 2, maxOffsetStrata = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(offsets === window)
    assert(offsets.size === 120) // exactly m = 2 per group
  }

  test("groupSample: NULL group keys survive both regimes identically") {
    import spark.implicits._
    // before the r19 sentinel guard, the offsets path's NULL map key
    // silently dropped the whole null-group stratum
    val rows = ((1 to 20).map(i => (Some(s"g${i % 4}"), i.toLong)) ++
      (1 to 6).map(i => (None: Option[String], 100L + i))).toDF("g", "id")
    val offsets = Scale.groupSample(rows, "g", "id", m = 3, regime = "offsets")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getInt(2))).toSet
    val window = Scale.groupSample(rows, "g", "id", m = 3, regime = "window")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getInt(2))).toSet
    assert(offsets === window)
    assert(offsets.count(_._1.isEmpty) === 3) // null group sampled like any other
    // pinned regimes bypass the countDistinct probe but match auto
    val auto = Scale.groupSample(rows, "g", "id", m = 3)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getInt(2))).toSet
    assert(auto === offsets)
  }

  test("stratumRank: default partition count tracks the input, floored at 32") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (s"g${i % 3}", i)).toDF("grp", "id")
    val (wide, _, releaseW) = Scale.stratumRank(rows.repartition(48), "'gs'")
    assert(wide.rdd.getNumPartitions === 48) // auto-size follows the input
    releaseW()
    val (narrow, _, releaseN) = Scale.stratumRank(rows.repartition(4), "'gs'")
    assert(narrow.rdd.getNumPartitions === 32) // floor keeps small inputs parallel
    releaseN()
  }

  test("svm datagen recovers the planted hyperplane") {
    val rows = graft.queries.Scale.defs("x28_svm_datagen")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r).toMap
    val (neg, pos) = (rows(0L), rows(1L))
    // symmetric hyperplane through the origin -> ~50% base rate
    val total = (neg.getAs[Long]("n") + pos.getAs[Long]("n")).toDouble
    assert(math.abs(pos.getAs[Long]("n") / total - 0.5) < 0.05)
    // w1 = +0.7: x1 separates upward; w2 = -0.4: x2 separates downward
    assert(pos.getAs[Long]("mean_x1_milli") > 100 &&
      neg.getAs[Long]("mean_x1_milli") < -100)
    assert(pos.getAs[Long]("mean_x2_milli") < -50 &&
      neg.getAs[Long]("mean_x2_milli") > 50)
    // margins sit on their label's side by construction
    assert(pos.getAs[Long]("sm") > 0 && neg.getAs[Long]("sm") < 0)
  }

  test("stratumRank: partition-parallel — no WindowExec, ranks match the window's") {
    import spark.implicits._
    // 3 strata of very different sizes spread over several partitions
    val rows = ((1 to 80).map(i => ("en", i.toLong)) ++
      (1 to 9).map(i => ("de", 200L + i)) ++ Seq(("fr", 500L)))
      .toDF("grp", "id").repartition(7)
    val (ranked, totals, release) = Scale.stratumRank(rows, "'gs'", numPartitions = 5)
    // the rank plan never funnels a stratum through one task
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan.take(2000))
    val got = ranked.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    release()
    assert(totals === Map("en" -> 80L, "de" -> 9L, "fr" -> 1L))
    // ranks are a permutation 1..n_k per stratum…
    got.groupBy(_._1).foreach { case (g, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to totals(g)), s"stratum $g")
    }
    // …and equal the per-stratum hash-order window rank they replaced
    val expected = rows
      .withColumn("h", expr(graft.ext.Dedup.portableHash("cast(id as string)", "'gs'")))
      .withColumn("pick", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("grp").orderBy(col("h"), col("id"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("pick"))).toSet
    assert(got.toSet === expected)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    // one hot key carrying ~all rows of the left side vs a tiny right side:
    // classic production skew. Lower AQE's thresholds so the local dataset
    // qualifies, force SMJ so the skew reaches the join, and check the
    // ADAPTIVE final plan marks the join's scan as skew-split.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // kill both the static AND the AQE runtime broadcast so the join
      // stays a shuffled SMJ where skew splitting applies
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val left = spark.range(0, 60000)
        .select((col("id") % 1000 === 0).cast("int").as("flag"), col("id"))
        .select(when(col("flag") === 1, col("id") % 7).otherwise(lit(3L)).as("k"),
          concat(lit("payload_payload_payload_"), col("id")).as("v"))
      val right = spark.range(0, 10).select(col("id").as("k"), col("id").as("rv"))
      val joined = left.hint("merge").join(right, "k")
      joined.collect() // execute THIS query so its adaptive plan finalizes
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n${plan.take(1200)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("rdd sliding triples equal a driver-side reimplementation at sf0.001") {
    import spark.implicits._
    val got = graft.queries.Scale.defs("x14_rdd_sliding")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3)).toMap
    val events = Tables.events(spark, sf001)
      .selectExpr("event_type", "ts", "event_id", "CAST(round(value * 1000) AS BIGINT) AS vm")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
    val expected = events.groupBy(_._1).flatMap { case (et, rs) =>
      val ordered = rs.sortBy(r => (r._2.getTime, r._3))
      ordered.map(_._4).sliding(3).zipWithIndex.collect {
        case (w, i) if w.length == 3 && ordered(i + 2)._3 <= 3000L =>
          (et, i.toLong + 3) -> w.sum / 3
      }
    }.toMap
    assert(got === expected)
  }

  test("counter-based random generation: in-range, id-keyed, fit recovers the planted weights") {
    val out = graft.queries.Scale.defs("x15_random_data")(spark, sf001).collect()
    assert(out.length === 51)
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 999)) // x1 uniform range
    assert(out.forall(r => r.getLong(4) >= 0))                        // exponential >= 0
    // the planted linear model is recovered from the generated stream
    val r = out.head
    assert(math.abs(r.getLong(5) - 2000000000L) < 100000000L) // b0 ~ 2000 milli
    assert(math.abs(r.getLong(6) - 3000000L) < 300000L)       // w1 ~ 3
    assert(math.abs(r.getLong(7) - 5000000L) < 300000L)       // w2 ~ 5
    // counter-keyed: re-running yields the identical rows (no hidden seed state)
    val again = graft.queries.Scale.defs("x15_random_data")(spark, sf001).collect()
    assert(out.toSeq === again.toSeq)
  }

  test("tall-skinny svd: hand-solved 2x2 factors, orthonormal U, axis-aligned diagonal case") {
    import spark.implicits._
    // rows (2,1) and (1,2): G = [[5,4],[4,5]], eigenvalues 9 and 1, so
    // sv = (3, 1), v1 = (1,1)/sqrt2, v2 = (1,-1)/sqrt2; U rows are
    // (±1/sqrt2) -> 707107 micro
    val feats = Seq((1L, 2L, 1L), (2L, 1L, 2L)).toDF("id", "x1", "x2")
    val out = graft.ext.Scale.tallSkinnySvd(feats, "id", 10L).collect()
    val r1 = out.find(_.getLong(0) == 1L).get
    assert((r1.getLong(3), r1.getLong(4)) === ((3000000L, 1000000L))) // sv1, sv2
    assert((r1.getLong(5), r1.getLong(6)) === ((707107L, 707107L)))   // v1
    assert((r1.getLong(7), r1.getLong(8)) === ((707107L, -707107L)))  // v2
    assert((r1.getLong(1), r1.getLong(2)) === ((707107L, 707107L)))   // u row 1
    val r2 = out.find(_.getLong(0) == 2L).get
    assert((r2.getLong(1), r2.getLong(2)) === ((707107L, -707107L)))  // u row 2
    // diagonal Gramian with the larger mass on x2: axis-aligned vectors
    val diag = Seq((1L, 3L, 0L), (2L, 0L, 4L)).toDF("id", "x1", "x2")
    val d1 = graft.ext.Scale.tallSkinnySvd(diag, "id", 10L).collect()
      .find(_.getLong(0) == 2L).get
    assert((d1.getLong(3), d1.getLong(4)) === ((4000000L, 3000000L)))
    assert((d1.getLong(5), d1.getLong(6)) === ((0L, 1000000L))) // v1 = e2
    assert((d1.getLong(1), d1.getLong(2)) === ((1000000L, 0L))) // row (0,4): u1=1
  }

  test("secondary sort: the shuffle-riding sort feeds the window — one exchange, one sort") {
    import org.apache.spark.sql.expressions.Window
    val ord = Tables.orders(spark, sf001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderstatus"))
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val ranked = Scale.secondarySorted(ord, "o_custkey",
        Seq("o_orderdate", "o_orderkey"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .filter(col("pos") <= 3)
    val plan = ranked.queryExecution.executedPlan.toString
    // the window's required distribution and child ordering are both
    // satisfied by the secondary-sorted layout — it must NOT add its own
    val exchanges = "Exchange ".r.findAllIn(plan).size
    val sorts = "Sort \\[".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected the single key shuffle, got $exchanges:\n${plan.take(1500)}")
    assert(sorts === 1, s"expected only the within-partition sort, got $sorts:\n${plan.take(1500)}")
    // and the layout is result-invisible
    val naive = ord.withColumn("pos", row_number().over(w).cast("long"))
      .filter(col("pos") <= 3)
    assert(ranked.collect().toSet === naive.collect().toSet)
  }

  test("tall-skinny qr: hand-solved cholesky R, orthonormal Q, partitioning-deterministic") {
    import spark.implicits._
    // A = [[3,1],[4,2]]: Gramian [[25,11],[11,5]] -> R = [[5, 2.2],
    // [0, 0.4]], Q = [[0.6, -0.8], [0.8, 0.6]] (a rotation)
    val feats = Seq((1L, 3L, 1L), (2L, 4L, 2L)).toDF("id", "x1", "x2")
    val out = graft.ext.Scale.tallSkinnyQr(feats, "id", 10L).collect()
    val r1 = out.find(_.getLong(0) == 1L).get
    assert((r1.getLong(3), r1.getLong(4), r1.getLong(5)) ===
      ((5000000L, 2200000L, 400000L)))
    assert((r1.getLong(1), r1.getLong(2)) === ((600000L, -800000L)))
    val r2 = out.find(_.getLong(0) == 2L).get
    assert((r2.getLong(1), r2.getLong(2)) === ((800000L, 600000L)))
    // Q columns orthonormal to micro tolerance
    val q = out.map(r => (r.getLong(1) / 1e6, r.getLong(2) / 1e6))
    val (d11, d12, d22) = q.foldLeft((0.0, 0.0, 0.0)) { case ((a, b, c), (u, v)) =>
      (a + u * u, b + u * v, c + v * v) }
    assert(math.abs(d11 - 1.0) < 1e-5)
    assert(math.abs(d12) < 1e-5)
    assert(math.abs(d22 - 1.0) < 1e-5)
    // exact integer Gramian makes the factors partitioning-deterministic
    val p = graft.ext.Scale.tallSkinnyQr(feats.repartition(7, col("x2")), "id", 10L)
      .collect()
    assert(p.toSeq === out.toSeq)
  }

  test("block multiply reproduces the dense product and is block-size invariant") {
    import spark.implicits._
    // A = [[1,2],[3,4]], B = [[5,6],[7,8]] -> C = [[19,22],[43,50]]
    val a = Seq((0L, 0L, 1L), (0L, 1L, 2L), (1L, 0L, 3L), (1L, 1L, 4L)).toDF("i", "k", "va")
    val b = Seq((0L, 0L, 5L), (0L, 1L, 6L), (1L, 0L, 7L), (1L, 1L, 8L)).toDF("k", "j", "vb")
    val got = Scale.blockMultiply(a, b, 1).orderBy("i", "j").collect()
      .map(r => (r.getLong(2), r.getLong(3)) -> r.getLong(4)).toMap
    assert(got === Map((0L, 0L) -> 19L, (0L, 1L) -> 22L, (1L, 0L) -> 43L, (1L, 1L) -> 50L))
    // the grid is routing only: any block size yields the same product
    val one = Scale.blockMultiply(a, b, 100).orderBy("i", "j").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(one === got.toSeq.sortBy(_._1).map { case ((i, j), v) => (i, j, v) })
    // sparse zero cells are absent, not zero rows
    val sp = Scale.blockMultiply(Seq((0L, 0L, 1L)).toDF("i", "k", "va"),
      Seq((1L, 1L, 9L)).toDF("k", "j", "vb"), 1)
    assert(sp.count() === 0L)
  }

  test("mf datagen: every emitted rating factors through its rank-2 entries plus bounded noise") {
    val rows = graft.queries.Scale.defs("x25_mf_datagen")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(u1, u2, v1, v2, rating) = (2 to 6).map(r.getLong)
      val noise = rating - (u1 * v1 + u2 * v2)
      assert(noise >= -10000L && noise <= 10000L)
      Seq(u1, u2, v1, v2).foreach(x => assert(x >= -1000L && x <= 1000L))
    }
    // the same (i, j) always draws the same factors: rows with a shared
    // i agree on (u1, u2), rows with a shared j on (v1, v2)
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.map(r => (r.getLong(2), r.getLong(3))).distinct.length === 1)
    }
    rows.groupBy(_.getLong(1)).values.foreach { g =>
      assert(g.map(r => (r.getLong(4), r.getLong(5))).distinct.length === 1)
    }
  }

  test("logit datagen: classes split evenly and feature means separate by ~eps") {
    val rows = graft.queries.Scale.defs("x24_logit_datagen")(spark, sf001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === Set(0L, 1L))
    // parity labels: the two classes differ by at most one example
    assert(math.abs(rows(0L)._1 - rows(1L)._1) <= 1L)
    // class-0 means sit near 0, class-1 near eps = 3000 milli (the
    // Box-Muller draws are unit-Gaussian, so sample means over ~1500
    // rows land well inside ±300 milli of their targets)
    for (c <- Seq(2, 3)) {
      val m0 = if (c == 2) rows(0L)._2 else rows(0L)._3
      val m1 = if (c == 2) rows(1L)._2 else rows(1L)._3
      assert(math.abs(m0) < 300, s"class-0 mean $m0")
      assert(math.abs(m1 - 3000) < 300, s"class-1 mean $m1")
    }
  }

  test("block add: both-present sum, one-side pass-through, zero sums kept") {
    import spark.implicits._
    val a = Seq((0L, 0L, 5L), (0L, 1L, 2L), (130L, 2L, -7L)).toDF("i", "j", "va")
    val b = Seq((0L, 0L, 3L), (1L, 1L, 9L), (130L, 2L, 7L)).toDF("i", "j", "vb")
    val got = Scale.blockAdd(a, b, 64).orderBy("i", "j").collect()
      .map(r => (r.getLong(2), r.getLong(3)) -> (r.getLong(0), r.getLong(1), r.getLong(4))).toMap
    assert(got === Map(
      (0L, 0L) -> ((0L, 0L, 8L)),     // both present: 5 + 3
      (0L, 1L) -> ((0L, 0L, 2L)),     // left only passes through
      (1L, 1L) -> ((0L, 0L, 9L)),     // right only passes through
      (130L, 2L) -> ((2L, 0L, 0L)))) // -7 + 7 KEPT as an explicit zero
  }

  test("tree aggregate equals the one-shot aggregate; fan-in bounded per level") {
    import spark.implicits._
    val df = (1L to 5000L).map(i => (i, i % 97)).toDF("k", "v")
    def aggs(first: Boolean) = {
      def c(n: String) = if (first) col("v") else col(n)
      Seq((if (first) count(lit(1)) else sum("n")).as("n"),
        sum(if (first) col("v") else col("s")).as("s"),
        min(c("mn")).as("mn"), max(c("mx")).as("mx"))
    }
    val tree = Scale.treeAggregate(df, "k", leaves = 64, fanout = 8,
      partials = aggs(first = true), merges = aggs(first = false))
    val got = tree.head()
    val want = df.agg(count(lit(1)).as("n"), sum("v").as("s"),
      min("v").as("mn"), max("v").as("mx")).head()
    assert(got === want)
    // three shuffle levels: 64 leaves -> 8 -> 1 (each merge fan-in <= 8)
    val exchanges = tree.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 3, s"expected 3 exchanges (64 -> 8 -> 1), got $exchanges")
    // degenerate single-leaf tree still answers (partials alone)
    val one = Scale.treeAggregate(df, "k", leaves = 1, fanout = 8,
      partials = aggs(first = true), merges = aggs(first = false)).head()
    assert(Seq(one.getLong(0), one.getLong(1)) === Seq(want.getLong(0), want.getLong(1)))
  }

  test("accumulator audit counts every row exactly once across partitionings") {
    import spark.implicits._
    val vals = (1L to 1000L).map(i => i % 97)
    for (parts <- Seq(1, 13)) {
      val got = Scale.auditedCleanse(
        vals.toDS().repartition(parts), suspectAbove = 50L).head()
      assert(got.getLong(0) === 1000L)
      assert(got.getLong(1) === vals.count(_ > 50L))
      assert(got.getLong(2) === vals.count(_ <= 50L))
      assert(got.getLong(3) === vals.filter(_ <= 50L).sum)
    }
    // all-clean edge: zero suspects, sum intact
    val clean = Scale.auditedCleanse((1L to 10L).toDS(), suspectAbove = 100L).head()
    assert((clean.getLong(0), clean.getLong(1), clean.getLong(2), clean.getLong(3)) ===
      ((10L, 0L, 10L, 55L)))
  }

  test("coordinate transpose -> indexed rows: swap, j-ordered assembly, dims, block ids") {
    import spark.implicits._
    // entries of a 3x12 matrix (max i = 2, max j = 11)
    val entries = Seq(
      (0L, 11L, 5L), (2L, 0L, 7L), (2L, 3L, 1L), (1L, 3L, 2L))
      .toDF("i", "j", "v")
    val out = Scale.coordinateTransposeRows(entries, rowsPerBlock = 8)
      .orderBy("i").collect()
    // transposed: rows are the ORIGINAL column indices; dims swap to 12x3
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 3L, 11L))
    val byI = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(byI(3L) === ((2L, 3L, 0L, 12L, 3L)))   // nnz 2, sum 1+2, block 0
    assert(byI(11L) === ((1L, 5L, 1L, 12L, 3L)))  // 11 div 8 = block 1
    // the row digest is j-ordered: row 3 holds (1,2) then (2,1) after swap
    val md = out.find(_.getLong(0) == 3L).get.getString(3)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("1:2,2:1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md === expect)
  }

  test("kmeans datagen: per-cluster means recover the generating centers") {
    val out = graft.queries.Scale.defs("x20_kmeans_datagen")(spark, sf01).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val (c1, c2, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (m1, m2) = (r.getLong(4), r.getLong(5))
      assert(n > 1000)
      // unit-Gaussian point noise: the mean's sampling error is
      // ~1000/sqrt(n) milli — allow 5 sigma plus the DIV floor unit
      val tol = (5000.0 / math.sqrt(n.toDouble)).toLong + 1
      assert(math.abs(m1 - c1) <= tol, s"cluster ${r.getLong(0)}: $m1 vs $c1")
      assert(math.abs(m2 - c2) <= tol, s"cluster ${r.getLong(0)}: $m2 vs $c2")
    }
  }

  test("topKByKey: bounded aggregate equals window rank, ties break on larger id") {
    import spark.implicits._
    // key 1: four values with a tie at 30 (ids 7 and 9 — 9 must win the
    // earlier rank); key 2: exactly k; key 3: fewer than k
    val df = Seq(
      (1L, 30L, 7L), (1L, 30L, 9L), (1L, 50L, 1L), (1L, 10L, 2L),
      (2L, 5L, 4L), (2L, 6L, 3L), (2L, 4L, 8L),
      (3L, 99L, 6L))
      .toDF("k", "v", "id").repartition(5) // arbitrary incoming layout
    val got = Scale.topKByKey(df, "k", "v", "id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq(
      (1L, 1L, 50L, 1L), (1L, 2L, 30L, 9L), (1L, 3L, 30L, 7L),
      (2L, 1L, 6L, 3L), (2L, 2L, 5L, 4L), (2L, 3L, 4L, 8L),
      (3L, 1L, 99L, 6L)))
  }

  test("topKByKey matches the window formulation on a real table and combines map-side") {
    val sup = Tables.supplier(spark, sf001).select(
      col("s_nationkey").cast("long").as("s_nationkey"),
      expr("CAST(round(s_acctbal * 100) AS BIGINT)").as("cents"), col("s_suppkey"))
    val agg = Scale.topKByKey(sup, "s_nationkey", "cents", "s_suppkey", k = 3)
    val win = {
      import org.apache.spark.sql.expressions.Window
      sup.withColumn("rk", row_number().over(Window.partitionBy("s_nationkey")
          .orderBy(col("cents").desc, col("s_suppkey").desc)))
        .filter("rk <= 3")
        .selectExpr("s_nationkey", "CAST(rk AS BIGINT) AS rk", "cents", "s_suppkey")
    }
    val a = agg.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val w = win.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a === w)
    // the plan is a partial+final object aggregate — per-key state is
    // k-bounded on BOTH sides of the exchange (no whole-group sort)
    val plan = agg.queryExecution.executedPlan.toString
    assert("(?i)objecthashaggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
    assert(!plan.contains("WindowExec"))
  }

  test("sampleByKeyExact: exactly ceil(n_k * f_k) rows per stratum, edge fractions included") {
    import spark.implicits._
    // strata: a (7 rows), b (3 rows), c (5 rows, absent from fractions)
    val df = ((1 to 7).map(i => ("a", i.toLong)) ++ (8 to 10).map(i => ("b", i.toLong)) ++
      (11 to 15).map(i => ("c", i.toLong))).toDF("k", "id")
    // a: 100% -> all 7; b: 1 ppm -> ceil(3e-6) = 1 row (the ceil floor)
    val got = Scale.sampleByKeyExact(df, "k", "id", Map("a" -> 1000000L, "b" -> 1L))
      .collect().groupBy(_.getString(0))
    assert(got("a").length === 7)
    assert(got("b").length === 1)
    assert(!got.contains("c")) // keys without a fraction are excluded
    // quota column is the exact integer ceil, and picks are 1..quota
    assert(got("a").map(_.getLong(2)).sorted.toSeq === (1L to 7L))
    assert(got("b").head.getLong(4) === 1L)
    // deterministic: a rerun picks the identical ids
    val again = Scale.sampleByKeyExact(df, "k", "id", Map("a" -> 1000000L, "b" -> 1L))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again === got.values.flatten.map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("spreadForScans: spreads starved big frames, no-ops on small or already-wide ones") {
    import spark.implicits._
    val slots = spark.sparkContext.defaultParallelism
    // big + starved: 1 partition, rows far above the per-slot floor -> spread
    val big = spark.range(0, slots * Scale.SpreadMinRowsPerSlot + 1, 1, 1).toDF("x")
    val spread = Scale.spreadForScans(big, slots * Scale.SpreadMinRowsPerSlot + 1)
    assert(spread.rdd.getNumPartitions === slots)
    // rows identical (round-robin repartition moves, never drops/duplicates)
    assert(spread.agg(sum("x"), count(lit(1))).head() ===
      big.agg(sum("x"), count(lit(1))).head())
    // small frame: repartition would cost more than it buys -> untouched plan
    val small = spark.range(0, 100, 1, 1).toDF("x")
    assert(Scale.spreadForScans(small, 100).rdd.getNumPartitions === 1)
    // already wide enough (the 100 TB case: source supplies the splits) -> no-op
    val wide = spark.range(0, 1000000, 1, slots).toDF("x")
    assert(Scale.spreadForScans(wide, 1000000L).rdd.getNumPartitions === slots)
  }
}
