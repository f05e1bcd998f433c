package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** ANN correctness beyond the oracle mirror: structural invariants and
  * recall of the approximate paths against the exact baseline. */
class SimilaritySpec extends SparkSpec {

  private val Dims = 64
  private def emb = Tables.embeddings(spark, sf01)
  private def probeSet = emb.filter(col("vec_id") % 50 === 0)

  private def topSet(df: org.apache.spark.sql.DataFrame, k: Int): Set[(Long, Long)] =
    df.filter(col("rank") <= k).select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("brute-force top-k is sorted by cosine within each probe") {
    val rows = Similarity.bruteForceTopK(probeSet, emb, "vec_id", "embedding", 5)
      .orderBy("probe_id", "rank").collect()
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val cos = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(g.length === 5)
    }
  }

  test("vector index: clusters in [1,8], signatures in [0,65536)") {
    val idx = Similarity.vectorIndex(emb, "vec_id", "embedding", Dims).collect()
    assert(idx.length === 500)
    assert(idx.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 8))
    assert(idx.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 65536))
  }

  test("ANN paths rank their candidates exactly like brute force") {
    // every (probe, vec) an ANN path returns must appear in the exhaustive
    // ranking with the identical rounded cosine
    val exact = Similarity.bruteForceTopK(probeSet, emb, "vec_id", "embedding", 500)
      .select("probe_id", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Seq(
      Similarity.rpLshTopK(probeSet, emb, "vec_id", "embedding", Dims),
      Similarity.ivfTopK(probeSet, emb, "vec_id", "embedding", Dims),
      Similarity.ivfSampledTopK(probeSet, emb, "vec_id", "embedding", Dims)
    ).foreach { ann =>
      val got = ann.select("probe_id", "vec_id", "cosine").collect()
      assert(got.nonEmpty)
      got.foreach { r =>
        assert(exact((r.getLong(0), r.getLong(1))) === r.getDouble(2))
      }
    }
  }

  test("vector kernels degrade gracefully on null / short vectors") {
    import spark.implicits._
    val planes = Similarity.signPlanes(4, 4, "t")
    val df = Seq(
      (1L, Some(Seq(1.0, -2.0, 3.0, 4.0))),
      (2L, Some(Seq(1.0))), // shorter than dims: only present elements count
      (3L, Option.empty[Seq[Double]])
    ).toDF("id", "v")
    val rows = df.select(col("id"),
        Similarity.signatureUdf(planes)(col("v")).as("sig"),
        Similarity.anchorDotsUdf(planes)(col("v")).as("dots"))
      .orderBy("id").collect()
    assert(!rows(0).isNullAt(1) && !rows(0).isNullAt(2))
    // short vector: bit j set iff sign of plane_j(0) * v(0) > 0
    val expectedSig = planes.zipWithIndex
      .filter { case (p, _) => p.head * 1.0 > 0 }.map(1 << _._2).sum
    assert(rows(1).getInt(1) === expectedSig)
    assert(rows(1).getSeq[Double](2) === planes.map(_.head * 1.0))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("ANN recall@3 against exact top-3 clears the floor") {
    val exact3 = topSet(
      Similarity.bruteForceTopK(probeSet, emb, "vec_id", "embedding", 3), 3)
    val rp = topSet(Similarity.rpLshTopK(probeSet, emb, "vec_id", "embedding", Dims), 3)
    val ivf = topSet(Similarity.ivfTopK(probeSet, emb, "vec_id", "embedding", Dims), 3)
    val rpRecall = (exact3 & rp).size.toDouble / exact3.size
    val ivfRecall = (exact3 & ivf).size.toDouble / exact3.size
    info(s"recall@3 rp-lsh=$rpRecall ivf=$ivfRecall")
    // random 64-dim data has weak neighbor structure; the point is the
    // pipelines work and beat random chance (3/499 ~ 0.006) by far
    assert(rpRecall >= 0.2, s"rp-lsh recall too low: $rpRecall")
    assert(ivfRecall >= 0.2, s"ivf recall too low: $ivfRecall")
  }

  test("sampled-IVF agrees with scanning the probed Lloyd clusters exhaustively") {
    import spark.implicits._
    // recompute the same sampled training directly and verify the operator
    // equals brute force restricted to each probe's 2 nearest clusters —
    // the whole approximation is the cluster restriction, nothing else
    val centers = graft.ext.Clustering.sampledCenters(
      emb, "vec_id", "embedding", Dims, k = 16, iters = 2, sampleMod = 4)
    val quant = graft.ext.Clustering.quantized(emb, "vec_id", "embedding")
    val corpusCl = quant
      .withColumn("cluster", graft.ext.Clustering.assignUdf(centers)(col("vq")))
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    val probeCl = quant.filter(col("vec_id") % 50 === 0)
      .withColumn("cls", Similarity.nearestClustersUdf(centers, 2)(col("vq")))
      .select("vec_id", "cls").as[(Long, Seq[Long])].collect().toMap
    val exact = Similarity.bruteForceTopK(probeSet, emb, "vec_id", "embedding", 500)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val expected = exact
      .filter { case (p, v, _) => probeCl(p).contains(corpusCl(v)) }
      .groupBy(_._1).flatMap { case (p, g) =>
        g.toSeq.sortBy { case (_, v, c) => (-c, v) }.take(3).zipWithIndex
          .map { case ((_, v, c), i) => (p, i + 1, v, c) }
      }.toSet
    val got = Similarity.ivfSampledTopK(probeSet, emb, "vec_id", "embedding", Dims)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === expected)
  }

  test("sq8: code-domain top-3 tracks exact integer L2 top-3; deterministic") {
    import spark.implicits._
    val got = Similarity.sq8TopK(probeSet, emb, "vec_id", "embedding", Dims, topK = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    assert(got.forall(_._4 >= 0L))
    // exact L2 ground truth over the SAME quantized integers, driver-side
    val vecs = graft.ext.Clustering.quantized(emb, "vec_id", "embedding")
      .as[(Long, Seq[Long])].collect().toMap
    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val probes = vecs.keys.filter(_ % 50 == 0).toSeq
    val truth = probes.flatMap { p =>
      vecs.toSeq.filter(_._1 != p)
        .sortBy { case (v, x) => (l2(vecs(p), x), v) }.take(3)
        .map { case (v, _) => (p, v) }
    }.toSet
    val hits = got.filter { case (p, _, v, _) => truth((p, v)) }.length
    // 8-bit range quantization distorts little: recall@3 clears 0.8
    assert(hits.toDouble / got.length >= 0.8, s"recall ${hits.toDouble / got.length}")
    val again = Similarity.sq8TopK(probeSet, emb.repartition(7, col("vec_id")),
        "vec_id", "embedding", Dims, topK = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(x => (x._1, x._2)).toSeq === got.sortBy(x => (x._1, x._2)).toSeq)
  }

  test("sq8 rerank: candK covering the corpus reproduces brute force exactly") {
    // with the candidate stage recalling EVERYTHING, the rerank stage IS
    // s01 — equality pins that stage 2 is the exact cosine, not an
    // approximation of one
    val all = Similarity.sq8RerankTopK(probeSet, emb, "vec_id", "embedding",
        Dims, candK = 100000, topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val brute = Similarity.bruteForceTopK(probeSet, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(all.sortBy(x => (x._1, x._2)).toSeq === brute.sortBy(x => (x._1, x._2)).toSeq)
    // and the bounded-candidate path emits a subset of its own stage-1 set
    val cands = Similarity.sq8TopK(probeSet, emb, "vec_id", "embedding", Dims, topK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Similarity.sq8RerankTopK(probeSet, emb, "vec_id", "embedding", Dims)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.forall(cands))
  }

  test("ivf-pq: hits scoped to the probed coarse lists; deterministic across partitionings") {
    import spark.implicits._
    // recompute the same coarse training directly: every hit must come
    // from one of its probe's two probed lists, and the reported cluster
    // must be that corpus vector's own list — the inverted-list routing
    // is the half of IVFADC the oracle's hash alone can't localize
    val centers = graft.ext.Clustering.sampledCenters(
      emb, "vec_id", "embedding", Dims, k = 8, iters = 2, sampleMod = 4)
    val quant = graft.ext.Clustering.quantized(emb, "vec_id", "embedding")
    val corpusCl = quant
      .withColumn("cluster", graft.ext.Clustering.assignUdf(centers)(col("vq")))
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    val probeCl = quant.filter(col("vec_id") % 50 === 0)
      .withColumn("cls", Similarity.nearestClustersUdf(centers, 2)(col("vq")))
      .select("vec_id", "cls").as[(Long, Seq[Long])].collect().toMap
    val got = Similarity.ivfPqTopK(probeSet, emb, "vec_id", "embedding", Dims)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (p, _, v, cl, d) =>
      assert(corpusCl(v) === cl)
      assert(probeCl(p).contains(cl))
      assert(d >= 0.0)
    }
    // ranks contiguous from 1 within each probe
    got.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq === (1 to g.size).toSeq)
    }
    // exact-integer training + shared kernels: partitioning-invariant
    val again = Similarity.ivfPqTopK(probeSet,
        emb.repartition(7, col("vec_id")), "vec_id", "embedding", Dims)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(again.sortBy(x => (x._1, x._2)).toSeq === got.sortBy(x => (x._1, x._2)).toSeq)
  }

  test("rp near-dup pairs: dedup-first expansion equals the raw banded self-join") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode, expr, round}
    // duplicate-heavy corpus: sf0.001 embeddings tiled 3x under shifted ids
    val base = Tables.embeddings(spark, sf001)
    val tiled = (0 until 3).map(k =>
      base.select((col("vec_id") + k * 100000L).as("vec_id"), col("embedding")))
      .reduce(_ union _)
    val got = Similarity.rpNeardupPairs(tiled, "vec_id", "embedding", Dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the raw (pre-dedup-first) formulation, reconstructed inline
    val planes = Similarity.signPlanes(16, Dims, "pl")
    val bandExpr = "transform(sequence(0, 3), " +
      "j -> concat_ws(':', cast(j as string), cast((shiftright(sig, 4 * j) & 15) as string)))"
    val q = tiled.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", graft.functions.VectorFunctions.l2norm(col("v")))
    val banded = q.withColumn("sig", Similarity.signatureUdf(planes)(col("v")))
      .select(col("vec_id"), explode(expr(bandExpr)).as("nkey"))
    val raw = banded.select(col("vec_id").as("id_a"), col("nkey"))
      .join(banded.select(col("vec_id").as("id_b"), col("nkey")), "nkey")
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
      .join(q.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(q.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      .withColumn("cosine",
        graft.functions.VectorFunctions.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= 0.4)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(raw.nonEmpty)
    assert(got === raw)
  }

  test("rp near-dup pairs: zero-norm and null vectors never pair; copies verify by real self-cosine") {
    import spark.implicits._
    val v = (0 until Dims).map(_ * 0.01)
    val corpus = Seq(
      (1L, Some(v)), (2L, Some(v)),                          // exact copies
      (3L, Some(Seq.fill(Dims)(0.0))), (4L, Some(Seq.fill(Dims)(0.0))), // zero-norm copies: cosine NaN
      (5L, Option.empty[Seq[Double]])                        // null vector
    ).toDF("vec_id", "embedding")
    val got = Similarity.rpNeardupPairs(corpus, "vec_id", "embedding", Dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // zero-norm cosine is undefined: the raw formulation would raise an
    // ANSI divide-by-zero on the colliding zero pair, this operator
    // DEFINES the behavior as "never pairs" (null-guarded division);
    // null vectors are excluded from banding outright
    assert(got === Set((1L, 2L, 1.0)))
  }

  test("PQ self-recovery: probes identical to codebook seeds reconstruct at distance 0") {
    import spark.implicits._
    // 16 distinct vectors = exactly the k seeds, so after one Lloyd round
    // every vector IS its own (per-subspace) centroid: a probe copy must
    // rank its original first at ADC distance exactly 0.
    def vec(i: Int): Seq[Double] = (0 until Dims).map(d => (i * Dims + d) / 1000.0)
    val corpus = (0 until 16).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val probesDf = (0 until 16).map(i => (100L + i, vec(i))).toDF("vec_id", "embedding")
    val top1 = Similarity.pqTopK(probesDf, corpus, "vec_id", "embedding", Dims, topK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(top1.length === 16)
    top1.foreach { case (pid, vid, d) =>
      assert(vid === pid - 100L)
      assert(d === 0.0)
    }
  }

  test("PQ ADC ranking matches exact distances when reconstruction is exact") {
    import spark.implicits._
    // same 16-seed corpus: reconstruction is lossless, so ADC distance =
    // exact squared L2 and the full ranking equals the exact ranking
    def vec(i: Int): Seq[Double] = (0 until Dims).map(d => ((i * 7 + d) % 31) / 10.0)
    val corpus = (0 until 16).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val probe = Seq((200L, vec(0))).toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(probe, corpus, "vec_id", "embedding", Dims, topK = 16)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toList
    val exact = (0 until 16).map { i =>
      val (a, b) = (vec(0), vec(i))
      val d = (0 until 8).map { m =>
        (8 * m until 8 * m + 8).map(j => (a(j) - b(j)) * (a(j) - b(j))).sum
      }.sum
      (d, i.toLong)
    }.sorted.zipWithIndex.map { case ((_, vid), r) => (r + 1, vid) }.toList
    assert(got === exact)
  }

  test("partitioned IVF index: probe scan prunes to the probed clusters, same answer") {
    val path = "/tmp/graft_scale/ivf_spec"
    val part = Similarity.ivfTopKPartitioned(spark, probeSet, emb,
      "vec_id", "embedding", Dims, indexPath = path)
    // identical to the in-flight IVF path: storage layout is invisible
    val inflight = Similarity.ivfTopK(probeSet, emb, "vec_id", "embedding", Dims)
    assert(part.collect().toSet === inflight.collect().toSet)
    // and the stored-index scan is partition-pruned: the cluster predicate
    // becomes a PartitionFilter (directory pruning at the source), not a
    // pushed data filter
    val probedRead = spark.read.parquet(path).filter(col("cluster").isin(1, 2))
    val scan = probedRead.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.partitionFilters.nonEmpty, scan.toString.take(800))
    assert(!scan.dataFilters.exists(_.references.exists(_.name == "cluster")),
      "cluster must prune directories, not filter rows")
    val selected = scan.relation.location.listFiles(scan.partitionFilters, Nil).length
    val total = scan.relation.location.listFiles(Nil, Nil).length
    assert(selected < total,
      s"pruned scan selects $selected of $total partitions — nothing was pruned")
  }

  test("mmr: a duplicated top hit is demoted below the diverse alternative") {
    import spark.implicits._
    // probe 0 along e1; vectors 1 and 2 are IDENTICAL near-probe copies;
    // vector 3 is a distinct direction still similar to the probe.
    // Plain cosine top-3 = (1, 2, 3); at lambda=0.5 the redundancy
    // penalty of the exact copy (sim=1 with the already-selected 1)
    // outweighs its higher relevance, so MMR picks 1, then 3, then 2.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Array(0.7f, 0.0f, 0.7f, 0.0f))).toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.mmrTopK(
        vecs.filter($"vec_id" === 0L), vecs, "vec_id", "embedding",
        candK = 3, lambda = 0.5)
      .orderBy("rank").collect().map(r => r.getInt(1) -> r.getLong(2))
    assert(out.toSeq === Seq(1 -> 1L, 2 -> 3L, 3 -> 2L))
    // at lambda=1 MMR degenerates to the plain cosine order
    val plain = graft.ext.Similarity.mmrTopK(
        vecs.filter($"vec_id" === 0L), vecs, "vec_id", "embedding",
        candK = 3, lambda = 1.0)
      .orderBy("rank").collect().map(r => r.getInt(1) -> r.getLong(2))
    assert(plain.toSeq === Seq(1 -> 1L, 2 -> 2L, 3 -> 3L))
  }

  test("semDedup: every vector emitted once; removals have a smaller same-cluster near-dup") {
    val emb = Tables.embeddings(spark, sf01)
    val out = graft.ext.Similarity.semDedup(emb, "vec_id", "embedding", dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length === emb.count(), "one verdict per corpus vector")
    val cluster = out.map(r => r._1 -> r._2).toMap
    val removed = out.filter(!_._3).map(_._1).toSet
    assert(removed.nonEmpty, "the sf0.01 corpus has same-cluster near-dups to remove")
    // justify every removal and every keep against the pair set
    val pairs = graft.ext.Similarity.rpNeardupPairs(
        emb, "vec_id", "embedding", dims = 64, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => cluster(a) == cluster(b) }
    val removable = pairs.map(_._2).toSet // id_a < id_b: larger id loses
    assert(removed === removable,
      "removed set must be exactly the larger ids of same-cluster pairs (greedy rule)")
  }

  test("DIMSUM: sampled estimate tracks exact within the paper bound; mllib concurs") {
    import spark.implicits._
    // 1000 rows x 8 cols, deterministic pseudo-noise; col 2 = col 1 plus
    // small noise -> cos(1,2) ~ 0.97, far above threshold 0.05. Column
    // magnitudes ~ 39 exceed sqrt(gamma) ~ 20.4, so every column SAMPLES
    // (p ~ 0.5) — a genuine DIMSUM sample, not the exact degeneration —
    // while gamma ~ 416 keeps the relative error ~ 5%, well inside the
    // paper's 20% band (error scales ~ 1/sqrt(gamma), NOT with rows).
    def noise(i: Long, j: Int): Float = (((i * 31 + j * 17) % 13) - 6) / 3.0f
    val data = (1L to 1000L).map { i =>
      val base = Array.tabulate(6)(j => noise(i, j + 2))
      (i, (Seq(noise(i, 1), noise(i, 1) + noise(i, 99) * 0.2f) ++ base).toSeq)
    }
    val df = data.toDF("vec_id", "embedding")
    val thr = 0.05
    val est = Similarity.columnSimilaritiesDIMSUM(df, "vec_id", "embedding",
        dim = 8, threshold = thr)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val exact = Similarity.columnSimilarities(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(exact((1L, 2L)) > 900000L, s"fixture cos(1,2) = ${exact((1L, 2L))}")
    // the paper's guarantee: above-threshold pairs within ~20% relative
    assert(math.abs(est((1L, 2L)) - exact((1L, 2L))).toDouble
      / exact((1L, 2L)) < 0.2, s"est ${est((1L, 2L))} vs ${exact((1L, 2L))}")
    // mllib's own thresholded DIMSUM lands inside the same bound on the
    // same matrix — pins our convention to the reference's contract
    // (coins differ: theirs XORShift, ours deterministic md5)
    import org.apache.spark.mllib.linalg.{Vectors => MlV}
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val rm = new RowMatrix(spark.sparkContext.parallelize(
      data.map { case (_, v) => MlV.dense(v.map(_.toDouble).toArray) }, 4))
    val ml = rm.columnSimilarities(thr).entries.collect()
      .map(e => (e.i + 1, e.j + 1) -> e.value).toMap
    assert(math.abs(ml((1L, 2L)) * 1e6 - exact((1L, 2L))) / exact((1L, 2L))
      < 0.2, s"mllib ${ml((1L, 2L))} vs exact ${exact((1L, 2L))}")
    // the coin really gates: sampled term counts fall short of the
    // co-occurrence count (1000 shared rows for the dense pair)
    val terms = Similarity.columnSimilaritiesDIMSUM(df, "vec_id", "embedding",
        dim = 8, threshold = thr)
      .filter(col("di") === 1 && col("dj") === 2).head().getLong(2)
    assert(terms > 0 && terms < 1000, s"n_terms $terms should be sampled")
    // deterministic across physical layout
    val a = Similarity.columnSimilaritiesDIMSUM(df.repartition(1), "vec_id",
      "embedding", 8, thr).orderBy("di", "dj").collect()
    val b = Similarity.columnSimilaritiesDIMSUM(df.repartition(7, col("vec_id")),
      "vec_id", "embedding", 8, thr).orderBy("di", "dj").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("DIMSUM: rarely-co-occurring heavy pairs can vanish; light columns stay exact") {
    import spark.implicits._
    // cols 1/2: heavy (two rows of value 40 -> mag ~ 56, p ~ 0.11),
    // co-occurring in ONE row — the pair survives only if both cells win
    // a ~11% coin. col 3: light (mag ~ 1.4 < sqrt(gamma) -> p >= 1,
    // never sampled) — its pairs keep EXACT contributions.
    val df = Seq(
      (1L, Seq(40f, 0f, 1f)), (2L, Seq(40f, 40f, 0f)),
      (3L, Seq(0f, 40f, 1f)), (4L, Seq(0f, 0f, 0.1f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.columnSimilaritiesDIMSUM(df, "vec_id", "embedding",
        dim = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // light col 3's pairs carry every co-occurrence that survived the
    // HEAVY side's coin; the heavy-heavy pair (1,2) must not carry more
    // terms than its single co-occurrence
    assert(got.getOrElse((1L, 2L), 0L) <= 1L)
    assert(got.keys.forall { case (i, j) => i < j && j <= 3 })
  }

  test("column similarities: proportional columns hit cosine 1, orthogonal 0") {
    import spark.implicits._
    // columns: c1=(1,0,2), c2=(0,1,0), c3=2*c1 -> cos(1,3)=1; the
    // orthogonal pairs share no co-nonzero row, so under the sparse
    // convention they are ABSENT rather than materialized as 0
    val df = Seq((1L, Seq(1f, 0f, 2f)), (2L, Seq(0f, 1f, 0f)), (3L, Seq(2f, 0f, 4f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.columnSimilarities(df, "vec_id", "embedding")
      .orderBy("di", "dj").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got === Map((1L, 3L) -> 1000000L))
    // an all-zero column appears in NO row (sparse convention), and
    // gram entries are exact integer sums -> partitioning-independent
    val big = (1L to 60L).map(i => (i, Seq.tabulate(8)(j =>
        if (j == 4) 0f else ((i * (j + 3)) % 7 + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val dims = Similarity.columnSimilarities(big, "vec_id", "embedding")
      .select("di", "dj").collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!dims.contains(5L), "zero column 5 must be absent from the output")
    val a = Similarity.columnSimilarities(big.repartition(1), "vec_id", "embedding")
      .orderBy("di", "dj").collect()
    val b = Similarity.columnSimilarities(big.repartition(9, col("vec_id")), "vec_id", "embedding")
      .orderBy("di", "dj").collect()
    assert(a.toSeq === b.toSeq)
  }
}
