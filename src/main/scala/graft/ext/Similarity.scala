package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{UserDefinedFunction, Window}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`): brute-force cosine top-k as the exactness baseline,
  * random-projection LSH and IVF-style coarse quantization as the scale
  * paths.
  *
  * Hyperplanes/anchors are ±1 sign matrices derived from md5 (seeded,
  * deterministic) and inlined as literal arrays into the expression — the
  * same constants can be embedded in any engine's SQL, so every stage is
  * oracle-checkable, and nothing is recomputed per row.
  *
  * Scale design (billions of vectors, 1000 executors):
  *   - Brute force is probe-set-only: the probe side is broadcast, the scan
  *     stays a single narrow pass over the corpus; top-k is a per-probe
  *     window after a shuffle on probe_id.
  *   - RP-LSH: signature is one map pass; candidates come from a band-key
  *     equi-join (ONE shuffle, no cross join); exact cosine re-ranks only
  *     the candidates.
  *   - IVF: each vector is assigned to its argmax anchor cluster; a probe
  *     scans only its `nprobe` best clusters — at real scale, cluster id
  *     becomes the partition key of the stored corpus so a probe reads
  *     nprobe partitions and everything else is pruned at the source.
  */
object Similarity {

  private def md5Long(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Deterministic ±1 sign matrix (`rows` x `dims`) seeded by `seed`. */
  def signPlanes(rows: Int, dims: Int, seed: String): Seq[Seq[Int]] =
    (0 until rows).map(j => (0 until dims).map(i =>
      if ((md5Long(s"$seed:$j:$i") & 1L) == 1L) 1 else -1))

  /** DuckDB SQL literal for a sign matrix: [[1,-1,...], ...] (for the
    * oracle mirrors; the Spark side captures the matrix in UDF closures). */
  def planesLiteralDuck(planes: Seq[Seq[Int]]): String =
    planes.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  // ---- Compiled kernels ---------------------------------------------------
  // The per-row vector math (signature bits, anchor dots, norms, cosine)
  // must not run as SQL higher-order lambdas: `transform`/`aggregate`
  // lambdas are interpreted per element, so an O(bits*dims) nested lambda
  // costs ~ms per row — at a billion vectors that IS the job. Dot products
  // and norms are native codegen'd expressions
  // (graft.functions.{DotProduct, L2Norm} — they stay inside whole-stage
  // codegen); the plane/anchor projections are JIT'd Scala closures (they
  // capture a literal matrix). Every kernel accumulates doubles LEFT TO
  // RIGHT, bit-identical to the SQL `aggregate(sequence(...))` fragments
  // they replaced, so the DuckDB oracle mirrors are unchanged.

  /** Signed-projection signature (INT, one bit per plane): bit j set iff
    * dot(plane_j, v) > 0. Planes are captured in the closure once, not
    * rebuilt per row like a SQL literal array inside a lambda. */
  def signatureUdf(planes: Seq[Seq[Int]]): UserDefinedFunction = {
    val p: Array[Array[Int]] = planes.map(_.toArray).toArray
    // null vector => null signature, and a vector shorter than dims only
    // contributes its present elements — matching the element_at-based SQL
    // this kernel replaced (null element => bit not set), instead of
    // NPE/IndexOutOfBounds.
    udf { (v: Seq[Double]) =>
      if (v == null) None
      else {
        val x = v.toArray
        var sig = 0; var j = 0
        while (j < p.length) {
          val row = p(j); val n = math.min(row.length, x.length)
          var acc = 0.0; var i = 0
          while (i < n) { acc += row(i) * x(i); i += 1 }
          if (acc > 0) sig |= 1 << j
          j += 1
        }
        Some(sig)
      }
    }
  }

  /** Per-anchor dot products: DOUBLE array of length `anchors.size`. */
  def anchorDotsUdf(anchors: Seq[Seq[Int]]): UserDefinedFunction = {
    val p: Array[Array[Int]] = anchors.map(_.toArray).toArray
    udf { (v: Seq[Double]) =>
      if (v == null) None
      else {
        val x = v.toArray
        Some(p.map { row =>
          val n = math.min(row.length, x.length)
          var acc = 0.0; var i = 0
          while (i < n) { acc += row(i) * x(i); i += 1 }
          acc
        }.toSeq)
      }
    }
  }

  /** (id, vec as DOUBLE array, L2 norm) with `prefix`-namespaced columns.
    * The float->double widening is a native array Cast (codegen'd), not a
    * per-element lambda. */
  private def normed(df: DataFrame, idCol: String, vecCol: String, prefix: String): DataFrame =
    df.select(col(idCol).as(s"${prefix}_id"),
        col(vecCol).cast("array<double>").as(s"${prefix}_v"))
      .withColumn(s"${prefix}_norm", graft.functions.VectorFunctions.l2norm(col(s"${prefix}_v")))

  /** Rank candidate (probe, vec) pairs by exact cosine, keep top k. */
  private def rankTopK(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .withColumn("cosine",
        graft.functions.VectorFunctions.dot(col("probe_v"), col("vec_v"))
          / (col("probe_norm") * col("vec_norm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id"),
        round(col("cosine"), 4).as("cosine"))

  /** Exact cosine top-k of every probe against the corpus (minus self). */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val p = broadcast(normed(probes, idCol, vecCol, "probe"))
    val q = normed(corpus, idCol, vecCol, "vec")
    rankTopK(p.join(q, col("probe_id") =!= col("vec_id")), k)
  }

  /** Random-projection LSH ANN: `bits`-bit signatures banded into
    * `bandsCount` chunks; candidates share at least one chunk; exact
    * cosine re-ranks candidates to top k. */
  def rpLshTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, dims: Int, bits: Int = 16,
                bandsCount: Int = 4, k: Int = 3): DataFrame = {
    val planes = signPlanes(bits, dims, "pl")
    val chunk = bits / bandsCount
    val mask = (1 << chunk) - 1
    val bandExpr = s"transform(sequence(0, ${bandsCount - 1}), " +
      s"j -> concat_ws(':', cast(j as string), cast((shiftright(sig, $chunk * j) & $mask) as string)))"
    val sigOf = signatureUdf(planes)
    def banded(df: DataFrame, prefix: String) =
      df.withColumn("sig", sigOf(col(s"${prefix}_v")))
        .select(col(s"${prefix}_id"), explode(expr(bandExpr)).as("nkey"))
    // the normed corpus feeds band generation AND the exact re-rank:
    // persist for the call (at real scale this is the stored vector index),
    // release once the small top-k result is materialized
    val q = normed(corpus, idCol, vecCol, "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val p = broadcast(normed(probes, idCol, vecCol, "probe"))
    val cands = broadcast(banded(p, "probe")).join(banded(q, "vec"), "nkey")
      .filter(col("probe_id") =!= col("vec_id"))
      .select("probe_id", "vec_id").distinct()
    val topk = rankTopK(
      cands.join(p.select("probe_id", "probe_v", "probe_norm"), "probe_id")
        .join(q, "vec_id"), k)
    val out = topk.localCheckpoint()
    q.unpersist()
    out
  }

  /** Corpus-scale embedding near-dup pairs: RP-LSH banded SELF-join
    * generates candidates (one equi-join shuffle on the band key — never
    * all-pairs), exact cosine verifies survivors. The full-corpus analog
    * of [[Dedup.embeddingNeardupPairs]]'s probe-set scan: at a billion
    * vectors the candidate set is linear in the true near-dup count, so
    * this is the shape that shards to 100 TB. Recall is the standard LSH
    * tradeoff (pairs must agree on at least one band); the banding is
    * deterministic, so results are engine-portable.
    *
    * Dedup-first (graft.ext.Dedup.neardupPairs' cost argument applied to
    * vectors): signatures and cosines are pure functions of the VECTOR,
    * so banding/verification run once per DISTINCT vector (grouped by an
    * injective to_json digest — element order and nulls preserved) and
    * exact copies re-enter through two membership equi-joins.
    * Within-group pairs are verified by the ACTUAL self-cosine of the
    * rep vector — the same value the raw self-join computes for the copy
    * pair. Degenerate payloads are defined, not inherited: null vectors
    * are excluded from banding outright (in the raw formulation they
    * band-collide on degenerate keys and die later via null cosines — we
    * skip the O(nulls^2) candidate churn), and zero-norm vectors never
    * pair (their cosine is undefined; the division is null-guarded where
    * the raw formulation would raise an ANSI divide-by-zero). For
    * well-formed vectors — non-null, norm > 0 — the result is exactly
    * the raw banded self-join's on any input (no bucket cap exists
    * here). On a dup-heavy corpus (web-crawl embeddings) the raw
    * self-join grows quadratically in copy count — measured 65.6 s on
    * the 10x-tiled sf1 corpus before this. */
  def rpNeardupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                     dims: Int, bits: Int = 16, bandsCount: Int = 4,
                     threshold: Double = 0.4): DataFrame = {
    val planes = signPlanes(bits, dims, "pl")
    val chunk = bits / bandsCount
    val mask = (1 << chunk) - 1
    val bandExpr = s"transform(sequence(0, ${bandsCount - 1}), " +
      s"j -> concat_ws(':', cast(j as string), cast((shiftright(sig, $chunk * j) & $mask) as string)))"
    val members = Dedup.digestMembership(
        corpus, idCol, md5(to_json(col(vecCol))), groupNulls = false)
      .select("rep", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the normed rep corpus feeds band generation (twice, via the
    // self-join), the verification join, and the within-group
    // self-cosine: persist until every consumer is materialized. Null
    // vectors are excluded here — they could never verify (null cosine)
    // and their degenerate band keys would otherwise collide pairwise.
    val q = normed(Dedup.repRows(corpus, idCol, members), idCol, vecCol, "vec")
      .filter(col("vec_v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = q.withColumn("sig", signatureUdf(planes)(col("vec_v")))
      .select(col("vec_id"), explode(expr(bandExpr)).as("nkey"))
    val cands = banded.select(col("vec_id").as("id_a"), col("nkey"))
      .join(banded.select(col("vec_id").as("id_b"), col("nkey")), "nkey")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // zero-norm vectors have no defined cosine and never pair: the norm
    // product goes through nullif so the division yields null (filtered by
    // the threshold) instead of an ANSI divide-by-zero error — applied on
    // BOTH the rep-pair and the within-group path so the two agree
    def cosineOf(dot: org.apache.spark.sql.Column, normProd: org.apache.spark.sql.Column) =
      dot / when(normProd === 0.0, lit(null)).otherwise(normProd)
    val repPairs = cands
      .join(q.select(col("vec_id").as("id_a"), col("vec_v").as("va"), col("vec_norm").as("na")), "id_a")
      .join(q.select(col("vec_id").as("id_b"), col("vec_v").as("vb"), col("vec_norm").as("nb")), "id_b")
      .withColumn("cosine", cosineOf(
        graft.functions.VectorFunctions.dot(col("va"), col("vb")), col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
      .localCheckpoint()
    val cross = Dedup.expandCross(repPairs, members, "id_a", "id_b")
      .select("id_a", "id_b", "cosine")
    val within = Dedup.withinGroupPairs(members, "id_a", "id_b")
      .join(q.select(col("vec_id").as("rep"), col("vec_v"), col("vec_norm")), "rep")
      .withColumn("cosine", cosineOf(
        graft.functions.VectorFunctions.dot(col("vec_v"), col("vec_v")),
        col("vec_norm") * col("vec_norm")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
    val out = cross.union(within).localCheckpoint()
    q.unpersist()
    members.unpersist()
    out
  }

  /** Corpus side of IVF: each vector assigned to its argmax-anchor
    * cluster — (vec_id, vec_v, vec_norm, cluster). */
  private def ivfCorpus(corpus: DataFrame, idCol: String, vecCol: String,
                        dims: Int, nClusters: Int): DataFrame = {
    val dotsOf = anchorDotsUdf(signPlanes(nClusters, dims, "anc"))
    normed(corpus, idCol, vecCol, "vec")
      .withColumn("dots", dotsOf(col("vec_v")))
      .withColumn("cluster", expr("cast(array_position(dots, array_max(dots)) as int)"))
      .drop("dots")
  }

  /** Probe side of IVF: one row per (probe, cluster) for its `nprobe`
    * best clusters. */
  private def ivfProbes(probes: DataFrame, idCol: String, vecCol: String,
                        dims: Int, nClusters: Int, nprobe: Int): DataFrame = {
    val dotsOf = anchorDotsUdf(signPlanes(nClusters, dims, "anc"))
    normed(probes, idCol, vecCol, "probe")
      .withColumn("dots", dotsOf(col("probe_v")))
      .withColumn("ranked", expr(
        s"array_sort(transform(sequence(1, $nClusters), j -> named_struct('nd', -element_at(dots, j), 'idx', j)))"))
      .withColumn("cluster", explode(expr(
        s"transform(slice(ranked, 1, $nprobe), r -> cast(r.idx as int))")))
      .drop("dots", "ranked")
  }

  /** IVF-style ANN: corpus vectors live in their argmax-anchor cluster;
    * each probe scans its `nprobe` best clusters only. */
  def ivfTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, dims: Int, nClusters: Int = 8,
              nprobe: Int = 2, k: Int = 3): DataFrame = {
    val corpusC = ivfCorpus(corpus, idCol, vecCol, dims, nClusters)
    val probeC = ivfProbes(probes, idCol, vecCol, dims, nClusters, nprobe)
    rankTopK(broadcast(probeC).join(corpusC, Seq("cluster"))
      .filter(col("probe_id") =!= col("vec_id")), k)
  }

  /** The `nprobe` nearest centroid labels (squared-L2 over quantized
    * units, ties to the lowest label) — the probe-side selector of a
    * Lloyd-trained IVF index. Same distance/tie rules as
    * [[Clustering.assignUdf]] so corpus assignment and probe selection
    * agree on the same index geometry. */
  def nearestClustersUdf(centers: Seq[(Long, Array[Double])],
                         nprobe: Int): UserDefinedFunction = {
    val labels = centers.map(_._1).toArray
    val cs = centers.map(_._2).toArray
    udf { (vq: Seq[Long]) =>
      if (vq == null) None
      else {
        val x = vq.toArray
        val ds = new Array[Double](cs.length)
        var j = 0
        while (j < cs.length) {
          val c = cs(j); val n = math.min(c.length, x.length)
          var d = 0.0; var i = 0
          while (i < n) { val t = x(i) - c(i); d += t * t; i += 1 }
          ds(j) = d; j += 1
        }
        Some(labels.indices.sortBy(j => (ds(j), labels(j)))
          .take(nprobe).map(labels).toSeq)
      }
    }
  }

  /** IVF ANN over a SAMPLE-TRAINED Lloyd coarse quantizer — the index
    * build a 100 TB deployment actually runs, replacing [[ivfTopK]]'s
    * fixed sign-plane anchors. The r6 sf1 bench showed the anchor variant
    * at 7.7x wall for 10x rows: with nClusters=8/nprobe=2 every probe
    * scores 25% of the corpus, and the probe set (every 50th vector)
    * grows WITH the corpus, so scored pairs grow ~100x per 10x rows.
    * This variant fixes both halves of the index economics:
    *   - Training is Lloyd on the deterministic hash sample
    *     ([[Clustering.sampledCenters]], the s07 recipe) — training
    *     passes read sample/sampleMod rows, never the corpus, and at
    *     production scale the resulting centroid table is persisted (the
    *     x04 storage convention) and reused across every query.
    *   - The corpus is touched by exactly ONE narrow assignment pass
    *     (cluster + norm computed in the same scan), and nClusters=16
    *     halves each probe's scan fraction to nprobe/16 = 12.5% while
    *     Lloyd (unlike random anchors) balances the partition sizes.
    * Results stay engine-exact: quantized integer distances, ties to the
    * lowest label, the oracle unrolls the SAME sampled training. */
  def ivfSampledTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, dims: Int, nClusters: Int = 16,
                     nprobe: Int = 2, k: Int = 3, iters: Int = 2,
                     sampleMod: Int = 4): DataFrame = {
    val centers = Clustering.sampledCenters(
      corpus, idCol, vecCol, dims, nClusters, iters, sampleMod)
    val quantExpr = expr(s"transform(cast($vecCol as array<double>), " +
      s"x -> cast(round(x * ${Clustering.QuantScale}) as bigint))")
    val corpusC = corpus
      .select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("vec_v"), quantExpr.as("vq"))
      .withColumn("vec_norm", graft.functions.VectorFunctions.l2norm(col("vec_v")))
      .withColumn("cluster", Clustering.assignUdf(centers)(col("vq")))
      .drop("vq")
    val probeC = probes
      .select(col(idCol).as("probe_id"),
        col(vecCol).cast("array<double>").as("probe_v"), quantExpr.as("vq"))
      .withColumn("probe_norm", graft.functions.VectorFunctions.l2norm(col("probe_v")))
      .withColumn("cluster", explode(nearestClustersUdf(centers, nprobe)(col("vq"))))
      .drop("vq")
    rankTopK(broadcast(probeC).join(corpusC, Seq("cluster"))
      .filter(col("probe_id") =!= col("vec_id")), k)
  }

  // ---- scalar quantization (SQ8) ----------------------------------------
  // The OTHER classic compressed-domain scan next to PQ: each dimension
  // maps independently to an 8-bit code by per-dim min/max scaling
  // (FAISS ScalarQuantizer QT_8bit with RANGE training), so a 64-dim
  // vector stores as 64 bytes with NO codebook — cheaper training than
  // PQ, 8x compression instead of 32x, and the symmetric code-domain
  // distance is exact integer arithmetic both engines share verbatim.

  /** Per-dim 8-bit code: (255·(v − mn)) div spread, clamped to [0, 255]
    * (probes may fall outside the trained range). `src` is a quantized
    * BIGINT vector column name; mn/spread are literal 64-element arrays
    * collected from ONE corpus aggregate (bounded by dims, the
    * centers-collect convention). Emitted as DOUBLE elements so the
    * native DotProduct kernel consumes the code arrays directly. */
  def sq8CodeExpr(src: String, dims: Int, mnLit: String, spLit: String): String =
    s"transform(sequence(1, $dims), i -> CAST(greatest(0L, least(255L, " +
      s"(255 * (element_at($src, i) - element_at($mnLit, i))) DIV element_at($spLit, i)" +
      s")) AS DOUBLE))"

  /** SQ8 top-k: train per-dim (min, max) in one corpus aggregate, code
    * corpus and probes to 8-bit arrays, scan the CODE table with the
    * exact symmetric squared-L2 — |p|² + |c|² − 2·p·c through the native
    * codegen DotProduct, every operand an integer-valued double, so the
    * distance is an exact BIGINT (≤ dims·255² — no rounding surface).
    * Constant dimensions train spread 0 and clamp to code 0 on both
    * sides (the guard keeps the div defined). Scale shape: one stats
    * aggregate (dims rows collected), one narrow coding pass per side,
    * broadcast probes x corpus codes — the scan reads dims bytes per
    * vector, never the raw doubles. Emits (probe_id, rank, vec_id,
    * sqdist_code). */
  def sq8TopK(probes: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, dims: Int, topK: Int = 5): DataFrame = {
    val quant = Clustering.quantized(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = quant.select(posexplode(col("vq")).as(Seq("i", "v")))
      .groupBy("i").agg(min("v").as("mn"), max("v").as("mx"))
      .orderBy("i").collect() // dims rows — bounded by construction
    val mn = stats.map(_.getLong(1))
    val spread = stats.map(r => math.max(r.getLong(2) - r.getLong(1), 1L))
    val mnLit = mn.mkString("array(", "L, ", "L)")
    val spLit = spread.mkString("array(", "L, ", "L)")
    def coded(df: DataFrame, idAs: String) = df
      .withColumn("c", expr(sq8CodeExpr("vq", dims, mnLit, spLit)))
      .select(col("vec_id").as(idAs), col("c"),
        graft.functions.VectorFunctions.dot(col("c"), col("c")).as("n2"))
    val corpusC = coded(quant, "vec_id")
    val probeC = broadcast(
      coded(probes.transform(Clustering.quantized(_, idCol, vecCol)), "probe_id")
        .withColumnRenamed("c", "pc").withColumnRenamed("n2", "pn2"))
    val ranked = probeC.join(corpusC, col("probe_id") =!= col("vec_id"))
      .withColumn("sqdist_code",
        (col("pn2") + col("n2") -
          lit(2.0) * graft.functions.VectorFunctions.dot(col("pc"), col("c")))
          .cast("bigint"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("sqdist_code"), col("vec_id"))))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("sqdist_code"))
      .localCheckpoint()
    quant.unpersist()
    ranked
  }

  /** Coarse-to-fine retrieval: the SQ8 code scan recalls `candK`
    * candidates per probe (the cheap 8-bytes-per-dim stage), then ONLY
    * those candidates pay the exact cosine (the precision stage) and
    * re-rank to `topK` — the standard two-stage production retrieval
    * shape (compressed first pass, exact rerank of a bounded survivor
    * set; FAISS's refine/RFlat wrapper). The rerank repairs any
    * quantization-induced misordering INSIDE the candidate set, so the
    * emitted scores are exact cosines, bit-identical to s01's on the
    * same pairs. Scale shape: stage 1 is the s71 code scan; stage 2
    * touches probes x candK raw vectors — bounded by construction,
    * never a second corpus scan (the candidate list joins the corpus by
    * id). */
  def sq8RerankTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, dims: Int, candK: Int = 20,
                    topK: Int = 5): DataFrame = {
    val cands = sq8TopK(probes, corpus, idCol, vecCol, dims, topK = candK)
      .select(col("probe_id"), col("vec_id"))
    val p = broadcast(normed(probes, idCol, vecCol, "probe"))
    val q = normed(corpus, idCol, vecCol, "vec")
    rankTopK(cands.join(p, "probe_id").join(q, "vec_id"), topK)
  }

  /** Per-element residual vq − round(center_cl) — the IVFADC residual
    * r(x) = x − q1(x) (Jégou, Douze, Schmid, "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011, §IV-A). Centers are
    * engine-identical doubles (exact integer sums / count), rounded
    * HALF-AWAY-FROM-ZERO (the SQL round both engines share — Scala's
    * math.round is HALF-UP and differs on negative halves), so the
    * integer residuals are exact and shared. */
  def residUdf(centers: Seq[(Long, Array[Double])]): UserDefinedFunction = {
    def rnd(x: Double): Long =
      if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
    val m = centers.map { case (l, c) => l -> c.map(rnd) }.toMap
    udf { (vq: Seq[Long], cl: Long) =>
      if (vq == null) None
      else {
        val c = m.getOrElse(cl, throw new IllegalStateException(
          s"resid: cluster $cl absent from the coarse codebook"))
        Some(vq.indices.map(i => vq(i) - (if (i < c.length) c(i) else 0L)).toSeq)
      }
    }
  }

  /** IVF-PQ composite ANN (the IVFADC system of Jégou et al. 2011 §IV:
    * a sample-trained coarse quantizer routes vectors to inverted lists,
    * each vector stores only the PQ CODES OF ITS RESIDUAL from its
    * coarse center, and a probe runs the asymmetric-distance scan over
    * the nprobe probed lists' codes — the standard billion-scale ANN
    * index shape). Composition of the house pieces: s09's sampled-Lloyd
    * coarse training + s06's residual-input PQ train/encode/ADC, cluster
    * as the join key so each probe touches nprobe/nCoarse of the CODE
    * table (8 bytes/vector), never the raw vectors. Residual encoding is
    * what makes the composite beat flat PQ at equal code budget: within
    * a list the residual magnitudes are center-bounded, so the shared
    * global codebook spends its 16 codes on a tighter distribution.
    * Output: (probe_id, rank, vec_id, cluster, adc_dist). */
  def ivfPqTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, dims: Int, nCoarse: Int = 8,
                nprobe: Int = 2, m: Int = 8, k: Int = 16,
                coarseIters: Int = 2, sampleMod: Int = 4,
                pqIters: Int = 1, topK: Int = 5): DataFrame = {
    require(dims % m == 0, s"ivfPqTopK: dims=$dims not divisible by m=$m")
    val subDims = dims / m
    val centers = Clustering.sampledCenters(
      corpus, idCol, vecCol, dims, nCoarse, coarseIters, sampleMod)
    val resid = Clustering.quantized(corpus, idCol, vecCol)
      .withColumn("cluster",
        Clustering.assignUdf(centers)(col("vq")).cast("long"))
      .withColumn("rq", residUdf(centers)(col("vq"), col("cluster")))
      .select(col("vec_id"), col("cluster"), col("rq").as("vq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sub = pqSubvectors(resid.select("vec_id", "vq"), m, subDims)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cbs = pqTrain(sub, resid.select("vec_id", "vq"), m, subDims, k, pqIters)
    val codes = resid.withColumn("codes", pqEncodeUdf(cbs, subDims)(col("vq")))
      .select(col("vec_id"), col("cluster"), col("codes"))
    val probeC = broadcast(probes
      .transform(Clustering.quantized(_, idCol, vecCol))
      .select(col("vec_id").as("probe_id"), col("vq").as("pvq"))
      .withColumn("cluster",
        explode(nearestClustersUdf(centers, nprobe)(col("pvq"))))
      .withColumn("cluster", col("cluster").cast("long"))
      .withColumn("prq", residUdf(centers)(col("pvq"), col("cluster"))))
    val qs2 = Clustering.QuantScale.toDouble * Clustering.QuantScale
    val ranked = probeC.join(codes, Seq("cluster"))
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("adc_q", pqAdcUdf(cbs, subDims)(col("prq"), col("codes")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("adc_q"), col("vec_id"))))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("cluster"),
        round(col("adc_q") / qs2, 4).as("adc_dist"))
      .localCheckpoint()
    sub.unpersist(); resid.unpersist()
    ranked
  }

  /** IVF ANN with the cluster as the STORAGE partition key — the scale
    * shape [[ivfTopK]]'s design note promises: the indexed corpus is
    * written `partitionBy(cluster)` once, and a probe batch reads ONLY
    * the directories of its probed clusters. The probed set is an
    * explicit `cluster IN (...)` predicate, so pruning is static — the
    * scan's PartitionFilters eliminate every other cluster at the source
    * (SimilaritySpec asserts it), which at a billion vectors means a
    * probe touches nprobe/nClusters of the corpus bytes instead of all
    * of them. The collected probed-cluster list is bounded by nClusters
    * (not by data size), so the driver-side collect is safe by
    * construction. Results are identical to [[ivfTopK]]. */
  def ivfTopKPartitioned(spark: org.apache.spark.sql.SparkSession,
                         probes: DataFrame, corpus: DataFrame,
                         idCol: String, vecCol: String, dims: Int,
                         indexPath: String, nClusters: Int = 8,
                         nprobe: Int = 2, k: Int = 3): DataFrame = {
    // temp-build + atomic install (IndexStore): a concurrent probe against
    // indexPath reads either the previous complete store or this one,
    // never a directory mid-overwrite
    IndexStore.atomically(spark, indexPath) { tmp =>
      ivfCorpus(corpus, idCol, vecCol, dims, nClusters)
        .write.mode("overwrite").partitionBy("cluster").parquet(tmp)
    }
    val stored = spark.read.parquet(indexPath)
    val probeC = ivfProbes(probes, idCol, vecCol, dims, nClusters, nprobe)
    val probed = probeC.select("cluster").distinct()
      .collect().map(_.getInt(0)).sorted // <= nClusters values, tiny
    val pruned = stored.filter(col("cluster").isin(probed.map(Int.box).toIndexedSeq: _*))
    rankTopK(broadcast(probeC).join(pruned, Seq("cluster"))
      .filter(col("probe_id") =!= col("vec_id")), k)
  }

  // ---- Product quantization (compressed-domain ANN) -----------------------
  // PQ is the memory lever the other ANN paths don't have: a 64-dim float
  // vector (256 B) compresses to `m` one-byte codes (8 B here), so at a
  // billion vectors the scan side of search shrinks ~30x and fits the page
  // cache where raw vectors would not. Codebooks are per-subspace k-means
  // with the same exact-integer determinism design as Clustering.kmeans
  // (quantized inputs, integer centroid sums, ties to the lowest label),
  // so every stage — training, encoding, the ADC scan — hash-matches the
  // DuckDB mirror.

  /** PQ codebooks: for each of `m` subspaces of `subDims` dims, `k`
    * centroids labeled by seed vec_id (seeds = the k smallest-id vectors'
    * subvectors), refined by `iters` Lloyd rounds. Driver holds
    * m x k x subDims doubles — bounded by construction. */
  def pqTrain(sub: DataFrame, quant: DataFrame, m: Int, subDims: Int,
              k: Int, iters: Int): Array[Seq[(Long, Array[Double])]] = {
    val seedRows = quant.orderBy("vec_id").limit(k).collect()
    require(seedRows.nonEmpty, "pqTrain: input has no vectors to seed from")
    var cbs: Array[Seq[(Long, Array[Double])]] = Array.tabulate(m) { mi =>
      seedRows.map { r =>
        val vq = r.getSeq[Long](1)
        (r.getLong(0), vq.slice(mi * subDims, (mi + 1) * subDims).map(_.toDouble).toArray)
      }.sortBy(_._1).toSeq
    }
    val sumAggs = (0 until subDims).map(d =>
      sum(expr(s"element_at(sq, ${d + 1})")).as(s"s$d")) :+ count(lit(1)).as("cnt")
    for (_ <- 1 to iters) {
      val rows = sub.withColumn("code", pqAssignUdf(cbs)(col("m"), col("sq")))
        .groupBy("m", "code").agg(sumAggs.head, sumAggs.tail: _*)
        .collect() // <= m*k rows of integer sums — tiny
      cbs = Array.tabulate(m) { mi =>
        rows.filter(_.getInt(0) == mi).map { r =>
          val cnt = r.getLong(subDims + 2).toDouble
          (r.getLong(1), (0 until subDims).map(d => r.getLong(d + 2).toDouble / cnt).toArray)
        }.sortBy(_._1).toSeq
      }
    }
    cbs
  }

  /** (vec_id, m, sq): the quantized subvector table. */
  def pqSubvectors(quant: DataFrame, m: Int, subDims: Int): DataFrame =
    quant.select(col("vec_id"), posexplode(expr(
      s"transform(sequence(0, ${m - 1}), mi -> slice(vq, mi * $subDims + 1, $subDims))")))
      .toDF("vec_id", "m", "sq")

  /** Argmin-centroid code for one subspace; ties to the lowest label
    * (strict `<`, labels pre-sorted ascending — mirrors the oracle's
    * ROW_NUMBER ... ORDER BY dist, cl). */
  private def pqAssignUdf(cbs: Array[Seq[(Long, Array[Double])]]): UserDefinedFunction = {
    val labels = cbs.map(_.map(_._1).toArray)
    val cents = cbs.map(_.map(_._2).toArray)
    udf { (mi: Int, sq: Seq[Long]) =>
      if (sq == null) None
      else {
        val x = sq.toArray
        val cs = cents(mi)
        var best = 0; var bestD = Double.PositiveInfinity
        var j = 0
        while (j < cs.length) {
          val c = cs(j); val n = math.min(c.length, x.length)
          var d = 0.0; var i = 0
          while (i < n) { val t = x(i) - c(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        Some(labels(mi)(best))
      }
    }
  }

  /** Full-vector encoder: the m argmin codes in subspace order, one
    * compiled pass per row — the production encode kernel (8 bytes out
    * per vector; no explode, no shuffle). */
  private def pqEncodeUdf(cbs: Array[Seq[(Long, Array[Double])]],
                          subDims: Int): UserDefinedFunction = {
    val labels = cbs.map(_.map(_._1).toArray)
    val cents = cbs.map(_.map(_._2).toArray)
    udf { (vq: Seq[Long]) =>
      if (vq == null) None
      else {
        val x = vq.toArray
        Some((0 until cents.length).map { mi =>
          val cs = cents(mi); val off = mi * subDims
          var best = 0; var bestD = Double.PositiveInfinity
          var j = 0
          while (j < cs.length) {
            val c = cs(j); val n = math.min(c.length, math.max(x.length - off, 0))
            var d = 0.0; var i = 0
            while (i < n) { val t = x(off + i) - c(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          labels(mi)(best)
        }.toSeq)
      }
    }
  }

  /** Asymmetric-distance kernel: squared L2 between a probe's exact
    * (quantized) vector and a corpus vector's RECONSTRUCTION from its m
    * codes. Per-subspace subtotals accumulate first, then add in subspace
    * order — bit-identical to the oracle's
    * `list_sum(list(d ORDER BY m))` over per-m `list_sum`s. */
  private def pqAdcUdf(cbs: Array[Seq[(Long, Array[Double])]],
                       subDims: Int): UserDefinedFunction = {
    val lut: Array[Map[Long, Array[Double]]] = cbs.map(_.toMap)
    udf { (pvq: Seq[Long], codes: Seq[Long]) =>
      if (pvq == null || codes == null) None
      else {
        val x = pvq.toArray
        var total = 0.0
        var mi = 0
        while (mi < codes.length) {
          // unknown code = codebook/encoding mismatch: fail loudly — a
          // silent zero subtotal would rank the vector as a false near
          // neighbor with no error
          val c = lut(mi).getOrElse(codes(mi), throw new IllegalStateException(
            s"pqAdc: code ${codes(mi)} absent from subspace-$mi codebook"))
          val off = mi * subDims
          val n = math.min(c.length, math.max(x.length - off, 0))
          var dm = 0.0; var i = 0
          while (i < n) { val t = x(off + i) - c(i); dm += t * t; i += 1 }
          total += dm
          mi += 1
        }
        Some(total)
      }
    }
  }

  /** PQ-ADC top-k: train codebooks, encode the corpus to m codes, scan
    * the CODES (not the vectors) per probe with the asymmetric-distance
    * kernel, keep the k closest. The scan is PQ's design point: it reads
    * the 8-byte code table, never the raw corpus vectors — at a billion
    * vectors that is the difference between an in-memory scan and an I/O
    * bound one. Probes are broadcast; distances rank ascending with
    * vec_id tie-break. Output: (probe_id, rank, vec_id, adc_dist in
    * original vector units², rounded 1e-4). */
  def pqTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, dims: Int, m: Int = 8, k: Int = 16,
             iters: Int = 1, topK: Int = 5,
             materialize: Boolean = true): DataFrame = {
    require(dims % m == 0, s"pqTopK: dims=$dims not divisible by m=$m")
    val subDims = dims / m
    // training is eager (driver-side codebooks) even on the lazy
    // (materialize = false, shape-assertion) path, so the persists below
    // are load-bearing for it either way; the lazy path releases them
    // after training and lets the returned plan recompute lazily
    val quant = Clustering.quantized(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sub = pqSubvectors(quant, m, subDims)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cbs = pqTrain(sub, quant, m, subDims, k, iters)
    val codes = quant.withColumn("codes", pqEncodeUdf(cbs, subDims)(col("vq")))
      .select("vec_id", "codes")
    val p = broadcast(probes
      .transform(Clustering.quantized(_, idCol, vecCol))
      .select(col("vec_id").as("probe_id"), col("vq").as("pvq")))
    val qs2 = Clustering.QuantScale.toDouble * Clustering.QuantScale
    val ranked = p.join(codes, col("probe_id") =!= col("vec_id"))
      .withColumn("adc_q", pqAdcUdf(cbs, subDims)(col("pvq"), col("codes")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("adc_q"), col("vec_id"))))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("rank"), col("vec_id"),
        round(col("adc_q") / qs2, 4).as("adc_dist"))
    if (!materialize) {
      sub.unpersist(); quant.unpersist()
      ranked
    } else {
      val out = ranked.localCheckpoint()
      sub.unpersist(); quant.unpersist()
      out
    }
  }

  /** MMR diversified retrieval (Carbonell & Goldstein 1998): re-rank each
    * probe's cosine top-`candK` so consecutive picks trade relevance
    * against redundancy — pick 1 is the plain argmax; pick i maximizes
    * lambda * sim(probe, c) - (1 - lambda) * max_{s selected} sim(c, s).
    * The RAG-retrieval step after ANN: without it the top-k of a dup-heavy
    * corpus is k copies of one document.
    *
    * Expressed RELATIONALLY with the greedy unrolled to 3 picks (no
    * per-probe JVM loop): candidate cosines and candidate-candidate
    * similarities are micro-quantized BIGINTs, every double op downstream
    * (lambda * c - (1-lambda) * m, one multiply each) is literally the
    * same IEEE instruction sequence the oracle's SQL states, so argmax
    * comparisons and emitted scores are bit-identical cross-engine; ties
    * break by vec_id.
    *
    * Scale shape: probes are a bounded broadcast set (the s01/s08
    * convention); per probe the candidate set is candK rows, so the
    * candidate-pair table is probes x candK^2 — bounded by construction,
    * never corpus-quadratic. */
  def mmrTopK(probeSet: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, candK: Int = 10, lambda: Double = 0.7): DataFrame = {
    val p = broadcast(normed(probeSet, idCol, vecCol, "probe"))
    val q = normed(corpus, idCol, vecCol, "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = p.join(q, col("probe_id") =!= col("vec_id"))
      .withColumn("cosq", round(graft.functions.VectorFunctions.dot(col("probe_v"), col("vec_v"))
        / (col("probe_norm") * col("vec_norm")) * 1e6).cast("bigint"))
      .withColumn("crank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("cosq").desc, col("vec_id"))))
      .filter(col("crank") <= candK)
      .select(col("probe_id"), col("vec_id"), col("cosq"),
        col("vec_v"), col("vec_norm"))
      .localCheckpoint() // bounded: probes x candK rows
    q.unpersist()
    // candidate-candidate sims within each probe group (probes x candK^2)
    val sims = cands.select(col("probe_id"), col("vec_id").as("ca"),
        col("vec_v").as("va"), col("vec_norm").as("na"))
      .join(cands.select(col("probe_id"), col("vec_id").as("cb"),
        col("vec_v").as("vb"), col("vec_norm").as("nb")), "probe_id")
      .filter(col("ca") =!= col("cb"))
      .select(col("probe_id"), col("ca"), col("cb"),
        round(graft.functions.VectorFunctions.dot(col("va"), col("vb"))
          / (col("na") * col("nb")) * 1e6).cast("bigint").as("simq"))
    val lam = lit(lambda); val oneMinus = lit(1.0 - lambda)
    def argmax(df: DataFrame, score: org.apache.spark.sql.Column) =
      df.withColumn("score", score)
        .withColumn("r", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("score").desc, col("vec_id"))))
        .filter(col("r") === 1)
    val base = cands.select(col("probe_id"), col("vec_id"), col("cosq"))
    val s1 = argmax(base, lam * col("cosq"))
      .select(col("probe_id"), col("vec_id").as("sel1"), col("score").as("sc1"))
    val s2 = argmax(
      base.join(s1, "probe_id").filter(col("vec_id") =!= col("sel1"))
        .join(sims.select(col("probe_id"), col("ca").as("vec_id"),
          col("cb").as("sel1"), col("simq").as("sim1")), Seq("probe_id", "vec_id", "sel1")),
      lam * col("cosq") - oneMinus * col("sim1"))
      .select(col("probe_id"), col("vec_id").as("sel2"), col("score").as("sc2"))
    val s3 = argmax(
      base.join(s1.select("probe_id", "sel1"), "probe_id")
        .join(s2.select("probe_id", "sel2"), "probe_id")
        .filter(col("vec_id") =!= col("sel1") && col("vec_id") =!= col("sel2"))
        .join(sims.select(col("probe_id"), col("ca").as("vec_id"),
          col("cb").as("sel1"), col("simq").as("sim1")), Seq("probe_id", "vec_id", "sel1"))
        .join(sims.select(col("probe_id"), col("ca").as("vec_id"),
          col("cb").as("sel2"), col("simq").as("sim2")), Seq("probe_id", "vec_id", "sel2")),
      lam * col("cosq") - oneMinus * greatest(col("sim1"), col("sim2")))
      .select(col("probe_id"), col("vec_id").as("sel3"), col("score").as("sc3"))
    // raw quotient, NOT round(x, 6): the quotient of identical doubles is
    // bit-identical cross-engine, while the engines' 6-dp rounding paths
    // disagree by one ulp on some values (observed in the gate)
    s1.select(col("probe_id"), lit(1).as("rank"), col("sel1").as("vec_id"),
        (col("sc1") / 1e6).as("mmr"))
      .unionByName(s2.select(col("probe_id"), lit(2).as("rank"),
        col("sel2").as("vec_id"), (col("sc2") / 1e6).as("mmr")))
      .unionByName(s3.select(col("probe_id"), lit(3).as("rank"),
        col("sel3").as("vec_id"), (col("sc3") / 1e6).as("mmr")))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, public recipe):
    * cluster the embedding corpus, then remove near-duplicates WITHIN
    * each cluster — keep the lowest-id member of every similar pair, the
    * greedy epsilon-ball rule (deterministic; like all greedy variants it
    * can over-remove along similarity chains, which is the published
    * trade too).
    *
    * Scale-first deviation from the paper's within-cluster ALL-PAIRS
    * scan: candidate pairs come from the RP-LSH banded self-join
    * ([[rpNeardupPairs]] — an equi-join on band keys, never quadratic in
    * cluster size), then the same-cluster restriction and the exact
    * cosine >= threshold verify. Banding recall rises with the threshold
    * (sign-agreement probability grows with cosine), so any recall bound
    * d08's spec establishes at 0.4 holds a fortiori at dedup thresholds.
    * The default 0.45 is corpus-relative, as the published recipe's
    * epsilon is — this synthetic corpus tops out near 0.49 cosine.
    * Training reads the vec_id % sampleMod hash sample (the s07/s09
    * recipe); the corpus pays ONE assignment pass + the banded join.
    *
    * Returns one row per corpus vector: (vec_id, cluster, kept). Null /
    * zero-norm vectors have no defined cosine: never paired, always
    * kept, cluster null for null vectors. */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String, dims: Int,
               k: Int = 4, iters: Int = 2, sampleMod: Int = 4,
               threshold: Double = 0.45): DataFrame = {
    val centers = Clustering.sampledCenters(corpus, idCol, vecCol, dims, k, iters, sampleMod)
    val assigned = Clustering.quantized(corpus, idCol, vecCol)
      .withColumn("cluster", Clustering.assignUdf(centers)(col("vq")))
      .select(col("vec_id"), col("cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = rpNeardupPairs(corpus, idCol, vecCol, dims, threshold = threshold)
    // pairs carry id_a < id_b: id_b is the removal candidate; the pair
    // only counts when both ends share a cluster (the SemDeDup scope)
    val removed = pairs
      .join(assigned.select(col("vec_id").as("id_a"), col("cluster").as("ca")), "id_a")
      .join(assigned.select(col("vec_id").as("id_b"), col("cluster").as("cb")), "id_b")
      .filter(col("ca") === col("cb"))
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("removed", lit(true))
    val out = assigned.join(removed, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        col("removed").isNull.as("kept"))
      .localCheckpoint()
    assigned.unpersist()
    out
  }

  /** Per-vector index card: RP signature + IVF cluster assignment. */
  def vectorIndex(df: DataFrame, idCol: String, vecCol: String, dims: Int,
                  bits: Int = 16, nClusters: Int = 8): DataFrame = {
    val sigOf = signatureUdf(signPlanes(bits, dims, "pl"))
    val dotsOf = anchorDotsUdf(signPlanes(nClusters, dims, "anc"))
    normed(df, idCol, vecCol, "vec")
      .withColumn("rp_sig", sigOf(col("vec_v")))
      .withColumn("dots", dotsOf(col("vec_v")))
      .withColumn("ivf_cluster", expr("cast(array_position(dots, array_max(dots)) as int)"))
      .select(col("vec_id"), col("rp_sig"), col("ivf_cluster"),
        round(col("vec_norm"), 4).as("norm"))
  }

  /** The pairwise column cosine in micro-units over (gram, na, nb) —
    * one sqrt-product formula string, shared verbatim with the oracle. */
  val colCosExpr: String =
    "CAST(round((CAST(gram AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))) * 1000000.0) AS BIGINT)"

  /** All-pairs COLUMN similarities of the embedding matrix — the
    * reference's RowMatrix.columnSimilarities at threshold 0 (mllib/
    * linalg/distributed/RowMatrix.scala:453; with no threshold the DIMSUM
    * sampler at :573 degenerates to emitting every in-row dimension pair,
    * which is exactly the self-join below; the Gramian inner products are
    * :113 computeGramianMatrix). Values quantized once to 2^20 integer
    * units (the Clustering convention), so every Gramian entry and column
    * norm is an exact integer sum — partitioning-independent — and the
    * cosine is one shared sqrt formula over them.
    *
    * Shape: one posexplode (row-linear × d), one self-join on the row id
    * (the per-row pair emission — d²/2 products per row, inherent to the
    * exact algorithm; DIMSUM's oversampling is the reference's
    * scale-path for d in the thousands), two hash aggregates bounded by
    * d². SPARSE convention, like the reference's CoordinateMatrix
    * result: quantized-zero cells are dropped, so an all-zero column
    * appears in no output row (rather than dividing by a zero norm) and
    * never-co-nonzero pairs are absent rather than materialized as 0.
    * Returns up to d·(d−1)/2 rows (di, dj, gram, cos_micro). */
  def columnSimilarities(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val cells = df.select(col(idCol).as("rid"),
        posexplode(expr(s"transform(cast($vecCol as array<double>), x -> cast(round(x * 1048576) as bigint))")))
      .selectExpr("rid", "CAST(pos + 1 AS BIGINT) AS d", "col AS v")
      .filter(col("v") =!= 0L)
    val g = cells.as("a")
      .join(cells.as("b"),
        col("a.rid") === col("b.rid") && col("a.d") < col("b.d"))
      .groupBy(col("a.d").as("di"), col("b.d").as("dj"))
      .agg(sum(col("a.v") * col("b.v")).as("gram"))
    val nn = cells.groupBy("d").agg(sum(col("v") * col("v")).as("nrm2"))
    g.join(nn.select(col("d").as("di"), col("nrm2").as("na")), "di")
      .join(nn.select(col("d").as("dj"), col("nrm2").as("nb")), "dj")
      .selectExpr("di", "dj", "gram", s"$colCosExpr AS cos_micro")
  }

  /** DIMSUM oversampling factor — the reference's exact formula
    * (RowMatrix.scala:505-509: γ = 10·log(n)/threshold, n = numCols).
    * Computed DRIVER-side and embedded as one shortest-round-trip double
    * literal in BOTH engines' expressions, so no libm `ln` seam can
    * desynchronize the sampling coin. */
  def dimsumGamma(dim: Int, threshold: Double): Double =
    10.0 * math.log(dim.toDouble) / threshold

  /** The shared per-engine scalar seeds of the DIMSUM sampler for a given
    * (dim, threshold): (`sg` = sqrt(γ) as a formula over the γ literal —
    * sqrt is correctly rounded in every IEEE engine, so the value is
    * bit-identical given the identical literal). */
  def dimsumSgExpr(dim: Int, threshold: Double): String =
    s"sqrt(CAST(${dimsumGamma(dim, threshold)} AS DOUBLE))"

  /** Thresholded DIMSUM column similarities — the reference's actual
    * scale algorithm for this operator (mllib/linalg/distributed/
    * RowMatrix.scala:497 `columnSimilarities(threshold)`, sampling core
    * at :573 `columnSimilaritiesDIMSUM`; papers arxiv 1206.2082 /
    * 1304.1467): per column c, keep probability p_c = √γ/‖c‖ and scale
    * divisor q_c = min(√γ, ‖c‖); each row emits the product
    * (v_i/q_i)·(v_j/q_j) for the pairs whose BOTH cells survive their
    * coin, and the sum over rows is an unbiased cosine estimate — exact
    * for small-magnitude columns (p ≥ 1), sampled for heavy ones, with
    * above-threshold pairs correct to ~20% relative error w.h.p.
    * Declared deviations: (a) the coin is ONE draw per (row, column)
    * CELL — the paper's per-entry form — rather than the reference
    * implementation's fresh j-coin per (i, j) pair visit; expectations
    * are identical (p_i·p_j per pair) and the cell form is what a
    * relational plan can express as a filter. (b) The coin is the house
    * deterministic md5 residue (the x15 LCG/residue discipline), not
    * XORShiftRandom — so the SAMPLED estimator itself is reproducible
    * in any engine and the oracle equality is exact, not statistical.
    *
    * Shape (the 100 TB path): cells scan → 64-row broadcast of
    * per-column (p, q) → the coin FILTER cuts cells BEFORE the per-row
    * pair self-join, so the quadratic pair emission runs on ~p·d cells
    * per row instead of d — the reference's O(n·log n·L/(γ·A)) shuffle
    * bound vs the brute-force O(m·L²). Magnitudes come off the exact
    * integer Gramian diagonal (one aggregate), never a double sum.
    *
    * Output: (di, dj, n_terms, sim_micro) — surviving-pair term count
    * and the micro-quantized similarity estimate; pairs whose every
    * co-occurrence was coin-dropped are absent (the sparse convention,
    * like the reference's CoordinateMatrix). */
  def columnSimilaritiesDIMSUM(df: DataFrame, idCol: String,
                               vecCol: String, dim: Int,
                               threshold: Double,
                               salt: String = "'dimsum'"): DataFrame = {
    require(dimsumGamma(dim, threshold) > 1.0,
      s"DIMSUM oversampling must exceed 1 (got ${dimsumGamma(dim, threshold)})")
    val sg = dimsumSgExpr(dim, threshold)
    val cells = df.select(col(idCol).as("rid"),
        posexplode(expr(s"transform(cast($vecCol as array<double>), x -> cast(round(x * 1048576) as bigint))")))
      .selectExpr("rid", "CAST(pos + 1 AS BIGINT) AS d", "col AS v")
      .filter(col("v") =!= 0L)
    // per-column magnitude in the matrix's REAL units (the quantization
    // is an encoding, not a rescale of the DIMSUM probabilities)
    val cols = cells.groupBy("d")
      // second-moment convention: DECIMAL(38,0) here / HUGEINT oracle-side
      // — a plain BIGINT sum of 2^40-scale squares wraps silently at very
      // large row counts while the oracle errors, a desync seam
      .agg(sum(expr("CAST(v * v AS DECIMAL(38,0))")).as("nrm2"))
      .selectExpr("d",
        "sqrt(CAST(nrm2 AS DOUBLE)) / CAST(1048576.0 AS DOUBLE) AS mag")
      .selectExpr("d", s"least($sg, mag) AS qd",
        s"CAST(floor(($sg / mag) * 1000000.0) AS BIGINT) AS keep_micro")
    val kept = cells.join(broadcast(cols), "d")
      .filter(expr(Dedup.portableHash(
        "concat(cast(rid as string), ':', cast(d as string))", salt) +
        " % 1000000 < keep_micro"))
      .selectExpr("rid", "d",
        "(CAST(v AS DOUBLE) / CAST(1048576.0 AS DOUBLE)) / qd AS s")
    kept.as("a")
      .join(kept.as("b"),
        col("a.rid") === col("b.rid") && col("a.d") < col("b.d"))
      .groupBy(col("a.d").as("di"), col("b.d").as("dj"))
      .agg(count(lit(1)).as("n_terms"),
        sum(expr("CAST(round((a.s * b.s) * 1000000000000.0) AS BIGINT)"))
          .as("gram_pico"))
      .selectExpr("di", "dj", "n_terms",
        "CAST(round((CAST(gram_pico AS DOUBLE) / 1000000000000.0) * 1000000.0) AS BIGINT) AS sim_micro")
  }
}
