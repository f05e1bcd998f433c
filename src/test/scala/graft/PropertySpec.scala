package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated edge-case inputs (FIXTURES.md plan: null-heavy,
  * boundary numerics, non-ASCII UTF-8) pushed through the engine and
  * checked against independently computed expectations. Generators are
  * seeded so failures reproduce. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  // BMP, non-surrogate, printable-ish chars incl. multibyte UTF-8
  private val utf8Char: Gen[Char] = Gen.frequency(
    (5, Gen.alphaNumChar),
    (2, Gen.oneOf('é', 'ü', 'ß', 'λ', '中', '文', 'д', '✓')),
    (1, Gen.oneOf(' ', '_', '-')))
  private val utf8String: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, utf8Char)).map(_.mkString)

  test("UTF-8 strings: length/upper/substring/concat match JVM semantics") {
    val strs = samples(utf8String, 60)
    val rows = strs.toDF("s").select(
      col("s"), length(col("s")), substring(col("s"), 2, 3),
      concat(col("s"), lit("|x"))).collect()
    rows.foreach { r =>
      val s = r.getString(0)
      assert(r.getInt(1) === s.codePointCount(0, s.length))
      assert(r.getString(2) === (if (s.length >= 1) s.slice(1, 4) else ""))
      assert(r.getString(3) === s + "|x")
    }
  }

  test("split/concat_ws round-trips generated token lists") {
    val tokens = Gen.chooseNum(1, 8)
      .flatMap(n => Gen.listOfN(n, Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)))
    samples(tokens, 40).foreach { ts =>
      val back = Seq(ts.mkString(" ")).toDF("s")
        .select(split(col("s"), " ")).collect().head.getSeq[String](0)
      assert(back.toSeq === ts)
    }
  }

  test("null-heavy aggregation matches independently computed expectations") {
    val optInts: Gen[List[Option[Int]]] =
      Gen.listOfN(40, Gen.frequency((1, Gen.const(None)),
        (2, Gen.chooseNum(-1000000, 1000000).map(Some(_)))))
    samples(optInts, 12).foreach { xs =>
      val r = xs.toDF("v")
        .agg(count(col("v")), sum(col("v")), min(col("v")), max(col("v")))
        .collect().head
      val defined = xs.flatten
      assert(r.getLong(0) === defined.size)
      if (defined.isEmpty) assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
      else {
        assert(r.getLong(1) === defined.map(_.toLong).sum)
        assert(r.getInt(2) === defined.min && r.getInt(3) === defined.max)
      }
    }
  }

  test("boundary numerics: long sums near the edges stay exact") {
    val nearEdge: Gen[Long] = Gen.oneOf(
      Gen.chooseNum(Long.MinValue / 4, Long.MinValue / 8),
      Gen.chooseNum(Long.MaxValue / 8, Long.MaxValue / 4),
      Gen.chooseNum(-100L, 100L))
    samples(Gen.listOfN(6, nearEdge), 12).foreach { xs =>
      val expected = xs.map(BigInt(_)).sum
      if (expected.isValidLong) {
        val got = xs.toDF("v").agg(sum("v")).collect().head.getLong(0)
        assert(got === expected.toLong)
      }
    }
  }

  test("exact dedup invariants on generated duplicate-heavy corpora") {
    val docGen = Gen.listOfN(30,
      Gen.oneOf("a b", "a b c", "x", "y z w", "q")) // heavy duplication
    samples(docGen, 8).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = graft.ext.Dedup.exactDedup(df, "doc_id", "text").collect()
      assert(out.length === texts.distinct.size)
      assert(out.map(_.getLong(2)).sum === texts.size) // copies partition the corpus
      // canonical id is the first occurrence's id
      out.foreach { r =>
        val canonical = r.getLong(1)
        assert(texts(canonical.toInt) != null)
        assert(texts.indexOf(texts(canonical.toInt)).toLong === canonical)
      }
    }
  }

  test("shinglesUdf equals the SQL transform/slice/distinct formulation on generated texts") {
    // texts with runs of spaces, empty tokens and duplication — the exact
    // semantics the compiled UDF must preserve: regex split keeping
    // empties, end-truncated slices, first-occurrence distinct
    val textGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("a", "b", "ab", "", "xy", "a"))).map(_.mkString(" "))
    val texts = samples(textGen, 80)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val both = df.select(
      graft.ext.Dedup.shinglesUdf(3)(col("text")).as("udf_sh"),
      expr("array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), " +
        "i -> concat_ws(' ', slice(split(text, ' '), i, 3))))").as("sql_sh"))
    assert(both.filter(not(col("udf_sh") === col("sql_sh"))).count() === 0)
  }

  test("span dedup invariants on generated duplicate-heavy corpora") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val text = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = samples(text, 40).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val docs = corpus.toDF("doc_id", "text")
    val k = 4
    val spans = graft.ext.Dedup.duplicatedSpans(docs, "doc_id", "text", k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lens = corpus.map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap
    spans.foreach { case (id, s, e, nw) =>
      assert(s >= 1 && e <= lens(id))              // spans inside the doc
      assert(e - s + 1 >= k && nw === e - s + 1 - (k - 1)) // island arithmetic
    }
    // islands are disjoint and non-adjacent in window-START space (token
    // extents MAY overlap when islands sit closer than k — by design)
    spans.groupBy(_._1).values.foreach { g =>
      g.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1 - (k - 1) + 1)
        case _ => ()
      }
    }
    // coverage = TOKEN-UNION of span extents (not the raw extent sum),
    // zero-coverage docs included, and consistent with excision:
    // n_tokens - dup_tokens == kept_tokens for every doc
    val cov = graft.ext.Dedup.spanCoverage(docs, "doc_id", "text", k = k)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(cov.keySet === lens.keySet)
    val union = spans.groupBy(_._1).view.mapValues(
      _.flatMap(x => x._2 to x._3).toSet.size.toLong).toMap
    cov.foreach { case (id, (_, dup)) => assert(dup === union.getOrElse(id, 0L)) }
    val kept = graft.ext.Dedup.spanExcise(docs, "doc_id", "text", k = k)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    cov.foreach { case (id, (n, dup)) => assert(kept(id) === n - dup) }
  }

  test("chunking reassembles generated docs losslessly at every chunk size") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val text = Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = samples(text, 25).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val docs = corpus.toDF("doc_id", "text")
    for (l <- Seq(1, 3, 7, 64)) {
      val byDoc = graft.ext.TextAnalysis.fixedChunks(docs, "doc_id", "text", chunkTokens = l)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .groupBy(_._1)
      corpus.foreach { case (id, t) =>
        val chunks = byDoc(id).sortBy(_._2)
        assert(chunks.map(_._4).mkString(" ") === t)          // lossless
        assert(chunks.forall(_._3 <= l))                      // size bound
        assert(chunks.init.forall(_._3 === l.toLong))         // only the tail ragged
      }
    }
  }

  test("scc equals brute-force mutual reachability on random digraphs at full budget") {
    // generated digraphs small enough for a driver-side transitive
    // closure; with rounds = iters = |V| the operator's bounded budget is
    // provably sufficient (each round confirms at least the minimum
    // remaining vertex), so equality must be EXACT — soundness AND
    // completeness on arbitrary topology, not just the hand fixtures.
    val graphGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.chooseNum(4, 7)
      m <- Gen.chooseNum(n, 2 * n)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield es.distinct
    samples(graphGen, 3).filter(_.nonEmpty).foreach { es =>
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      // driver-side reflexive-transitive closure
      var reach = verts.map(v => v -> (Set(v) ++ es.filter(_._1 == v).map(_._2))).toMap
      var changed = true
      while (changed) {
        val next = reach.map { case (v, s) => v -> s.flatMap(reach) }
        changed = next != reach; reach = next
      }
      val expected = verts.map(v =>
        v -> verts.filter(u => reach(v)(u) && reach(u)(v)).min).toMap
      val n = verts.size
      val got = graft.ext.Graph.scc(es.toDF("src", "dst"), iters = n, rounds = n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"graph: $es")
    }
  }

  test("scc untilConverged: exact with zero -1 labels, iters demoted to dead weight") {
    // The convergence flag must make exactness independent of the
    // superstep budget: iters = 1 would grossly under-propagate in
    // bounded mode, but with untilConverged each min-label run drains its
    // frontier, so the result still equals brute-force mutual
    // reachability and carries NO unresolved (-1) vertices.
    val graphGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.chooseNum(4, 7)
      m <- Gen.chooseNum(n, 2 * n)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield es.distinct
    samples(graphGen, 3).filter(_.nonEmpty).foreach { es =>
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      var reach = verts.map(v => v -> (Set(v) ++ es.filter(_._1 == v).map(_._2))).toMap
      var changed = true
      while (changed) {
        val next = reach.map { case (v, s) => v -> s.flatMap(reach) }
        changed = next != reach; reach = next
      }
      val expected = verts.map(v =>
        v -> verts.filter(u => reach(v)(u) && reach(u)(v)).min).toMap
      val got = graft.ext.Graph.scc(es.toDF("src", "dst"),
          iters = 1, rounds = verts.size, untilConverged = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(!got.values.exists(_ == -1L), s"unresolved vertices in: $es")
      assert(got === expected, s"graph: $es")
    }
  }

  test("landmarkHops equals brute-force undirected BFS per landmark on random graphs") {
    val graphGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.chooseNum(4, 8)
      m <- Gen.chooseNum(n, 2 * n)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield es.distinct
    samples(graphGen, 3).filter(_.nonEmpty).foreach { es =>
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val adj = verts.map(v => v ->
        (es.collect { case (a, b) if a == v => b } ++
          es.collect { case (a, b) if b == v => a }).toSet).toMap
      def bfs(src: Long): Map[Long, Long] = {
        var dist = Map(src -> 0L); var frontier = Set(src); var lvl = 0L
        while (frontier.nonEmpty) {
          lvl += 1
          val next = frontier.flatMap(adj).filterNot(dist.contains)
          dist ++= next.map(_ -> lvl)
          frontier = next
        }
        dist
      }
      val lms = verts.take(2)
      val expected = lms.flatMap(lm => bfs(lm).map { case (v, d) => (v, lm) -> d }).toMap
      val got = graft.ext.Graph.landmarkHops(es.toDF("src", "dst"), lms, iters = verts.size)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === expected, s"graph: $es landmarks: $lms")
    }
  }

  test("label propagation is deterministic across partitionings") {
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L), (2L, 7L), (7L, 8L))
    val a = graft.ext.Graph.labelPropagation(es.toDF("src", "dst").repartition(5), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = graft.ext.Graph.labelPropagation(es.toDF("src", "dst").repartition(2), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("native dot/norm equal interpreted lambdas on generated vectors (incl. specials)") {
    val d = Gen.frequency(
      (8, Gen.chooseNum(-1e6, 1e6)),
      (1, Gen.oneOf(0.0, -0.0, 1e-300, -1e300, Double.MaxValue, Double.MinPositiveValue)))
    val vecGen = Gen.chooseNum(1, 16).flatMap(n => Gen.listOfN(n, d))
    val pairs = samples(vecGen, 40).map(v => (v, v.reverse))
    val df = pairs.toDF("a", "b")
    val checked = df.select(
      graft.functions.VectorFunctions.dot(col("a"), col("b")).as("dn"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)").as("dl"),
      graft.functions.VectorFunctions.l2norm(col("a")).as("nn"),
      expr("sqrt(aggregate(a, cast(0 as double), (acc, x) -> acc + x * x))").as("nl"))
      .collect()
    checked.foreach { r =>
      // bit-exact equality, including NaN/Inf overflow cases
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        === java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2))
        === java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
    assert(checked.nonEmpty)
  }
}
