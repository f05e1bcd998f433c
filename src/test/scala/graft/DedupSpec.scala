package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** Dedup operator correctness beyond the DuckDB oracle: hash portability,
  * exact-dedup semantics, and — the part an oracle mirror can't prove —
  * that the banded LSH/SimHash shortcuts lose nothing vs brute force. */
class DedupSpec extends SparkSpec {

  test("portable hash matches an independent md5 implementation") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("0:hello".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = java.lang.Long.parseLong(hex.take(15), 16)
    val got = spark.sql(s"SELECT ${Dedup.portableHash("'hello'", "'0'")}")
      .collect().head.getLong(0)
    assert(got === expected)
  }

  test("exact dedup collapses identical texts to the min id") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y")).toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, "doc_id", "text").collect()
    assert(out.length === 2)
    val dup = out.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) === 1L)
  }

  test("LSH near-dup pairs equal brute-force Jaccard pairs (full recall)") {
    val docs = Tables.documents(spark, sf01)
    val lsh = Dedup.neardupPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs.select(col("doc_id"), Dedup.shinglesUdf(3)(col("text")).as("sh"))
    val brute = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .crossJoin(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")))
      .filter(col("doc_a") < col("doc_b"))
      .filter(expr("cast(size(array_intersect(sh_a, sh_b)) as double) / size(array_union(sh_a, sh_b)) >= 0.5"))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty) // the generator plants near-dup pairs at sf0.01
    assert(lsh === brute)
  }

  test("incremental dedup drops corpus dups and in-batch dups, keeps the rest") {
    import spark.implicits._
    val existing = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    val incoming = Seq((10L, "aa"), (11L, "cc"), (12L, "cc"), (13L, "dd"))
      .toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(existing, incoming, "doc_id", "text")
      .collect().map(_.getLong(0)).sorted
    assert(kept === Array(11L, 13L))
  }

  test("bloom-prefiltered incremental dedup equals the exact formulation") {
    import spark.implicits._
    // corpus dups, in-batch dups, nulls on both sides, and a tight fpp=0.5
    // filter (many false positives) — the verify join must absorb every
    // suspect, and nulls must dedupe in-batch only, exactly as d10.
    val corpus = Seq(1L -> "aa", 2L -> "bb", 3L -> "aa", 4L -> (null: String))
      .toDF("doc_id", "text")
    val batch = Seq(10L -> "aa", 11L -> "cc", 12L -> "cc", 13L -> (null: String),
      14L -> (null: String), 15L -> "dd").toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = ids(Dedup.incrementalDedup(corpus, batch, "doc_id", "text"))
    val bloomy = ids(Dedup.bloomIncrementalDedup(corpus, batch, "doc_id", "text",
      expectedItems = 8, fpp = 0.5))
    assert(bloomy === exact)
    // "aa" dropped (corpus dup); one "cc" survives; nulls dedupe in-batch
    // (never against the corpus null); "dd" clean-new
    assert(exact === Set(11L, 13L, 15L))
    // sf0.01 cross-check at the d19 split
    val docs = Tables.documents(spark, sf01)
    val e2 = ids(Dedup.incrementalDedup(
      docs.filter(col("doc_id") < 300), docs.filter(col("doc_id") >= 300), "doc_id", "text"))
    val b2 = ids(Dedup.bloomIncrementalDedup(
      docs.filter(col("doc_id") < 300), docs.filter(col("doc_id") >= 300), "doc_id", "text"))
    assert(b2 === e2 && b2.nonEmpty)
  }

  test("incremental near-dup probe equals the full recompute restricted to the batch") {
    import spark.implicits._
    // corpus: two near-dup texts (share most 3-shingles), one exact pair,
    // one loner. batch: an exact copy of a corpus text (joins a standing
    // group whose rep has standing near-dup links), a near-dup of a corpus
    // text, an in-batch exact pair with a NEW text, and a loner.
    val t1 = "a b c d e f g h i j"
    val t1near = "a b c d e f g h i k" // near-dup of t1
    val corpus = Seq(1L -> t1, 2L -> t1near, 3L -> t1, 4L -> "z y x w v u t s r q")
      .toDF("doc_id", "text")
    val batch = Seq(10L -> t1, 11L -> "a b c d e f g h j k",
      12L -> "m n o p q r s t u v", 13L -> "m n o p q r s t u v",
      14L -> "completely different words here nothing shared at all ok")
      .toDF("doc_id", "text")
    val idx = "/tmp/graft_scale/neardup_idx_spec"
    Dedup.writeNeardupIndex(corpus, "doc_id", "text", idx)
    val got = Dedup.incrementalNeardupPairs(spark, idx, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.neardupPairs(corpus.union(batch), "doc_id", "text")
      .filter(col("doc_b") >= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === full)
    assert(got.contains((1L, 10L, 1.0)))  // batch copy joins the standing group
    assert(got.exists(p => p._1 == 2L && p._2 == 10L && p._3 < 1.0),
      "standing near-dup link must expand to the batch copy") // (1,2) was corpus near-dup; 10 copies 1
    assert(got.contains((12L, 13L, 1.0))) // in-batch exact pair, new digest
    assert(!got.exists { case (a, b, _) => a == 14L || b == 14L }) // batch loner
    assert(!got.exists { case (a, b, _) => b < 10L }) // nothing corpus-only
  }

  test("incremental near-dup probe on sf0.01 matches the restricted recompute") {
    val docs = Tables.documents(spark, sf01)
    val idx = "/tmp/graft_scale/neardup_idx_spec_sf"
    Dedup.writeNeardupIndex(docs.filter(col("doc_id") < 250), "doc_id", "text", idx)
    val got = Dedup.incrementalNeardupPairs(
        spark, idx, docs.filter(col("doc_id") >= 250), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.neardupPairs(docs, "doc_id", "text")
      .filter(col("doc_b") >= 250)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === full)
  }

  test("neardup index ingest: probe after ingest equals probe of a from-scratch corpus+batch index") {
    import spark.implicits._
    val t1 = "a b c d e f g h i j"
    val corpus = Seq(1L -> t1, 2L -> "a b c d e f g h i k", 3L -> t1,
      4L -> "z y x w v u t s r q").toDF("doc_id", "text")
    val batchB = Seq(10L -> t1, 11L -> "a b c d e f g h j k",
      12L -> "m n o p q r s t u v", 13L -> "m n o p q r s t u v").toDF("doc_id", "text")
    val batchC = Seq(20L -> "a b c d e f g h i j", // copy of the standing group
      21L -> "m n o p q r s t u w", // near-dup of B's new text
      22L -> "totally fresh words that match nothing else in any batch")
      .toDF("doc_id", "text")
    def pairs(idx: String) =
      Dedup.incrementalNeardupPairs(spark, idx, batchC, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val idxA = "/tmp/graft_scale/neardup_idx_ingest_a"
    Dedup.writeNeardupIndex(corpus, "doc_id", "text", idxA)
    Dedup.ingestNeardupBatch(spark, idxA, batchB, "doc_id", "text")
    val idxAB = "/tmp/graft_scale/neardup_idx_ingest_ab"
    Dedup.writeNeardupIndex(corpus.union(batchB), "doc_id", "text", idxAB)
    val got = pairs(idxA)
    assert(got === pairs(idxAB))
    // the ingested batch is really standing corpus now: C's copy pairs
    // with A-era AND B-era members of the group
    assert(got.contains((1L, 20L, 1.0)) && got.contains((10L, 20L, 1.0)))
    assert(got.exists(p => p._1 == 12L && p._2 == 21L && p._3 < 1.0),
      "B's new text must be probe-able standing state after ingest")
    // ingest added a second generation (batch-proportional, not a rebuild)
    val fs = new org.apache.hadoop.fs.Path(idxA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(idxA))
      .map(_.getPath.getName).filter(_.startsWith("gen=")).sorted
    assert(gens === Array("gen=0", "gen=1"))
  }

  test("neardup index reader falls back to the pre-generational flat layout") {
    import spark.implicits._
    val t1 = "a b c d e f g h i j"
    val corpus = Seq(1L -> t1, 2L -> "a b c d e f g h i k", 3L -> t1,
      4L -> "z y x w v u t s r q").toDF("doc_id", "text")
    val batch = Seq(10L -> t1, 11L -> "completely unrelated words here ok")
      .toDF("doc_id", "text")
    val gen = "/tmp/graft_scale/neardup_idx_legacy_gen"
    Dedup.writeNeardupIndex(corpus, "doc_id", "text", gen)
    def pairs(idx: String) =
      Dedup.incrementalNeardupPairs(spark, idx, batch, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = pairs(gen)
    // simulate an index written by the pre-generational layout: the four
    // tables sit directly under the path, no gen=N/ level
    val legacy = "/tmp/graft_scale/neardup_idx_legacy_flat"
    val fs = new org.apache.hadoop.fs.Path(legacy)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(legacy), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(legacy))
    for (t <- Seq("members", "shingles", "bands", "meta"))
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(s"$gen/gen=0/$t"),
        fs, new org.apache.hadoop.fs.Path(s"$legacy/$t"),
        false, spark.sparkContext.hadoopConfiguration)
    assert(pairs(legacy) === expected)
    // and an ingest on top of the legacy layout unions both generations
    val batchB = Seq(20L -> "m n o p q r s t u v").toDF("doc_id", "text")
    Dedup.ingestNeardupBatch(spark, legacy, batchB, "doc_id", "text")
    val got = Dedup.incrementalNeardupPairs(spark, legacy,
        Seq(30L -> t1, 31L -> "m n o p q r s t u w").toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 30L)))  // legacy-layout standing group still probes
    assert(got.contains((20L, 31L))) // ingested generation probes too
  }

  test("neardup index compaction: probe identical before/after, old generations retired") {
    import spark.implicits._
    val t1 = "a b c d e f g h i j"
    val corpus = Seq(1L -> t1, 2L -> "a b c d e f g h i k", 3L -> t1,
      4L -> "z y x w v u t s r q").toDF("doc_id", "text")
    val batchB = Seq(10L -> t1, 11L -> "m n o p q r s t u v").toDF("doc_id", "text")
    val batchC = Seq(20L -> t1, 21L -> "m n o p q r s t u w").toDF("doc_id", "text")
    val idx = "/tmp/graft_scale/neardup_idx_compact"
    Dedup.writeNeardupIndex(corpus, "doc_id", "text", idx)
    Dedup.ingestNeardupBatch(spark, idx, batchB, "doc_id", "text")
    def pairs() =
      Dedup.incrementalNeardupPairs(spark, idx, batchC, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val before = pairs()
    assert(before.nonEmpty)
    Dedup.compactNeardupIndex(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val children = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .map(_.getPath.getName).filter(!_.startsWith(".")).sorted
    assert(children === Array("gen=0"), s"superseded generations must retire: ${children.toSeq}")
    assert(pairs() === before)
    // the id-monotonicity manifest survives the fold: ingested B ids count
    assert(Dedup.indexMaxCorpusId(spark, idx) === Some(11L))
  }

  test("index installs are atomic: a probe interleaved with a rebuild sees only complete indexes") {
    import spark.implicits._
    // The multi-process race the temp-dir + atomic-rename build exists
    // for: builder B overwrite-building while A's probe reads. Simulated
    // deterministically: v1 and v2 corpora hold the same text under
    // DIFFERENT rep ids, so a probe's answer identifies which index it
    // read. The v2 rebuild probes dest from INSIDE the build lambda —
    // after v2's files are fully written to the temp sibling, before the
    // swap — and must still get v1's complete answer.
    val t1 = "a b c d e f g h i j"
    val v1 = Seq(1L -> t1, 2L -> "z y x w v u t s r q").toDF("doc_id", "text")
    val v2 = Seq(3L -> t1, 4L -> "z y x w v u t s r q").toDF("doc_id", "text")
    val batch = Seq(10L -> t1).toDF("doc_id", "text")
    val dest = "/tmp/graft_scale/neardup_idx_atomic_spec"
    def probeReps(): Set[(Long, Long)] =
      Dedup.incrementalNeardupPairs(spark, dest, batch, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Dedup.writeNeardupIndex(v1, "doc_id", "text", dest)
    assert(probeReps() === Set((1L, 10L)))
    graft.ext.IndexStore.atomically(spark, dest) { tmp =>
      Dedup.writeNeardupIndex(v2, "doc_id", "text", tmp) // nested install at tmp
      assert(probeReps() === Set((1L, 10L)),
        "mid-rebuild probe must still answer from the complete v1 index")
    }
    assert(probeReps() === Set((3L, 10L)), "post-install probe must see v2")
    // a FAILED build leaves dest untouched and no temp/retired garbage
    intercept[RuntimeException] {
      graft.ext.IndexStore.atomically(spark, dest) { _ =>
        throw new RuntimeException("simulated build failure")
      }
    }
    assert(probeReps() === Set((3L, 10L)), "failed rebuild must not disturb dest")
    val parent = new java.io.File(dest).getParentFile
    val base = new java.io.File(dest).getName
    val leftovers = parent.listFiles().map(_.getName)
      .filter(n => n.contains(base + ".__")) // dot-prefixed temp/retired siblings
    assert(leftovers.isEmpty, s"temp/retired dirs must be cleaned up: ${leftovers.toSeq}")
  }

  test("incremental near-dup: bucket caps bind identically in probe and recompute") {
    import spark.implicits._
    // near-identical texts force heavy band collisions; tightening
    // maxBucket makes cap decisions depend on the COMBINED corpus+new
    // bucket sizes — a new batch rep must be able to push a standing
    // bucket over the cap exactly like the full recompute would
    def t(x: String) = s"the quick brown fox jumps over the lazy dog $x end"
    val corpus = (1L to 8L).map(i => (i, t(s"c$i"))).toDF("doc_id", "text")
    val batch = ((20L to 23L).map(i => (i, t(s"b$i"))) :+ ((24L, t("c3"))))
      .toDF("doc_id", "text")
    val idx = "/tmp/graft_scale/neardup_idx_spec_cap"
    Dedup.writeNeardupIndex(corpus, "doc_id", "text", idx)
    for (cap <- Seq(2, 3, 50)) {
      val got = Dedup.incrementalNeardupPairs(spark, idx, batch, "doc_id", "text",
          maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val full = Dedup.neardupPairs(corpus.union(batch), "doc_id", "text",
          maxBucket = cap)
        .filter(col("doc_b") >= 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === full, s"probe diverges from restricted recompute at maxBucket=$cap")
    }
  }

  test("incremental near-dup probe reads only the index, never the corpus text") {
    import spark.implicits._
    val corpus = Seq(1L -> "a b c d e", 2L -> "f g h i j").toDF("doc_id", "text")
    val batch = Seq(10L -> "a b c d e", 11L -> "k l m n o").toDF("doc_id", "text")
    val idx = "/tmp/graft_scale/neardup_idx_spec_plan"
    Dedup.writeNeardupIndex(corpus, "doc_id", "text", idx)
    // the batch is an in-memory relation, so every file scan in the probe
    // plan must be an index read — the corpus parquet/text is untouched
    val probe = Dedup.incrementalNeardupPairs(spark, idx, batch, "doc_id", "text",
      materialize = false)
    val p = probe.queryExecution.executedPlan.toString
    val locations = p.linesIterator.filter(_.contains("Location:")).toSeq
    assert(locations.nonEmpty)
    locations.foreach { loc =>
      assert(loc.contains("neardup_idx_spec_plan"), s"non-index scan: $loc")
    }
  }

  test("null texts: simhash never pairs them (raw-oracle semantics); minhash groups them (dedup-first-oracle semantics)") {
    import spark.implicits._
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "a b c d"), (4L, "a b c d")).toDF("doc_id", "text")
    // d06's oracle is the raw banded formulation: a null text yields no
    // token rows, no fingerprint, no bands — it can never pair
    val sim = Dedup.simhashNeardupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim === Set((3L, 4L)))
    // d04's oracle windows PARTITION BY md5(text), which groups nulls into
    // one digest group — they pair at jaccard 1.0
    val mh = Dedup.neardupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(mh === Set((1L, 2L, 1.0), (3L, 4L, 1.0)))
  }

  test("deletion-neighborhood fuzzy pairs equal brute-force levenshtein (full recall)") {
    import spark.implicits._
    // substitutions, inserts, deletes, distance-2 decoys, an exact-dup id pair
    val names = Seq(1L -> "abc", 2L -> "abd", 3L -> "ab", 4L -> "abcd",
      5L -> "xyz", 6L -> "abc", 7L -> "bbcc").toDF("id", "name")
    val got = Dedup.fuzzyPairsEd1(names, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = names.as("a").join(names.as("b"), col("a.id") < col("b.id"))
      .withColumn("d", levenshtein(col("a.name"), col("b.name")))
      .filter(col("d") <= 1)
      .select(col("a.id"), col("b.id"), col("d").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === brute)
    assert(got.contains((1L, 6L, 0)))   // identical strings, distance 0
    assert(got.contains((1L, 3L, 1)))   // deletion
    assert(got.contains((1L, 4L, 1)))   // insertion
    assert(!got.exists { case (a, b, _) => a == 5L || b == 5L }) // no decoy
  }

  test("duplicated spans find shared runs, merge windows, and skip short/unique docs") {
    import spark.implicits._
    // doc 1 and 2 share tokens 1-10 exactly ("w1".."w10"), then diverge;
    // doc 3 is unique; doc 4 is shorter than the window width
    val shared = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      1L -> s"$shared alpha beta gamma delta epsilon zeta eta theta",
      2L -> s"$shared one two three four five six seven eight",
      3L -> "totally different words that appear nowhere else in this corpus at all",
      4L -> "too short").toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // shared run = 10 tokens -> windows at starts 1,2,3 merge into ONE
    // span [1,10] of 3 windows, in each of the two sharing docs
    assert(spans === Set((1L, 1L, 10L, 3L), (2L, 1L, 10L, 3L)))

    val cov = Dedup.spanCoverage(docs, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(cov(1L) === ((18L, 10L, math.round(10.0 / 18 * 1e6) / 1e6)))
    assert(cov(3L) === ((12L, 0L, 0.0)))  // unique doc: present, zero coverage
    assert(cov(4L) === ((2L, 0L, 0.0)))   // short doc: no windows, zero coverage

    val ex = Dedup.spanExcise(docs, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(ex(1L) === (("alpha beta gamma delta epsilon zeta eta theta", 18L, 8L)))
    assert(ex(2L) === (("one two three four five six seven eight", 18L, 8L)))
    assert(ex(3L)._3 === 12L)             // unique doc survives whole
    assert(ex(4L) === (("too short", 2L, 2L)))

    // a doc that is ALL duplicated content still appears, fully excised
    val twins = Seq(1L -> shared, 2L -> shared).toDF("doc_id", "text")
    val ex2 = Dedup.spanExcise(twins, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(3)))).toMap
    assert(ex2(1L) === (("", 0L)) && ex2(2L) === (("", 0L)))
  }

  test("span decontamination excises benchmark passages from training docs only") {
    import spark.implicits._
    val passage = (1 to 10).map(i => s"b$i").mkString(" ")   // 10-token benchmark run
    val train = Seq(
      1L -> s"intro words here then $passage and a closing tail remains",
      2L -> "completely clean training document with no leaked content at all").toDF("doc_id", "text")
    val bench = Seq(100L -> s"$passage plus unrelated benchmark framing").toDF("doc_id", "text")
    val out = Dedup.spanDecontaminate(train, bench, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: the 10 leaked tokens (windows merged into one span) are gone,
    // surrounding text survives intact
    assert(out(1L)._1 === "intro words here then and a closing tail remains")
    assert(out(1L)._2 - out(1L)._3 === 10L)
    // doc 2 untouched; benchmark docs never appear in the output
    assert(out(2L)._1 === "completely clean training document with no leaked content at all")
    assert(out.keySet === Set(1L, 2L))
  }

  test("containment pairs catch subset-duplication Jaccard misses, match brute force") {
    import spark.implicits._
    val core = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      1L -> core,                                        // short doc
      2L -> (core + " " + (13 to 60).map(i => s"x$i").mkString(" ")), // contains doc 1
      3L -> "entirely unrelated words about nothing shared with others at all").toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // 1 is fully contained in 2 (containment 1.0) though their Jaccard is
    // ~10/58 — far below any symmetric near-dup threshold; 2 is NOT
    // contained in 1, and 3 pairs with nothing
    assert(got === Set((1L, 2L, 1.0)))

    // full-recall parity vs brute force on the sf0.01 corpus
    val corpus = Tables.documents(spark, sf01)
    val blocked = Dedup.containmentPairs(corpus, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = corpus.select(col("doc_id"), Dedup.shinglesUdf(3)(col("text")).as("sh"))
    val brute = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
      .filter(col("id_a") =!= col("id_b"))
      .filter(expr("size(array_intersect(sh_a, sh_b)) >= size(sh_a) * 0.8"))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(blocked === brute)
  }

  test("neardup pairs on a dup-heavy corpus equal brute-force shingle Jaccard") {
    import spark.implicits._
    // exact-dup groups (1,2,5), (4,6); near-dup 3 of the first group; 7 unrelated
    val base = "the quick brown fox jumps over the lazy dog and then runs far away into the deep green forest before sunset tonight"
    val docs = Seq(
      1L -> base, 2L -> base, 5L -> base,
      3L -> base.replace("sunset", "sunrise"),
      4L -> "completely different text about distributed query engines and shuffles",
      6L -> "completely different text about distributed query engines and shuffles",
      7L -> "nothing in common with anything else whatsoever here at all today"
    ).toDF("doc_id", "text")
    val got = Dedup.neardupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sh = Dedup.shingleTable(docs, "doc_id", "text")
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("jaccard", expr(
        "cast(size(array_intersect(a.shingles, b.shingles)) as double) / cast(size(array_union(a.shingles, b.shingles)) as double)"))
      .filter(col("jaccard") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id"), round(col("jaccard"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === brute)
    assert(got.contains((1L, 2L, 1.0)) && got.contains((2L, 5L, 1.0)) && got.contains((4L, 6L, 1.0)))
    assert(got.exists { case (a, b, j) => (a, b) == (1L, 3L) && j < 1.0 }) // near-dup, not exact
    assert(!got.exists { case (a, b, _) => a == 7L || b == 7L })
  }

  test("blocked Jaro-Winkler pairs equal the brute-force formulation") {
    val c = Tables.customer(spark, sf001)
    val blocked = Dedup.jaroWinklerBlocked(c, "c_custkey", "c_name", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = c.as("a").join(c.as("b"), col("a.c_custkey") < col("b.c_custkey"))
      .filter(levenshtein(col("a.c_name"), col("b.c_name")) <= 1)
      .withColumn("jw_raw", graft.functions.StringFunctions.jaroWinkler(
        col("a.c_name"), col("b.c_name")))
      .filter(col("jw_raw") >= 0.9)
      .select(col("a.c_custkey"), col("b.c_custkey"), round(col("jw_raw"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(blocked.nonEmpty)
    assert(blocked === brute)
  }

  test("d06 dup-rate gate: raw and dedup-first paths are result-identical") {
    import spark.implicits._
    // dup-heavy input: the corpus tiled once (every text occurs twice)
    val base = Tables.documents(spark, sf001).select("doc_id", "text").limit(100)
    val tiled = base.union(base.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    // knownDupRate forces each path with no probe job — deterministic
    // routing (the HLL estimate can go slightly negative on dup-free
    // input, so threshold-gaming is not a reliable way to force a path)
    def run(forcedRate: Double) =
      Dedup.simhashNeardupPairs(tiled, "doc_id", "text",
          knownDupRate = Some(forcedRate))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaRaw = run(forcedRate = -1.0)
    val viaDedup = run(forcedRate = 1.0)
    assert(viaRaw === viaDedup)
    assert(viaRaw.nonEmpty) // tiling guarantees within-group pairs exist
    // every tiled copy pairs with its original at Hamming 0
    assert(viaRaw.contains((base.head.getLong(0), base.head.getLong(0) + 100000L, 0)))
  }

  test("d04 dup-rate gate: raw and dedup-first paths are result-identical") {
    import spark.implicits._
    // The equivalence has three seams the raw path must get right (see
    // neardupPairs' scaladoc): same-digest pairs independent of LSH,
    // the bucket cap counted over distinct digests, and null texts
    // grouping at 1.0 — so the fixture mixes a tiled dup-heavy slice,
    // two null texts, and a short (single-shingle) text pair.
    val base = Tables.documents(spark, sf001).select("doc_id", "text").limit(100)
    val tiled = base.union(base.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .union(Seq((200001L, null: String), (200002L, null: String),
        (200003L, "x y"), (200004L, "x y")).toDF("doc_id", "text"))
    def run(forcedRate: Double) =
      Dedup.neardupPairs(tiled, "doc_id", "text",
          knownDupRate = Some(forcedRate))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaRaw = run(forcedRate = -1.0)
    val viaDedup = run(forcedRate = 1.0)
    assert(viaRaw === viaDedup)
    // tiled copy pairs its original at 1.0; nulls group; shorts group
    assert(viaRaw.contains((base.head.getLong(0), base.head.getLong(0) + 100000L, 1.0)))
    assert(viaRaw.contains((200001L, 200002L, 1.0)))
    assert(viaRaw.contains((200003L, 200004L, 1.0)))
    // and a TIGHT bucket cap (every bucket oversized) must still keep the
    // same-digest pairs identical across paths — the seam where a raw
    // formulation that rides buckets for 1.0-pairs breaks
    def runCapped(forcedRate: Double) =
      Dedup.neardupPairs(tiled, "doc_id", "text", maxBucket = 1,
          knownDupRate = Some(forcedRate))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(runCapped(-1.0) === runCapped(1.0))
    assert(runCapped(-1.0).contains((200001L, 200002L, 1.0)))
  }

  test("SimHash banded pairs equal brute-force Hamming pairs (full recall)") {
    val docs = Tables.documents(spark, sf001)
    val banded = Dedup.simhashNeardupPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fp = Dedup.simhashFingerprints(docs, "doc_id", "text")
    val brute = fp.select(col("doc_id").as("doc_a"), col("sim").as("sim_a"))
      .crossJoin(fp.select(col("doc_id").as("doc_b"), col("sim").as("sim_b")))
      .filter(col("doc_a") < col("doc_b"))
      .filter(expr("bit_count(sim_a ^ sim_b) <= 1"))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute)
  }
}
