package graft

import graft.ext.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def doc(text: String): DataFrame = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("repetition stats on hand-counted documents") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b a b a b", // 2-grams: ab,ba,ab,ba,ab -> total 5, distinct 2, top 3
      2L -> "w x y z",     // all grams unique
      3L -> "solo",        // no 2-grams at all
      4L -> "").toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getLong(4), x.getDouble(5))).toMap
    assert(r(1L) === ((5L, 0.6, 0.6, 4L, 0.5)))  // 3-grams: aba,bab,aba,bab -> dup 0.5
    assert(r(2L) === ((3L, 0.0, 0.333333, 2L, 0.0))) // top2 = round(1/3, 6), all unique
    assert(r(3L) === ((0L, 0.0, 0.0, 0L, 0.0)))
    assert(r(4L) === ((0L, 0.0, 0.0, 0L, 0.0))) // "" -> one empty token, no grams
  }

  test("bpe merges: hand-traced rounds, greedy non-overlap, early exhaustion") {
    import spark.implicits._
    // words: "aaa" x3, "bb" x1.
    // r1: (a,a) = 2 pairs x 3 = 6 beats (b,b) = 1 -> merge "aaa" GREEDILY
    //     left-to-right: [a,a,a] -> [aa, a] (NOT [a, aa], NOT [aa, aa]).
    // r2: (aa,a) = 3 beats (b,b) = 1 -> [aaa].
    // r3: only (b,b) = 1 remains. r4: no pairs anywhere -> stop early.
    val docs = Seq((1L, "aaa bb aaa"), (2L, "aaa"), (3L, null: String))
      .toDF("doc_id", "text")
    val rules = TextAnalysis.bpeMerges(docs, "doc_id", "text", merges = 5)
      .orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(rules === Seq((1L, "a", "a", 6L), (2L, "aa", "a", 3L), (3L, "b", "b", 1L)))
  }

  test("bpe merges: count ties break to the lexicographically smallest pair") {
    import spark.implicits._
    val docs = Seq((1L, "cd ab")).toDF("doc_id", "text")
    val rules = TextAnalysis.bpeMerges(docs, "doc_id", "text", merges = 2)
      .orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(rules === Seq(("a", "b"), ("c", "d")))
  }

  test("bpe encode: dictionary pieces reassemble per doc in word order") {
    import spark.implicits._
    // same trace as the merges test: after 2 merges aaa -> [aaa],
    // bb stays [b, b]; encoding concatenates per-word pieces in position
    // order and a null doc reports the empty encoding.
    val docs = Seq((1L, "aaa bb"), (2L, "bb aaa aaa"), (3L, null: String))
      .toDF("doc_id", "text")
    val enc = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(enc === Seq((1L, 3L, "aaa b b"), (2L, 4L, "b b aaa aaa"), (3L, 0L, "")))
  }

  test("bpe merges are deterministic across partitionings") {
    val docs = Tables.documents(spark, sf001)
    def run(parts: Int) = TextAnalysis.bpeMerges(
        docs.repartition(parts), "doc_id", "text", merges = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val a = run(7); val b = run(2)
    assert(a === b)
    assert(a.size === 4)
  }

  test("quality scores on a known document") {
    val r = TextAnalysis.qualityScores(doc("the cat sat on the mat !"), "doc_id", "text")
      .collect().head
    assert(r.getAs[Int]("n_tokens") === 7)
    assert(r.getAs[Int]("n_distinct") === 6) // 'the' twice
    assert(r.getAs[Double]("mean_tok_len") === math.rint(18.0 / 7.0 * 1e6) / 1e6)
    assert(r.getAs[Int]("punct_count") === 1) // the '!'
    assert(r.getAs[Double]("stop_ratio") === math.rint(2.0 / 7.0 * 1e6) / 1e6)
  }

  test("token counts: regex tokenizer splits glued words and symbols") {
    val r = TextAnalysis.tokenCounts(doc("abc123 x! y"), "doc_id", "text").collect().head
    assert(r.getAs[Int]("ws_tokens") === 3)
    assert(r.getAs[Int]("re_tokens") === 5) // abc, 123, x, !, y
    // ceil(6/4)+ceil(2/4)+ceil(1/4) = 2+1+1
    assert(r.getAs[Int]("subword_est") === 4)
  }

  test("language id picks the lexicon with most hits, ties break alphabetically") {
    val en = TextAnalysis.languageId(doc("the the value"), "doc_id", "text").collect().head
    assert(en.getAs[String]("best_lang") === "en")
    // 'a' hits de/en/es/fr equally -> alphabetical winner 'de'
    val tie = TextAnalysis.languageId(doc("a value row"), "doc_id", "text").collect().head
    assert(tie.getAs[String]("best_lang") === "de")
  }

  test("null text yields null fold results, like the SQL lambdas replaced") {
    import spark.implicits._
    val df = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(col("doc_id"), expr("split(text, ' ')").as("toks"))
    val r = df.select(
      TextAnalysis.lexiconHitsUdf(Seq("the"))(col("toks")).as("hits")).head()
    assert(r.isNullAt(0))
    // the full scorecards must also survive a null text row
    val q = TextAnalysis.qualityScores(Seq((1L, null: String)).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    val t = TextAnalysis.tokenCounts(Seq((1L, null: String)).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(q.length === 1 && t.length === 1)
    assert(t.head.isNullAt(t.head.fieldIndex("subword_est")))
  }

  test("near-duplicate documents land in the same fingerprint bucket") {
    val docs = Tables.documents(spark, sf01)
    val fps = TextAnalysis.fingerprints(docs, "doc_id", "text")
    // the generator plants 25 near-dup pairs; winnowed min-5 fingerprints
    // should put at least some of them in shared buckets
    val bucketed = fps.filter(col("fp_bucket_size") >= 2).count()
    assert(bucketed >= 2, s"expected some shared-fingerprint docs, got $bucketed")
    assert(fps.count() === 500)
  }

  test("fingerprint path has no interpreted higher-order lambdas in its plan") {
    // hash->sort->take-5->xor runs as one compiled UDF kernel; an
    // interpreted transform/aggregate chain here is the O(shingles)-per-doc
    // tax the MinHash path already eliminated (Dedup.scala convention)
    val plan = TextAnalysis.fingerprints(doc("a b c d e f"), "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("transform("), s"interpreted transform in plan:\n$plan")
    assert(!plan.contains("aggregate("), s"interpreted aggregate in plan:\n$plan")
  }

  test("normalize folds case/punct, collapses runs, and is idempotent") {
    import spark.implicits._
    val df = Seq((1L, "Hello,  World!! 42"), (2L, "already clean")).toDF("doc_id", "text")
    val out = TextAnalysis.normalize(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // uppercase letters are punct-class here (pipeline lowercases first)
    assert(out(1L) === "hello world 42")
    assert(out(2L) === "already clean")
    val again = TextAnalysis.normalize(
      TextAnalysis.normalize(df, "doc_id", "text"), "doc_id", "norm_text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === out)
  }

  test("vocab coverage: full-vocab docs score 0 OOV; rare tokens raise it exactly") {
    import spark.implicits._
    val df = Seq((1L, "a b a b"), (2L, "a b zzz")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabOov(df, "doc_id", "text", vocabSize = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // vocab = {a, b} (counts 3 and 3); zzz is the one OOV token
    assert(out(1L) === ((4L, 4L, 0.0)))
    assert(out(2L) === ((3L, 2L, 0.333333)))
  }

  test("boilerplate ratio: repeated template text scores high, unique prose zero") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c a b c a b c"),   // shingles: 7 total, 3 distinct
      (2L, "one two three four")   // 2 total, 2 distinct
    ).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateRatio(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((7, 3, 0.571429)))
    assert(out(2L) === ((2, 2, 0.0)))
  }

  test("bigram LM: conditional probabilities from known counts") {
    import spark.implicits._
    val df = Seq((1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog sat")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLm(df, "doc_id", "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("the", "cat")) === ((2L, 3L, 0.666667)))
    assert(out(("the", "dog")) === ((1L, 3L, 0.333333)))
    assert(out(("cat", "sat")) === ((1L, 2L, 0.5)))
    assert(out.size === 5)
  }

  test("redact: ordered rules — phone fires before the digit-run rule") {
    import spark.implicits._
    val df = Seq((1L, "call 555-1234 or 555-4321 id 98765 ok 42")).toDF("doc_id", "text")
    val r = TextAnalysis.redact(df, "doc_id", "text", Seq(
      ("phone", "[0-9]{3}-[0-9]{4}", "<phone>"),
      ("num", "[0-9]{3,}", "<num>"))).head()
    assert(r.getString(1) === "call <phone> or <phone> id <num> ok 42")
    assert(r.getInt(2) === 2) // phones
    assert(r.getInt(3) === 1) // digit runs AFTER phones were consumed
  }

  test("decontaminate: overlap counted against the benchmark shingle set exactly") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),     // identical: 3/3 shingles hit
      (2L, "the quick brown dog barks"),     // shares only 'the quick brown': 1/3
      (3L, "totally unrelated text here")    // 0/2
    ).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    assert(out(1L) === ((3, 3L, 1.0, 1)))
    assert(out(2L) === ((3, 1L, 0.333333, 0)))
    assert(out(3L) === ((2, 0L, 0.0, 0)))
  }

  test("decontaminate: threshold compares in integer micro-units, not rounded doubles") {
    import spark.implicits._
    // 1 of 2 shingles hit = exactly the 0.5 default threshold -> contaminated
    val bench = Seq((100L, "a b c")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b c x")).toDF("doc_id", "text") // shingles: 'a b c', 'b c x'
    val r = TextAnalysis.decontaminate(corpus, bench, "doc_id", "text").head()
    assert(r.getLong(2) === 1L && r.getInt(4) === 1)
  }

  test("decontaminate: benchmark side is broadcast, corpus scanned once") {
    import spark.implicits._
    val bench = Seq((100L, "a b c")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b c x")).toDF("doc_id", "text")
    val plan = TextAnalysis.decontaminate(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe join:\n$plan")
  }

  test("decontaminate: a null-text doc has null ratio and is never contaminated") {
    import spark.implicits._
    val bench = Seq((100L, "a b c")).toDF("doc_id", "text")
    val corpus = Seq((1L, null: String)).toDF("doc_id", "text")
    val r = TextAnalysis.decontaminate(corpus, bench, "doc_id", "text").head()
    assert(r.getInt(1) === 0 && r.getLong(2) === 0L)
    assert(r.isNullAt(3) && r.getInt(4) === 0)
  }

  test("doc LM score: known corpus gives exact micro-nat sums") {
    import spark.implicits._
    val df = Seq((1L, "the cat sat"), (2L, "the cat ran")).toDF("doc_id", "text")
    // LM: P(cat|the)=2/2=1 -> 0 micro-nats; P(sat|cat)=1/2, P(ran|cat)=1/2
    val halfMicro = math.rint(math.log(0.5) * 1e6).toLong // -693147
    val out = TextAnalysis.docLmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((2L, halfMicro, math.rint(halfMicro / 1e6 / 2 * 1e6) / 1e6)))
    assert(out(2L) === ((2L, halfMicro, math.rint(halfMicro / 1e6 / 2 * 1e6) / 1e6)))
  }

  test("doc LM score: docs with fewer than two tokens drop out") {
    import spark.implicits._
    val df = Seq((1L, "single"), (2L, "two tokens")).toDF("doc_id", "text")
    val out = TextAnalysis.docLmScore(df, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSet === Set(2L))
  }

  test("tfidf: ubiquitous terms score below rare terms at equal tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common rare1"),
      (2L, "common rare2"),
      (3L, "common rare3")).toDF("doc_id", "text")
    val scored = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", topK = 10)
    val byTerm = scored.filter($"doc_id" === 2L)
      .select("term", "tfidf").as[(String, Double)].collect().toMap
    // df(common)=3 (every doc) vs df(rare2)=1: same tf=1 within doc 2
    assert(byTerm("rare2") > byTerm("common"))
    // smoothed idf of an every-doc term is ln(4/4)+1 = 1.0 exactly
    assert(byTerm("common") === 1.0)
    // top-1 per doc is the doc's rare term, never the ubiquitous one
    val top1 = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", topK = 1)
      .select("term").as[String].collect().toSet
    assert(top1 === Set("rare1", "rare2", "rare3"))
  }

  test("fixed chunks: sizes, ragged tail, and lossless reassembly") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),  // 10 tokens, L=4 -> 4+4+2
      (2L, "single")).toDF("doc_id", "text")
    val chunks = TextAnalysis.fixedChunks(docs, "doc_id", "text", chunkTokens = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).toList === List(4L, 4L, 2L))   // ragged tail
    // order-preserving and lossless: chunks reassemble the original text
    assert(d1.map(_._4).mkString(" ") === (1 to 10).map(i => s"w$i").mkString(" "))
    assert(chunks.filter(_._1 == 2L).toList === List((2L, 1L, 1L, "single")))
  }

  test("inverted index: df/tf counts and doc-ordered posting strings") {
    import spark.implicits._
    val docs = Seq((2L, "b a b"), (1L, "a b b"), (3L, "c")).toDF("doc_id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "doc_id", "text", topN = 10)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(idx("a") === ((2L, 2L, "1:1,2:1")))
    assert(idx("b") === ((2L, 4L, "1:2,2:2")))  // postings doc-ordered, tf exact
    assert(idx("c") === ((1L, 1L, "3:1")))
  }

  test("bm25 ranks by tf, penalizes length, and weights rare terms over common ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash hash hash pad pad pad"),        // tf(hash)=3
      (2L, "hash pad pad pad pad pad"),          // tf(hash)=1, same length
      (3L, "hash " + Seq.fill(50)("pad").mkString(" ")), // tf=1 but much longer
      (4L, "rare pad pad pad pad pad"),          // rare term, df=1
      (5L, "pad pad pad pad pad pad")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq("hash", "rare"), topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(out(1L) > out(2L))            // more occurrences, same length
    assert(out(2L) > out(3L))            // same tf, longer doc penalized
    assert(out(4L) > out(2L))            // df=1 term outweighs df=3 term
    assert(out(5L) === 0.0)              // no query term -> zero
  }

  test("mixture sampling upweights minority languages and hits the target size") {
    import spark.implicits._
    // 90:10 en:fr imbalance; alpha=0.5 should pull keep RATES toward parity
    val docs = ((1 to 90).map(i => (i.toLong, "the of and value")) ++
      (91 to 100).map(i => (i.toLong, "le la et les"))).toDF("doc_id", "text")
    val kept = TextAnalysis.mixtureSample(docs, "doc_id", "text", frac = 0.5)
    val rates = kept.select("best_lang", "rate_ppm").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // sqrt weights: S = sqrt(90)+sqrt(10); rate_en = sqrt(90)*50/S/90 < rate_fr = sqrt(10)*50/S/10
    assert(rates("fr") > rates("en"))
    val s = math.sqrt(90.0) + math.sqrt(10.0)
    assert(rates("en") === math.round(math.min(1.0, math.sqrt(90.0) * 50 / s / 90) * 1e6))
    assert(rates("fr") === math.round(math.min(1.0, math.sqrt(10.0) * 50 / s / 10) * 1e6))
    // the md5 coin keeps roughly rate * n per language (binomial, loose bound)
    val n = kept.count()
    assert(n > 20 && n < 80, s"kept $n of 100 for target 50")
  }

  test("word synonyms: identical-context words are mutual top synonyms at cosine 1") {
    import spark.implicits._
    // x and y occur in exactly the same contexts {a, b}: their PPMI
    // vectors are proportional, so cos(x, y) = 1e6 and each is the
    // other's top synonym.
    val docs = ((1L to 6L).map(i => (i, "a x b")) ++
      (7L to 12L).map(i => (i, "a y b"))).toDF("doc_id", "text")
    val got = TextAnalysis.wordSynonyms(docs, "doc_id", "text",
      window = 2, minCount = 5L, nTargets = 4, topK = 1)
      .collect().map(r => r.getString(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(got("x") === (("y", 1000000L)))
    assert(got("y") === (("x", 1000000L)))
  }

  test("dsir: target-like documents outweigh off-target ones; deterministic") {
    import spark.implicits._
    // target class (doc_id % 7 == 0) speaks only "alpha": alpha-rich
    // docs must carry higher importance weights than beta-only docs,
    // whose buckets have zero target mass
    val docs = (Seq(0L, 7L).map(i => (i, "alpha alpha")) ++
      (1L to 6L).map(i => (i, "alpha")) ++
      (8L to 13L).map(i => (i, "beta"))).toDF("doc_id", "text")
    val got = TextAnalysis.dsirSelect(docs, "doc_id", "text", selectK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 14)
    assert(got.map(_._1).toSeq === (1L to 14L))          // contiguous ranks
    val w = got.map(x => x._2 -> x._3).toMap
    val alphaMin = (Seq(0L, 7L) ++ (1L to 6L)).map(w).min
    val betaMax = (8L to 13L).map(w).max
    assert(alphaMin > betaMax)
    // at this corpus size the +1/+B smoothing dominates, so every ratio
    // is negative and LONGER docs accumulate more negative mass: the
    // expected order is single-alpha > double-alpha > beta — a
    // hand-derivable consequence of the exact formula, pinned here
    // (ln(5/70)−ln(11/82) per alpha unigram; the alpha-alpha bigram
    // bucket is the only positive ratio, ln(3/70)−ln(3/82))
    assert((1L to 6L).map(w).min > Seq(0L, 7L).map(w).max)
    assert(w(1L) === math.round((math.log(5.0 / 70.0) - math.log(11.0 / 82.0)) * 1e6))
    // exact integer weights: partitioning-invariant
    val p = TextAnalysis.dsirSelect(docs.repartition(5, col("text")),
      "doc_id", "text", selectK = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(p.toSeq === got.toSeq)
  }
}
