package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: language identification
  * (stopword-lexicon scoring), quality scoring, token counting
  * (whitespace + regex-subword), and winnowing-style document
  * fingerprinting.
  *
  * Everything is one narrow map pass per document — the token split is
  * hoisted to a single codegen'd column and the per-token folds (length
  * sums, lexicon hit counts, subword estimates) run as compiled JIT'd
  * loops rather than interpreted `aggregate` lambdas — so at 100 TB each
  * operator is a pure scan-shaped pipeline (the only shuffle anywhere is
  * the fingerprint-bucket count, a groupBy on a 64-bit key).
  */
object TextAnalysis {

  /** Stopword lexicons for the language-ID heuristic. Tiny by design: the
    * operator shape (per-language hit scoring + deterministic argmax) is
    * what scales; production swaps in real frequency profiles. */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "a"),
    "en" -> Seq("the", "a"),
    "es" -> Seq("el", "la", "los", "de", "a"),
    "fr" -> Seq("le", "la", "les", "de", "a"),
    "zh" -> Seq("de", "shi", "le"))

  /** Per-language stopword hit count (with multiplicity) over a token
    * array: compiled fold, same result as an `aggregate(tokens, 0,
    * array_contains ? +1 : +0)` lambda. */
  def lexiconHitsUdf(lexicon: Seq[String]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val set = lexicon.toSet
    // null token array (split of a null text) => null, like the SQL
    // aggregate lambda this fold replaced
    udf { (ts: Seq[String]) =>
      if (ts == null) None
      else {
        var a = 0; val it = ts.iterator
        while (it.hasNext) if (set(it.next())) a += 1
        Some(a)
      }
    }
  }

  /** Sum of token lengths (for mean token length), compiled fold. */
  private val sumTokLenUdf = udf { (ts: Seq[String]) =>
    if (ts == null) None
    else {
      var a = 0; val it = ts.iterator
      while (it.hasNext) a += it.next().length
      Some(a)
    }
  }

  /** Subword estimate: sum of ceil(len/4) per token, compiled fold with
    * the same double-ceil arithmetic as the SQL `ceil(length(t) / 4.0)`. */
  private val subwordUdf = udf { (ts: Seq[String]) =>
    if (ts == null) None
    else {
      var a = 0L; val it = ts.iterator
      while (it.hasNext) a += math.ceil(it.next().length / 4.0).toLong
      Some(a.toInt)
    }
  }

  /** (doc_id, per-language hit counts, argmax language). Ties break
    * alphabetically via struct sort — deterministic in any engine. */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hits = lexicons.map { case (lang, lex) =>
      lexiconHitsUdf(lex)(col("toks")).as(s"hits_$lang")
    }
    val ranked = lexicons.map { case (lang, _) =>
      s"named_struct('neg', -hits_$lang, 'lang', '$lang')"
    }.mkString("array(", ", ", ")")
    df.select(col(idCol).as("doc_id"), expr(Dedup.tokens(textCol)).as("toks"))
      .select(col("doc_id") +: hits: _*)
      .withColumn("best_lang", expr(s"element_at(array_sort($ranked), 1).lang"))
  }

  /** Quality scorecard: token counts, type-token ratio, mean token length,
    * stopword ratio, punctuation count, and a composite score in [0,1]. */
  def qualityScores(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"),
        expr(Dedup.tokens(textCol)).as("toks"))
      .select(
        col("doc_id"),
        expr("size(toks)").as("n_tokens"),
        expr("size(array_distinct(toks))").as("n_distinct"),
        round(sumTokLenUdf(col("toks")) / expr("cast(size(toks) as double)"), 6)
          .as("mean_tok_len"),
        round(lexiconHitsUdf(Seq("the", "a"))(col("toks")) / expr("cast(size(toks) as double)"), 6)
          .as("stop_ratio"),
        expr("length(regexp_replace(text, '[a-z0-9 ]', ''))").as("punct_count"))
      .withColumn("quality", expr(
        "round(least(n_tokens, 100) / 100.0 * 0.4" +
          " + n_distinct / cast(n_tokens as double) * 0.4" +
          " + (1.0 - abs(stop_ratio - 0.1)) * 0.2, 6)"))

  /** Repetition-ratio quality signals — the repetitious-text filter
    * family from the public MassiveText/Gopher data-curation recipe (Rae
    * et al. 2021, appendix A1.1): per document, the duplicate n-gram
    * fraction (1 - distinct/total) and the most-frequent-n-gram share,
    * for n = 2 and 3. High values flag boilerplate loops and template
    * spam that t01's length/stopword heuristics miss. Documents too short
    * to have an n-gram report 0 (nothing repeats).
    *
    * Execution shape: n-grams from one slice/concat pass per row, then
    * explode -> two-level hash aggregate (per-(doc, gram) counts map-side
    * combined, then per-doc sum/count/max) -> left join back to ALL docs
    * — the codegen-friendly counting discipline (Pipeline.HashingTF's
    * scaladoc carries the measured 10x against per-row HOF counting).
    * All stats are exact integer counts; the ratios are single IEEE
    * divisions, so the DuckDB mirror is bit-exact. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Both gram lengths ride ONE explode + aggregate chain, each gram
    // tagged with its n as a ':'-separated prefix. Tokens may themselves
    // contain ':', but the tag is POSITIONAL — always exactly one n digit
    // then ':' — so two distinct (n, gram) pairs can never collide: same
    // n implies the remaining suffix is the space-joined token slice
    // (unambiguous because tokens contain no spaces). One
    // pass over the corpus, one shuffle pair, conditional aggregation
    // splitting the per-n stats at the end. Tokenize ONCE into a column —
    // an expression inline in a HOF lambda is re-evaluated per element,
    // so split() written inside would run O(tokens) times per gram.
    // sequence(1, 0) in Spark DESCENDS ([1, 0]) rather than returning
    // empty — the size guards are load-bearing for short docs.
    def taggedGrams(n: Int) =
      s"CASE WHEN size(__toks) >= $n " +
        s"THEN transform(sequence(1, size(__toks) - ${n - 1}), " +
        s"i -> concat('$n', ':', concat_ws(' ', slice(__toks, i, $n)))) " +
        "ELSE array() END"
    def forN(n: Int, agg: org.apache.spark.sql.Column) =
      when(col("n") === n.toString, agg)
    val stats = df
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__toks"))
      .select(col("doc_id"),
        explode(expr(s"concat(${taggedGrams(2)}, ${taggedGrams(3)})")).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .withColumn("n", substring(col("gram"), 1, 1))
      .groupBy("doc_id")
      .agg(
        sum(forN(2, col("c"))).as("n2_total"),
        count(forN(2, lit(1))).as("n2_distinct"),
        max(forN(2, col("c"))).as("n2_top"),
        sum(forN(3, col("c"))).as("n3_total"),
        count(forN(3, lit(1))).as("n3_distinct"),
        max(forN(3, col("c"))).as("n3_top"))
    def ratios(p: String) = Seq(
      coalesce(col(s"${p}_total"), lit(0L)).as(s"${p}_total"),
      round(when(col(s"${p}_total").isNull, 0.0)
        .otherwise(lit(1.0) - col(s"${p}_distinct") / col(s"${p}_total")), 6)
        .as(s"dup${p.drop(1)}_ratio"),
      round(when(col(s"${p}_total").isNull, 0.0)
        .otherwise(col(s"${p}_top") / col(s"${p}_total")), 6)
        .as(s"top${p.drop(1)}_frac"))
    df.select(col(idCol).as("doc_id"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id") +: (ratios("n2") ++ ratios("n3")): _*)
  }

  /** Token-count surface: whitespace tokens, regex word/number/symbol
    * tokens (a BPE-ish first pass), and a subword estimate of
    * ceil(len/4) per token. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"),
        expr(Dedup.tokens(textCol)).as("toks"))
      .select(
        col("doc_id"),
        expr("size(toks)").as("ws_tokens"),
        expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
          .as("re_tokens"),
        subwordUdf(col("toks")).as("subword_est"),
        length(col("text")).as("n_chars_measured"))

  /** End-to-end corpus curation — the pipeline a training-data run
    * composes from the pieces above: language-ID + quality scoring in ONE
    * scan (no joins between the stages; every per-doc column derives from
    * the same hoisted token array), exact dedup keeping the smallest
    * doc_id per content digest, a quality-floor filter, then a per-language
    * rollup. Two shuffles total at any scale: the digest window and the
    * final groupBy. Mean quality is aggregated from exact micro-unit
    * integers so the rollup is deterministic under any partitioning. */
  def curateCorpus(df: DataFrame, idCol: String, textCol: String,
                   minQuality: Double = 0.5): DataFrame = {
    val hits = lexicons.map { case (lang, lex) =>
      lexiconHitsUdf(lex)(col("toks")).as(s"hits_$lang")
    }
    val ranked = lexicons.map { case (lang, _) =>
      s"named_struct('neg', -hits_$lang, 'lang', '$lang')"
    }.mkString("array(", ", ", ")")
    val perDoc = df
      .select(col(idCol).as("doc_id"), col(textCol).as("text"),
        expr(Dedup.tokens(textCol)).as("toks"))
      .select(Seq(col("doc_id"), col("text"), col("toks")) ++ hits: _*)
      .withColumn("best_lang", expr(s"element_at(array_sort($ranked), 1).lang"))
      .withColumn("n_tokens", expr("size(toks)"))
      .withColumn("n_distinct", expr("size(array_distinct(toks))"))
      .withColumn("stop_ratio",
        round(lexiconHitsUdf(Seq("the", "a"))(col("toks")) / expr("cast(size(toks) as double)"), 6))
      .withColumn("quality", expr(
        "round(least(n_tokens, 100) / 100.0 * 0.4" +
          " + n_distinct / cast(n_tokens as double) * 0.4" +
          " + (1.0 - abs(stop_ratio - 0.1)) * 0.2, 6)"))
      .withColumn("subword_est", subwordUdf(col("toks")))
    perDoc
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy("doc_id")))
      .filter(col("rn") === 1)
      .filter(col("quality") >= minQuality)
      .groupBy("best_lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        sum(col("subword_est").cast("long")).as("total_subwords"),
        sum(expr("cast(round(quality * 1e6) as bigint)")).as("q_micro"))
      .select(col("best_lang"), col("n_docs"), col("total_tokens"),
        col("total_subwords"),
        round(col("q_micro").cast("double") / col("n_docs") / 1e6, 6).as("mean_quality"))
  }

  /** Fingerprint kernel: per-shingle portable hash (first 15 md5 hex digits
    * of "fp:"+shingle, decoded — the same bytes as [[Dedup.portableHash]])
    * and XOR of the 5 smallest, as ONE compiled loop per document. Replaces
    * an `aggregate(slice(array_sort(transform(...))))` chain whose lambdas
    * ran interpreted per shingle — the same O(shingles)-interpreted tax the
    * MinHash path already paid off (see [[Dedup.shinglesUdf]]). Bit-identical
    * to the SQL form: XOR is order-free, so the 5 smallest hashes (kept with
    * multiplicity) fully determine the result; empty input folds to 0. */
  private val fingerprintUdf = udf { (sh: Seq[String]) =>
    if (sh == null) None
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val k = 5
      val top = new Array[Long](k) // ascending prefix of length `filled`
      var filled = 0
      val it = sh.iterator
      while (it.hasNext) {
        val d = md.digest(("fp:" + it.next()).getBytes("UTF-8"))
        // value of the first 15 hex digits = first 7 bytes + the high
        // nibble of byte 7, read big-endian — computed straight from the
        // digest bytes (hex-formatting per byte costs more than the md5)
        var h = 0L; var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = (h << 4) | ((d(7) & 0xffL) >> 4)
        if (filled < k) {
          var i = filled
          while (i > 0 && top(i - 1) > h) { top(i) = top(i - 1); i -= 1 }
          top(i) = h
          filled += 1
        } else if (h < top(k - 1)) {
          var i = k - 1
          while (i > 0 && top(i - 1) > h) { top(i) = top(i - 1); i -= 1 }
          top(i) = h
        }
      }
      var fp = 0L; var i = 0
      while (i < filled) { fp ^= top(i); i += 1 }
      Some(fp)
    }
  }

  /** Winnowing-style fingerprint: XOR of the 5 smallest shingle hashes.
    * Identical fingerprints put documents in the same near-dup bucket;
    * bucket size is attached via a groupBy on the fingerprint. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3): DataFrame =
    df.select(col(idCol).as("doc_id"),
        Dedup.shinglesUdf(shingleN)(col(textCol)).as("sh"))
      .select(col("doc_id"),
        expr("size(sh)").as("n_shingles"),
        fingerprintUdf(col("sh")).as("fp"))
      .withColumn("fp_bucket_size", count(lit(1)).over(Window.partitionBy("fp")))

  /** Canonical text normalization — the first stage of any curation run:
    * lowercase, fold every non-alphanumeric to a space, collapse space
    * runs, trim. Pure narrow map pass (three codegen'd regexp/string ops
    * per row, no UDF, no shuffle): at 100 TB this pipelines inside the
    * scan stage. Emits before/after sizes so the downstream quality gate
    * can filter on shrinkage. */
  def normalize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("norm_text",
        trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
      .select(col("doc_id"), col("norm_text"),
        length(col("text")).as("n_chars_raw"),
        length(col("norm_text")).as("n_chars_norm"),
        when(col("norm_text") === "", 0)
          .otherwise(expr("size(split(norm_text, ' '))")).as("n_tokens_norm"))

  /** Corpus vocabulary coverage: build the top-`vocabSize` token
    * vocabulary (count desc, term asc — deterministic at the cutoff),
    * then score every document's out-of-vocabulary rate against it.
    *
    * Scale shape: term counts are ONE map-side-combined shuffle on term;
    * the vocabulary is bounded by `vocabSize` so the coverage join is a
    * BROADCAST hash join against the exploded token table, and the per-doc
    * rollup is the second (and last) shuffle. The token table feeds both
    * the vocabulary build and the coverage join — persisted per call,
    * released when the small per-doc result materializes. */
  def vocabOov(df: DataFrame, idCol: String, textCol: String,
               vocabSize: Int = 50): DataFrame = {
    val tok = df
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(vocabSize)
      .select(col("term"), lit(1).as("in_v"))
    val perDoc = tok.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("in_v"), lit(0))).cast("bigint").as("in_vocab"))
      .select(col("doc_id"), col("n_tokens"), col("in_vocab"),
        round(lit(1.0) - col("in_vocab").cast("double") / col("n_tokens").cast("double"), 6)
          .as("oov_rate"))
    val out = perDoc.localCheckpoint()
    tok.unpersist()
    out
  }

  /** (total, distinct) 3-gram shingle counts in ONE compiled pass per
    * document — same windows as [[Dedup.shinglesUdf]] (split keeps empty
    * tokens, short docs yield their full run as one shingle) but KEEPING
    * multiplicity, which the dedup path deliberately drops. */
  private def shingleStatsUdf(n: Int) = udf { (text: String) =>
    if (text == null) None
    else {
      val t = text.split(" ", -1)
      val m = math.max(t.length - (n - 1), 1)
      val seen = new scala.collection.mutable.HashSet[String]
      var i = 0
      while (i < m) {
        seen += t.slice(i, math.min(i + n, t.length)).mkString(" ")
        i += 1
      }
      Some(Array(m, seen.size))
    }
  }

  /** Boilerplate detector: per-document repeated-shingle ratio
    * `1 - distinct/total` over 3-gram shingles — near 0 for natural prose,
    * high for template/repeated text. Pure narrow map pass (one compiled
    * kernel per row, no shuffle); a curation run filters on the ratio the
    * same way it filters on [[qualityScores]]. */
  def boilerplateRatio(df: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3): DataFrame =
    df.select(col(idCol).as("doc_id"), shingleStatsUdf(shingleN)(col(textCol)).as("st"))
      .select(col("doc_id"),
        expr("element_at(st, 1)").as("n_total"),
        expr("element_at(st, 2)").as("n_distinct"),
        round(lit(1.0) - expr("element_at(st, 2)").cast("double")
          / expr("element_at(st, 1)").cast("double"), 6).as("repeat_ratio"))

  /** Adjacent-bigram list of a token array, one compiled pass (the
    * tuple array encodes as array<struct<_1,_2>> — explode-ready). */
  private val bigramsUdf = udf { (ts: Seq[String]) =>
    if (ts == null) Seq.empty[(String, String)]
    else {
      val n = math.max(ts.length - 1, 0)
      val out = new Array[(String, String)](n)
      var i = 0
      while (i < n) { out(i) = (ts(i), ts(i + 1)); i += 1 }
      out.toSeq
    }
  }

  /** Corpus bigram language model, top-`topK` bigrams: count(w1 w2),
    * count(w1 *) and the conditional probability P(w2|w1).
    *
    * Scale shape: ONE map-side-combined shuffle counts the bigrams; the
    * w1 marginals derive from the (much smaller) bigram-count table — no
    * second corpus scan; top-k is a TakeOrdered, never a global sort
    * materialization. */
  def bigramLm(df: DataFrame, idCol: String, textCol: String,
               topK: Int = 20): DataFrame = {
    val bg = df
      .select(explode(bigramsUdf(expr(Dedup.tokens(textCol)))).as("b"))
      .select(col("b._1").as("w1"), col("b._2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c1 = bg.groupBy("w1").agg(sum("c12").as("c1"))
    val out = bg.join(c1, "w1")
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        round(col("c12").cast("double") / col("c1").cast("double"), 6).as("p"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(topK)
      .localCheckpoint()
    bg.unpersist()
    out
  }

  /** The DSIR per-bucket log importance ratio in micro-nats over
    * (ct, tt, cr, tr) — Laplace-smoothed (+1 / +buckets) bucket
    * probabilities under the target and raw models, one shared formula
    * string so both engines evaluate ln on identical doubles (micro
    * rounding absorbs the 1-ulp libm slack, the t13 precedent). */
  def dsirRatioExpr(buckets: Int): String =
    s"CAST(round((ln((CAST(ct AS DOUBLE) + CAST(1.0 AS DOUBLE)) / (CAST(tt AS DOUBLE) + CAST($buckets.0 AS DOUBLE)))" +
      s" - ln((CAST(cr AS DOUBLE) + CAST(1.0 AS DOUBLE)) / (CAST(tr AS DOUBLE) + CAST($buckets.0 AS DOUBLE))))" +
      " * 1000000.0) AS BIGINT)"

  /** DSIR-style data selection (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023, §3:
    * hashed n-gram bag-of-words models of the TARGET and RAW
    * distributions; every raw doc weighted by the log importance ratio
    * Σ_b c_b·(ln p_tgt(b) − ln p_raw(b)); resample by the weights).
    * Thin-slice conventions, declared: features are md5-hashed
    * unigram+bigram buckets (the paper's hashed n-grams; `buckets` of
    * them), both models Laplace-smoothed, the per-bucket log-ratio
    * quantized ONCE to integer micro-nats ([[dsirRatioExpr]]) so the
    * per-doc weight is an exact integer sum, and the paper's
    * Gumbel-top-k resampling is replaced by deterministic top-`selectK`
    * on (weight, doc_id) — the house no-RNG rule. The target set is the
    * deterministic doc_id % targetMod == 0 residue class standing in
    * for the paper's high-quality corpus.
    *
    * Scale shape: one (doc, bucket) count aggregate; both bucket models
    * are `buckets`-bounded aggregates of it; the ratio table broadcasts
    * back onto the doc-bucket counts; one groupBy(doc) produces the
    * weights; selection is orderBy+limit (TakeOrderedAndProject), never
    * a global window. At 100 TB the models are two tiny aggregates and
    * the weighting rides a single corpus-proportional shuffle. */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
                 buckets: Int = 64, targetMod: Long = 7L,
                 selectK: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = df.select(col(idCol).as("doc_id"), expr(Dedup.tokens(textCol)).as("ts"))
    val grams = d.select(col("doc_id"), explode(col("ts")).as("g"))
      .union(d.select(col("doc_id"), explode(expr(
        "CASE WHEN size(ts) >= 2 THEN transform(sequence(1, size(ts) - 1), " +
          "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1))) " +
          "ELSE array() END")).as("g")))
    val db = grams.selectExpr("doc_id",
        s"cast(conv(substr(md5(g), 1, 15), 16, 10) as bigint) % $buckets AS b")
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tgt = db.filter(col("doc_id") % targetMod === 0)
      .groupBy("b").agg(sum("c").as("ct"))
    val raw = db.groupBy("b").agg(sum("c").as("cr"))
    val models = df.sparkSession.range(buckets).select(col("id").as("b"))
      .join(tgt, Seq("b"), "left").join(raw, Seq("b"), "left")
      .selectExpr("b", "coalesce(ct, CAST(0 AS BIGINT)) AS ct",
        "coalesce(cr, CAST(0 AS BIGINT)) AS cr")
    val lr = models
      .crossJoin(broadcast(models.agg(
        sum("ct").as("tt"), sum("cr").as("tr"))))
      .selectExpr("b", s"${dsirRatioExpr(buckets)} AS lr_micro")
    val w = db.join(broadcast(lr), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_grams"),
        sum(col("c") * col("lr_micro")).as("w_micro"))
    // top-k FIRST (TakeOrderedAndProject), then rank over <= selectK rows
    val out = w.orderBy(col("w_micro").desc, col("doc_id")).limit(selectK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("w_micro").desc, col("doc_id"))).cast("long"))
      .selectExpr("rank", "doc_id", "CAST(w_micro AS BIGINT) AS w_micro",
        "CAST(n_grams AS BIGINT) AS n_grams")
      .orderBy("rank")
      .localCheckpoint()
    db.unpersist()
    out
  }

  /** Rule-chain redaction — the PII-scrubbing stage of corpus curation:
    * apply (regex -> placeholder) rules IN ORDER (order matters: a phone
    * pattern must fire before a bare digit-run pattern eats its digits),
    * emitting per-rule hit counts alongside the scrubbed text. Pure
    * narrow map pass of codegen'd regexp ops — no UDF, no shuffle; at
    * 100 TB this fuses into the scan like [[normalize]]. */
  def redact(df: DataFrame, idCol: String, textCol: String,
             rules: Seq[(String, String, String)]): DataFrame = {
    require(rules.nonEmpty, "redact: need at least one (name, regex, placeholder) rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"redact: duplicate rule names in ${rules.map(_._1)}")
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // count and replace must see the SAME pattern: both go through the
    // Column DSL (lit(re)), never an expr() SQL literal whose string
    // escaping would silently diverge for regexes with backslashes
    val (out, _) = rules.foldLeft((base, "text")) {
      case ((d, cur), (name, re, placeholder)) =>
        val next = s"__red_$name"
        (d.withColumn(s"n_$name",
            size(regexp_extract_all(col(cur), lit(re), lit(0))))
          .withColumn(next, regexp_replace(col(cur), re, placeholder)), next)
    }
    val lastCol = s"__red_${rules.last._1}"
    out.select(Seq(col("doc_id"), col(lastCol).as("red_text")) ++
      rules.map { case (name, _, _) => col(s"n_$name") }: _*)
  }

  /** Benchmark decontamination — flag corpus documents whose shingle sets
    * overlap a held-out benchmark/eval set, the standard pre-training
    * hygiene pass that keeps test questions out of the training corpus.
    *
    * A document is contaminated when at least `minOverlap` of its distinct
    * `shingleN`-gram shingles appear anywhere in the benchmark. The flag is
    * decided in exact integer arithmetic (`n_hit * 1e6 >= tau_micro *
    * n_shingles`) so the threshold comparison never rides on a rounded
    * double.
    *
    * Scale shape (100 TB corpus, benchmark = a few MB of n-grams): the
    * benchmark shingle set is distinct'd and BROADCAST — the corpus is
    * scanned ONCE, its exploded shingles hash-probe the broadcast set with
    * no shuffle, and the only shuffle anywhere is the per-doc hit-count
    * rollup on doc_id. Never a corpus-side distinct, never a shuffle join
    * against the (tiny) benchmark side. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String,
                    shingleN: Int = 3, minOverlap: Double = 0.5): DataFrame = {
    val tauMicro = math.round(minOverlap * 1e6)
    val bench = benchmark
      .select(explode(Dedup.shinglesUdf(shingleN)(col(textCol))).as("s"))
      .distinct()
      .withColumn("hit", lit(1))
    val perDoc = corpus
      .select(col(idCol).as("doc_id"), Dedup.shinglesUdf(shingleN)(col(textCol)).as("sh"))
      .select(col("doc_id"), expr("size(sh)").as("n_shingles"), col("sh"))
    val hits = perDoc
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .join(broadcast(bench), Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    perDoc.drop("sh")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      // a null-text doc has zero shingles: ratio undefined (null, never a
      // double NaN) and never contaminated — 0 >= tau*0 must not flag it
      .withColumn("overlap_ratio",
        when(col("n_shingles") > 0,
          round(col("n_hit").cast("double") / col("n_shingles").cast("double"), 6)))
      .withColumn("contaminated",
        when(col("n_shingles") > 0,
          (col("n_hit") * lit(1000000L) >= lit(tauMicro) * col("n_shingles"))
            .cast("int"))
          .otherwise(lit(0)))
  }

  /** Per-document language-model score under the corpus bigram LM: the
    * count of scored bigrams, the sum of per-bigram ln P(w2|w1) in exact
    * micro-nat integers, and the per-bigram average log-probability — the
    * perplexity-style quality signal a curation run thresholds on (low
    * average log-prob = surprising/noisy text).
    *
    * The LM is built from the same corpus being scored ([[bigramLm]]'s
    * count tables), so every document bigram joins a model row and no
    * smoothing branch is needed. Each bigram's ln P is quantized to an
    * integer BEFORE the per-doc sum, making the aggregate independent of
    * partitioning and summation order — the same determinism trick as
    * [[curateCorpus]]'s mean quality.
    *
    * Scale shape: the exploded bigram table is computed once and persisted
    * for its two consumers (model counts, per-doc scoring); the model is a
    * map-side-combined groupBy on (w1,w2); the scoring join shuffles on the
    * same (w1,w2) key; the per-doc rollup is the final shuffle. No corpus
    * rescan, no driver-side model. */
  def docLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = df
      .select(col(idCol).as("doc_id"),
        explode(bigramsUdf(expr(Dedup.tokens(textCol)))).as("b"))
      .select(col("doc_id"), col("b._1").as("w1"), col("b._2").as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val lm = c12.join(c1, "w1")
    val out = bg.join(lm, Seq("w1", "w2"))
      .withColumn("lp_micro",
        expr("cast(round(ln(cast(c12 as double) / cast(c1 as double)) * 1e6) as bigint)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp_micro").as("sum_logp_micro"))
      .withColumn("avg_logp",
        round(col("sum_logp_micro").cast("double") / 1e6 / col("n_bigrams"), 6))
      .localCheckpoint()
    bg.unpersist()
    out
  }

  /** Per-document top-k terms by smoothed TF-IDF
    * (`tf * (ln((N+1)/(df+1)) + 1)`, the sklearn smoothing so unseen
    * terms never hit ln(0)).
    *
    * Scale shape: term frequencies are ONE shuffle on (doc, term) with
    * map-side partial counts; document frequency derives from the tf
    * table (terms are unique per doc there — a plain count, no distinct)
    * and is a small term-vocabulary table joined back by term; the
    * corpus size N is a broadcast scalar; top-k is a per-doc window.
    * Every arithmetic step is the same IEEE op sequence the DuckDB
    * mirror runs, so scores are bit-identical cross-engine. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    topK: Int = 3): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = tf.select(countDistinct("doc_id").as("n"))
    val out = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf").cast("double") *
        (log((col("n") + 1).cast("double") / (col("df") + 1).cast("double")) + 1.0))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rn") <= topK)
      .select("doc_id", "term", "tf", "df", "tfidf")
      // tf feeds three consumers (dfreq, N, the final join); persist for the
      // call, pin the result, release the cache — same convention as
      // Graph.pageRank / the MinHash stages.
      .localCheckpoint()
    tf.unpersist()
    out
  }

  /** [[tfidfTopTerms]] under the reference's minDocFreq floor (mllib
    * feature/IDF.scala:40; :34: a term in fewer than minDocFreq
    * documents gets idf 0, zeroing its TF-IDF — the vocabulary-pruning
    * knob production TF-IDF always runs with) and the reference's
    * UNSMOOTHED mllib formula ln((m + 1)/(df + 1)) (t06 uses the
    * +1-smoothed ml variant). Scores micro-quantized through ONE
    * shared formula so the gate is integer-exact; zeroed terms still
    * rank (deterministically, by term) so the floor's effect is on
    * the gated path. Same one-scan persist discipline as
    * [[tfidfTopTerms]]. */
  def tfidfMinDf(docs: DataFrame, idCol: String, textCol: String,
                 topK: Int = 3, minDocFreq: Long = 100L): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = tf.select(countDistinct("doc_id").as("n"))
    val out = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf_micro", expr(
        s"CAST(round(CASE WHEN df >= $minDocFreq THEN " +
          "CAST(tf AS DOUBLE) * ln((CAST(n AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) * 1000000.0 " +
          "ELSE 0.0 END) AS BIGINT)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("tfidf_micro").desc, col("term"))))
      .filter(col("rn") <= topK)
      .select("doc_id", "term", "tf", "df", "tfidf_micro")
      .localCheckpoint()
    tf.unpersist()
    out
  }

  /** Fixed-size chunking — context-window preprocessing: each document's
    * token run splits into ceil(n/L) order-preserving chunks of at most
    * L tokens (final chunk ragged). The complement to the x10 packer
    * (which BINS whole short docs, while this SPLITS long ones — real
    * pipelines chain them). Entirely narrow: one projection + generate
    * per document, NO shuffle at any scale; the per-chunk lambda runs
    * n/L times per doc, two orders below the per-token hot paths. */
  def fixedChunks(df: DataFrame, idCol: String, textCol: String,
                  chunkTokens: Int = 64): DataFrame = {
    val L = chunkTokens
    df.select(col(idCol).as("doc_id"), expr(Dedup.tokens(textCol)).as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("long").as("n"),
        posexplode(expr(
          s"""transform(sequence(1, cast(ceil(size(ts) / $L.0) as int)),
             |  i -> concat_ws(' ', slice(ts, (i - 1) * $L + 1, $L)))""".stripMargin)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("chunk_idx"),
        least(lit(L.toLong), col("n") - col("pos") * L).as("n_chunk_tokens"),
        col("col").as("chunk_text"))
  }

  /** Inverted-index construction — the artifact behind [[bm25TopK]] at
    * scale: per term, document frequency, total term frequency, and the
    * doc-ordered posting list (`doc:tf` pairs flattened to a string —
    * the repo's comparator policy for list-valued outputs). `topN` terms
    * by df (term tiebreak) bound the demo output; the build itself is
    * the full-vocabulary shape you'd write to storage. Two shuffles:
    * the (term, doc) count and the per-term group; the hot path
    * (explode + both counts) is codegen'd, only the per-term posting
    * render walks a collected list — bounded by a term's df, the same
    * bound a real posting file has. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    topN: Int = 20): DataFrame = {
    val td = df
      .select(col(idCol).as("doc_id"), explode(expr(Dedup.tokens(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    td.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"),
        concat_ws(",", expr(
          "transform(array_sort(collect_list(struct(doc_id, tf))), " +
            "s -> concat(cast(s.doc_id as string), ':', cast(s.tf as string)))"))
          .as("postings"))
      .orderBy(col("df").desc, col("term"))
      .limit(topN)
  }

  /** BM25 ranked retrieval for a fixed multi-term query (Robertson k1/b
    * form) — the corpus-curation retrieval step TF-IDF ([[tfidfTopTerms]])
    * doesn't give: query-conditioned ranking with length normalization.
    * Cross-engine determinism: idf_t = ln((N - df + 0.5)/(df + 0.5) + 1)
    * is quantized to integer MICRO-nats immediately (the t13 convention —
    * a 6-dp round is the only place libm ln rounding could ever show),
    * per-term scores then run in one fixed left-to-right double chain
    * (micro_idf * tf * (k1+1) / (tf + k1*(1-b + b*dl/avgdl)) / 1e6), and
    * the total adds the terms in WRITTEN order, never via an aggregate.
    *
    * Scale: per-term tf comes from explode + conditional SUMs in ONE
    * map-side-combined hash aggregate — every stage whole-stage-codegen'd
    * (a per-row Scala UDF or a higher-order `filter` lambda would drop
    * out of codegen and pay per-row interpretation); N / avgdl / df are
    * ONE tiny aggregate row (driver-bounded by construction, like the
    * k-means centroids); scoring is a narrow codegen'd projection over
    * the corpus; top-k is a single ordered limit (TakeOrderedAndProject
    * — no global sort materialized). */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
               topK: Int = 20): DataFrame = {
    val tfAggs = terms.indices.map(i =>
      sum(when(col("t") === terms(i), 1L).otherwise(0L)).as(s"tf$i"))
    val base = df
      .select(col(idCol).as("doc_id"), expr(Dedup.tokens(textCol)).as("ts"))
      // dl rides the explode as a grouping column (size(null) = -1 kept,
      // matching the pre-explode projection this aggregate replaced)
      .select(col("doc_id"), size(col("ts")).cast("long").as("dl"),
        explode_outer(col("ts")).as("t"))
      .groupBy("doc_id", "dl")
      .agg(tfAggs.head, tfAggs.tail: _*)
      .persist()
    // one bounded stats row: N, total length, per-term document frequency
    val statsAggs = sum(col("dl")).as("sumdl") +: terms.indices.map(i =>
      sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val statsRow = base.agg(count(lit(1)).as("n"), statsAggs: _*)
      .collect().head
    val n = statsRow.getAs[Long]("n")
    val avgdl = statsRow.getAs[Long]("sumdl").toDouble / n
    val idfMicro = terms.indices.map { i =>
      val dft = statsRow.getAs[Long](s"df$i")
      math.round(math.log((n - dft + 0.5) / (dft + 0.5) + 1.0) * 1e6)
    }
    val perTerm = terms.indices.map { i =>
      lit(idfMicro(i)) * col(s"tf$i") * lit(k1 + 1) /
        (col(s"tf$i") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))) /
        lit(1e6)
    }
    val scored = base
      .withColumn("s_raw", perTerm.reduceLeft(_ + _))
      .orderBy(col("s_raw").desc, col("doc_id"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("s_raw").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank").cast("int").as("rank"), col("dl"),
        round(col("s_raw"), 6).as("bm25"))
    val out = scored.localCheckpoint()
    base.unpersist()
    out
  }

  /** Temperature-based mixture resampling (the training-mix step every
    * LLM pipeline runs): sample documents so the language shares follow
    * n_g^alpha renormalized, at alpha = 0.5 — sqrt specifically, because
    * IEEE sqrt is correctly rounded in every engine while pow(x, alpha)
    * is not, so the oracle can reproduce the rates bit-for-bit. Keep
    * probability per language g: rate_g = min(1, sqrt(n_g) * Ntarget /
    * S / n_g) with S = sum of sqrt(n_h) added in LANGUAGE-SORTED order
    * (deterministic double summation) and Ntarget = floor(total * frac);
    * the per-document coin is the portable md5 hash mod 1e6 compared to
    * the rate in INTEGER ppm — no float comparison anywhere near a row.
    *
    * Scale: the per-language count table is bounded by the lexicon set
    * (driver-side by construction, like the k-means centroids); the keep
    * decision is a broadcast join + one narrow filter over the corpus —
    * one shuffle (the language-ID aggregation) end to end. */
  /** BPE merge-rule training (the public byte-pair-encoding recipe of
    * Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
    * Subword Units") — the tokenizer-training half of an LLM data
    * pipeline, run as iterative distributed aggregation:
    *   1. ONE corpus pass builds the word-frequency table — the classic
    *      BPE working set: every later round runs over DISTINCT words
    *      weighted by count, so round cost is O(vocabulary), not
    *      O(corpus). At 100 TB this table is the only thing the
    *      iterations touch.
    *   2. Each round: adjacent symbol pairs explode into one map-side-
    *      combined hash aggregate (sum of word freqs per pair); the
    *      argmax — ties broken (count DESC, left, right) for engine-
    *      portable determinism — is ONE collected row; the winning pair
    *      merges into every word via a compiled greedy left-to-right
    *      loop (the [[shinglesUdf]] rationale: one JIT'd loop per word
    *      beats an interpreted positional HOF chain), and the word table
    *      localCheckpoints so plan depth stays constant across rounds.
    * Output: the learned merge table (rank, left, right, pair_count) —
    * `merges` rows, driver-bounded by construction. The greedy
    * left-to-right non-overlap semantics ("aaa" + (a,a) -> [aa, a]) is
    * the reference behavior and is mirrored positionally by the t19
    * oracle (match islands + parity — no fold needed in SQL). */
  def bpeMerges(df: DataFrame, idCol: String, textCol: String,
                merges: Int): DataFrame =
    bpeTrain(df, textCol, merges)._1

  /** Shared BPE training loop: returns (merge-rule table, final
    * word→pieces dictionary). The dictionary is what [[bpeEncode]]
    * joins the corpus against — encoding is dictionary-driven, never a
    * per-occurrence re-merge. */
  private def bpeTrain(df: DataFrame, textCol: String,
                       merges: Int): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    var words = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), expr("filter(split(w, ''), c -> c <> '')").as("syms"), col("freq"))
      .localCheckpoint()
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var k = 1
    var exhausted = false
    while (k <= merges && !exhausted) {
      val best = words
        .select(col("freq"), explode(expr(
          "CASE WHEN size(syms) >= 2 THEN transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r)) " +
            "ELSE array() END")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        rules += ((k.toLong, l, r, cnt))
        val merge = udf { (syms: Seq[String]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2 // greedy, non-overlapping
            } else { out += syms(i); i += 1 }
          }
          out.toSeq
        }
        words = words.select(col("w"), merge(col("syms")).as("syms"), col("freq"))
          .localCheckpoint()
        k += 1
      }
    }
    import spark.implicits._
    (rules.toSeq.toDF("rank", "left", "right", "pair_count"), words)
  }

  /** BPE corpus encoding with the trained vocabulary — the apply half of
    * [[bpeMerges]], in the only shape that survives 100 TB: the training
    * loop's final word→pieces DICTIONARY (O(vocabulary) rows) joins the
    * exploded corpus by word, so each distinct word is merged exactly
    * once regardless of its billion occurrences, and a document's
    * encoding reassembles by position (posexplode preserves word order;
    * the per-doc window is partitioned by doc, never global). Output per
    * document: the piece count and the space-joined piece string (arrays
    * flattened for the comparator; pieces contain no spaces — they come
    * from a space split). Docs with no words (null/empty text) report 0
    * pieces and an empty string. */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
                merges: Int): DataFrame = {
    val (_, dict) = bpeTrain(df, textCol, merges)
    val occurrences = df
      .select(col(idCol).as("doc_id"),
        posexplode(expr(s"filter(split($textCol, ' '), w -> w <> '')")).as(Seq("pos", "w")))
    val pieced = occurrences
      .join(dict.select(col("w"), col("syms")), "w")
      .groupBy("doc_id")
      .agg(
        sum(size(col("syms"))).cast("long").as("n_pieces"),
        concat_ws(" ", flatten(sort_array(
          collect_list(struct(col("pos"), col("syms")))).getField("syms"))).as("pieces"))
    df.select(col(idCol).as("doc_id")).distinct()
      .join(pieced, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("pieces"), lit("")).as("pieces"))
  }

  def mixtureSample(df: DataFrame, idCol: String, textCol: String,
                    frac: Double = 0.5): DataFrame = {
    val langs = languageId(df, idCol, textCol).select(col("doc_id"), col("best_lang"))
    val counts = langs.groupBy("best_lang").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    val nt = math.floor(total * frac)
    val s = counts.foldLeft(0.0) { case (a, (_, n)) => a + math.sqrt(n.toDouble) }
    val ratePpm = counts.map { case (l, n) =>
      (l, math.round(math.min(1.0, math.sqrt(n.toDouble) * nt / s / n) * 1e6))
    }
    val spark = df.sparkSession
    import spark.implicits._
    langs.join(broadcast(ratePpm.toSeq.toDF("best_lang", "rate_ppm")), "best_lang")
      .filter(expr(s"${Dedup.portableHash("cast(doc_id as string)", "'mix'")} % 1000000")
        < col("rate_ppm"))
      .select(col("doc_id"), col("best_lang"), col("rate_ppm"))
  }

  // ---- distributional synonyms (reference mllib/feature/Word2Vec
  // .scala:72 — skip-gram + hierarchical softmax SGD, findSynonyms at
  // :515 ranks the vocabulary by embedding cosine. DECLARED THIN-SLICE
  // DEVIATION: SGD embeddings are seeded/scheduling-nondeterministic by
  // design (:349 samples the window per step), so the house version
  // embeds words by their POSITIVE-PMI context-count vectors — the
  // classic count-based distributional baseline the skip-gram objective
  // implicitly factorizes — and ranks synonyms by the same cosine
  // contract. Everything is exact counts, one ln formula string, and
  // integer dot products) ----------------------------------------------

  /** The PPMI weight in milli-units over (cab, ca, cb, tt):
    * max(0, ln(cab·T/(ca·cb))) quantized — one shared formula string.
    * Milli (not micro) keeps Σ pmi² inside BIGINT at large vocabularies. */
  val ppmiExpr: String =
    "greatest(CAST(0 AS BIGINT), CAST(round(ln((CAST(cab AS DOUBLE) * CAST(tt AS DOUBLE)) / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))) * 1000.0) AS BIGINT))"

  /** Top-`topK` distributional synonyms for the `nTargets` most frequent
    * tokens: symmetric ±`window` co-occurrence counts (one position
    * self-join, row-linear in corpus size), PPMI context vectors over the
    * minCount-filtered vocabulary (the reference's default minCount=5
    * gate), then cosine between target vectors and every vocabulary
    * vector via a context-key join — vocabulary-bounded everywhere after
    * the one corpus scan. Ties break toward the lexicographically
    * smaller word. Returns (target, rnk, word, cos_micro). */
  def wordSynonyms(docs: DataFrame, idCol: String, textCol: String,
                   window: Int = 2, minCount: Long = 5L,
                   nTargets: Int = 8, topK: Int = 3): DataFrame = {
    val toks = docs.select(col(idCol).as("did"),
        posexplode(split(col(textCol), " ")))
      .selectExpr("did", "CAST(pos AS BIGINT) AS p", "col AS tok")
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
    val kept = toks.join(freq.select("tok"), "tok")
    val pairs = kept.as("a")
      .join(kept.as("b"), col("a.did") === col("b.did") &&
        col("b.p") >= col("a.p") - window && col("b.p") <= col("a.p") + window &&
        col("b.p") =!= col("a.p"))
      .groupBy(col("a.tok").as("w"), col("b.tok").as("ctx"))
      .agg(count(lit(1)).as("cab"))
    val marg = pairs.groupBy("w").agg(sum("cab").as("ca"))
    val tot = pairs.agg(sum("cab").as("tt"))
    val vecs = pairs
      .join(marg, "w")
      .join(marg.select(col("w").as("ctx"), col("ca").as("cb")), "ctx")
      .crossJoin(broadcast(tot))
      .selectExpr("w", "ctx", s"$ppmiExpr AS pmi")
      .filter(col("pmi") > 0)
    val norms = vecs.groupBy("w").agg(sum(col("pmi") * col("pmi")).as("nrm2"))
    // top-nTargets via orderBy+limit (TakeOrderedAndProject: per-partition
    // top-k then a bounded merge), NOT a global-window rank — the rank
    // window would funnel the whole token-frequency table through one
    // partition (same fix as chiSqSelect / word2vecSlice)
    val targets = freq.orderBy(col("c").desc, col("tok")).limit(nTargets)
      .select(col("tok").as("target"))
    val dots = vecs.join(targets, col("w") === col("target"))
      .select(col("target"), col("ctx"), col("pmi").as("tp"))
      .join(vecs.select(col("w").as("word"), col("ctx"), col("pmi").as("wp")), "ctx")
      .filter(col("word") =!= col("target"))
      .groupBy("target", "word").agg(sum(col("tp") * col("wp")).as("gram"))
    dots
      .join(norms.select(col("w").as("target"), col("nrm2").as("na")), "target")
      .join(norms.select(col("w").as("word"), col("nrm2").as("nb")), "word")
      .selectExpr("target", "word", s"${Similarity.colCosExpr} AS cos_micro")
      .select(col("target"), col("word"), col("cos_micro"),
        row_number().over(Window.partitionBy("target")
          .orderBy(col("cos_micro").desc, col("word"))).cast("long").as("rnk"))
      .filter(col("rnk") <= topK)
      .select("target", "rnk", "word", "cos_micro")
  }
}
