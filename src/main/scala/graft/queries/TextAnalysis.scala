package graft.queries

import graft.Tables
import graft.ext.{TextAnalysis => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis surface over the documents table, DuckDB-mirrored.
  * Per-row-heavy scans (regex scoring, tokenizing lambdas, LM scoring)
  * take the documentsSpread accessor — see its scaladoc for the
  * single-file-single-split argument; queries whose first stage is a
  * wide shuffle on a high-cardinality key use the plain accessor. */
object TextAnalysis {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_quality_scores" -> { (s, dir) =>
      T.qualityScores(Tables.documentsSpread(s, dir), "doc_id", "text").orderBy("doc_id")
    },
    "t02_token_counts" -> { (s, dir) =>
      T.tokenCounts(Tables.documentsSpread(s, dir), "doc_id", "text").orderBy("doc_id")
    },
    // Repetition-ratio quality signals (MassiveText/Gopher repetitious-
    // text filters): duplicate {2,3}-gram fraction + most-frequent-gram
    // share per document.
    "t18_repetition_ratio" -> { (s, dir) =>
      T.repetitionStats(Tables.documentsSpread(s, dir), "doc_id", "text").orderBy("doc_id")
    },
    "t03_language_id" -> { (s, dir) =>
      T.languageId(Tables.documentsSpread(s, dir), "doc_id", "text").orderBy("doc_id")
    },
    // BPE merge-rule training (Sennrich et al. 2016): 8 most-frequent-
    // adjacent-pair merges over the word-frequency table, greedy
    // left-to-right merge application, ties (count DESC, left, right).
    "t19_bpe_merges" -> { (s, dir) =>
      T.bpeMerges(Tables.documents(s, dir), "doc_id", "text", merges = 8)
        .orderBy("rank")
    },
    // BPE corpus encoding with the trained vocabulary: dictionary-driven
    // (each DISTINCT word merged once, corpus joins by word), per-doc
    // reassembly by position.
    "t20_bpe_encode" -> { (s, dir) =>
      T.bpeEncode(Tables.documents(s, dir), "doc_id", "text", merges = 8)
        .orderBy("doc_id")
    },
    "t04_fingerprints" -> { (s, dir) =>
      T.fingerprints(Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id")
    },

    // End-to-end curation pipeline: language-ID + quality in one scan,
    // exact dedup (min doc_id per digest), quality floor, per-language rollup.
    "t05_corpus_curation" -> { (s, dir) =>
      T.curateCorpus(Tables.documentsSpread(s, dir), "doc_id", "text").orderBy("best_lang")
    },

    // Top-3 terms per document by smoothed TF-IDF.
    "t06_tfidf_terms" -> { (s, dir) =>
      T.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text", topK = 3)
        .orderBy("doc_id", "term")
    },

    // IDF's minDocFreq floor + the UNSMOOTHED mllib formula (reference
    // feature/IDF.scala:40/:34 — rare terms' idf pinned to 0, the
    // vocabulary-pruning knob; t06 is the ml +1-smoothed variant):
    // df < 100 terms zero out of the ranking at sf0.01 while the
    // common vocabulary keeps exact micro scores.
    "t23_tfidf_mindf" -> { (s, dir) =>
      T.tfidfMinDf(Tables.documents(s, dir), "doc_id", "text",
          topK = 3, minDocFreq = 100L)
        .orderBy("doc_id", "term")
    },

    // Canonical normalization pass: lowercase, punct -> space, collapse,
    // trim — pure narrow map, no shuffle.
    "t07_normalize" -> { (s, dir) =>
      T.normalize(Tables.documentsSpread(s, dir), "doc_id", "text").orderBy("doc_id")
    },

    // Top-50 vocabulary + per-document out-of-vocabulary rate.
    "t08_vocab_oov" -> { (s, dir) =>
      T.vocabOov(Tables.documentsSpread(s, dir), "doc_id", "text", vocabSize = 50)
        .orderBy("doc_id")
    },

    // Boilerplate detection: per-doc repeated 3-gram shingle ratio.
    "t09_boilerplate_ratio" -> { (s, dir) =>
      T.boilerplateRatio(Tables.documentsSpread(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Corpus bigram LM: top-20 bigrams with conditional P(w2|w1).
    "t10_bigram_lm" -> { (s, dir) =>
      T.bigramLm(Tables.documents(s, dir), "doc_id", "text", topK = 20)
        .orderBy(col("c12").desc, col("w1"), col("w2"))
    },

    // PII-style redaction over a synthetic composite record (name with an
    // id run, a phone-like field, account cents): ordered rule chain —
    // phone pattern must fire before the bare digit-run rule.
    "t11_redact" -> { (s, dir) =>
      val src = Tables.customerSpread(s, dir).select(col("c_custkey"),
        concat(col("c_name"), lit(" ph "),
          format_string("%03d-%04d", col("c_custkey") % 1000, col("c_custkey") % 10000),
          lit(" acct "),
          expr("cast(cast(round(c_acctbal * 100) as bigint) as string)")).as("rec"))
      T.redact(src, "c_custkey", "rec", Seq(
          ("phone", "[0-9]{3}-[0-9]{4}", "<phone>"),
          ("num", "[0-9]{3,}", "<num>")))
        .orderBy("doc_id")
    },

    // Benchmark decontamination: every 20th document plays the held-out
    // eval set; the rest of the corpus is scored for shingle overlap
    // against it (broadcast benchmark, one corpus scan).
    "t12_decontaminate" -> { (s, dir) =>
      val docs = Tables.documentsSpread(s, dir)
      T.decontaminate(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0),
          "doc_id", "text")
        .orderBy("doc_id")
    },

    // Per-document bigram-LM score: average ln P(w2|w1) under the corpus
    // LM, micro-nat-quantized before summing for order-independence.
    "t13_doc_lm_score" -> { (s, dir) =>
      T.docLmScore(Tables.documentsSpread(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    },

    // DSIR importance resampling (Xie et al. NeurIPS 2023 — hashed
    // n-gram importance weights against a target distribution, the
    // domain-targeted pretraining-data selection step; hashing/
    // smoothing/top-k conventions declared on TextAnalysis.dsirSelect):
    // 64 md5-hashed unigram+bigram buckets, doc_id % 7 as the stand-in
    // target, top-30 by exact integer micro-nat weight.
    "t22_dsir_select" -> { (s, dir) =>
      T.dsirSelect(Tables.documentsSpread(s, dir), "doc_id", "text")
    },

    // CCNet-style quality bucketing: rank every document by its LM score
    // (t13's micro-nat-exact average) and cut the corpus into
    // head/middle/tail terciles — the pretraining-mix partitioning step.
    // The global rank uses x05's range-repartition + broadcast-offset
    // two-pass, NEVER a single-partition window sort; the tercile cut is
    // the exact-rank formula ((rank-1)*3) div N stated identically in the
    // oracle, so no interpolated-percentile boundary can flip a
    // tied-score doc between engines (duplicate docs tie exactly).
    // Distributional synonyms (reference mllib/feature/Word2Vec.scala:72
    // fit / :515 findSynonyms; the count-based PPMI deviation is declared
    // in TextAnalysis.wordSynonyms' scaladoc — skip-gram SGD is
    // nondeterministic by design): top-3 cosine neighbors in PPMI context
    // space for the 8 most frequent corpus tokens.
    "s37_word_synonyms" -> { (s, dir) =>
      T.wordSynonyms(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("target", "rnk")
    },

    "t21_ccnet_buckets" -> { (s, dir) =>
      val scored = T.docLmScore(Tables.documentsSpread(s, dir), "doc_id", "text")
        .withColumn("ck",
          struct((col("avg_logp") * -1).as("neg_lp"), col("doc_id").as("d")))
      val ranked = graft.ext.Scale.globalRowIndex(scored, "ck", numPartitions = 8)
      val n = broadcast(scored.agg(count(lit(1)).as("n_docs")))
      ranked.crossJoin(n)
        .select(col("doc_id"), col("avg_logp"),
          element_at(array(lit("head"), lit("middle"), lit("tail")),
            (expr("((global_index - 1) * 3) div n_docs") + 1).cast("int")).as("bucket"))
        .orderBy("doc_id")
    },

    // Temperature (alpha=0.5) mixture resampling over language domains:
    // keep rates from sqrt-renormalized shares, per-doc md5 coin in
    // integer ppm.
    "t14_mixture_sample" -> { (s, dir) =>
      T.mixtureSample(Tables.documentsSpread(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    },

    // BM25 top-20 for a fixed 3-term query — length-normalized ranked
    // retrieval (k1=1.2, b=0.75), micro-quantized idf.
    "t15_bm25_topk" -> { (s, dir) =>
      T.bm25TopK(Tables.documents(s, dir), "doc_id", "text",
          Seq("hash", "join", "filter"))
        .orderBy("rank")
    },

    // Inverted index: top-20 terms by df with doc-ordered doc:tf
    // posting lists (flattened per comparator policy).
    "t16_inverted_index" -> { (s, dir) =>
      T.invertedIndex(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("df").desc, col("term"))
    },

    // Fixed 64-token chunking (context-window preprocessing) — narrow,
    // shuffle-free; final chunk ragged.
    "t17_fixed_chunks" -> { (s, dir) =>
      T.fixedChunks(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id", "chunk_idx")
    }
  )

  // ---- DuckDB mirrors ----------------------------------------------------

  private def lexHits(lex: Seq[String]): String =
    s"list_sum(list_transform(toks, t -> CASE WHEN list_contains(${lex.map(x => s"'$x'").mkString("[", ", ", "]")}, t) THEN 1 ELSE 0 END))"

  private val toksCte =
    "WITH d AS (SELECT doc_id, text, string_split(text, ' ') toks FROM documents)"

  /** Unrolled-CTE mirror of [[graft.ext.TextAnalysis.bpeMerges]] (the
    * lpaStep discipline: every chain CTE MATERIALIZED so DuckDB never
    * re-inlines a round). Greedy left-to-right merge application needs no
    * fold: merge positions are matches grouped into consecutive islands
    * (only possible for left == right runs), keeping odd island ranks —
    * "aaa" + (a,a) keeps position 1, skips 2 -> [aa, a], exactly the
    * Spark-side compiled loop's semantics. */
  private def bpeChain(rounds: Int): String = {
    val base =
      """WITH s0 AS MATERIALIZED (
        |  SELECT w wid, freq, list_transform(range(1, len(w) + 1), i -> w[i]) syms
        |  FROM (SELECT w, CAST(count(*) AS BIGINT) freq
        |        FROM (SELECT unnest(string_split(text, ' ')) w FROM documents)
        |        WHERE len(w) > 0 GROUP BY w))""".stripMargin
    val steps = (1 to rounds).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT l, r, CAST(sum(freq) AS BIGINT) cnt FROM (
         |    SELECT syms[i] l, syms[i + 1] r, freq
         |    FROM s${k - 1}, unnest(range(1, len(syms))) t(i))
         |  GROUP BY l, r),
         |b$k AS MATERIALIZED (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
         |mk$k AS MATERIALIZED (
         |  SELECT wid, i FROM (
         |    SELECT wid, i, row_number() OVER (PARTITION BY wid, grp ORDER BY i) rn FROM (
         |      SELECT s.wid, t.i, t.i - row_number() OVER (PARTITION BY s.wid ORDER BY t.i) grp
         |      FROM s${k - 1} s, unnest(range(1, len(s.syms))) t(i), b$k b
         |      WHERE s.syms[t.i] = b.l AND s.syms[t.i + 1] = b.r))
         |  WHERE rn % 2 = 1),
         |s$k AS MATERIALIZED (
         |  SELECT t.wid, t.freq freq,
         |    list(CASE WHEN kp.i IS NOT NULL THEN t.syms[t.i] || t.syms[t.i + 1]
         |              ELSE t.syms[t.i] END ORDER BY t.i) syms
         |  FROM (SELECT wid, freq, syms, unnest(range(1, len(syms) + 1)) i FROM s${k - 1}) t
         |  LEFT JOIN mk$k kp ON kp.wid = t.wid AND kp.i = t.i
         |  LEFT JOIN mk$k kq ON kq.wid = t.wid AND kq.i = t.i - 1
         |  WHERE kq.i IS NULL
         |  GROUP BY t.wid, t.freq)""".stripMargin
    }
    s"""$base,
       |${steps.mkString(",\n")}""".stripMargin
  }

  private def bpeOracle(rounds: Int): String = {
    val union = (1 to rounds).map(k =>
      s"SELECT CAST($k AS BIGINT) k, l, r, cnt FROM b$k").mkString("\n  UNION ALL ")
    s"""${bpeChain(rounds)}
       |SELECT k AS "rank", l AS "left", r AS "right", cnt AS pair_count FROM (
       |  $union)
       |ORDER BY "rank"""".stripMargin
  }

  /** t20 mirror: the chain's FINAL word table s<rounds> is the trained
    * word->pieces dictionary; a document's encoding is its (position-
    * ordered) words joined against it, pieces flattened in order. */
  private def bpeEncodeOracle(rounds: Int): String =
    s"""${bpeChain(rounds)},
       |occ AS MATERIALIZED (
       |  SELECT doc_id, i pos, toks[i] w FROM (
       |    SELECT doc_id, string_split(text, ' ') toks FROM documents),
       |    unnest(range(1, len(toks) + 1)) t(i)
       |  WHERE len(toks[i]) > 0)
       |SELECT d.doc_id,
       |  CAST(coalesce(sum(len(s.syms)), 0) AS BIGINT) n_pieces,
       |  coalesce(array_to_string(flatten(list(s.syms ORDER BY o.pos)), ' '), '') pieces
       |FROM documents d
       |LEFT JOIN occ o ON o.doc_id = d.doc_id
       |LEFT JOIN s$rounds s ON s.wid = o.w
       |GROUP BY d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "t19_bpe_merges" -> bpeOracle(8),
    "t20_bpe_encode" -> bpeEncodeOracle(8),

    "t01_quality_scores" ->
      s"""$toksCte,
         |q AS (SELECT doc_id,
         |  CAST(len(toks) AS INT) n_tokens,
         |  CAST(len(list_distinct(toks)) AS INT) n_distinct,
         |  round(list_sum(list_transform(toks, t -> len(t))) / len(toks)::DOUBLE, 6) mean_tok_len,
         |  round(${lexHits(Seq("the", "a"))} / len(toks)::DOUBLE, 6) stop_ratio,
         |  CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS INT) punct_count
         |FROM d)
         |SELECT *, round(least(n_tokens, 100) / 100.0 * 0.4
         |  + n_distinct / CAST(n_tokens AS DOUBLE) * 0.4
         |  + (1.0 - abs(stop_ratio - 0.1)) * 0.2, 6) AS quality
         |FROM q ORDER BY doc_id""".stripMargin,

    // Mirrors repetitionStats: per-(doc, gram) counts then per-doc
    // sum/count/max; short docs produce no gram rows and coalesce to 0.
    "t18_repetition_ratio" ->
      s"""$toksCte,
         |g2 AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
         |    i -> toks[i] || ' ' || toks[i + 1])) gram FROM d),
         |c2 AS (SELECT doc_id, gram, count(*) c FROM g2 GROUP BY 1, 2),
         |s2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) total, count(*) dn, max(c) topc
         |  FROM c2 GROUP BY 1),
         |g3 AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
         |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) gram FROM d),
         |c3 AS (SELECT doc_id, gram, count(*) c FROM g3 GROUP BY 1, 2),
         |s3 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) total, count(*) dn, max(c) topc
         |  FROM c3 GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(s2.total, 0) AS n2_total,
         |  round(CASE WHEN s2.total IS NULL THEN 0.0
         |    ELSE 1.0 - s2.dn / s2.total::DOUBLE END, 6) AS dup2_ratio,
         |  round(CASE WHEN s2.total IS NULL THEN 0.0
         |    ELSE s2.topc / s2.total::DOUBLE END, 6) AS top2_frac,
         |  COALESCE(s3.total, 0) AS n3_total,
         |  round(CASE WHEN s3.total IS NULL THEN 0.0
         |    ELSE 1.0 - s3.dn / s3.total::DOUBLE END, 6) AS dup3_ratio,
         |  round(CASE WHEN s3.total IS NULL THEN 0.0
         |    ELSE s3.topc / s3.total::DOUBLE END, 6) AS top3_frac
         |FROM d LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "t02_token_counts" ->
      s"""$toksCte
         |SELECT doc_id,
         |  CAST(len(toks) AS INT) ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) re_tokens,
         |  CAST(list_sum(list_transform(toks, t -> CAST(ceil(len(t) / 4.0) AS BIGINT))) AS INT) subword_est,
         |  CAST(len(text) AS INT) n_chars_measured
         |FROM d ORDER BY doc_id""".stripMargin,

    "t03_language_id" ->
      s"""$toksCte,
         |h AS (SELECT doc_id,
         |  ${T.lexicons.map { case (lang, lex) => s"CAST(${lexHits(lex)} AS INT) hits_$lang" }.mkString(",\n         |  ")}
         |FROM d)
         |SELECT doc_id, ${T.lexicons.map { case (l, _) => s"hits_$l" }.mkString(", ")},
         |  list_sort([${T.lexicons.map { case (l, _) => s"{'neg': -hits_$l, 'lang': '$l'}" }.mkString(", ")}])[1].lang AS best_lang
         |FROM h ORDER BY doc_id""".stripMargin,

    "t05_corpus_curation" ->
      s"""$toksCte,
         |q AS (SELECT doc_id, text, toks,
         |  list_sort([${T.lexicons.map { case (l, lex) => s"{'neg': -(${lexHits(lex)}), 'lang': '$l'}" }.mkString(", ")}])[1].lang AS best_lang,
         |  CAST(len(toks) AS INT) n_tokens,
         |  CAST(len(list_distinct(toks)) AS INT) n_distinct,
         |  round(${lexHits(Seq("the", "a"))} / len(toks)::DOUBLE, 6) stop_ratio,
         |  CAST(list_sum(list_transform(toks, t -> CAST(ceil(len(t) / 4.0) AS BIGINT))) AS INT) subword_est
         |FROM d),
         |scored AS (SELECT *, round(least(n_tokens, 100) / 100.0 * 0.4
         |    + n_distinct / CAST(n_tokens AS DOUBLE) * 0.4
         |    + (1.0 - abs(stop_ratio - 0.1)) * 0.2, 6) AS quality,
         |  ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |FROM q)
         |SELECT best_lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(sum(subword_est) AS BIGINT) AS total_subwords,
         |  round(sum(CAST(round(quality * 1e6) AS BIGINT))::DOUBLE / count(*) / 1000000.0, 6) AS mean_quality
         |FROM scored WHERE rn = 1 AND quality >= 0.5
         |GROUP BY best_lang ORDER BY best_lang""".stripMargin,

    "t04_fingerprints" ->
      s"""WITH sh AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
         |    i -> array_to_string(list_slice(string_split(text,' '), i, i+2), ' '))) AS shingles
         |  FROM documents),
         |fp AS (
         |  SELECT doc_id, CAST(len(shingles) AS INT) n_shingles,
         |    list_reduce(list_slice(list_sort(list_transform(shingles,
         |      s -> CAST('0x' || substr(md5('fp' || ':' || s), 1, 15) AS BIGINT))), 1, 5),
         |      (a, x) -> xor(a, x)) AS fp
         |  FROM sh)
         |SELECT doc_id, n_shingles, fp, count(*) OVER (PARTITION BY fp) AS fp_bucket_size
         |FROM fp ORDER BY doc_id""".stripMargin,

    // Same IEEE op sequence as the Spark side: bigint counts -> double
    // division -> ln -> +1 -> * tf, so scores hash-match bit-for-bit.
    "t06_tfidf_terms" ->
      """WITH tf AS (
        |  SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE len(t) > 0 GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf)
        |SELECT doc_id, term, tf, df, tfidf FROM (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |    tf.tf::DOUBLE * (ln((nn.n + 1)::DOUBLE / (dfreq.df + 1)::DOUBLE) + 1.0::DOUBLE) AS tfidf,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf::DOUBLE * (ln((nn.n + 1)::DOUBLE / (dfreq.df + 1)::DOUBLE) + 1.0::DOUBLE) DESC,
        |        tf.term) AS rn
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN nn)
        |WHERE rn <= 3 ORDER BY doc_id, term""".stripMargin,

    // The t06 chain under the minDocFreq CASE and the unsmoothed
    // formula, micro-quantized once.
    "t23_tfidf_mindf" ->
      """WITH tf AS (
        |  SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE len(t) > 0 GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |    CAST(round(CASE WHEN dfreq.df >= 100 THEN
        |      CAST(tf.tf AS DOUBLE) * ln((CAST(nn.n AS DOUBLE) + 1.0) / (CAST(dfreq.df AS DOUBLE) + 1.0)) * 1000000.0
        |      ELSE 0.0 END) AS BIGINT) AS tfidf_micro
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN nn)
        |SELECT doc_id, term, tf, df, tfidf_micro FROM (
        |  SELECT doc_id, term, tf, df, tfidf_micro,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf_micro DESC, term) AS rn
        |  FROM scored)
        |WHERE rn <= 3 ORDER BY doc_id, term""".stripMargin,

    "t07_normalize" ->
      """WITH n AS (SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
        |  FROM documents)
        |SELECT doc_id, norm_text,
        |  CAST(len(text) AS INT) AS n_chars_raw,
        |  CAST(len(norm_text) AS INT) AS n_chars_norm,
        |  CAST(CASE WHEN norm_text = '' THEN 0
        |       ELSE len(string_split(norm_text, ' ')) END AS INT) AS n_tokens_norm
        |FROM n ORDER BY doc_id""".stripMargin,

    // Same cutoff rule (count desc, term asc) and the same IEEE op order
    // (1.0 - in/total, rounded) as the Spark side.
    "t08_vocab_oov" ->
      """WITH tok AS (SELECT doc_id, t AS term FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) t FROM documents)
        |  WHERE len(t) > 0),
        |vocab AS (SELECT term, 1 AS in_v FROM
        |    (SELECT term, count(*) cnt FROM tok GROUP BY 1)
        |  ORDER BY cnt DESC, term LIMIT 50)
        |SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(coalesce(v.in_v, 0)) AS BIGINT) AS in_vocab,
        |  round(1.0 - sum(coalesce(v.in_v, 0))::DOUBLE / count(*)::DOUBLE, 6) AS oov_rate
        |FROM tok LEFT JOIN vocab v ON tok.term = v.term
        |GROUP BY tok.doc_id ORDER BY doc_id""".stripMargin,

    // Same windows as the engine kernel: multiplicity kept, short docs
    // yield one full-run shingle.
    "t09_boilerplate_ratio" ->
      """WITH sh AS (SELECT doc_id,
        |    list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' ')) AS all_sh
        |  FROM (SELECT doc_id, string_split(text, ' ') toks FROM documents))
        |SELECT doc_id,
        |  CAST(len(all_sh) AS INT) AS n_total,
        |  CAST(len(list_distinct(all_sh)) AS INT) AS n_distinct,
        |  round(1.0 - len(list_distinct(all_sh))::DOUBLE / len(all_sh)::DOUBLE, 6) AS repeat_ratio
        |FROM sh ORDER BY doc_id""".stripMargin,

    "t10_bigram_lm" ->
      """WITH toks AS (SELECT string_split(text, ' ') t FROM documents),
        |bg AS (SELECT x.w1 w1, x.w2 w2 FROM (
        |  SELECT unnest(list_transform(range(1, len(t)),
        |    i -> {'w1': t[i], 'w2': t[i + 1]})) x FROM toks)),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) c1 FROM c12 GROUP BY 1)
        |SELECT c12.w1, c12.w2, c12.c12, c1.c1,
        |  round(c12.c12::DOUBLE / c1.c1::DOUBLE, 6) AS p
        |FROM c12 JOIN c1 USING (w1)
        |ORDER BY c12.c12 DESC, w1, w2 LIMIT 20""".stripMargin,

    "t11_redact" ->
      """WITH src AS (SELECT c_custkey AS doc_id,
        |    c_name || ' ph ' || printf('%03d-%04d', c_custkey % 1000, c_custkey % 10000)
        |      || ' acct ' || CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR) AS rec
        |  FROM customer),
        |p1 AS (SELECT doc_id, rec,
        |    CAST(len(regexp_extract_all(rec, '[0-9]{3}-[0-9]{4}')) AS INT) n_phone,
        |    regexp_replace(rec, '[0-9]{3}-[0-9]{4}', '<phone>', 'g') r1
        |  FROM src)
        |SELECT doc_id,
        |  regexp_replace(r1, '[0-9]{3,}', '<num>', 'g') AS red_text,
        |  n_phone,
        |  CAST(len(regexp_extract_all(r1, '[0-9]{3,}')) AS INT) AS n_num
        |FROM p1 ORDER BY doc_id""".stripMargin,

    // Same shingle windows as t04/t09; contamination flag decided in exact
    // integer micro-units, mirroring the engine's arithmetic.
    "t12_decontaminate" ->
      """WITH sh AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
        |      i -> array_to_string(list_slice(string_split(text,' '), i, i+2), ' '))) AS shingles
        |  FROM documents),
        |b AS (SELECT DISTINCT unnest(shingles) s FROM sh WHERE doc_id % 20 = 0),
        |c AS (SELECT doc_id, shingles FROM sh WHERE doc_id % 20 <> 0),
        |e AS (SELECT doc_id, unnest(shingles) s FROM c),
        |h AS (SELECT e.doc_id, CAST(count(*) AS BIGINT) n_hit
        |  FROM e JOIN b USING (s) GROUP BY 1)
        |SELECT c.doc_id, CAST(len(c.shingles) AS INT) AS n_shingles,
        |  coalesce(h.n_hit, 0) AS n_hit,
        |  round(coalesce(h.n_hit, 0)::DOUBLE / len(c.shingles)::DOUBLE, 6) AS overlap_ratio,
        |  CAST(CASE WHEN coalesce(h.n_hit, 0) * 1000000 >= 500000 * len(c.shingles)
        |       THEN 1 ELSE 0 END AS INT) AS contaminated
        |FROM c LEFT JOIN h USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Per-bigram ln P quantized to micro-nats BEFORE the per-doc sum, so
    // the aggregate matches the engine under any summation order.
    // The same hashed-bucket models, the shared ratio string, the exact
    // integer weight sum, the top-30 cut.
    "t22_dsir_select" -> {
      val ratio = graft.ext.TextAnalysis.dsirRatioExpr(64)
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') ts FROM documents),
         |g AS (SELECT doc_id, unnest(ts) g FROM d
         |      UNION ALL
         |      SELECT doc_id, unnest(list_transform(range(1, len(ts)),
         |        i -> ts[i] || ' ' || ts[i + 1])) g FROM d),
         |db AS MATERIALIZED (SELECT doc_id,
         |    CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 64 AS b,
         |    CAST(count(*) AS BIGINT) c
         |  FROM g GROUP BY 1, 2),
         |tgt AS (SELECT b, CAST(sum(c) AS BIGINT) ct FROM db WHERE doc_id % 7 = 0 GROUP BY 1),
         |rawm AS (SELECT b, CAST(sum(c) AS BIGINT) cr FROM db GROUP BY 1),
         |mo AS (SELECT CAST(r.b AS BIGINT) b, coalesce(t.ct, 0) ct, coalesce(r2.cr, 0) cr
         |  FROM range(0, 64) r(b) LEFT JOIN tgt t ON t.b = r.b LEFT JOIN rawm r2 ON r2.b = r.b),
         |tot AS (SELECT CAST(sum(ct) AS BIGINT) tt, CAST(sum(cr) AS BIGINT) tr FROM mo),
         |lr AS (SELECT b, $ratio AS lr_micro FROM mo CROSS JOIN tot),
         |w AS (SELECT doc_id, CAST(sum(c) AS BIGINT) n_grams,
         |    CAST(sum(c * lr_micro) AS BIGINT) w_micro
         |  FROM db JOIN lr USING (b) GROUP BY 1),
         |sel AS (SELECT * FROM w ORDER BY w_micro DESC, doc_id LIMIT 30)
         |SELECT CAST(row_number() OVER (ORDER BY w_micro DESC, doc_id) AS BIGINT) rank,
         |  doc_id, w_micro, n_grams
         |FROM sel ORDER BY rank""".stripMargin
    },

    "t13_doc_lm_score" ->
      """WITH bg AS (SELECT doc_id, x.w1 w1, x.w2 w2 FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |    i -> {'w1': t[i], 'w2': t[i + 1]})) x
        |  FROM (SELECT doc_id, string_split(text, ' ') t FROM documents))),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) c1 FROM c12 GROUP BY 1),
        |lm AS (SELECT c12.w1, c12.w2, c12.c12, c1.c1 FROM c12 JOIN c1 USING (w1)),
        |s AS (SELECT bg.doc_id,
        |    CAST(round(ln(lm.c12::DOUBLE / lm.c1::DOUBLE) * 1e6) AS BIGINT) lp
        |  FROM bg JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(lp) AS BIGINT) AS sum_logp_micro,
        |  round(sum(lp)::DOUBLE / 1e6 / count(*), 6) AS avg_logp
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // t13's LM-score chain, then the exact-rank tercile cut — the same
    // Mirror of TextAnalysis.wordSynonyms: position self-join
    // co-occurrence, PPMI via the shared ln formula string, cosine via
    // the shared Similarity.colCosExpr over aliased integer sums.
    "s37_word_synonyms" ->
      s"""WITH toks AS MATERIALIZED (
         |  SELECT did, CAST(i AS BIGINT) AS p, arr[i] AS tok
         |  FROM (SELECT doc_id AS did, string_split(text, ' ') AS arr FROM documents),
         |       unnest(range(1, len(arr) + 1)) t(i)),
         |freq AS MATERIALIZED (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1
         |  HAVING count(*) >= 5),
         |kept AS MATERIALIZED (SELECT t.did, t.p, t.tok FROM toks t JOIN freq USING (tok)),
         |pairs AS MATERIALIZED (
         |  SELECT a.tok AS w, b.tok AS ctx, CAST(count(*) AS BIGINT) AS cab
         |  FROM kept a JOIN kept b ON a.did = b.did
         |    AND b.p BETWEEN a.p - 2 AND a.p + 2 AND b.p <> a.p
         |  GROUP BY 1, 2),
         |marg AS MATERIALIZED (SELECT w, CAST(sum(cab) AS BIGINT) AS ca FROM pairs GROUP BY 1),
         |tot AS (SELECT CAST(sum(cab) AS BIGINT) AS tt FROM pairs),
         |vecs AS MATERIALIZED (SELECT w, ctx, pmi FROM (
         |    SELECT w, ctx, ${graft.ext.TextAnalysis.ppmiExpr} AS pmi FROM (
         |      SELECT p.w, p.ctx, p.cab, ma.ca, mb.cb, t.tt
         |      FROM pairs p JOIN marg ma ON ma.w = p.w
         |      JOIN (SELECT w AS ctx, ca AS cb FROM marg) mb ON mb.ctx = p.ctx
         |      CROSS JOIN tot t))
         |  WHERE pmi > 0),
         |norms AS (SELECT w, CAST(sum(pmi * pmi) AS BIGINT) AS nrm2 FROM vecs GROUP BY 1),
         |targets AS (SELECT tok AS target FROM (
         |    SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS rn FROM freq)
         |  WHERE rn <= 8),
         |dots AS MATERIALIZED (
         |  SELECT tv.target, wv.w AS word, CAST(sum(tv.pmi * wv.pmi) AS BIGINT) AS gram
         |  FROM (SELECT t.target, v.ctx, v.pmi FROM vecs v JOIN targets t ON v.w = t.target) tv
         |  JOIN vecs wv ON wv.ctx = tv.ctx AND wv.w <> tv.target
         |  GROUP BY 1, 2),
         |scored AS (SELECT target, word, ${graft.ext.Similarity.colCosExpr} AS cos_micro FROM (
         |    SELECT d.target, d.word, d.gram, na.nrm2 AS na, nb.nrm2 AS nb
         |    FROM dots d JOIN norms na ON na.w = d.target JOIN norms nb ON nb.w = d.word))
         |SELECT target, CAST(rn AS BIGINT) AS rnk, word, cos_micro FROM (
         |  SELECT target, word, cos_micro,
         |    row_number() OVER (PARTITION BY target ORDER BY cos_micro DESC, word) AS rn
         |  FROM scored)
         |WHERE rn <= 3 ORDER BY target, rnk""".stripMargin,

    // ((rank-1)*3) // N formula the Spark side computes.
    "t21_ccnet_buckets" ->
      """WITH bg AS (SELECT doc_id, x.w1 w1, x.w2 w2 FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |    i -> {'w1': t[i], 'w2': t[i + 1]})) x
        |  FROM (SELECT doc_id, string_split(text, ' ') t FROM documents))),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) c1 FROM c12 GROUP BY 1),
        |lm AS (SELECT c12.w1, c12.w2, c12.c12, c1.c1 FROM c12 JOIN c1 USING (w1)),
        |s AS (SELECT bg.doc_id,
        |    CAST(round(ln(lm.c12::DOUBLE / lm.c1::DOUBLE) * 1e6) AS BIGINT) lp
        |  FROM bg JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2),
        |scored AS (
        |  SELECT doc_id, round(sum(lp)::DOUBLE / 1e6 / count(*), 6) AS avg_logp
        |  FROM s GROUP BY doc_id),
        |r AS (SELECT doc_id, avg_logp,
        |    row_number() OVER (ORDER BY avg_logp DESC, doc_id) rn,
        |    count(*) OVER () n FROM scored)
        |SELECT doc_id, avg_logp,
        |  CASE ((rn - 1) * 3) // n WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,

    // Mixture resampling mirror: same sqrt (IEEE-exact, unlike pow),
    // same language-sorted deterministic sum for the denominator, same
    // left-associated rate arithmetic, same integer-ppm coin.
    "t14_mixture_sample" ->
      s"""$toksCte,
         |h AS (SELECT doc_id,
         |  ${T.lexicons.map { case (lang, lex) => s"CAST(${lexHits(lex)} AS INT) hits_$lang" }.mkString(",\n         |  ")}
         |FROM d),
         |lng AS (SELECT doc_id,
         |  list_sort([${T.lexicons.map { case (l, _) => s"{'neg': -hits_$l, 'lang': '$l'}" }.mkString(", ")}])[1].lang AS best_lang
         |FROM h),
         |cnt AS (SELECT best_lang, CAST(count(*) AS BIGINT) n FROM lng GROUP BY 1),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) total FROM cnt),
         |sden AS (SELECT list_sum(list(sqrt(CAST(n AS DOUBLE)) ORDER BY best_lang)) s FROM cnt),
         |rates AS (SELECT best_lang,
         |    CAST(round(least(1.0, sqrt(CAST(n AS DOUBLE)) * floor(total * 0.5) / s / n) * 1e6) AS BIGINT) rate_ppm
         |  FROM cnt, tot, sden)
         |SELECT l.doc_id, l.best_lang, r.rate_ppm
         |FROM lng l JOIN rates r USING (best_lang)
         |WHERE CAST('0x' || substr(md5('mix:' || CAST(l.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 < r.rate_ppm
         |ORDER BY doc_id""".stripMargin,

    // BM25 mirror: identical micro-nat idf quantization (the 6-dp round
    // is the only place libm ln rounding can show), identical
    // left-associated per-term chains, terms added in written order.
    "t15_bm25_topk" -> {
      val terms = Seq("hash", "join", "filter")
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(ts, x -> x = '$t')) AS BIGINT) tf$i"
      }.mkString(",\n         |  ")
      val dfCols = terms.indices.map(i =>
        s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) df$i")
        .mkString(",\n         |  ")
      val idfCols = terms.indices.map(i =>
        s"CAST(round(ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * 1e6) AS BIGINT) i$i")
        .mkString(",\n         |  ")
      val scoreSum = terms.indices.map(i =>
        s"i.i$i * b.tf$i * 2.2 / (b.tf$i + 1.2 * (0.25 + 0.75 * b.dl / (i.sumdl::DOUBLE / i.n))) / 1e6")
        .mkString("\n         |    + ")
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') ts FROM documents),
         |base AS (SELECT doc_id, CAST(len(ts) AS BIGINT) dl,
         |  $tfCols
         |FROM d),
         |st AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(dl) AS BIGINT) sumdl,
         |  $dfCols
         |FROM base),
         |idf AS (SELECT *,
         |  $idfCols
         |FROM st),
         |scored AS (SELECT b.doc_id, b.dl,
         |    $scoreSum AS s_raw
         |  FROM base b, idf i)
         |SELECT doc_id, rank, dl, round(s_raw, 6) AS bm25 FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY s_raw DESC, doc_id) AS INT) rank
         |  FROM scored)
         |WHERE rank <= 20 ORDER BY rank""".stripMargin
    },

    "t16_inverted_index" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) term FROM documents),
        |td AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) tf FROM tok GROUP BY 1, 2),
        |idx AS (SELECT term, CAST(count(*) AS BIGINT) df, CAST(sum(tf) AS BIGINT) total_tf,
        |    string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR), ',' ORDER BY doc_id) postings
        |  FROM td GROUP BY term)
        |SELECT term, df, total_tf, postings FROM idx
        |ORDER BY df DESC, term LIMIT 20""".stripMargin,

    "t17_fixed_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') ts FROM documents),
        |c AS (SELECT doc_id, CAST(len(ts) AS BIGINT) n,
        |    unnest(range(1, CAST(ceil(len(ts) / 64.0) AS BIGINT) + 1)) AS chunk_idx,
        |    unnest(list_transform(range(1, CAST(ceil(len(ts) / 64.0) AS BIGINT) + 1),
        |      i -> array_to_string(list_slice(ts, (i - 1) * 64 + 1, i * 64), ' '))) AS chunk_text
        |  FROM d)
        |SELECT doc_id, chunk_idx,
        |  least(64, n - (chunk_idx - 1) * 64) AS n_chunk_tokens, chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
  )
}
