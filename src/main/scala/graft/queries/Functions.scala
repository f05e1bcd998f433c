package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY §2.8 — the reference registers 158
  * functions in CAT/analysis/FunctionRegistry.scala:116-288; implementations
  * under CAT/expressions/). All are modern built-ins; these queries prove
  * cross-engine value parity for the deterministic subset. Transcendental
  * libm functions (exp/log/pow/trig) are deliberately NOT oracle-checked —
  * last-ulp differences across engines — they're covered by golden-value
  * ScalaTests instead (FunctionsSpec).
  *
  * Everything here is a narrow projection over one scan: whole-stage
  * codegen keeps each query a single pipelined stage, and ReadSchema
  * pruning means only the referenced columns are read at 100 TB.
  */
object Functions {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // stringExpressions.scala surface.
    "f01_string_functions" -> { (s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        length(col("c_name")).as("name_len"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        substring(col("c_name"), 1, 8).as("prefix"),
        concat_ws("-", col("c_name"), col("c_mktsegment")).as("joined"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded_key"),
        rpad(col("c_mktsegment"), 12, ".").as("rpadded"),
        reverse(col("c_name")).as("rev"),
        repeat(substring(col("c_name"), 1, 2), 3).as("rep"),
        translate(col("c_name"), "#0", "_x").as("trans"),
        instr(col("c_name"), "#").as("hash_pos"),
        ascii(col("c_name")).as("first_ascii"),
        levenshtein(col("c_name"), col("c_mktsegment")).as("lev"),
        trim(lit("  x  ")).as("trimmed"),
        ltrim(lit("  x")).as("ltrimmed"),
        rtrim(lit("x  ")).as("rtrimmed"))
        .orderBy("c_custkey")
    },

    // regexpExpressions.scala surface (patterns valid in both Java and RE2).
    "f02_regexp_functions" -> { (s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "[0-9]+", 0).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        col("p_name").rlike("^[a-z]+ (widget|bolt)$").as("is_simple"),
        col("p_type").like("%ECO%").as("is_eco"),
        split(col("p_name"), " ").getItem(0).as("first_word"))
        .orderBy("p_partkey")
    },

    // datetimeExpressions.scala surface over orders dates.
    "f03_date_functions" -> { (s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofyear(col("o_orderdate")).as("doy"),
        quarter(col("o_orderdate")).as("qtr"),
        weekofyear(col("o_orderdate")).as("wk"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).as("days_since"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"),
        add_months(to_date(col("o_orderdate")), 2).as("plus2mo"),
        last_day(col("o_orderdate")).as("month_end"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month_start"))
        .orderBy("o_orderkey")
    },

    // mathExpressions.scala surface (exact subset).
    "f04_math_functions" -> { (s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        abs(col("l_quantity") - 25.0).as("qty_dev"),
        ceil(col("l_extendedprice") / 1000.0).as("price_ceil_k"),
        floor(col("l_extendedprice") / 1000.0).as("price_floor_k"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        signum(col("l_discount") - 0.05).as("disc_sign"),
        greatest(col("l_discount"), col("l_tax")).as("max_rate"),
        least(col("l_discount"), col("l_tax")).as("min_rate"),
        (col("l_orderkey") % 7).as("key_mod"),
        hex(col("l_orderkey")).as("key_hex"),
        bin(col("l_linenumber")).as("line_bin"))
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
    },

    // conditionalExpressions + nullExpressions surface.
    "f05_conditional_functions" -> { (s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        when(col("o_totalprice") > 400000, "platinum")
          .when(col("o_totalprice") > 250000, "gold")
          .otherwise("standard").as("tier"),
        nullif(col("o_orderstatus"), lit("O")).as("non_open_status"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_label"),
        isnull(nullif(col("o_orderstatus"), lit("O"))).as("is_open"),
        nvl(nullif(col("o_orderpriority"), lit("5-LOW")), lit("urgent-ish")).as("prio"))
        .orderBy("o_orderkey")
    },

    // jsonExpressions.scala surface: JSON path extraction from event props.
    "f06_json_functions" -> { (s, dir) =>
      Tables.eventsSpread(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_num"),
        get_json_object(col("props"), "$.missing").as("absent"))
        .orderBy("event_id")
    },

    // Generator surface (CAT/expressions/generators.scala Explode:102 →
    // EXEC/Generate.scala:49): tokenize documents and count words.
    "f07_explode_tokens" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(50)
    },

    // misc.scala hash surface: md5 / sha2 (hex-identical across engines).
    "f08_hash_functions" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        md5(col("text")).as("text_md5"),
        sha2(col("text"), 256).as("text_sha256"))
        .orderBy("doc_id")
    },

    // bitwiseExpressions.scala surface.
    "f09_bitwise_functions" -> { (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        (col("user_id").bitwiseAND(255)).as("low_byte"),
        (col("user_id").bitwiseOR(1)).as("or1"),
        (col("user_id").bitwiseXOR(col("event_id"))).as("mix"),
        shiftleft(col("user_id"), 2).as("shl"),
        shiftright(col("user_id"), 1).as("shr"))
        .orderBy("event_id")
    },

    // json_tuple generator (CAT/expressions/jsonExpressions.scala JsonTuple)
    // + to_json(struct) serialization; null JSON fields are omitted by
    // to_json, mirrored with a CASE in the oracle.
    "f13_json_tuple" -> { (s, dir) =>
      Tables.eventsSpread(s, dir)
        .select(col("event_id"), col("event_type"),
          json_tuple(col("props"), "k", "missing"))
        .toDF("event_id", "event_type", "k_str", "absent")
        .withColumn("rejson",
          to_json(struct(col("event_type").as("t"), col("k_str").as("k"))))
        .orderBy("event_id")
    },

    // Generator with position (posexplode — CAT/expressions/generators.scala).
    // OUTER generator variants + inline (reference CAT/expressions/
    // generators.scala Explode :94 and the HiveQl LATERAL VIEW OUTER
    // path — outer keeps the parent row with NULL output when the
    // generator yields nothing; inline expands an array of structs to
    // columns). Gated arithmetically: the oracle derives every count
    // from the array-construction rule, so a generator dropping or
    // duplicating a row mismatches.
    "f20_outer_generators" -> { (s, dir) =>
      val src = Tables.orders(s, dir).selectExpr("o_orderkey",
        """CASE WHEN o_orderkey % 5 = 0 THEN array()
          |     WHEN o_orderkey % 7 = 0 THEN CAST(NULL AS ARRAY<STRING>)
          |     ELSE array(o_orderstatus, o_orderpriority) END AS arr""".stripMargin)
      val inner = src.select(explode(col("arr")).as("tok"))
        .agg(count(lit(1)).as("n_inner"))
      val outer = src.select(explode_outer(col("arr")).as("tok"))
        .agg(count(lit(1)).as("n_outer"),
          count(when(col("tok").isNull, lit(1))).as("n_null_tok"))
      val pos = src.select(posexplode_outer(col("arr")).as(Seq("pos", "tok")))
        .agg(max("pos").cast("long").as("max_pos"),
          count(when(col("pos").isNull, lit(1))).as("n_null_pos"))
      val inl = Tables.orders(s, dir)
        .selectExpr("inline(array(struct(o_orderkey AS k, o_orderstatus AS v), " +
          "struct(o_custkey AS k, o_orderpriority AS v)))")
        .agg(count(lit(1)).as("n_inline"))
      inner.crossJoin(outer).crossJoin(pos).crossJoin(inl)
    },

    "f11_posexplode" -> { (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
        .select(col("p_partkey"), col("pos"), col("col").as("word"))
        .orderBy("p_partkey", "pos")
    },

    // MapType creation + access (complexTypeExtractors.scala GetMapValue:240).
    "f12_map_functions" -> { (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          map(lit("brand"), col("p_brand"), lit("type"), col("p_type")).as("m"))
        .select(col("p_partkey"),
          size(col("m")).as("n_keys"),
          concat_ws(",", map_keys(col("m"))).as("keys_csv"),
          element_at(col("m"), "brand").as("brand_val"),
          element_at(col("m"), "type").as("type_val"),
          array_contains(map_keys(col("m")), "brand").as("has_brand"))
        .orderBy("p_partkey")
    },

    // complexTypeCreator + collectionOperations surface: build arrays/
    // structs/maps, then size/sort_array/array_contains. Arrays are
    // flattened to delimited strings in the final projection — the driver's
    // comparator can't hash array cells — which keeps the array ops
    // themselves (array/sort_array/array_contains) fully exercised.
    "f10_collection_functions" -> { (s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        array(col("p_brand"), col("p_type")).as("tags"),
        size(split(col("p_name"), " ")).as("n_words"),
        sort_array(split(col("p_name"), " ")).as("sorted_words"),
        array_contains(split(col("p_name"), " "), "widget").as("is_widget"),
        struct(col("p_brand").as("b"), col("p_size").as("s")).as("meta"))
        .select(col("p_partkey"),
          concat_ws(",", col("tags")).as("tags_csv"),
          element_at(col("tags"), 1).as("first_tag"),
          col("n_words"),
          concat_ws(",", col("sorted_words")).as("sorted_csv"),
          col("is_widget"),
          col("meta.b").as("meta_brand"), col("meta.s").as("meta_size"))
        .orderBy("p_partkey")
    },

    // VARIANT surface (semi-structured columns without a declared schema —
    // the open-JSON analog of the reference's get_json_object string
    // walks): parse once into the binary variant encoding, then typed
    // path access, a missing-path probe via try_variant_get, the inferred
    // per-row schema, and canonical re-serialization. At 100 TB the win
    // over f06's string re-parsing is that parse_json runs once per row
    // and every downstream access walks the binary form.
    "f14_variant_json" -> { (s, dir) =>
      Tables.eventsSpread(s, dir).createOrReplaceTempView("fx_events")
      s.sql(
        """SELECT event_id,
          |  variant_get(parse_json(props), '$.k', 'bigint') AS k_num,
          |  try_variant_get(parse_json(props), '$.missing', 'string') IS NULL AS missing_is_null,
          |  schema_of_variant(parse_json(props)) AS sch,
          |  to_json(parse_json(props)) AS canon
          |FROM fx_events ORDER BY event_id""".stripMargin)
    },

    // listagg (ANSI ordered string aggregation, WITHIN GROUP): the
    // deterministic ORDER BY inside the aggregate is what makes the
    // result hashable — an unordered collect would be partition-order
    // dependent.
    "f15_listagg" -> { (s, dir) =>
      Tables.nation(s, dir).createOrReplaceTempView("fx_nation")
      Tables.region(s, dir).createOrReplaceTempView("fx_region")
      s.sql(
        """SELECT r_name,
          |  listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name) AS nations,
          |  CAST(count(*) AS BIGINT) AS n_nations
          |FROM fx_nation JOIN fx_region ON n_regionkey = r_regionkey
          |GROUP BY r_name ORDER BY r_name""".stripMargin)
    },

    // UNPIVOT (relational melt): a wide per-flag aggregate folded to
    // (key, metric, value) long form — the metrics-export shape. The
    // UNPIVOT operator is a zero-shuffle Expand over the aggregate.
    "f16_unpivot" -> { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("fx_lineitem")
      s.sql(
        """SELECT l_returnflag, metric, val FROM (
          |  SELECT l_returnflag,
          |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
          |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
          |    CAST(count(*) AS BIGINT) AS n_items
          |  FROM fx_lineitem GROUP BY l_returnflag
          |) UNPIVOT (val FOR metric IN (qty, price_cents, n_items))
          |ORDER BY l_returnflag, metric""".stripMargin)
    },

    // Higher-order functions over token arrays (transform / filter /
    // aggregate / exists). CAVEAT, measured in s10's history: HOF lambdas
    // run INTERPRETED — fine on these short per-row arrays, but corpus-
    // scale featurization belongs in the explode -> codegen -> agg shape
    // (see ext.Pipeline.HashingTF). This query is the API surface, with
    // the arrays bounded by the row.
    "f17_higher_order" -> { (s, dir) =>
      Tables.documentsSpread(s, dir).createOrReplaceTempView("fx_documents")
      s.sql(
        """SELECT doc_id,
          |  CAST(aggregate(transform(split(text, ' '), t -> length(t)), 0,
          |       (a, x) -> a + x) AS BIGINT) AS total_chars,
          |  CAST(size(filter(split(text, ' '), t -> length(t) > 3)) AS BIGINT) AS n_long,
          |  exists(split(text, ' '), t -> t = 'data') AS has_data
          |FROM fx_documents ORDER BY doc_id""".stripMargin)
    },

    // Collated comparisons (UTF8_LCASE): case-insensitive equality and
    // DISTINCT without materializing lower() copies — the collation
    // travels with the value, so joins/aggregates on collated keys stay
    // hash-based.
    "f18_collation" -> { (s, dir) =>
      Tables.nation(s, dir).createOrReplaceTempView("fx_nation")
      s.sql(
        """SELECT CAST(count(DISTINCT m) AS BIGINT) AS n_binary,
          |  CAST(count(DISTINCT collate(m, 'UTF8_LCASE')) AS BIGINT) AS n_ci,
          |  CAST(sum(CASE WHEN collate(m, 'UTF8_LCASE') = 'nation_5' THEN 1 ELSE 0 END) AS BIGINT) AS n5
          |FROM (SELECT n_name AS m FROM fx_nation
          |      UNION ALL SELECT lower(n_name) FROM fx_nation)""".stripMargin)
    },

    // try_ error-safe arithmetic: NULL instead of a runtime error on
    // zero-divide, bad casts, and overflow — what keeps a 100 TB job from
    // dying at hour three on one malformed row. Performance contract,
    // MEASURED: try_ is free on the happy path but each failure throws and
    // catches a JVM exception — an always-overflowing try_add column cost
    // 2.6 s vs 0.2 s at 0.1% overflow on the same 150k rows. try_ guards
    // RARE bad rows; if the majority of rows are expected to fail, filter
    // them out first.
    "f19_try_functions" -> { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("fx_orders")
      s.sql(
        """SELECT o_orderkey,
          |  try_divide(o_totalprice, CAST(o_custkey % 3 AS DOUBLE)) AS div_maybe,
          |  try_cast(o_orderpriority AS INT) AS prio_full,
          |  try_cast(substr(o_orderpriority, 1, 1) AS INT) AS prio_digit,
          |  try_add(CASE WHEN o_orderkey % 1000 = 0 THEN 9223372036854775807L
          |               ELSE 0L END, o_orderkey) AS ovf
          |FROM fx_orders ORDER BY o_orderkey""".stripMargin)
    }
  )

  val oracles: Map[String, String] = Map(
    // Every count derived arithmetically from the construction rule:
    // %5 -> empty array (outer keeps 1 NULL row), else %7 -> NULL array
    // (ditto), else 2 elements; inline yields exactly 2 structs per row.
    "f20_outer_generators" ->
      """WITH c AS (SELECT
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
        |    CAST(sum(CASE WHEN o_orderkey % 5 <> 0 AND o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        |  FROM orders)
        |SELECT (n - n_empty - n_null) * 2 AS n_inner,
        |  ((n - n_empty - n_null) * 2) + n_empty + n_null AS n_outer,
        |  n_empty + n_null AS n_null_tok,
        |  CAST(1 AS BIGINT) AS max_pos,
        |  n_empty + n_null AS n_null_pos,
        |  n * 2 AS n_inline
        |FROM c""".stripMargin,

    "f01_string_functions" ->
      """SELECT c_custkey,
        |  length(c_name) AS name_len,
        |  upper(c_name) AS uname,
        |  lower(c_mktsegment) AS lseg,
        |  substring(c_name, 1, 8) AS prefix,
        |  concat_ws('-', c_name, c_mktsegment) AS joined,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
        |  rpad(c_mktsegment, 12, '.') AS rpadded,
        |  reverse(c_name) AS rev,
        |  repeat(substring(c_name, 1, 2), 3) AS rep,
        |  translate(c_name, '#0', '_x') AS trans,
        |  strpos(c_name, '#') AS hash_pos,
        |  ascii(c_name) AS first_ascii,
        |  levenshtein(c_name, c_mktsegment) AS lev,
        |  trim('  x  ') AS trimmed,
        |  ltrim('  x') AS ltrimmed,
        |  rtrim('x  ') AS rtrimmed
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "f02_regexp_functions" ->
      """SELECT p_partkey,
        |  regexp_extract(p_brand, '[0-9]+') AS brand_num,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  regexp_matches(p_name, '^[a-z]+ (widget|bolt)$') AS is_simple,
        |  p_type LIKE '%ECO%' AS is_eco,
        |  string_split(p_name, ' ')[1] AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,

    "f03_date_functions" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  CAST(weekofyear(o_orderdate) AS INT) AS wk,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2mo,
        |  CAST(last_day(o_orderdate) AS DATE) AS month_end,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f04_math_functions" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  abs(l_quantity - 25.0) AS qty_dev,
        |  CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_ceil_k,
        |  CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_floor_k,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  CAST(CASE WHEN l_discount - 0.05 > 0 THEN 1.0 WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS DOUBLE) AS disc_sign,
        |  greatest(l_discount, l_tax) AS max_rate,
        |  least(l_discount, l_tax) AS min_rate,
        |  l_orderkey % 7 AS key_mod,
        |  upper(to_hex(l_orderkey)) AS key_hex,
        |  bin(l_linenumber) AS line_bin
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,

    "f05_conditional_functions" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 400000 THEN 'platinum'
        |       WHEN o_totalprice > 250000 THEN 'gold'
        |       ELSE 'standard' END AS tier,
        |  nullif(o_orderstatus, 'O') AS non_open_status,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
        |  nullif(o_orderstatus, 'O') IS NULL AS is_open,
        |  coalesce(nullif(o_orderpriority, '5-LOW'), 'urgent-ish') AS prio
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f06_json_functions" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        |  json_extract_string(props, '$.missing') AS absent
        |FROM events ORDER BY event_id""".stripMargin,

    "f13_json_tuple" ->
      """SELECT event_id, event_type,
        |  json_extract_string(props, '$.k') AS k_str,
        |  json_extract_string(props, '$.missing') AS absent,
        |  -- json_merge_patch('{}', x) drops null fields (RFC 7386), matching
        |  -- Spark to_json's null-field omission; the serializer handles escaping
        |  CAST(json_merge_patch('{}', to_json(struct_pack(
        |    t := event_type, k := json_extract_string(props, '$.k')))) AS VARCHAR) AS rejson
        |FROM events ORDER BY event_id""".stripMargin,

    "f07_explode_tokens" ->
      """SELECT token, COUNT(*) AS freq FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |) t GROUP BY token
        |ORDER BY freq DESC, token
        |LIMIT 50""".stripMargin,

    "f08_hash_functions" ->
      """SELECT doc_id,
        |  md5(text) AS text_md5,
        |  sha256(text) AS text_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,

    "f09_bitwise_functions" ->
      """SELECT event_id,
        |  user_id & 255 AS low_byte,
        |  user_id | 1 AS or1,
        |  xor(user_id, event_id) AS mix,
        |  user_id << 2 AS shl,
        |  user_id >> 1 AS shr
        |FROM events ORDER BY event_id""".stripMargin,

    "f11_posexplode" ->
      """SELECT p_partkey,
        |  CAST(generate_subscripts(string_split(p_name, ' '), 1) - 1 AS INT) AS pos,
        |  unnest(string_split(p_name, ' ')) AS word
        |FROM part ORDER BY p_partkey, pos""".stripMargin,

    "f12_map_functions" ->
      """SELECT p_partkey,
        |  CAST(cardinality(m) AS INT) AS n_keys,
        |  array_to_string(map_keys(m), ',') AS keys_csv,
        |  m['brand'][1] AS brand_val,
        |  m['type'][1] AS type_val,
        |  list_contains(map_keys(m), 'brand') AS has_brand
        |FROM (SELECT p_partkey, map(['brand','type'], [p_brand, p_type]) m FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "f10_collection_functions" ->
      """SELECT p_partkey,
        |  array_to_string([p_brand, p_type], ',') AS tags_csv,
        |  [p_brand, p_type][1] AS first_tag,
        |  CAST(length(string_split(p_name, ' ')) AS INT) AS n_words,
        |  array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_csv,
        |  list_contains(string_split(p_name, ' '), 'widget') AS is_widget,
        |  p_brand AS meta_brand,
        |  p_size AS meta_size
        |FROM part ORDER BY p_partkey""".stripMargin,

    // props is uniformly {"k": <int>}: the inferred variant schema is the
    // constant OBJECT<k: BIGINT>, and the canonical minified form
    // reconstructs positionally from the extracted value.
    "f14_variant_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        |  json_extract_string(props, '$.missing') IS NULL AS missing_is_null,
        |  'OBJECT<k: BIGINT>' AS sch,
        |  '{"k":' || json_extract_string(props, '$.k') || '}' AS canon
        |FROM events ORDER BY event_id""".stripMargin,

    "f15_listagg" ->
      """SELECT r_name,
        |  string_agg(n_name, '|' ORDER BY n_name) AS nations,
        |  CAST(count(*) AS BIGINT) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    // UNPIVOT expressed as the equivalent UNION ALL melt — proving the
    // operator is sugar over per-metric projections.
    "f16_unpivot" ->
      """WITH agg AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
        |    CAST(count(*) AS BIGINT) AS n_items
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, val FROM (
        |  SELECT l_returnflag, 'qty' AS metric, qty AS val FROM agg
        |  UNION ALL
        |  SELECT l_returnflag, 'price_cents', price_cents FROM agg
        |  UNION ALL
        |  SELECT l_returnflag, 'n_items', n_items FROM agg)
        |ORDER BY l_returnflag, metric""".stripMargin,

    "f17_higher_order" ->
      """SELECT doc_id,
        |  CAST(list_sum(list_transform(string_split(text, ' '), t -> strlen(t))) AS BIGINT) AS total_chars,
        |  CAST(len(list_filter(string_split(text, ' '), t -> strlen(t) > 3)) AS BIGINT) AS n_long,
        |  len(list_filter(string_split(text, ' '), t -> t = 'data')) > 0 AS has_data
        |FROM documents ORDER BY doc_id""".stripMargin,

    // DuckDB's NOCASE collation can't ride through COUNT(DISTINCT), so the
    // oracle states the same semantics via lower().
    "f18_collation" ->
      """SELECT CAST(count(DISTINCT m) AS BIGINT) AS n_binary,
        |  CAST(count(DISTINCT lower(m)) AS BIGINT) AS n_ci,
        |  CAST(sum(CASE WHEN lower(m) = 'nation_5' THEN 1 ELSE 0 END) AS BIGINT) AS n5
        |FROM (SELECT n_name AS m FROM nation
        |      UNION ALL SELECT lower(n_name) FROM nation)""".stripMargin,

    // DuckDB double division already yields NULL on zero divisors; the
    // overflow probe is stated conditionally (BIGINT overflow raises).
    "f19_try_functions" ->
      """SELECT o_orderkey,
        |  o_totalprice / CAST(o_custkey % 3 AS DOUBLE) AS div_maybe,
        |  try_cast(o_orderpriority AS INT) AS prio_full,
        |  try_cast(substr(o_orderpriority, 1, 1) AS INT) AS prio_digit,
        |  CASE WHEN o_orderkey = 0 THEN 9223372036854775807
        |       WHEN o_orderkey % 1000 = 0 THEN NULL
        |       ELSE o_orderkey END AS ovf
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
