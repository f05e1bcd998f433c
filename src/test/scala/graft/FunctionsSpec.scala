package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Proves the full SURVEY §2.8 function surface (the reference's 158
  * FunctionRegistry entries, CAT/analysis/FunctionRegistry.scala:116-288)
  * resolves in this engine, and pins golden values for functions that are
  * NOT oracle-checked (libm transcendentals, engine-specific hashes).
  */
class FunctionsSpec extends SparkSpec {

  // SQL names as registered by the reference, §2.8 categories.
  private val referenceRegistry: Seq[String] = Seq(
    // misc non-aggregate (FunctionRegistry.scala:117-133)
    "abs", "array", "coalesce", "explode", "greatest", "if", "isnan",
    "isnull", "isnotnull", "least", "nvl", "rand", "randn", "struct",
    "named_struct", "sqrt", "nanvl",
    // math (:136-178)
    "acos", "asin", "atan", "atan2", "bin", "cbrt", "ceil", "ceiling",
    "cos", "cosh", "conv", "e", "exp", "expm1", "floor", "factorial",
    "hypot", "hex", "log", "ln", "log10", "log1p", "log2", "negative",
    "pi", "pow", "power", "pmod", "positive", "rint", "round",
    "shiftleft", "shiftright", "shiftrightunsigned", "sign", "signum",
    "sin", "sinh", "tan", "tanh", "degrees", "radians",
    // aggregates (:181-200)
    "avg", "mean", "count", "first", "first_value", "last", "last_value",
    "max", "min", "sum", "stddev", "stddev_pop", "stddev_samp",
    "variance", "var_pop", "var_samp", "skewness", "kurtosis", "corr",
    "approx_count_distinct",
    // string (:202-240)
    "ascii", "base64", "concat", "concat_ws", "encode", "decode",
    "find_in_set", "format_number", "get_json_object", "initcap",
    "json_tuple", "lcase", "lower", "length", "levenshtein",
    "regexp_extract", "regexp_replace", "instr", "locate", "lpad",
    "ltrim", "format_string", "printf", "rpad", "repeat", "reverse",
    "rtrim", "soundex", "space", "split", "substr", "substring",
    "substring_index", "translate", "trim", "unbase64", "ucase",
    "upper", "unhex",
    // datetime (:243-270)
    "add_months", "current_date", "current_timestamp", "now", "datediff",
    "date_add", "date_format", "date_sub", "day", "dayofmonth",
    "dayofyear", "from_unixtime", "from_utc_timestamp", "hour",
    "last_day", "minute", "month", "months_between", "next_day",
    "quarter", "second", "to_date", "to_unix_timestamp",
    "to_utc_timestamp", "trunc", "unix_timestamp", "weekofyear", "year",
    // collection (:273-275)
    "size", "sort_array", "array_contains",
    // misc/hash (:278-287)
    "crc32", "md5", "sha", "sha1", "sha2", "spark_partition_id",
    "input_file_name", "monotonically_increasing_id")

  test("every reference-registry function name resolves in this engine") {
    val missing = referenceRegistry.filterNot(spark.catalog.functionExists)
    assert(missing.isEmpty, s"unresolved reference functions: $missing")
  }

  private def eval1(sqlExpr: String): Any =
    spark.sql(s"SELECT $sqlExpr").collect().head.get(0)

  test("golden values: math/libm functions (not oracle-checked)") {
    assert(eval1("round(exp(1), 10)") === 2.7182818285)
    assert(eval1("round(log(e()), 10)") === 1.0)
    assert(eval1("round(log10(1000), 10)") === 3.0)
    assert(eval1("round(log2(8), 10)") === 3.0)
    assert(eval1("round(pow(2, 10), 10)") === 1024.0)
    assert(eval1("round(hypot(3, 4), 10)") === 5.0)
    assert(eval1("round(sin(0), 10)") === 0.0)
    assert(eval1("round(cos(0), 10)") === 1.0)
    assert(eval1("round(atan2(1, 1) * 4, 10)") === BigDecimal(math.Pi)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(eval1("round(degrees(pi()), 8)") === 180.0)
    assert(eval1("factorial(5)") === 120L)
    assert(eval1("conv('100', 2, 10)") === "4")
    assert(eval1("cbrt(27.0)") === 3.0)
    assert(eval1("rint(2.5)") === 2.0) // banker's rounding
    assert(eval1("pmod(-7, 3)") === 2) // pmod is positive, unlike %
    assert(eval1("-7 % 3") === -1)
    assert(eval1("shiftrightunsigned(-8, 1)") === Int.MaxValue - 3) // int input
    assert(eval1("shiftrightunsigned(cast(-8 as bigint), 1)") === Long.MaxValue - 3)
  }

  test("golden values: string functions (not oracle-checked)") {
    assert(eval1("soundex('Robert')") === "R163")
    assert(eval1("format_number(1234567.891, 2)") === "1,234,567.89")
    assert(eval1("substring_index('a.b.c', '.', 2)") === "a.b")
    assert(eval1("find_in_set('b', 'a,b,c')") === 2)
    assert(eval1("base64(cast('spark' as binary))") === "c3Bhcms=")
    assert(eval1("cast(unbase64('c3Bhcms=') as string)") === "spark")
    assert(eval1("initcap('hello world')") === "Hello World")
    assert(eval1("space(3)") === "   ")
    assert(eval1("format_string('%03d', 7)") === "007")
    assert(eval1("locate('l', 'hello')") === 3)
    assert(eval1("cast(decode(encode('abc', 'utf-8'), 'utf-8') as string)") === "abc")
    assert(eval1("unhex('4D')") === Array(0x4d.toByte))
  }

  test("golden values: datetime functions (not oracle-checked)") {
    assert(eval1("date_format(timestamp'2024-03-05 10:30:00', 'yyyy/MM/dd HH')") === "2024/03/05 10")
    assert(eval1("cast(months_between(date'2024-03-15', date'2024-01-15') as int)") === 2)
    assert(eval1("next_day(date'2024-03-05', 'Friday')").toString === "2024-03-08")
    assert(eval1("date_sub(date'2024-03-05', 4)").toString === "2024-03-01")
    assert(eval1("unix_timestamp(timestamp'1970-01-02 00:00:00')") === 86400L)
    assert(eval1("from_unixtime(86400, 'yyyy-MM-dd')") === "1970-01-02")
    assert(eval1("trunc(date'2024-03-15', 'MM')").toString === "2024-03-01")
    assert(eval1("hour(timestamp'2024-03-05 10:30:45')") === 10)
    assert(eval1("minute(timestamp'2024-03-05 10:30:45')") === 30)
    assert(eval1("second(timestamp'2024-03-05 10:30:45')") === 45)
  }

  test("golden values: hash/misc functions (not oracle-checked)") {
    val crc = new java.util.zip.CRC32()
    crc.update("es".getBytes("UTF-8"))
    assert(eval1("crc32(cast('es' as binary))") === crc.getValue)
    assert(eval1("sha1(cast('x' as binary))") === "11f6ad8ec52a2984abaafd7c3b516503785c2072")
    assert(eval1("isnan(cast('NaN' as double))") === true)
    assert(eval1("nanvl(cast('NaN' as double), 9.0)") === 9.0)
    // generator + json_tuple
    val jt = spark.sql("""SELECT json_tuple('{"a":1,"b":"x"}', 'a', 'b')""").collect().head
    assert(jt === Row("1", "x"))
  }

  test("variant: typed access, missing paths, null semantics, canonical form") {
    // typed path access + canonical re-serialization (minified, key order kept)
    val r = spark.sql(
      """SELECT variant_get(parse_json('{"a":{"b":[1,2]},"s":"x"}'), '$.a.b[1]', 'int') AS b1,
        |  variant_get(parse_json('{"a":1}'), '$.a', 'string') AS cast_str,
        |  try_variant_get(parse_json('{"a":1}'), '$.zz', 'int') AS missing,
        |  is_variant_null(parse_json('null')) AS vnull,
        |  to_json(parse_json('{ "k" : 7 }')) AS canon""".stripMargin).collect().head
    assert(r.getInt(0) === 2)
    assert(r.getString(1) === "1")      // variant int casts to its string form
    assert(r.isNullAt(2))               // try_ on a missing path is NULL, no error
    assert(r.getBoolean(3))             // JSON null is a variant-null, not SQL NULL
    assert(r.getString(4) === """{"k":7}""")
    // variant_get on a missing path (non-try) also yields NULL for variant
    val m = spark.sql("SELECT variant_get(parse_json('{}'), '$.x', 'int')").collect().head
    assert(m.isNullAt(0))
  }

  test("listagg: WITHIN GROUP ordering is the output order; DISTINCT dedupes") {
    val r = spark.sql(
      """SELECT listagg(c, ',') WITHIN GROUP (ORDER BY c DESC) AS d,
        |  listagg(DISTINCT c, ',') WITHIN GROUP (ORDER BY c) AS u
        |FROM VALUES ('b'),('a'),('b') t(c)""".stripMargin).collect().head
    assert(r.getString(0) === "b,b,a")
    assert(r.getString(1) === "a,b")
  }

  test("f16 unpivot lowers to Expand — zero extra shuffles past the aggregate") {
    val df = graft.queries.Functions.defs("f16_unpivot")(spark, sf001)
    assert(df.collect().length === 9) // 3 flags x 3 metrics
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    // one agg exchange + one final sort exchange; the melt itself is narrow
    assert("Exchange".r.findAllIn(plan.replace("AQEShuffleRead", "")).size <= 4)
  }

  test("rand/randn are seeded-deterministic, monotonic id distinct") {
    val a = spark.range(100).select(rand(42)).collect().map(_.getDouble(0))
    val b = spark.range(100).select(rand(42)).collect().map(_.getDouble(0))
    assert(a.sameElements(b))
    assert(a.forall(v => v >= 0.0 && v < 1.0))
    val ids = spark.range(1000).repartition(7)
      .select(monotonically_increasing_id()).collect().map(_.getLong(0))
    assert(ids.distinct.length === 1000)
  }
}
