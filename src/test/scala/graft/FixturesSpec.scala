package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** SQLTestData.scala:307 fixture (top-level: encoders need a stable
  * TypeTag, which method-local case classes don't have). */
case class FixturePerson(id: Int, name: String, age: Int)

/** The reference's own unit-test fixtures (SQLTestData.scala:292-307 —
  * TestData/TestData2/TestData3, UpperCaseData/LowerCaseData, ArrayData,
  * MapData, Person), ported with their classic assertions: joins over
  * temp views, null-aware aggregation, case-sensitive values in outer
  * joins, array/map access, typed encoders. */
class FixturesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val testData =
    (1 to 100).map(i => (i, i.toString)).toDF("key", "value")
  private lazy val testData2 =
    Seq((1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)).toDF("a", "b")
  private lazy val testData3 =
    Seq((1, None), (2, Some(2))).toDF("a", "b")
  private lazy val upperCaseData =
    Seq((1, "A"), (2, "B"), (3, "C"), (4, "D"), (5, "E"), (6, "F")).toDF("N", "L")
  private lazy val lowerCaseData =
    Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("n", "l")

  test("TestData: scan, filter, self-join via temp view") {
    testData.createOrReplaceTempView("testData")
    assert(spark.sql("SELECT * FROM testData WHERE key = 1").collect()
      === Array(Row(1, "1")))
    val joined = spark.sql(
      "SELECT a.key, b.value FROM testData a JOIN testData b ON a.key = b.key WHERE a.key <= 3")
    assert(joined.count() === 3)
  }

  test("TestData2: multi-column grouping") {
    val g = testData2.groupBy("a").agg(sum("b")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(g === Map(1 -> 3L, 2 -> 3L, 3 -> 3L))
  }

  test("TestData3: aggregates ignore nulls, count(col) vs count(*)") {
    val r = testData3.agg(
      count(lit(1)).as("all"), count(col("b")).as("nonnull"),
      sum("b").as("s"), avg("b").as("m")).collect().head
    assert(r.getLong(0) === 2 && r.getLong(1) === 1)
    assert(r.getLong(2) === 2 && r.getDouble(3) === 2.0)
  }

  test("UpperCaseData x LowerCaseData: outer joins keep unmatched sides") {
    // analyzer default is case-insensitive, so qualify `l` vs `L` refs
    val full = upperCaseData.join(lowerCaseData,
      upperCaseData("N") === lowerCaseData("n"), "full_outer")
    assert(full.count() === 6) // 4 matched + 2 unmatched upper rows
    assert(full.filter(lowerCaseData("l").isNull).count() === 2)
    val left = lowerCaseData.join(upperCaseData,
      lowerCaseData("n") === upperCaseData("N"), "left_outer")
    assert(left.count() === 4)
    assert(left.filter(upperCaseData("L").isNull).count() === 0)
  }

  test("ArrayData: explode, getItem, nested arrays") {
    val arrayData = Seq(
      (Seq(1, 2, 3), Seq(Seq(1, 2, 3))),
      (Seq(2, 3, 4), Seq(Seq(2, 3, 4)))).toDF("data", "nestedData")
    assert(arrayData.select(explode(col("data"))).count() === 6)
    assert(arrayData.select(col("data").getItem(0)).collect().map(_.getInt(0)).toSeq
      === Seq(1, 2))
    assert(arrayData.select(col("nestedData").getItem(0).getItem(1))
      .collect().map(_.getInt(0)).toSeq === Seq(2, 3))
  }

  test("MapData: getMapValue semantics") {
    val mapData = Seq(
      Map(1 -> "a1", 2 -> "b1"),
      Map(2 -> "b2", 3 -> "c2")).toDF("data")
    val vals = mapData.select(col("data").getItem(2)).collect().map(_.getString(0))
    assert(vals.toSeq === Seq("b1", "b2"))
    assert(mapData.select(element_at(col("data"), 9)).collect().forall(_.isNullAt(0)))
  }

  test("Person: typed encoder round trip and typed filter") {
    val ds = Seq(FixturePerson(0, "mike", 30), FixturePerson(1, "jim", 20)).toDS()
    assert(ds.filter(_.age > 25).map(_.name).collect().toSeq === Seq("mike"))
    assert(ds.schema.fieldNames.toSeq === Seq("id", "name", "age"))
  }
}
