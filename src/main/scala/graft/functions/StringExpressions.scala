package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler kernel, shared by the interpreted and generated paths
  * (a top-level object compiles with static forwarders, so generated
  * Java calls `graft.functions.JaroWinklerKernel.similarity(...)`
  * directly — one static call, no encoder boundary, whole-stage codegen
  * unbroken).
  *
  * Semantics pinned to the classic definition DuckDB implements
  * (probed empirically, see StringExprSpec): match window
  * `max(|a|,|b|)/2 - 1`, transpositions = floor(mismatched matched
  * positions / 2), either side empty => 0.0, Winkler prefix boost
  * (scale 0.1, prefix capped at 4) applied only when jaro > 0.7. */
object JaroWinklerKernel {
  def similarity(a: UTF8String, b: UTF8String): Double =
    sim(a.toString, b.toString)

  def sim(s: String, t: String): Double = {
    val n = s.length; val m = t.length
    if (n == 0 || m == 0) return 0.0
    if (s == t) return 1.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(i - window, 0)
      val hi = math.min(i + window + 1, m)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    // INTEGER halving of the raw mismatch count, like DuckDB/rapidfuzz:
    // an odd count is possible (equal multisets, 3 displaced positions),
    // and flooring vs /2.0 shifts jaro by 0.5/m — enough to reorder ties.
    val halved = transpositions / 2
    val jaro = (mm / n + mm / m + (mm - halved) / mm) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val cap = math.min(4, math.min(n, m))
      while (l < cap && s.charAt(l) == t.charAt(l)) l += 1
      jaro + 0.1 * l * (1.0 - jaro)
    }
  }
}

/** Native Jaro-Winkler similarity of two strings — the scoring kernel of
  * fuzzy record linkage. Spark has `levenshtein` built in but no JW; a
  * Scala UDF here would box both strings and break whole-stage codegen
  * at every call site, so this is the third native expression alongside
  * DotProduct/L2Norm: the generated code is one static kernel call and
  * the comparison pipeline stays fused. */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerKernel.similarity($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry point + SQL registration. */
object StringFunctions {
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (es: Seq[Expression]) => JaroWinkler(es.head, es(1))))
}
