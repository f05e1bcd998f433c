package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * A Scala UDF costs an encoder boundary (catalyst -> Seq[Double] -> box)
  * and breaks whole-stage codegen at every call site; these expressions
  * read `ArrayData` in place and emit a tight Java loop via `doGenCode`,
  * so dot products and norms stay inside the fused codegen stage with the
  * surrounding projection/filter.
  *
  * Semantics (shared by the interpreted and generated paths, and identical
  * to the SQL `aggregate(zip_with(...))` formulation they replace): doubles
  * accumulate LEFT TO RIGHT, the iteration length is min(len(a), len(b)),
  * null input array => null result. Null ELEMENTS are not expected
  * (embedding vectors are dense); containsNull inputs are the caller's
  * responsibility, as with the builtin array aggregates.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Locals must come from ctx.freshName: nullSafeCodeGen inlines this block
    // without a brace scope when inputs are non-nullable, so two DotProduct
    // instances in one projection would otherwise declare duplicate names.
    val n = ctx.freshName("dotN")
    val acc = ctx.freshName("dotAcc")
    val i = ctx.freshName("dotI")
    nullSafeCodeGen(ctx, ev, (x, y) => s"""
      |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
      |double $acc = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  $acc += $x.getDouble($i) * $y.getDouble($i);
      |}
      |${ev.value} = $acc;
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a double array: sqrt of the left-to-right sum of squares. */
case class L2Norm(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i); acc += d * d; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ctx.freshName for the same reason as DotProduct: duplicate fixed locals
    // across instances fail janino and silently fall back to interpreted eval.
    val n = ctx.freshName("normN")
    val acc = ctx.freshName("normAcc")
    val i = ctx.freshName("normI")
    val d = ctx.freshName("normD")
    nullSafeCodeGen(ctx, ev, x => s"""
      |int $n = $x.numElements();
      |double $acc = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  double $d = $x.getDouble($i);
      |  $acc += $d * $d;
      |}
      |${ev.value} = java.lang.Math.sqrt($acc);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** Column-level entry points (usable without any session-level setup). */
object VectorFunctions {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def l2norm(v: Column): Column =
    Bridge.column(L2Norm(Bridge.expression(v)))

  /** (identifier, info, builder) triples for SQL registration — consumed
    * by [[graft.GraftExtensions]] and directly registrable into an
    * existing session's function registry. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))),
    (FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_norm"),
      (es: Seq[Expression]) => L2Norm(es.head)))
}
