package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, ShortType}

/** Native dot product of two numeric-array columns — the hot inner loop of
  * every ANN / near-dup / LSH query (SURVEY.md Similarity family).
  *
  * The composed form (`aggregate(zip_with(a, b, _ * _), ...)`) is codegen'd
  * but materializes an intermediate product ARRAY per row pair; at
  * queries × candidates × dims scale that allocation dominates the actual
  * multiply-adds. This expression loops directly over both `ArrayData`
  * buffers — zero allocation, whole-stage-codegen friendly.
  *
  * Semantics are IDENTICAL to the composed form (oracle parity): null if
  * either array is null, if lengths differ (zip_with pads with null), or if
  * any element is null; otherwise the double sum of products accumulated in
  * index order (floats widened exactly).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private val supported: Map[DataType, String] = Map(
    FloatType -> "getFloat", DoubleType -> "getDouble", LongType -> "getLong",
    IntegerType -> "getInt", ShortType -> "getShort", ByteType -> "getByte")

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(t, _) => supported.contains(t)
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects arrays of numeric elements, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def getter(e: Expression): String =
    supported(e.dataType.asInstanceOf[ArrayType].elementType)

  private def read(xs: ArrayData, i: Int, get: String): Double = get match {
    case "getFloat" => xs.getFloat(i).toDouble
    case "getDouble" => xs.getDouble(i)
    case "getLong" => xs.getLong(i).toDouble
    case "getInt" => xs.getInt(i).toDouble
    case "getShort" => xs.getShort(i).toDouble
    case "getByte" => xs.getByte(i).toDouble
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lg, rg) = (getter(left), getter(right))
    var acc = 0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += read(x, i, lg) * read(y, i, rg)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = getter(left)
    val rGet = getter(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // ev.value's declared default is -1.0, not 0.0 — reset before the loop
      s"""
         |${ev.value} = 0.0;
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; ${ev.value} = 0.0; break;
         |    }
         |    ${ev.value} += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}
