package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native ADC (asymmetric distance computation) lookup-sum — the inner loop
  * of every IVFADC/PQ serving and graph query (Jégou et al. 2011 §III):
  * given a candidate's `codes` (m small ints) and the query's per-subspace
  * lookup tables `parts` (m rows of ksub longs), the score is
  * Σ_s parts(s)(codes(s)).
  *
  * The composed form (`aggregate(zip_with(codes, parts, (c, p) =>
  * element_at(p, c + 1)), 0L, _ + _)`) materializes an intermediate m-array
  * per (query, candidate) pair; the ADC join evaluates it once per resident
  * code in every probed cell, so at serving scale the allocation dominates
  * the m integer adds. This expression indexes both `ArrayData` buffers
  * directly — zero allocation, whole-stage-codegen friendly (the
  * [[DotProductExpr]] treatment applied to the quantized path).
  *
  * Semantics are the composed form's on every input the engine produces
  * (AdcSumSpec pins parity): null if either argument, any element, or any
  * looked-up cell is null, or if the lengths differ (zip_with's null pad
  * poisons the sum). A code outside its row's bounds returns null rather
  * than ANSI-throwing — encode always emits valid codes, and a corrupt
  * store row should drop from the shortlist, not kill the serving job.
  *
  * NEGATIVE codes are part of that out-of-bounds contract and are the one
  * place the two forms deliberately DIVERGE: this expression returns null
  * for any `code < 0`, while the HOF form inherits `element_at`'s
  * index-from-end semantics (`element_at(p, c + 1)` reads from the tail for
  * `c < -1` and errors outright at `c == -1`). Encode can never emit a
  * negative code, so the divergence is unreachable from the engine's own
  * plans; AdcSumSpec pins the intended null behavior explicitly.
  */
case class AdcSumExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_adc"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(LongType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_adc expects (array<int>, array<array<bigint>>), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val parts = b.asInstanceOf[ArrayData]
    val n = codes.numElements()
    if (n != parts.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i) || parts.isNullAt(i)) return null
      val idx = codes.getInt(i)
      val row = parts.getArray(i)
      if (idx < 0 || idx >= row.numElements() || row.isNullAt(idx)) return null
      acc += row.getLong(idx)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val idx = ctx.freshName("idx")
      val row = ctx.freshName("row")
      // ev.value's declared default is -1L — reset before the loop
      s"""
         |${ev.value} = 0L;
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; ${ev.value} = 0L; break;
         |    }
         |    int $idx = $a.getInt($i);
         |    org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($i);
         |    if ($idx < 0 || $idx >= $row.numElements() || $row.isNullAt($idx)) {
         |      ${ev.isNull} = true; ${ev.value} = 0L; break;
         |    }
         |    ${ev.value} += $row.getLong($idx);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}
