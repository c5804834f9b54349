package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared coefficient generation for the MinHash universal-hash family —
  * MUST stay in lockstep with the composed form's sequence (one
  * `scala.util.Random(seed)` stream, a then b per slot) so signatures are
  * stable across the expression and HOF implementations. */
object MinHashCoefs {
  val MersenneP = 2147483647L // 2^31 - 1

  def generate(numHashes: Int, seed: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    def coef() = 1L + rnd.nextInt((MersenneP - 1).toInt)
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    (0 until numHashes).foreach { j => as(j) = coef(); bs(j) = coef() }
    (as, bs)
  }
}

/** Native MinHash signature: `numHashes` universal-hash minima of a base-hash
  * array, computed in ONE pass over the input.
  *
  * The composed form (`array((0 until n).map(j => array_min(transform(bh,
  * h => pmod(h*a+b, p)))))`) materializes one transformed array per slot per
  * row — for a 500-shingle document and 16 slots that is 16 × 500-element
  * allocations before any min is taken. This expression keeps `n` running
  * minima in a primitive long[] and scans the base hashes once.
  *
  * Arithmetic matches `pmod(h*a + b, p)`: `floorMod` gives pmod's
  * non-negative result for any sign of input, and for the intended domain —
  * base hashes in [0, p) as produced by `Dedup.shingleHashes` — `h*a + b <
  * 2^62` never overflows a long. (Out-of-domain inputs big enough to
  * overflow differ from the ANSI HOF form, which would throw instead of
  * wrapping.) Null input array → null; null elements are skipped like
  * `array_min` does (all-null/empty input → null slots).
  */
case class MinHashSigExpr(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {

  private val n = as.length
  require(n == bs.length && n > 0, "coefficient arrays must match and be non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<bigint>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val m = xs.numElements()
    val mins = Array.fill(n)(Long.MaxValue)
    var i = 0
    while (i < m) {
      if (!xs.isNullAt(i)) {
        val h = xs.getLong(i)
        var j = 0
        while (j < n) {
          val v = java.lang.Math.floorMod(h * as(j) + bs(j), MinHashCoefs.MersenneP)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(v =>
      if (v == Long.MaxValue) null else java.lang.Long.valueOf(v)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as.toArray, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, xs => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("out")
      s"""
         |int $m = $xs.numElements();
         |long[] $mins = new long[$n];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $m; $i++) {
         |  if (!$xs.isNullAt($i)) {
         |    long $h = $xs.getLong($i);
         |    for (int $j = 0; $j < $n; $j++) {
         |      long $v = java.lang.Math.floorMod($h * $aRef[$j] + $bRef[$j], ${MinHashCoefs.MersenneP}L);
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |Object[] $out = new Object[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  $out[$j] = $mins[$j] == Long.MAX_VALUE ? null : (Object) $mins[$j];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
