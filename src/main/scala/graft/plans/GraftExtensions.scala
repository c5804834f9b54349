package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{BinaryType, IntegerType}

import graft.functions.{Blake2bHexExpr, Blake2sHexExpr, DotProductExpr, MinHashSigExpr}

/** SparkSessionExtensions entry point: installs the graft function surface
  * into any session at build time —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * This is the deployment-grade registration path (cluster-wide via config,
  * no per-session imperative setup); `HashFunctions.register` remains the
  * ad-hoc equivalent for an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def ternary(name: String, clazz: String,
                      build: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz, name),
      (exprs: Seq[Expression]) => build(exprs))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(ternary("blake2s_hex",
      classOf[Blake2sHexExpr].getCanonicalName,
      exprs => Blake2sHexExpr(
        Cast(exprs(0), BinaryType), Cast(exprs(1), BinaryType),
        Cast(exprs(2), IntegerType))))
    ext.injectFunction(ternary("blake2b_hex",
      classOf[Blake2bHexExpr].getCanonicalName,
      exprs => Blake2bHexExpr(
        Cast(exprs(0), BinaryType), Cast(exprs(1), BinaryType),
        Cast(exprs(2), IntegerType))))
    ext.injectFunction(ternary("graft_dot",
      classOf[DotProductExpr].getCanonicalName,
      exprs => DotProductExpr(exprs(0), exprs(1))))
    ext.injectFunction(ternary("graft_minhash",
      classOf[MinHashSigExpr].getCanonicalName,
      graft.functions.HashFunctions.buildMinhash))
    ext.injectOptimizerRule(_ => RewriteDotProduct)
  }
}
