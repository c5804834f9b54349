package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.HashFunctions

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

  override def apply(ext: SparkSessionExtensions): Unit = {
    // one shared builder map — this path and HashFunctions.register cannot
    // drift apart
    HashFunctions.builders.foreach { case (name, build) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          build(exprs)))
    }
    ext.injectOptimizerRule(_ => RewriteDotProduct)
  }
}
