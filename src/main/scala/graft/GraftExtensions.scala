package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{DotProduct, SimHash60}

/** SparkSessionExtensions entry point: makes graft's custom Catalyst
  * expressions available in any session (including pure SQL users)
  * without touching the function registry by hand:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * The library's DataFrame API also self-registers via
  * [[graft.functions.VectorFunctions.register]], so extensions are a
  * convenience for SQL-first deployments.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash60"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash60(exprs.head)))
    // transparently upgrade HOF dot products to the codegen'd expression
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
    // whole-operator as-of join: AsOfJoin logical node -> AsOfJoinExec
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
