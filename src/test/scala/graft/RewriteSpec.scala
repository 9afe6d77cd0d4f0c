package graft

import org.apache.spark.sql.functions._

import graft.plans.DotProductRewrite

/** The optimizer rule rewrites the HOF dot-product shape into the
  * codegen'd DotProduct, preserving values bit-exactly. */
class RewriteSpec extends SparkSpec {
  import spark.implicits._

  test("HOF dot product is rewritten to graft_dot and values match") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try {
      val df = Tables.load(spark, sf, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val hof = df.select($"vec_id",
        aggregate(zip_with($"v", $"v", _ * _), lit(0.0), _ + _).as("d"))
      assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        s"rule did not fire:\n${hof.queryExecution.optimizedPlan}")
      graft.functions.VectorFunctions.register(spark)
      val direct = df.select($"vec_id", expr("graft_dot(v, v)").as("d"))
      assert(hof.orderBy("vec_id").collect().map(_.getDouble(1)).toSeq ==
        direct.orderBy("vec_id").collect().map(_.getDouble(1)).toSeq)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }

  test("non-matching HOF shapes are left untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try {
      val df = Tables.load(spark, sf, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      // sum of |x*y| — the inner lambda is not a bare multiply
      val other = df.select(
        aggregate(zip_with($"v", $"v", (x, y) => abs(x * y)), lit(0.0), _ + _).as("d"))
      assert(!other.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      assert(other.count() > 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }
}
