package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch expression microbench (the PLANS.md A/B harness, checked
  * in like [[ExplainMain]]): times named SQL expressions over a 10M-row
  * synthetic column, warm, median-of-3.
  *
  * Usage: runMain graft.tools.MicroBench
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val df = spark.range(0, 10000000L)
      .selectExpr("concat('7:', cast(id as string)) AS s").cache()
    df.count()
    val cases = Seq(
      "conv-chain" -> "sum(cast(conv(substring(md5(s),1,15),16,10) as bigint) % 1000000007)",
      "digest-direct" -> "sum(graft_md5long60(s) % 1000000007)")
    // warm
    val warm = cases.map { case (_, e) => df.selectExpr(s"$e AS x").collect()(0).getLong(0) }
    println(s"[mb] equal: ${warm.distinct.size == 1} (${warm.mkString(", ")})")
    cases.foreach { case (tag, e) =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.selectExpr(s"$e AS x").collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[mb] $tag%-14s median ${ts(1)}%.3f s  [${ts.head}%.3f, ${ts.last}%.3f]")
    }
    spark.stop()
  }
}
