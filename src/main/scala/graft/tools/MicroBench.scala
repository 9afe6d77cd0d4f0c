package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch expression microbench (the PLANS.md A/B harness, checked
  * in like [[ExplainMain]]): times named SQL expressions over a 10M-row
  * synthetic column, warm, median-of-3.
  *
  * Usage: runMain graft.tools.MicroBench
  */
object MicroBench {

  /** Interleaved A/B of the C56 bootstrap replicate stage: old
    * (explode + md5-hex + conv(substring) + threshold when-chain) vs
    * new (posexplode(graft_boot_w)) over an events-shaped synthetic
    * frame. Interleaving makes the RATIO valid under uniform machine
    * contention (the r12 session's host showed persistent CPU steal). */
  private def bootAb(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val th = graft.operators.Stats.BootThresholds
    val w = th.map(t => s"(CASE WHEN u >= ${t}L THEN 1 ELSE 0 END)").mkString(" + ")
    val arr = th.mkString("array(", "L,", "L)")
    val base = spark.range(0, 1000000L)
      .selectExpr("cast(id % 5 as string) AS event_type", "id AS event_id",
        "cast(cast(id % 997 as double) / 7 as decimal(18,6)) AS v").cache()
    base.count()
    def old() = base
      .selectExpr("event_type", "event_id", "v", "explode(sequence(0, 12)) AS g")
      .selectExpr("event_type", "v", "g",
        "md5(concat('boot', cast(g as string), ':', cast(event_id as string))) AS h",
        "explode(sequence(0, 3)) AS sl")
      .selectExpr("event_type", "v", "g * 4 + sl AS b",
        "cast(conv(substring(h, sl * 7 + 1, 7), 16, 10) as long) AS u")
      .where("b < 50").selectExpr("event_type", "b", "v", s"($w) AS w")
      .groupBy("event_type", "b").agg(sum(col("w")).as("n"), sum(expr("v * w")).as("s"))
    def neu() = base
      .selectExpr("event_type", "v",
        "explode(sequence(0, 12)) AS g", "event_id")
      .select(col("event_type"), col("v"), col("g"),
        posexplode(expr(s"graft_boot_w(concat('boot', cast(g as string), ':', " +
          s"cast(event_id as string)), $arr)")).as(Seq("sl", "w")))
      .where(col("g") * 4 + col("sl") < 50 && col("w") > 0)
      .groupBy(col("event_type"), col("g") * 4 + col("sl"))
      .agg(sum(col("w")).as("n"), sum(expr("v * w")).as("s"))
    // result parity first
    val a = old().selectExpr("sum(n) AS n", "sum(s) AS s").collect()(0)
    val b = neu().selectExpr("sum(n) AS n", "sum(s) AS s").collect()(0)
    println(s"[mb] boot parity: ${a == b} ($a vs $b)")
    val ts = (1 to 4).flatMap { _ =>
      Seq("old" -> old _, "new" -> neu _).map { case (tag, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        tag -> (System.nanoTime() - t0) / 1e9
      }
    }
    Seq("old", "new").foreach { tag =>
      val xs = ts.collect { case (`tag`, t) => t }.sorted
      println(f"[mb] boot-$tag%-4s reps ${xs.map(x => f"$x%.2f").mkString(", ")}  median ${xs(xs.size / 2)}%.2f")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    if (args.contains("boot")) { bootAb(spark); spark.stop(); return }
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
