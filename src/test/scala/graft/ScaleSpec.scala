package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

/** §6 scale mechanics: salting preserves join semantics; bucketing
  * removes the join exchange. */
class ScaleSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows") {
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    val plain = orders.join(customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      .select("o_orderkey", "c_name")
    val salted = Scale.saltedJoin(
      orders, customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", 8)
      .select("o_orderkey", "c_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("stratified sample is deterministic and respects per-stratum fractions") {
    val docs = Tables.load(spark, sf, "documents")
    val fr = Map("en" -> 0.5, "de" -> 0.1, "es" -> 0.0, "fr" -> 1.0, "zh" -> 0.2)
    val s1 = Scale.stratifiedSample(docs, "lang", fr, seed = 42).select("doc_id", "lang")
    val s2 = Scale.stratifiedSample(docs, "lang", fr, seed = 42).select("doc_id", "lang")
    assert(s1.collect().toSet == s2.collect().toSet) // same seed, same sample
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("es")) // 0.0 fraction -> empty stratum
    assert(counts("fr") == totals("fr")) // 1.0 fraction -> full stratum
    val enRatio = counts("en").toDouble / totals("en")
    assert(enRatio > 0.2 && enRatio < 0.8, s"en ratio $enRatio far from 0.5")
  }

  test("hive-style partition layout prunes directories at planning time") {
    // at 100 TB, date-partitioned layout turns a date predicate into a
    // directory listing instead of a data scan — assert the filter
    // lands in PartitionFilters (metadata-only) not PushedFilters
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = Tables.load(spark, sf, "events")
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
    events.write.partitionBy("dt").mode("overwrite").parquet(s"$dir/by_day")
    val back = spark.read.parquet(s"$dir/by_day")
    val oneDay = back.where(col("dt") === "2024-01-05")
    val scan = oneDay.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.exists(_.toString.contains("2024-01-05")),
      s"date predicate must prune partitions: ${scan.partitionFilters}")
    assert(scan.relation.location.inputFiles.length >
      scan.selectedPartitions.totalNumberOfFiles,
      "pruned scan must read strictly fewer files than the table holds")
    assert(oneDay.count() ==
      events.where(col("dt") === "2024-01-05").count())
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // Spark injects a bloom filter built from the selective (dim) side
    // into the fact-side scan of a shuffle join — at 100 TB this skips
    // fact rows before the exchange. Default thresholds target real
    // cluster sizes (10 GB fact side), so lower them to demonstrate the
    // rewrite engages under this engine's configuration.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val lineitem = Tables.load(spark, sf, "lineitem")
      val orders = Tables.load(spark, sf, "orders")
        .where(col("o_totalprice") > 400000.0) // selective creation side
        .withColumnRenamed("o_orderkey", "l_orderkey")
      val joined = lineitem.join(orders, "l_orderkey").select("l_orderkey", "l_quantity")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter did not engage:\n${plan.take(2000)}")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed join plans without a shuffle exchange") {
    val orders = Tables.load(spark, sf, "orders").limit(500)
    val lineitem = Tables.load(spark, sf, "lineitem").limit(500)
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val joined = Scale.bucketedJoin(spark, orders, lineitem, "o_orderkey", 4,
      "graft_orders_b", "graft_lineitem_b")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
  }
}
