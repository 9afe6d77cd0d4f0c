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
