package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** The one `private[sql]` bridge graft needs: wrapping a custom
  * LogicalPlan ([[graft.plans.AsOfJoin]]) into a DataFrame. Spark 4
  * exposes no public constructor for this — the standard practice for
  * extension libraries (Delta, Sedona, Iceberg runtimes all ship the
  * same shim) is a package-adjacent accessor. Nothing else in graft
  * lives outside its own namespace, and no Spark internals are
  * modified — this only forwards to `Dataset.ofRows` and
  * `experimental.extraStrategies` (itself a public API).
  */
package object graftshim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently append a planner strategy at runtime (the
    * non-extensions path for DataFrame-API users). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }
}
