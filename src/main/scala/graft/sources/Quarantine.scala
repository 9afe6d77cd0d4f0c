package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** R17 (r8): malformed-record quarantine — the ingest-boundary
  * discipline every production pipeline needs and ad-hoc jobs skip:
  * a bad record must neither kill the job (ANSI throw) nor silently
  * vanish (DROPMALFORMED); it must land in a QUARANTINE table with
  * its raw payload intact so it can be inspected, re-parsed after a
  * schema fix, and counted against an ingest SLA.
  *
  * Built on the engine's own PERMISSIVE parse contract: the schema is
  * extended with a corrupt-record column; a row that fails JSON
  * parsing (or fails type conversion for a declared field) carries
  * its raw text there and nulls the data fields. Both outputs are
  * pure projections of ONE parse pass — Spark computes the split
  * without scanning twice, and the filter on the corrupt column
  * reaches the scan. The spec pins the three-way contract: good rows
  * parse field-exactly, bad rows preserve their payload byte-exactly,
  * and good + bad = input (nothing dropped, nothing duplicated).
  */
object Quarantine {

  private val CorruptCol = "_corrupt_record"

  /** (parsed, quarantine): parsed has `keyCols ++ schema fields`;
    * quarantine has `keyCols ++ raw payload`. */
  def parseJson(raw: DataFrame, rawCol: String, schema: StructType,
      keyCols: Seq[String] = Seq.empty): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already define $CorruptCol")
    val extended = schema.add(CorruptCol, StringType)
    val parsed = raw.withColumn("_p",
      from_json(col(rawCol), extended,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)))
    val good = parsed
      .where(col("_p").isNotNull && col(s"_p.$CorruptCol").isNull)
      .select(keyCols.map(col) ++
        schema.fieldNames.toSeq.map(f => col(s"_p.$f").as(f)): _*)
    val bad = parsed
      .where(col("_p").isNull || col(s"_p.$CorruptCol").isNotNull)
      .select(keyCols.map(col) :+ col(rawCol).as("raw_payload"): _*)
    (good, bad)
  }
}
