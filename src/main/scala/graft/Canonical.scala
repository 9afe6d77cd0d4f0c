package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Representation canonicalization applied symmetrically to BOTH sides
  * of the driver's correctness compare (the Spark parquet dump and the
  * generated DuckDB oracle SQL), so value-identical results can never
  * hash-differ on IEEE representation artifacts.
  *
  * The one artifact class observed across rounds is negative zero: a
  * rounded float aggregate whose true value is a tiny negative residue
  * lands on `-0.0` in one engine and `+0.0` in the other (r8's
  * q_leakage_scale / q_modularity reds). `x + 0.0` maps `-0.0` to
  * `+0.0` and is the identity on every other double, so adding it on
  * both sides is value-preserving and collapses the two reprs to one.
  *
  * Scope: top-level Double/Float columns and arrays thereof — the only
  * shapes the oracle-backed surface emits. Types are preserved exactly
  * (REAL is cast back to REAL in DuckDB) so the driver's schema check
  * is unaffected.
  *
  * This object is FLOATS-ONLY by design. The second observed repr
  * hazard — max-precision DECIMAL(38,0) in a released projection
  * (r10's 14 hash-reds, bit-identical values) — is guarded not here
  * but by the released-type lint in OperatorSpec ("released-type
  * lint"): no query schema may carry a decimal with precision > 18;
  * wide-decimal arithmetic stays internal and releases as BIGINT or a
  * declared fixed-point rescale.
  */
object Canonical {

  private def fixCol(c: Column, dt: DataType): Option[Column] = dt match {
    case DoubleType => Some(c + lit(0.0))
    case FloatType => Some((c + lit(0.0f)).cast(FloatType))
    case ArrayType(DoubleType, _) => Some(transform(c, x => x + lit(0.0)))
    case ArrayType(FloatType, _) =>
      Some(transform(c, x => (x + lit(0.0f)).cast(FloatType)))
    case _ => None
  }

  /** Spark side: identity unless the frame has float-typed columns. */
  def canonicalize(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    if (!fields.exists(f => fixCol(col(f.name), f.dataType).isDefined)) df
    else df.select(fields.map { f =>
      fixCol(col(f.name), f.dataType).map(_.as(f.name)).getOrElse(col(f.name))
    }.toIndexedSeq: _*)
  }

  private def fixSql(name: String, dt: DataType): Option[String] = {
    val q = "\"" + name + "\""
    dt match {
      case DoubleType => Some(s"($q + 0.0) AS $q")
      case FloatType => Some(s"(($q + 0.0)::REAL) AS $q")
      case ArrayType(DoubleType, _) =>
        Some(s"list_transform($q, graft_x -> graft_x + 0.0) AS $q")
      case ArrayType(FloatType, _) =>
        Some(s"list_transform($q, graft_x -> (graft_x + 0.0)::REAL) AS $q")
      case _ => None
    }
  }

  /** DuckDB side: wrap the oracle in one canonicalizing projection,
    * driven by the Spark result schema (same column names by the
    * driver's compare contract). Identity when no float columns. */
  def wrapSql(sql: String, schema: StructType): String =
    if (!schema.fields.exists(f => fixSql(f.name, f.dataType).isDefined)) sql
    else {
      val items = schema.fields.map { f =>
        fixSql(f.name, f.dataType).getOrElse("\"" + f.name + "\"")
      }.mkString(", ")
      s"SELECT $items FROM ($sql) graft_canon"
    }
}
