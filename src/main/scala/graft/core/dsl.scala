package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic-aggregation helpers.
  *
  * Why: the correctness gate hash-compares Spark output against DuckDB.
  * Plain `SUM(double)` is order-dependent (Spark's partial aggregation vs
  * DuckDB's scan order differ in final ulps), so every money/quantity
  * aggregate goes through an exact decimal path: cast each (bit-identical)
  * per-row double to DECIMAL — a deterministic function of the input —
  * sum exactly in decimal, and cast the single result back to double.
  * Both engines then produce the identical IEEE-754 value.
  *
  * The matching DuckDB oracle spellings are in [[OracleDsl]].
  */
object dsl {
  /** Exact sum of a ~2-decimal money/quantity double, as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact sum of a per-row product of up to three 2-decimal inputs
    * (e.g. price*(1-disc)*(1+tax)): the true product has ≤6 decimal
    * digits, so a scale-6 cast recovers the exact decimal value in both
    * engines (the per-row double is within ~1e-11 of it, far inside the
    * 5e-7 rounding radius), with no half-way ties. Scale 4 would sit on
    * genuine .00005 ties; scale 10 would keep engine-specific binary
    * junk. Both fail — 6 is exact.
    */
  def dsumExpr(c: Column): Column =
    sum(c.cast(DecimalType(25, 6))).cast(DoubleType)

  /** Deterministic average: exact decimal sum divided by count. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType) / count(c)
}

/** DuckDB SQL spellings of the [[dsl]] aggregates, for oracle strings. */
object OracleDsl {
  def dsum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"
  def dsumExpr(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(25,6))) AS DOUBLE)"
  def davg(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE) / COUNT($e)"
}
