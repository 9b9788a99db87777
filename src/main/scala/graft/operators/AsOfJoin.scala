package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator Spark lacks natively (SURVEY.md
  * §2.b): for each left row, attach the latest right row with the same
  * key and rightTime ≤ leftTime.
  *
  * Implementation is the union+window recipe, not a range join: both
  * sides are tagged and unioned, then one window pass per key carries the
  * most recent right payload forward (`last(..., ignoreNulls)` over rows
  * unbounded-preceding). Cost at scale: ONE shuffle of |L|+|R| rows on
  * the key + a per-partition sort — no pair explosion, no broadcast
  * requirement, skew handled by AQE like any other shuffle. A
  * broadcast-nested-loop range join would be O(|L|·|R|) per key and a
  * custom SparkPlan would buy nothing over this composition (preference
  * order (a) of the design rules).
  *
  * Right rows that tie on (key, rightTime) must be unique — pre-dedupe
  * (e.g. keep max id) or the carried payload is tie-ambiguous in any
  * engine.
  */
object AsOfJoin {

  /** @param keys       equi-join key columns (present in both sides)
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @return left rows (all columns) + the right side's non-key,
    *         non-time columns from the matched row; unmatched left rows
    *         are dropped (inner as-of) unless `keepUnmatched`.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      keepUnmatched: Boolean = false): DataFrame = {
    val payloadCols = right.columns.filterNot(c =>
      keys.contains(c) || c == rightTime).toSeq
    require(payloadCols.nonEmpty, "right side has no payload columns")

    val lCols = left.columns.toSeq
    // Unified schema: keys ++ __t ++ __side ++ left payload ++ right payload
    val lSide = left
      .withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__rpay", lit(null).cast(
        // struct type built from the right payload
        org.apache.spark.sql.types.StructType(
          right.select(payloadCols.map(col): _*).schema.fields)))
    val rSide = right
      .withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
      .withColumn("__rpay", struct(payloadCols.map(col): _*))
      .select((keys :+ "__t" :+ "__side" :+ "__rpay").map(col) ++
        lCols.filterNot(c => keys.contains(c))
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val unified = lSide
      .select((keys :+ "__t" :+ "__side" :+ "__rpay").map(col) ++
        lCols.filterNot(c => keys.contains(c)).map(col): _*)
      .unionByName(rSide)

    // Right rows sort before left at equal time (side 0 < 1) → `>=`.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unified
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val filtered =
      if (keepUnmatched) carried else carried.filter(col("__match").isNotNull)
    filtered.select(
      lCols.map(col) ++
        payloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** NEAREST as-of (pandas merge_asof direction='nearest' parity): for
    * each left row, the temporally closest right row on either side;
    * ties go BACKWARD (the pandas convention). Composed from
    * [[backward]] + [[forward]] with the matched right time smuggled
    * into the payload so the distance is computable — two union+window
    * passes on the same key partitioning (at scale: the same one
    * exchange, reused), then a pick by |Δt|.
    *
    * @param leftId a UNIQUE left row id (the two directional results
    *               re-join on it; a non-unique id would cross-pair).
    */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftId: String, leftTime: String, rightTime: String,
      keepUnmatched: Boolean = false): DataFrame = {
    val payloadCols = right.columns.filterNot(c =>
      keys.contains(c) || c == rightTime).toSeq
    val rightT = right.withColumn("__rts", col(rightTime))
    def sideStruct(df: DataFrame, tag: String): DataFrame =
      df.select(col(leftId),
        struct((payloadCols :+ "__rts").map(col): _*).as(tag))
    val b = sideStruct(backward(left, rightT, keys, leftTime, rightTime,
      keepUnmatched = true), "__b")
    val f = sideStruct(forward(left, rightT, keys, leftTime, rightTime,
      keepUnmatched = true), "__f")
    val lt = unix_micros(col(leftTime))
    val bD = lt - unix_micros(col("__b.__rts"))
    val fD = unix_micros(col("__f.__rts")) - lt
    val pick = when(col("__b.__rts").isNull && col("__f.__rts").isNull,
        lit(null))
      .when(col("__f.__rts").isNull, col("__b"))
      .when(col("__b.__rts").isNull, col("__f"))
      .when(bD <= fD, col("__b")) // tie -> backward
      .otherwise(col("__f"))
    val joined = left.join(b, leftId).join(f, leftId)
      .withColumn("__pick", pick)
    val kept = if (keepUnmatched) joined
      else joined.filter(col("__pick").isNotNull)
    kept.select(left.columns.map(col) ++
      payloadCols.map(c => col(s"__pick.$c").as(c)) :+
      (unix_micros(col("__pick.__rts")) - lt).as("asof_delta_us"): _*)
  }

  /** Forward as-of: earliest right row with rightTime ≥ leftTime. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      keepUnmatched: Boolean = false): DataFrame = {
    // Mirror trick: negate time by sorting descending with left-after-right.
    val payloadCols = right.columns.filterNot(c =>
      keys.contains(c) || c == rightTime).toSeq
    val lCols = left.columns.toSeq
    val lSide = left
      .withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__rpay", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(payloadCols.map(col): _*).schema.fields)))
      .select((keys :+ "__t" :+ "__side" :+ "__rpay").map(col) ++
        lCols.filterNot(c => keys.contains(c)).map(col): _*)
    val rSide = right
      .withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
      .withColumn("__rpay", struct(payloadCols.map(col): _*))
      .select((keys :+ "__t" :+ "__side" :+ "__rpay").map(col) ++
        lCols.filterNot(c => keys.contains(c))
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lSide.unionByName(rSide)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val filtered =
      if (keepUnmatched) carried else carried.filter(col("__match").isNotNull)
    filtered.select(
      lCols.map(col) ++ payloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
