package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF demo (SURVEY.md §2.b "custom typed UDAF"): quantity-weighted
  * average price.
  *
  * The buffer accumulates in BigDecimal so merge order (nondeterministic
  * across partitions) cannot perturb the result — mirroring the decimal
  * convention in [[graft.core.dsl]]. Inputs are quantized exactly like the
  * oracle SQL: the product at scale 6, the weight at scale 2.
  */
object WeightedAvg extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {
  // (price, qty) → (sum(price*qty)@scale6, sum(qty)@scale2)
  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: (JBigDecimal, JBigDecimal), in: (Double, Double)): (JBigDecimal, JBigDecimal) = {
    val (price, qty) = in
    val pq = new JBigDecimal(java.lang.Double.toString(price * qty))
      .setScale(6, RoundingMode.HALF_UP)
    val q = new JBigDecimal(java.lang.Double.toString(qty))
      .setScale(2, RoundingMode.HALF_UP)
    (b._1.add(pq), b._2.add(q))
  }

  override def merge(a: (JBigDecimal, JBigDecimal), b: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (a._1.add(b._1), a._2.add(b._2))

  override def finish(r: (JBigDecimal, JBigDecimal)): Double =
    if (r._2.signum == 0) Double.NaN
    else r._1.doubleValue() / r._2.doubleValue()

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
